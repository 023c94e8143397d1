"""Rich terminal rendering for search results.

Covers the surface of the reference's cli/display.py (query header,
result count + processing time, per-result code/docstring/informalization
sections, truncation notice) with this framework's own layout: one
compact panel per result with labeled sections inline, instead of the
reference's nested per-field panels.
"""

import textwrap

from rich.console import Console, Group
from rich.panel import Panel
from rich.text import Text

from lean_explore_tpu.models import SearchResponse

WRAP_WIDTH = 76

_SECTIONS = (
    # (attribute, label, label style)
    ("source_text", "code", "yellow"),
    ("docstring", "doc", "cyan"),
    ("informalization", "informal", "magenta"),
)


def _wrap(text: str, indent: str = "  ") -> str:
    """Wrap prose paragraphs; leave single lines of code untouched."""
    out: list[str] = []
    for paragraph in text.split("\n"):
        if not paragraph.strip():
            out.append("")
            continue
        out.extend(
            textwrap.wrap(
                paragraph,
                width=WRAP_WIDTH,
                initial_indent=indent,
                subsequent_indent=indent,
                break_long_words=True,
            )
        )
    return "\n".join(out)


def _result_panel(rank: int, item) -> Panel:
    head = Text()
    head.append(f"{item.name}", style="bold")
    head.append(f"   {item.module}", style="green")
    head.append(f"   #{item.id}", style="dim")
    body: list = [head]
    if item.source_link:
        body.append(Text(item.source_link, style=f"dim link {item.source_link}"))
    for attr, label, style in _SECTIONS:
        content = getattr(item, attr, None)
        if not content:
            continue
        section = Text()
        section.append(f"{label}\n", style=f"bold {style}")
        section.append(_wrap(content))
        body.append(section)
    return Panel(
        Group(*body),
        title=f"[bold]{rank}[/bold]",
        title_align="left",
        border_style="bright_black",
        padding=(0, 1),
    )


def display_search_results(
    response: SearchResponse,
    display_limit: int = 5,
    console: Console | None = None,
) -> None:
    """Render a SearchResponse as one panel per result."""
    console = console or Console()
    console.rule(f"[bold]{response.query}[/bold]")
    shown = min(len(response.results), display_limit)
    stats = f"{shown} of {response.count} results"
    if response.processing_time_ms:
        stats += f" · {response.processing_time_ms} ms"
    console.print(Text(stats, style="dim"))
    if not response.results:
        console.print("[yellow]No results found.[/yellow]")
        return

    for i, item in enumerate(response.results[:display_limit]):
        console.print(_result_panel(i + 1, item))

    hidden = len(response.results) - shown
    if hidden > 0:
        console.print(
            Text(f"+{hidden} more received but not shown (raise -n).", style="dim")
        )
