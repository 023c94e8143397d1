"""Rich terminal rendering for search results (reference cli/display.py)."""

import textwrap

from rich.console import Console
from rich.panel import Panel

from lean_explore_tpu.models import SearchResponse

PANEL_WIDTH = 80


def _fixed_width(text: str | None, width: int = PANEL_WIDTH) -> str:
    """Wrap paragraphs and pad every line to a fixed width so panels align."""
    blank = " " * width
    if not text:
        return blank
    lines: list[str] = []
    paragraphs = text.split("\n\n")
    for index, paragraph in enumerate(paragraphs):
        if not paragraph.strip():
            if index < len(paragraphs) - 1:
                lines.append(blank)
            continue
        for raw_line in paragraph.splitlines():
            wrapped = textwrap.wrap(
                raw_line, width=width, break_long_words=True
            ) or [""]
            lines.extend(segment.ljust(width) for segment in wrapped)
        if index < len(paragraphs) - 1:
            lines.append(blank)
    return "\n".join(lines) if lines else blank


def display_search_results(
    response: SearchResponse,
    display_limit: int = 5,
    console: Console | None = None,
) -> None:
    """Render results as per-field rich panels."""
    console = console or Console()
    console.print(
        Panel(
            f"[bold cyan]Search Query:[/bold cyan] {response.query}",
            expand=False,
            border_style="dim",
        )
    )
    shown = min(len(response.results), display_limit)
    timing = (
        f"Time: {response.processing_time_ms}ms"
        if response.processing_time_ms
        else ""
    )
    console.print(f"Showing {shown} of {response.count} results. {timing}")
    if not response.results:
        console.print("[yellow]No results found.[/yellow]")
        return
    console.print("")

    for i, item in enumerate(response.results[:display_limit]):
        console.rule(f"[bold]Result {i + 1}[/bold]", style="dim")
        console.print(f"[bold cyan]ID:[/bold cyan] [dim]{item.id}[/dim]")
        console.print(f"[bold cyan]Name:[/bold cyan] {item.name}")
        console.print(f"[bold cyan]Module:[/bold cyan] [green]{item.module}[/green]")
        console.print(
            f"[bold cyan]Source:[/bold cyan] "
            f"[link={item.source_link}]{item.source_link}[/link]"
        )
        sections = [
            (item.source_text, "Code", "green"),
            (item.docstring, "Docstring", "blue"),
            (item.informalization, "Informalization", "magenta"),
        ]
        for content, title, color in sections:
            if content:
                console.print(
                    Panel(
                        _fixed_width(content),
                        title=f"[bold {color}]{title}[/bold {color}]",
                        border_style=color,
                        expand=False,
                        padding=(0, 1),
                    )
                )
        if i < shown - 1:
            console.print("")

    console.rule(style="dim")
    if len(response.results) > shown:
        console.print(
            f"...and {len(response.results) - shown} more results received "
            "but not shown due to limit."
        )
