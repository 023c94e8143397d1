"""Rich display rendering tests (reference cli/display.py behaviors)."""

from rich.console import Console

from lean_explore_tpu.cli.display import _fixed_width, display_search_results
from lean_explore_tpu.models import SearchResponse, SearchResult


def render(response, limit=5) -> str:
    console = Console(record=True, width=100)
    display_search_results(response, display_limit=limit, console=console)
    return console.export_text()


def make_result(i=1, **overrides):
    base = dict(
        id=i,
        name=f"Nat.thing{i}",
        module="Init.Nat",
        docstring=f"docstring {i}",
        source_text=f"def Nat.thing{i} := {i}",
        source_link=f"https://github.com/x/{i}",
        dependencies=None,
        informalization=f"**Thing {i}.** informal {i}",
    )
    base.update(overrides)
    return SearchResult(**base)


class TestFixedWidth:
    def test_pads_to_width(self):
        lines = _fixed_width("short", width=20).splitlines()
        assert all(len(line) == 20 for line in lines)

    def test_wraps_long_lines(self):
        out = _fixed_width("word " * 50, width=30)
        assert all(len(line) == 30 for line in out.splitlines())
        assert len(out.splitlines()) > 5

    def test_none_and_empty(self):
        assert _fixed_width(None, width=10) == " " * 10
        assert _fixed_width("", width=10) == " " * 10

    def test_paragraph_separation(self):
        out = _fixed_width("para one\n\npara two", width=12)
        assert " " * 12 in out.splitlines()


class TestDisplay:
    def test_renders_all_sections(self):
        resp = SearchResponse(
            query="nat", results=[make_result()], count=1, processing_time_ms=42
        )
        text = render(resp)
        assert "Search Query: nat" in text
        assert "Nat.thing1" in text
        assert "Time: 42ms" in text
        assert "Code" in text and "Docstring" in text and "Informalization" in text

    def test_no_results(self):
        resp = SearchResponse(query="zzz", results=[], count=0)
        assert "No results found" in render(resp)

    def test_limit_note(self):
        resp = SearchResponse(
            query="q", results=[make_result(i) for i in range(1, 5)], count=4
        )
        text = render(resp, limit=2)
        assert "Result 1" in text and "Result 2" in text
        assert "Result 3" not in text
        assert "more results" in text

    def test_optional_sections_omitted(self):
        resp = SearchResponse(
            query="q",
            results=[make_result(docstring=None, informalization=None)],
            count=1,
        )
        text = render(resp)
        assert "Docstring" not in text
        assert "Informalization" not in text
        assert "Code" in text
