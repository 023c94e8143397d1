"""Rich display rendering tests (search-result rendering surface)."""

from rich.console import Console

from lean_explore_tpu.cli.display import _wrap, display_search_results
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


class TestWrap:
    def test_wraps_long_prose(self):
        out = _wrap("word " * 50)
        lines = out.splitlines()
        assert len(lines) > 2
        assert all(len(line) <= 78 for line in lines)

    def test_indents_every_line(self):
        out = _wrap("word " * 50)
        assert all(line.startswith("  ") for line in out.splitlines())

    def test_blank_paragraph_preserved(self):
        out = _wrap("para one\n\npara two")
        assert "" in out.splitlines()

    def test_short_code_untouched(self):
        assert _wrap("def f := 1") == "  def f := 1"


class TestDisplay:
    def test_renders_all_sections(self):
        resp = SearchResponse(
            query="nat", results=[make_result()], count=1, processing_time_ms=42
        )
        text = render(resp)
        assert "nat" in text
        assert "Nat.thing1" in text
        assert "42 ms" in text
        assert "code" in text and "doc" in text and "informal" in text
        assert "docstring 1" in text and "informal 1" in text

    def test_no_results(self):
        resp = SearchResponse(query="zzz", results=[], count=0)
        assert "No results found" in render(resp)

    def test_limit_note(self):
        resp = SearchResponse(
            query="q", results=[make_result(i) for i in range(1, 5)], count=4
        )
        text = render(resp, limit=2)
        assert "Nat.thing1" in text and "Nat.thing2" in text
        assert "Nat.thing3" not in text
        assert "+2 more" in text

    def test_optional_sections_omitted(self):
        resp = SearchResponse(
            query="q",
            results=[make_result(docstring=None, informalization=None)],
            count=1,
        )
        text = render(resp)
        assert "doc\n" not in text
        assert "informal\n" not in text
        assert "code" in text

    def test_count_and_shown(self):
        resp = SearchResponse(
            query="q", results=[make_result(i) for i in range(1, 4)], count=9
        )
        text = render(resp, limit=2)
        assert "2 of 9 results" in text
