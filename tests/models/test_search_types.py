"""Wire-type schema tests (parity with reference search_types.py:8-109)."""

from lean_explore_tpu.models import (
    SearchResponse,
    SearchResult,
    SearchResultSummary,
    SearchSummaryResponse,
    extract_bold_description,
)


class TestExtractBoldDescription:
    def test_basic(self):
        text = "**Addition of naturals.** Adds two natural numbers."
        assert extract_bold_description(text) == "Addition of naturals."

    def test_no_bold(self):
        assert extract_bold_description("plain text") is None

    def test_none_and_empty(self):
        assert extract_bold_description(None) is None
        assert extract_bold_description("") is None

    def test_bold_not_at_start(self):
        assert extract_bold_description("see **this**") is None

    def test_shortest_match(self):
        assert extract_bold_description("**a** and **b**") == "a"


def _result(**overrides) -> SearchResult:
    base = dict(
        id=1,
        name="Nat.add",
        module="Init.Nat",
        docstring=None,
        source_text="def Nat.add ...",
        source_link="https://github.com/x",
        dependencies=None,
        informalization="**Add.** sum",
    )
    base.update(overrides)
    return SearchResult(**base)


class TestSchemas:
    def test_search_result_fields(self):
        r = _result()
        dumped = r.model_dump()
        assert set(dumped) == {
            "id",
            "name",
            "module",
            "docstring",
            "source_text",
            "source_link",
            "dependencies",
            "informalization",
        }

    def test_response_envelope(self):
        resp = SearchResponse(
            query="q", results=[_result()], count=1, processing_time_ms=12
        )
        dumped = resp.model_dump(exclude_none=True)
        assert dumped["count"] == 1
        assert dumped["processing_time_ms"] == 12
        assert "docstring" not in dumped["results"][0]

    def test_summary_types(self):
        s = SearchResultSummary(id=1, name="Nat.add", description="Add.")
        resp = SearchSummaryResponse(query="q", results=[s], count=1)
        assert resp.processing_time_ms is None
        assert resp.model_dump()["results"][0]["name"] == "Nat.add"

    def test_from_attributes(self):
        """SearchResult validates directly from a store Declaration object."""
        from tests.conftest import make_declaration

        decl = make_declaration("List.map", "Init.List")
        decl.id = 7
        r = SearchResult.model_validate(decl)
        assert r.id == 7
        assert r.name == "List.map"
