"""Wire types for search requests/responses.

Field-for-field compatible with the reference's pydantic models
(/root/reference/src/lean_explore/models/search_types.py:8-109) so MCP/API
consumers see identical schemas.
"""

import re

from pydantic import BaseModel, ConfigDict

_BOLD_HEADER_RE = re.compile(r"\*\*(.+?)\*\*")


def extract_bold_description(informalization: str | None) -> str | None:
    """Pull the leading ``**Bold Title.**`` header out of an informalization.

    Informalizations follow the format spec ``**{informal_name}.** {description}``
    (reference extract/prompt.txt:10-13); returns the text between the first
    pair of ``**`` markers at the start of the string, or None.
    """
    if not informalization:
        return None
    match = _BOLD_HEADER_RE.match(informalization)
    return match.group(1) if match else None


class SearchResultSummary(BaseModel):
    """Slim result (id, name, short description) for token-frugal MCP output."""

    id: int
    name: str
    description: str | None


class SearchSummaryResponse(BaseModel):
    """Envelope for slim search results."""

    query: str
    results: list[SearchResultSummary]
    count: int
    processing_time_ms: int | None = None


class SearchResult(BaseModel):
    """One Lean declaration returned from search (full fields)."""

    id: int
    name: str
    module: str
    docstring: str | None
    source_text: str
    source_link: str
    dependencies: str | None
    informalization: str | None

    model_config = ConfigDict(from_attributes=True)


class SearchResponse(BaseModel):
    """Envelope for full search results."""

    query: str
    results: list[SearchResult]
    count: int
    processing_time_ms: int | None = None
