"""Transfer types for the extraction pipeline (parity: reference
extract/types.py:6-25)."""

from pydantic import BaseModel


class ParsedDeclaration(BaseModel):
    """A declaration parsed from doc-gen4 output, pre-database."""

    name: str
    module: str
    docstring: str | None = None
    source_text: str
    source_link: str
    dependencies: list[str] | None = None
