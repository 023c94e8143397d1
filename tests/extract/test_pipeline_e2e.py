"""One-shot extraction-pipeline integration: run_pipeline -> served query.

The reference's whole offline story is one orchestrator call
(/root/reference/src/lean_explore/extract/__main__.py:118-222):
parse -> informalize -> embed -> index, producing artifacts the engine
loads. Per-stage tests cover each step; this test proves them as ONE
``run_pipeline`` invocation from a doc-gen4-format fixture all the way to
a query served through ``Service`` with the embedder that built the index.
"""

import asyncio

import pytest

from lean_explore_tpu.extract.__main__ import run_pipeline
from lean_explore_tpu.index import load_index_artifacts
from lean_explore_tpu.models import DeclarationStore
from lean_explore_tpu.search.engine import SearchEngine
from lean_explore_tpu.search.service import Service

from tests.extract.test_doc_parser import _make_docgen_db, tag_const, text
from tests.helpers import make_tiny_model_dir


class FakeOpenRouter:
    """Deterministic stand-in for the OpenRouter informalizer LLM."""

    def __init__(self):
        self.calls = 0

    async def generate(self, prompt, model, temperature=0.3):
        self.calls += 1
        # The prompt embeds the declaration name; echo it into the required
        # output format (extract/prompt.txt: **{informal_name}.** {body}).
        name = next(
            (
                line.split(":", 1)[1].strip()
                for line in prompt.splitlines()
                if line.startswith("Declaration name:")
            ),
            f"decl {self.calls}",
        )
        words = name.replace(".", " ").replace("_", " ").lower()
        return f"**The {words} lemma.** A statement about {words}."


@pytest.fixture
def lean_root(tmp_path):
    """Fake lean root: one workspace, 3 real declarations + 1 filtered."""
    root = tmp_path / "lean"
    ws = root / "mathlib"
    build = ws / ".lake" / "build"
    build.mkdir(parents=True)
    pkg = ws / ".lake" / "packages" / "mathlib4"
    (pkg / "Mathlib").mkdir(parents=True)
    (pkg / "Mathlib" / "Basic.lean").write_text(
        "import X\n"
        "theorem Nat.add_comm : True := trivial\n"
        "theorem List.map_id : True := trivial\n"
        "theorem Real.sqrt_nonneg : True := trivial\n"
        "def Other.mk := 1\n"
    )
    url = (
        "https://github.com/leanprover-community/mathlib4/blob/abc/"
        "Mathlib/Basic.lean"
    )
    rows = []
    for line, name in (
        (2, "Nat.add_comm"),
        (3, "List.map_id"),
        (4, "Real.sqrt_nonneg"),
        (5, "Other.mk"),  # .mk constructor: filtered by the parser
    ):
        rows.append(
            {
                "module": "Mathlib.Basic",
                "name": name,
                "start": line,
                "end": line,
                "docstring": f"doc for {name}",
                "source_url": url,
                "type_blob": tag_const("True", text("True")),
            }
        )
    _make_docgen_db(build / "api-docs.db", rows)
    return root


def test_run_pipeline_to_served_query(lean_root, tmp_path, monkeypatch):
    from lean_explore_tpu.extract import doc_parser, informalize, packages

    monkeypatch.setattr(packages, "get_extraction_order", lambda: ["mathlib"])
    monkeypatch.setattr(doc_parser, "get_extraction_order", lambda: ["mathlib"])

    # run_pipeline constructs the OpenRouter client itself (client=None);
    # inject the fake through a forwarding wrapper so the real informalizer
    # runs (Kahn layering, caching, commits) against the fake LLM.
    fake_llm = FakeOpenRouter()
    real_informalize = informalize.informalize_declarations

    def informalize_with_fake(store, **kw):
        kw["client"] = fake_llm
        kw["use_cache"] = False
        return real_informalize(store, **kw)

    monkeypatch.setattr(
        informalize, "informalize_declarations", informalize_with_fake
    )

    tiny_model = make_tiny_model_dir(
        tmp_path / "tiny_model", with_st_prompt=True
    )
    monkeypatch.setenv("LEAN_EXPLORE_EMBEDDING_MODEL", str(tiny_model))
    # Config reads env at import; patch the resolved attribute directly.
    from lean_explore_tpu.config import Config

    monkeypatch.setattr(Config, "EMBEDDING_MODEL_NAME", str(tiny_model))

    extraction = tmp_path / "extraction"
    extraction.mkdir()
    asyncio.run(
        run_pipeline(
            extraction,
            run_docgen=False,  # lake/doc-gen4 needs the Lean toolchain
            run_parse=True,
            run_informalize=True,
            run_embed=True,
            run_index=True,
            lean_root=lean_root,
            informalize_model="fake/model",
            max_concurrent=4,
            embed_batch_size=8,
            limit=None,
        )
    )

    assert fake_llm.calls == 3  # every real declaration, none twice

    # The artifacts the pipeline wrote are a complete servable set.
    artifacts = load_index_artifacts(extraction)
    store = DeclarationStore(extraction / "declarations.db")
    from lean_explore_tpu.util import EmbeddingClient, RerankerClient

    engine = SearchEngine(
        extraction,
        store=store,
        artifacts=artifacts,
        embedding_client=EmbeddingClient(str(tiny_model), dtype="float32"),
        reranker_client=RerankerClient(str(tiny_model), dtype="float32"),
    )
    resp = asyncio.run(Service(engine).search("nat add comm", limit=5))
    assert resp.count > 0
    assert resp.results[0].name == "Nat.add_comm"
    assert resp.results[0].informalization.startswith("**The nat add comm")
    assert resp.results[0].docstring == "doc for Nat.add_comm"
    # Embeddings were produced by the tiny embedder and round-trip the store.
    decl = asyncio.run(engine.get_by_name("List.map_id"))
    assert decl is not None
    store.close()
