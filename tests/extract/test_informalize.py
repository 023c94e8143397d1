"""Informalization stage tests: layering, prompting, caching, resume."""

import asyncio
import json

import pytest

from lean_explore_tpu.extract import informalize as inf
from lean_explore_tpu.models import Declaration, DeclarationStore
from tests.conftest import make_declaration


def run(coro):
    return asyncio.run(coro)


def decl(name, deps=None, informalization=None):
    return make_declaration(
        name, dependencies=deps, informalization=informalization
    )


class TestLayers:
    def test_simple_chain(self):
        decls = [
            decl("C", deps=["B"]),
            decl("A", deps=[]),
            decl("B", deps=["A"]),
        ]
        layers = inf.build_dependency_layers(decls)
        assert [sorted(d.name for d in layer) for layer in layers] == [
            ["A"],
            ["B"],
            ["C"],
        ]

    def test_diamond(self):
        decls = [
            decl("D", deps=["B", "C"]),
            decl("B", deps=["A"]),
            decl("C", deps=["A"]),
            decl("A"),
        ]
        layers = inf.build_dependency_layers(decls)
        assert sorted(d.name for d in layers[1]) == ["B", "C"]
        assert [d.name for d in layers[2]] == ["D"]

    def test_cycle_goes_last(self):
        decls = [
            decl("X", deps=["Y"]),
            decl("Y", deps=["X"]),
            decl("Z"),
        ]
        layers = inf.build_dependency_layers(decls)
        assert [d.name for d in layers[0]] == ["Z"]
        assert sorted(d.name for d in layers[-1]) == ["X", "Y"]

    def test_external_deps_ignored(self):
        decls = [decl("A", deps=["NotInSet"])]
        layers = inf.build_dependency_layers(decls)
        assert len(layers) == 1


class TestPrompt:
    def test_render_includes_dependencies(self):
        template = "N={name}\nD={docstring}\nS={source_text}\n{dependencies}"
        d = decl("Nat.mul", deps=["Nat.add", "Unknown"])
        out = inf.render_prompt(
            template, d, {"Nat.add": "**Addition.** adds"}
        )
        assert "N=Nat.mul" in out
        assert "- Nat.add: **Addition.** adds" in out
        assert "Unknown" not in out

    def test_dependency_truncation(self):
        template = "{name}{docstring}{source_text}{dependencies}"
        long_desc = "x" * 500
        d = decl("A", deps=["B"])
        out = inf.render_prompt(template, d, {"B": long_desc})
        assert "x" * 253 + "..." in out
        assert "x" * 260 not in out

    def test_missing_docstring_placeholder(self):
        template = "{docstring}|{name}|{source_text}|{dependencies}"
        d = decl("A")
        d.docstring = None
        assert "No docstring available" in inf.render_prompt(template, d, {})

    def test_bundled_template_format_contract(self):
        """The bundled prompt demands the **Name.** format the search layer's
        extract_bold_description relies on."""
        template = inf.PROMPT_PATH.read_text()
        assert "{{informal_name}}.**" in template.replace("**{{informal_name}}", "{{informal_name}}") or "**{{informal_name}}.**" in template
        rendered = inf.render_prompt(template, decl("Nat.add"), {})
        assert "Nat.add" in rendered


class FakeLLM:
    def __init__(self):
        self.calls: list[str] = []

    async def generate(self, prompt, model, temperature=0.3):
        self.calls.append(prompt)
        name = prompt.split("Declaration name: ")[1].splitlines()[0].strip()
        return f"**{name} described.** generated text"


class TestInformalizeDeclarations:
    def _store(self):
        store = DeclarationStore(":memory:", create=True)
        store.insert_many(
            [
                decl("A"),
                decl("B", deps=["A"]),
                decl("Done", informalization="**Done.** already"),
            ]
        )
        return store

    def test_processes_missing_only(self):
        store = self._store()
        llm = FakeLLM()
        n = run(
            inf.informalize_declarations(store, client=llm, use_cache=False)
        )
        assert n == 2
        assert len(llm.calls) == 2
        assert store.get_by_name("A").informalization.startswith("**A described.**")
        # Dependency description propagates into B's prompt
        b_prompt = next(c for c in llm.calls if "Declaration name: B" in c)
        assert "A described" in b_prompt

    def test_resume_noop(self):
        store = self._store()
        llm = FakeLLM()
        run(inf.informalize_declarations(store, client=llm, use_cache=False))
        llm2 = FakeLLM()
        n = run(inf.informalize_declarations(store, client=llm2, use_cache=False))
        assert n == 0 and llm2.calls == []

    def test_cache_hit_skips_llm(self, tmp_path, monkeypatch):
        # Prior extraction with the same (name, source_text)
        prior = DeclarationStore(tmp_path / "declarations.db", create=True)
        prior.insert_many([decl("A", informalization="**Cached A.** from before")])
        prior.close()
        monkeypatch.setattr(
            inf, "discover_database_files", lambda: [tmp_path / "declarations.db"]
        )
        store = DeclarationStore(":memory:", create=True)
        store.insert_many([decl("A"), decl("New")])
        llm = FakeLLM()
        n = run(inf.informalize_declarations(store, client=llm))
        assert n == 2
        assert store.get_by_name("A").informalization == "**Cached A.** from before"
        assert len(llm.calls) == 1  # only "New"

    def test_failures_tolerated(self):
        class FlakyLLM:
            async def generate(self, prompt, model, temperature=0.3):
                if "Declaration name: A" in prompt:
                    raise RuntimeError("boom")
                return "**ok.** fine"

        store = self._store()
        n = run(
            inf.informalize_declarations(store, client=FlakyLLM(), use_cache=False)
        )
        assert n == 1
        assert store.get_by_name("A").informalization is None
        assert store.get_by_name("B").informalization == "**ok.** fine"

    def test_limit(self):
        store = self._store()
        llm = FakeLLM()
        n = run(
            inf.informalize_declarations(
                store, client=llm, use_cache=False, limit=1
            )
        )
        assert n == 1


class TestCacheSemantics:
    """Cache is keyed (name, source_text) — the reference's exact reuse rule
    (informalize.py:189-237)."""

    def _store_with(self, name, source):
        from lean_explore_tpu.models import Declaration, DeclarationStore

        store = DeclarationStore(":memory:", create=True)
        store.insert_many(
            [
                Declaration(
                    name=name, module="M", source_text=source,
                    source_link="https://x",
                )
            ]
        )
        return store

    def test_changed_source_misses_cache(self, monkeypatch, tmp_path):
        import asyncio

        from lean_explore_tpu.extract import informalize as inf

        store = self._store_with("Nat.add", "def add := NEW BODY")
        monkeypatch.setattr(inf, "discover_database_files", lambda: [])
        llm = FakeLLM()
        cache = {("Nat.add", "def add := OLD BODY"): "cached text"}
        monkeypatch.setattr(
            inf, "load_informalization_cache", lambda files: cache
        )
        done = asyncio.run(
            inf.informalize_declarations(store, client=llm, use_cache=True)
        )
        assert done == 1
        assert len(llm.calls) == 1  # cache MISSED -> LLM was used
        store.close()

    def test_same_source_hits_cache(self, monkeypatch):
        import asyncio

        from lean_explore_tpu.extract import informalize as inf

        store = self._store_with("Nat.add", "def add := SAME")
        monkeypatch.setattr(inf, "discover_database_files", lambda: [])
        monkeypatch.setattr(
            inf,
            "load_informalization_cache",
            lambda files: {("Nat.add", "def add := SAME"): "**Add.** cached"},
        )
        llm = FakeLLM()
        asyncio.run(inf.informalize_declarations(store, client=llm, use_cache=True))
        assert len(llm.calls) == 0
        decl = store.get_by_name("Nat.add")
        assert decl.informalization == "**Add.** cached"
        store.close()


class TestDependencyContextFlow:
    def test_layered_descriptions_reach_dependents(self):
        """A dependency informalized in layer 0 must appear in its
        dependent's prompt in layer 1 (reference informalize.py:289-330)."""
        import asyncio
        import json

        from lean_explore_tpu.extract import informalize as inf
        from lean_explore_tpu.models import Declaration, DeclarationStore

        store = DeclarationStore(":memory:", create=True)
        store.insert_many(
            [
                Declaration(
                    name="Base", module="M", source_text="def base := 1",
                    source_link="https://x",
                ),
                Declaration(
                    name="Derived", module="M", source_text="def derived := base",
                    source_link="https://x",
                    dependencies=json.dumps(["Base"]),
                ),
            ]
        )

        prompts: list[str] = []

        class RecordingLLM:
            async def generate(self, prompt, model=None, temperature=0.3):
                prompts.append(prompt)
                name = "Base" if "def base" in prompt else "Derived"
                return f"**{name}.** description of {name.lower()}"

        asyncio.run(
            inf.informalize_declarations(
                store, client=RecordingLLM(), use_cache=False
            )
        )
        derived_prompt = next(p for p in prompts if "def derived" in p)
        assert "description of base" in derived_prompt
        store.close()

    def test_semaphore_bounds_concurrency(self):
        import asyncio
        import json

        from lean_explore_tpu.extract import informalize as inf
        from lean_explore_tpu.models import Declaration, DeclarationStore

        store = DeclarationStore(":memory:", create=True)
        store.insert_many(
            [
                Declaration(
                    name=f"D{i}", module="M", source_text=f"def d{i}",
                    source_link="https://x", dependencies=json.dumps([]),
                )
                for i in range(12)
            ]
        )

        class GaugeLLM:
            def __init__(self):
                self.in_flight = 0
                self.peak = 0

            async def generate(self, prompt, model=None, temperature=0.3):
                self.in_flight += 1
                self.peak = max(self.peak, self.in_flight)
                await asyncio.sleep(0.01)
                self.in_flight -= 1
                return "**D.** text"

        llm = GaugeLLM()
        asyncio.run(
            inf.informalize_declarations(
                store, client=llm, use_cache=False, max_concurrent=3
            )
        )
        assert llm.peak <= 3
        store.close()

    def test_commit_batching_persists_incrementally(self):
        """With commit_batch_size=2, earlier results are durable before the
        layer finishes (crash loses at most one batch — reference
        informalize.py:417-427)."""
        import asyncio
        import json

        from lean_explore_tpu.extract import informalize as inf
        from lean_explore_tpu.models import Declaration, DeclarationStore

        store = DeclarationStore(":memory:", create=True)
        store.insert_many(
            [
                Declaration(
                    name=f"D{i}", module="M", source_text=f"def d{i}",
                    source_link="https://x", dependencies=json.dumps([]),
                )
                for i in range(5)
            ]
        )
        seen_counts: list[int] = []

        class CountingLLM:
            async def generate(self, prompt, model=None, temperature=0.3):
                await asyncio.sleep(0)  # yield so commits interleave
                rows = sum(
                    1
                    for d in store.iter_all(with_embeddings=False)
                    if d.informalization
                )
                seen_counts.append(rows)
                return "**X.** text"

        asyncio.run(
            inf.informalize_declarations(
                store, client=CountingLLM(), use_cache=False,
                commit_batch_size=2, max_concurrent=1,
            )
        )
        # By the later calls, earlier batches must already be committed.
        assert max(seen_counts) >= 2
        final = sum(
            1 for d in store.iter_all(with_embeddings=False) if d.informalization
        )
        assert final == 5
        store.close()

    def test_malformed_dependency_json_tolerated(self):
        import asyncio

        from lean_explore_tpu.extract import informalize as inf
        from lean_explore_tpu.models import Declaration, DeclarationStore

        store = DeclarationStore(":memory:", create=True)
        store.insert_many(
            [
                Declaration(
                    name="Bad", module="M", source_text="def bad",
                    source_link="https://x", dependencies="{not json]",
                )
            ]
        )
        done = asyncio.run(
            inf.informalize_declarations(store, client=FakeLLM(), use_cache=False)
        )
        assert done == 1
        store.close()
