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
