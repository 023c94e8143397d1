"""Embedding stage, packages/github helpers, doc_gen4 pure logic, and the
pipeline CLI."""

import json

import numpy as np
import pytest
from click.testing import CliRunner

from lean_explore_tpu.extract import embeddings as emb
from lean_explore_tpu.extract import packages as pkgs
from lean_explore_tpu.extract.doc_gen4 import library_names, uses_sqlite_docgen
from lean_explore_tpu.extract.github import extract_lean_version, github_url_to_raw
from lean_explore_tpu.models import DeclarationStore
from tests.conftest import make_declaration


class FakeEmbedder:
    def __init__(self, dim=4):
        self.dim = dim
        self.calls = []

    def embed_sync(self, texts, is_query=False):
        self.calls.append(list(texts))
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            out[i, 0] = float(len(t))
        return out


class TestGenerateEmbeddings:
    def _store(self):
        store = DeclarationStore(":memory:", create=True)
        store.insert_many(
            [
                make_declaration("A", informalization="**A.** short"),
                make_declaration("B", informalization="**B.** a bit longer text"),
                make_declaration("NoInf", informalization=None),
                make_declaration(
                    "Has", informalization="**Has.** x", embedding=[1.0, 0, 0, 0]
                ),
            ]
        )
        return store

    def test_incremental(self):
        store = self._store()
        client = FakeEmbedder()
        n = emb.generate_embeddings(store, client=client, use_cache=False)
        assert n == 2  # A and B only
        assert store.get_by_name("A", with_embedding=True).informalization_embedding is not None
        assert store.get_by_name("NoInf", with_embedding=True).informalization_embedding is None
        # rerun: nothing left
        assert emb.generate_embeddings(store, client=client, use_cache=False) == 0

    def test_cache_reuse(self, tmp_path, monkeypatch):
        prior = DeclarationStore(tmp_path / "declarations.db", create=True)
        prior.insert_many(
            [
                make_declaration(
                    "Old",
                    informalization="**A.** short",
                    embedding=[9.0, 9.0, 9.0, 9.0],
                )
            ]
        )
        prior.close()
        from lean_explore_tpu.extract import informalize as inf

        monkeypatch.setattr(
            inf, "discover_database_files", lambda: [tmp_path / "declarations.db"]
        )
        store = self._store()
        client = FakeEmbedder()
        n = emb.generate_embeddings(store, client=client)
        assert n == 2
        # "A" has the same informalization text as "Old" -> cached bytes
        assert store.get_by_name("A", with_embedding=True).informalization_embedding == [9.0, 9.0, 9.0, 9.0]
        assert client.calls == [["**B.** a bit longer text"]]

    def test_batching(self):
        store = DeclarationStore(":memory:", create=True)
        store.insert_many(
            [
                make_declaration(f"D{i}", informalization=f"**D{i}.** t")
                for i in range(7)
            ]
        )
        client = FakeEmbedder()
        n = emb.generate_embeddings(
            store, client=client, use_cache=False, batch_size=3
        )
        assert n == 7
        assert [len(c) for c in client.calls] == [3, 3, 1]


class TestPackages:
    def test_extraction_order_dependencies_first(self):
        order = pkgs.get_extraction_order()
        assert order.index("mathlib") < order.index("physlean")
        assert order.index("mathlib") < order.index("flt")
        assert set(order) == set(pkgs.PACKAGE_REGISTRY)

    def test_module_ownership(self):
        assert pkgs.get_package_for_module("Mathlib.Data.List") == "mathlib"
        assert pkgs.get_package_for_module("Lean.Meta") == "mathlib"
        assert pkgs.get_package_for_module("LeanSearchClient.X") is None
        assert pkgs.get_package_for_module("FLT.Basic") == "flt"

    def test_prefix_boundary(self):
        config = pkgs.PACKAGE_REGISTRY["mathlib"]
        assert config.should_include_module("Lean")
        assert config.should_include_module("Lean.Elab")
        assert not config.should_include_module("LeanExtras.X")

    def test_lakefile_pinning(self, tmp_path):
        lakefile = tmp_path / "lakefile.lean"
        lakefile.write_text(
            'require «doc-gen4» from git\n'
            '  "https://github.com/leanprover/doc-gen4" @ "v4.1.0"\n'
            'require mathlib from git "x"\n'
        )
        pkgs.update_lakefile_docgen_version(lakefile, "v4.24.0")
        assert '@ "v4.24.0"' in lakefile.read_text()
        assert "v4.1.0" not in lakefile.read_text()

    def test_lakefile_pinning_without_version(self, tmp_path):
        lakefile = tmp_path / "lakefile.lean"
        lakefile.write_text(
            'require «doc-gen4» from git\n  "https://github.com/leanprover/doc-gen4"\n'
        )
        pkgs.update_lakefile_docgen_version(lakefile, "v4.24.0")
        assert '@ "v4.24.0"' in lakefile.read_text()


class TestGithubHelpers:
    def test_url_to_raw(self):
        assert github_url_to_raw(
            "https://github.com/owner/repo", "main", "lean-toolchain"
        ) == "https://raw.githubusercontent.com/owner/repo/main/lean-toolchain"
        assert github_url_to_raw(
            "https://github.com/owner/repo.git", "v1", "f"
        ).endswith("/owner/repo/v1/f")

    def test_bad_url(self):
        with pytest.raises(ValueError):
            github_url_to_raw("https://gitlab.com/x/y", "main", "f")

    def test_extract_lean_version(self):
        assert extract_lean_version("leanprover/lean4:v4.27.0") == "v4.27.0"
        assert extract_lean_version("leanprover/lean4:v4.28.0-rc1") == "v4.28.0-rc1"
        with pytest.raises(ValueError):
            extract_lean_version("nightly")


class TestDocGen4Logic:
    def test_sqlite_cutover(self):
        assert not uses_sqlite_docgen("leanprover/lean4:v4.28.0")
        assert not uses_sqlite_docgen("leanprover/lean4:v4.29.0-rc1")
        assert uses_sqlite_docgen("leanprover/lean4:v4.29.0-rc2")
        assert uses_sqlite_docgen("leanprover/lean4:v4.29.0")
        assert uses_sqlite_docgen("leanprover/lean4:v4.30.0")
        assert not uses_sqlite_docgen("leanprover/lean4:v4.9.1")

    def test_library_names(self):
        assert library_names("mathlib") == ["MathExtract"]
        assert library_names("formal-conjectures") == [
            "FormalConjectures",
            "FormalConjecturesForMathlib",
        ]
        assert library_names("newpkg") == ["NewpkgExtract"]


class TestPipelineCli:
    def test_index_stage_on_existing_extraction(self, tmp_path, monkeypatch):
        from lean_explore_tpu import config as config_mod
        from lean_explore_tpu.extract.__main__ import main

        # Point the config at a temp data root with one extraction dir.
        extraction = tmp_path / "20260101_000000"
        extraction.mkdir(parents=True)
        store = DeclarationStore(extraction / "declarations.db", create=True)
        store.insert_many(
            [
                make_declaration(
                    "A", informalization="**A.** x", embedding=[0.1, 0.2]
                )
            ]
        )
        store.close()
        monkeypatch.setattr(config_mod.Config, "DATA_DIRECTORY", tmp_path)

        runner = CliRunner()
        result = runner.invoke(main, ["--index", "--use-latest"])
        assert result.exit_code == 0, result.output
        assert (extraction / "manifest.json").exists()
        assert (extraction / "dense_embeddings.npy").exists()
        manifest = json.loads((extraction / "manifest.json").read_text())
        assert manifest["n_embedded"] == 1

    def test_use_latest_without_extraction_fails(self, tmp_path, monkeypatch):
        from lean_explore_tpu import config as config_mod
        from lean_explore_tpu.extract.__main__ import main

        monkeypatch.setattr(config_mod.Config, "DATA_DIRECTORY", tmp_path / "none")
        runner = CliRunner()
        result = runner.invoke(main, ["--index", "--use-latest"])
        assert result.exit_code == 1
