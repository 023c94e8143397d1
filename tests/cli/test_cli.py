"""CLI tests: search (remote mocked + local), mcp serve spawn, data commands."""

import json
from pathlib import Path

import pytest
from click.testing import CliRunner

from lean_explore_tpu.cli.data_commands import data_group
from lean_explore_tpu.cli.main import cli
from lean_explore_tpu.models import SearchResponse, SearchResult


def _result():
    return SearchResult(
        id=3,
        name="Nat.add",
        module="Init.Nat",
        docstring="adds naturals",
        source_text="def Nat.add := fun a b => a + b",
        source_link="https://github.com/x",
        dependencies=None,
        informalization="**Addition.** The sum of naturals.",
    )


class TestSearchCommand:
    def test_remote_search_renders(self, monkeypatch):
        class FakeApi:
            def __init__(self, **kwargs):
                pass

            async def search(self, query, limit, packages=None, **kw):
                return SearchResponse(
                    query=query, results=[_result()], count=1, processing_time_ms=5
                )

        import lean_explore_tpu.api as api_mod

        monkeypatch.setattr(api_mod, "ApiClient", FakeApi)
        result = CliRunner().invoke(cli, ["search", "nat add", "-n", "3"])
        assert result.exit_code == 0, result.output
        assert "Nat.add" in result.output
        assert "Addition." in result.output
        assert "Init.Nat" in result.output

    def test_remote_search_without_key_fails(self, monkeypatch):
        monkeypatch.delenv("LEANEXPLORE_API_KEY", raising=False)
        result = CliRunner().invoke(cli, ["search", "query"])
        assert result.exit_code == 1

    def test_local_search(self, tmp_path, monkeypatch):
        from lean_explore_tpu.index import build_index_artifacts
        from lean_explore_tpu.models import DeclarationStore
        from tests.conftest import make_declaration

        store = DeclarationStore(tmp_path / "declarations.db", create=True)
        store.insert_many([make_declaration("Nat.add", "Init.Nat")])
        build_index_artifacts(store, tmp_path)
        store.close()

        result = CliRunner().invoke(
            cli,
            [
                "search",
                "Nat.add",
                "--local",
                "--data-dir",
                str(tmp_path),
                "--rerank-top",
                "0",
            ],
        )
        assert result.exit_code == 0, result.output
        assert "Nat.add" in result.output

    def test_local_search_missing_data(self, tmp_path):
        result = CliRunner().invoke(
            cli, ["search", "q", "--local", "--data-dir", str(tmp_path / "none")]
        )
        assert result.exit_code == 1


class TestMcpServe:
    def test_spawns_subprocess(self, monkeypatch):
        calls = {}

        def fake_run(command, check):
            calls["command"] = command

            class R:
                returncode = 0

            return R()

        monkeypatch.setattr("subprocess.run", fake_run)
        result = CliRunner().invoke(
            cli, ["mcp", "serve", "--backend", "local", "--data-dir", "/tmp/x"]
        )
        assert result.exit_code == 0, result.output
        assert "-m" in calls["command"]
        assert "lean_explore_tpu.mcp.server" in calls["command"]
        assert "--data-dir" in calls["command"]

    def test_api_backend_needs_key(self, monkeypatch):
        monkeypatch.delenv("LEANEXPLORE_API_KEY", raising=False)
        result = CliRunner().invoke(cli, ["mcp", "serve", "--backend", "api"])
        assert result.exit_code == 1

    def test_propagates_exit_code(self, monkeypatch):
        def fake_run(command, check):
            class R:
                returncode = 3

            return R()

        monkeypatch.setattr("subprocess.run", fake_run)
        result = CliRunner().invoke(
            cli, ["mcp", "serve", "--backend", "local"]
        )
        assert result.exit_code == 3


class TestApiServe:
    def test_forwards_flags_to_server_main(self, monkeypatch):
        calls = {}
        import lean_explore_tpu.api.server as server_mod

        monkeypatch.setattr(
            server_mod, "main", lambda argv: calls.setdefault("argv", argv)
        )
        result = CliRunner().invoke(
            cli,
            [
                "api",
                "serve",
                "--data-dir",
                "/tmp/arts",
                "--port",
                "9000",
                "--api-key",
                "k",
                "--warmup",
                "--warmup-batch",
                "16",
            ],
        )
        assert result.exit_code == 0, result.output
        argv = calls["argv"]
        assert argv[argv.index("--port") + 1] == "9000"
        assert argv[argv.index("--data-dir") + 1] == "/tmp/arts"
        assert argv[argv.index("--api-key") + 1] == "k"
        assert "--warmup" in argv
        assert argv[argv.index("--warmup-batch") + 1] == "16"


class TestDataCommands:
    def test_fetch_downloads_all_artifacts(self, tmp_path, monkeypatch):
        from lean_explore_tpu import config as config_mod
        from lean_explore_tpu.cli import data_commands as dc

        cache = tmp_path / "cache"
        monkeypatch.setattr(config_mod.Config, "CACHE_DIRECTORY", cache)

        downloaded = []

        def fake_get(url, timeout=None, stream=False):
            class R:
                headers = {"content-length": "4"}
                text = "20260101_000000"

                def raise_for_status(self):
                    pass

                def iter_content(self, chunk_size):
                    yield b"data"

            downloaded.append(url)
            return R()

        monkeypatch.setattr(dc.requests, "get", fake_get)
        result = CliRunner().invoke(data_group, ["fetch"])
        assert result.exit_code == 0, result.output
        # latest.txt + 7 artifacts
        assert any("latest.txt" in u for u in downloaded)
        assert sum("20260101_000000" in u for u in downloaded) == 7
        version_dir = cache / "20260101_000000"
        assert (version_dir / "manifest.json").exists()
        assert (cache.parent / "active_version").read_text() == "20260101_000000"

    def test_fetch_prunes_old_versions(self, tmp_path, monkeypatch):
        from lean_explore_tpu import config as config_mod
        from lean_explore_tpu.cli import data_commands as dc

        cache = tmp_path / "cache"
        (cache / "old_version").mkdir(parents=True)
        monkeypatch.setattr(config_mod.Config, "CACHE_DIRECTORY", cache)
        monkeypatch.setattr(dc, "fetch_latest_version", lambda base=None: "v2")
        monkeypatch.setattr(
            dc, "download_file", lambda url, dest, progress: dest.parent.mkdir(
                parents=True, exist_ok=True
            ) or dest.write_bytes(b"x")
        )
        result = CliRunner().invoke(data_group, ["fetch"])
        assert result.exit_code == 0, result.output
        assert not (cache / "old_version").exists()
        assert (cache / "v2").exists()

    def test_clean(self, tmp_path, monkeypatch):
        from lean_explore_tpu import config as config_mod

        cache = tmp_path / "cache"
        (cache / "v1").mkdir(parents=True)
        (tmp_path / "active_version").write_text("v1")
        monkeypatch.setattr(config_mod.Config, "CACHE_DIRECTORY", cache)
        result = CliRunner().invoke(data_group, ["clean"], input="y\n")
        assert result.exit_code == 0, result.output
        assert not cache.exists()
        assert not (tmp_path / "active_version").exists()

    def test_clean_nothing(self, tmp_path, monkeypatch):
        from lean_explore_tpu import config as config_mod

        monkeypatch.setattr(
            config_mod.Config, "CACHE_DIRECTORY", tmp_path / "nope" / "cache"
        )
        result = CliRunner().invoke(data_group, ["clean"], input="y\n")
        assert result.exit_code == 0
        assert "No local data" in result.output


def make_reference_db(path):
    import sqlite3
    import struct

    conn = sqlite3.connect(str(path))
    conn.executescript(
        """
        CREATE TABLE declarations (
            id INTEGER NOT NULL PRIMARY KEY,
            name TEXT NOT NULL UNIQUE,
            module TEXT NOT NULL,
            docstring TEXT,
            source_text TEXT NOT NULL,
            source_link TEXT NOT NULL,
            dependencies TEXT,
            informalization TEXT,
            informalization_embedding BLOB
        );
        """
    )
    rng = __import__("numpy").random.default_rng(0)
    for i in range(1, 13):
        vec = rng.standard_normal(16).astype("float32")
        vec /= (vec**2).sum() ** 0.5
        blob = struct.pack(f"{len(vec)}f", *vec)
        conn.execute(
            "INSERT INTO declarations VALUES (?,?,?,?,?,?,?,?,?)",
            (
                i,
                f"Ref.decl{i}",
                f"Ref.Mod{i % 3}",
                f"doc {i}",
                f"def decl{i} := {i}",
                f"https://x/{i}",
                json.dumps([f"Ref.decl{(i % 12) + 1}"]),
                f"**Decl {i}.** reference declaration {i}",
                blob if i <= 10 else None,
            ),
        )
    conn.commit()
    conn.close()


class TestDataConvert:
    """`lean-explore data convert`: a REFERENCE-format lean_explore.db
    (built here with raw SQL + struct-packed float32 blobs, exactly the
    reference's BinaryEmbedding encoding, search_db.py:24-35) becomes a
    servable artifact set."""

    def _make_reference_db(self, path):
        make_reference_db(path)
    def test_convert_and_serve(self, tmp_path):
        import asyncio

        import numpy as np

        from lean_explore_tpu.index import load_index_artifacts
        from lean_explore_tpu.models import DeclarationStore
        from lean_explore_tpu.search.engine import SearchEngine
        from lean_explore_tpu.util.embedding_client import EmbeddingResponse

        ref_dir = tmp_path / "refdata"
        ref_dir.mkdir()
        self._make_reference_db(ref_dir / "lean_explore.db")
        out = tmp_path / "converted"

        result = CliRunner().invoke(
            cli, ["data", "convert", str(ref_dir), "--output", str(out)]
        )
        assert result.exit_code == 0, result.output
        assert "Converted 12 declarations (10 embedded)" in result.output

        class Embedder:
            async def embed(self, texts, is_query=False):
                rng = np.random.default_rng(1)
                v = rng.standard_normal((len(texts), 16)).astype(np.float32)
                v /= np.linalg.norm(v, axis=1, keepdims=True)
                return EmbeddingResponse(
                    texts=list(texts), embeddings=v.tolist(), model="t"
                )

        engine = SearchEngine(
            out,
            store=DeclarationStore(out / "declarations.db"),
            artifacts=load_index_artifacts(out, mesh=False),
            embedding_client=Embedder(),
        )
        results = asyncio.run(
            engine.search("reference declaration 7", rerank_top=0, limit=5)
        )
        assert results and results[0].name.startswith("Ref.decl")

    def test_convert_direct_db_path(self, tmp_path):
        db = tmp_path / "lean_explore.db"
        self._make_reference_db(db)
        out = tmp_path / "arts"
        result = CliRunner().invoke(
            cli, ["data", "convert", str(db), "--output", str(out)]
        )
        assert result.exit_code == 0, result.output
        assert (out / "manifest.json").exists()

    def test_convert_missing_db_fails(self, tmp_path):
        empty = tmp_path / "nothing"
        empty.mkdir()
        result = CliRunner().invoke(cli, ["data", "convert", str(empty)])
        assert result.exit_code != 0


class TestDataFetchHelpers:
    def test_fetch_latest_version_strips_whitespace(self, monkeypatch):
        from lean_explore_tpu.cli import data_commands as dc

        class Resp:
            text = "  20260101_000000\n"

            def raise_for_status(self):
                pass

        monkeypatch.setattr(dc.requests, "get", lambda url, timeout: Resp())
        assert dc.fetch_latest_version("https://b") == "20260101_000000"

    def test_fetch_latest_version_network_error(self, monkeypatch):
        import requests as req

        from lean_explore_tpu.cli import data_commands as dc

        def boom(url, timeout):
            raise req.exceptions.ConnectionError("down")

        monkeypatch.setattr(dc.requests, "get", boom)
        with pytest.raises(ValueError, match="Failed to fetch"):
            dc.fetch_latest_version("https://b")

    def test_write_active_version_roundtrip(self, tmp_path, monkeypatch):
        from lean_explore_tpu.cli import data_commands as dc
        from lean_explore_tpu.config import Config

        monkeypatch.setattr(Config, "CACHE_DIRECTORY", tmp_path / "cache")
        dc.write_active_version("v1")
        dc.write_active_version("v2")  # overwrite
        assert (tmp_path / "active_version").read_text() == "v2"

    def test_cleanup_removes_only_other_versions(self, tmp_path, monkeypatch):
        from lean_explore_tpu.cli import data_commands as dc
        from lean_explore_tpu.config import Config

        cache = tmp_path / "cache"
        for v in ("v1", "v2", "keep"):
            (cache / v).mkdir(parents=True)
        monkeypatch.setattr(Config, "CACHE_DIRECTORY", cache)
        dc.cleanup_old_versions("keep")
        assert sorted(p.name for p in cache.iterdir()) == ["keep"]

    def test_cleanup_handles_missing_cache(self, tmp_path, monkeypatch):
        from lean_explore_tpu.cli import data_commands as dc
        from lean_explore_tpu.config import Config

        monkeypatch.setattr(Config, "CACHE_DIRECTORY", tmp_path / "absent")
        dc.cleanup_old_versions("x")  # must not raise

    def test_install_downloads_all_files_and_activates(
        self, tmp_path, monkeypatch
    ):
        from lean_explore_tpu.cli import data_commands as dc
        from lean_explore_tpu.config import REQUIRED_INDEX_FILES, Config

        monkeypatch.setattr(Config, "CACHE_DIRECTORY", tmp_path / "cache")
        downloaded = []

        def fake_download(url, destination, progress):
            downloaded.append(url.rsplit("/", 1)[-1])
            destination.parent.mkdir(parents=True, exist_ok=True)
            destination.write_bytes(b"x")

        monkeypatch.setattr(dc, "download_file", fake_download)
        version = dc.install_toolchain("v9", base_url="https://b")
        assert version == "v9"
        assert sorted(downloaded) == sorted(REQUIRED_INDEX_FILES)
        assert (tmp_path / "active_version").read_text() == "v9"

    def test_install_fetches_latest_when_unversioned(self, tmp_path, monkeypatch):
        from lean_explore_tpu.cli import data_commands as dc
        from lean_explore_tpu.config import Config

        monkeypatch.setattr(Config, "CACHE_DIRECTORY", tmp_path / "cache")
        monkeypatch.setattr(dc, "fetch_latest_version", lambda b: "vLATEST")
        monkeypatch.setattr(
            dc, "download_file",
            lambda url, d, p: (d.parent.mkdir(parents=True, exist_ok=True),
                               d.write_bytes(b"x")),
        )
        assert dc.install_toolchain(None, base_url="https://b") == "vLATEST"


class TestDataCommandsCli:
    def test_fetch_command_invokes_install(self, monkeypatch):
        from lean_explore_tpu.cli import data_commands as dc

        calls = []
        monkeypatch.setattr(
            dc, "install_toolchain", lambda v: calls.append(v) or "v1"
        )
        result = CliRunner().invoke(cli, ["data", "fetch", "-v", "20260101"])
        assert result.exit_code == 0 and calls == ["20260101"]

    def test_fetch_command_error_message(self, monkeypatch):
        from lean_explore_tpu.cli import data_commands as dc

        def boom(v):
            raise ValueError("no such version")

        monkeypatch.setattr(dc, "install_toolchain", boom)
        result = CliRunner().invoke(cli, ["data", "fetch"])
        assert result.exit_code != 0 and "no such version" in result.output

    def test_clean_aborted_keeps_data(self, tmp_path, monkeypatch):
        from lean_explore_tpu.config import Config

        cache = tmp_path / "cache"
        cache.mkdir()
        monkeypatch.setattr(Config, "CACHE_DIRECTORY", cache)
        result = CliRunner().invoke(cli, ["data", "clean"], input="n\n")
        assert result.exit_code == 1  # click confirmation abort
        assert cache.exists()

    def test_clean_confirmed_removes_cache_and_marker(
        self, tmp_path, monkeypatch
    ):
        from lean_explore_tpu.config import Config

        cache = tmp_path / "cache"
        (cache / "v1").mkdir(parents=True)
        marker = tmp_path / "active_version"
        marker.write_text("v1")
        monkeypatch.setattr(Config, "CACHE_DIRECTORY", cache)
        result = CliRunner().invoke(cli, ["data", "clean"], input="y\n")
        assert result.exit_code == 0
        assert not cache.exists() and not marker.exists()

    def test_clean_no_data_message(self, tmp_path, monkeypatch):
        from lean_explore_tpu.config import Config

        monkeypatch.setattr(Config, "CACHE_DIRECTORY", tmp_path / "none")
        result = CliRunner().invoke(cli, ["data", "clean"], input="y\n")
        assert result.exit_code == 0 and "No local data" in result.output

    def test_help_surfaces(self):
        for args in ([], ["search", "--help"], ["mcp", "--help"],
                     ["data", "--help"], ["data", "fetch", "--help"],
                     ["data", "convert", "--help"]):
            result = CliRunner().invoke(cli, args or ["--help"])
            assert result.exit_code == 0


class TestFetchConvertServeE2E:
    """The migration story end-to-end with real bytes.

    (a) `data fetch` against a mocked transport serving a REAL artifact set
        -> the installed tree is directly servable.
    (b) `data convert` pointed at a reference-faithful cache tree — the full
        file layout the reference's fetch installs (lean_explore.db, FAISS
        index + ids map, bm25s dirs with their 6-file sets; reference
        cli/data_commands.py:42-59) — ignores the foreign index files and
        produces a servable artifact set.
    """

    def _build_source_artifacts(self, path):
        import numpy as np

        from lean_explore_tpu.index import build_index_artifacts
        from lean_explore_tpu.models import Declaration, DeclarationStore

        path.mkdir(parents=True)
        store = DeclarationStore(path / "declarations.db", create=True)
        rng = np.random.default_rng(4)
        decls = []
        for i in range(20):
            v = rng.standard_normal(16).astype(np.float32)
            v /= np.linalg.norm(v)
            decls.append(
                Declaration(
                    name=f"Srv.decl{i}",
                    module=f"Srv.Mod{i % 2}",
                    source_text=f"def decl{i} := {i}",
                    source_link=f"https://x/{i}",
                    informalization=f"**Decl {i}.** served declaration {i}",
                    informalization_embedding=v.tolist(),
                )
            )
        store.insert_many(decls)
        build_index_artifacts(store, path)
        store.close()
        return path

    def _serve_one(self, artifact_dir, query):
        import asyncio

        import numpy as np

        from lean_explore_tpu.index import load_index_artifacts
        from lean_explore_tpu.models import DeclarationStore
        from lean_explore_tpu.search.engine import SearchEngine
        from lean_explore_tpu.util.embedding_client import EmbeddingResponse

        class Embedder:
            async def embed(self, texts, is_query=False):
                rng = np.random.default_rng(1)
                v = rng.standard_normal((len(texts), 16)).astype(np.float32)
                v /= np.linalg.norm(v, axis=1, keepdims=True)
                return EmbeddingResponse(
                    texts=list(texts), embeddings=v.tolist(), model="t"
                )

        store = DeclarationStore(artifact_dir / "declarations.db")
        engine = SearchEngine(
            artifact_dir,
            store=store,
            artifacts=load_index_artifacts(artifact_dir, mesh=False),
            embedding_client=Embedder(),
        )
        results = asyncio.run(engine.search(query, rerank_top=0, limit=5))
        store.close()
        return results

    def test_fetch_real_bytes_then_serve(self, tmp_path, monkeypatch):
        from lean_explore_tpu import config as config_mod
        from lean_explore_tpu.cli import data_commands as dc
        from lean_explore_tpu.config import REQUIRED_INDEX_FILES

        source = self._build_source_artifacts(tmp_path / "published")
        cache = tmp_path / "cache"
        monkeypatch.setattr(config_mod.Config, "CACHE_DIRECTORY", cache)

        def fake_get(url, timeout=None, stream=False):
            class R:
                def __init__(self, body):
                    self.body = body
                    self.headers = {"content-length": str(len(body))}
                    self.text = body.decode() if b"\x00" not in body else ""

                def raise_for_status(self):
                    pass

                def iter_content(self, chunk_size):
                    for i in range(0, len(self.body), chunk_size):
                        yield self.body[i : i + chunk_size]

            if url.endswith("latest.txt"):
                return R(b"20260301_000000")
            name = url.rsplit("/", 1)[1]
            assert name in REQUIRED_INDEX_FILES, url
            return R((source / name).read_bytes())

        monkeypatch.setattr(dc.requests, "get", fake_get)
        result = CliRunner().invoke(data_group, ["fetch"])
        assert result.exit_code == 0, result.output

        installed = cache / "20260301_000000"
        results = self._serve_one(installed, "served declaration 7")
        assert results and results[0].name.startswith("Srv.decl")

    def test_reference_faithful_cache_tree_convert_serve(self, tmp_path):
        import numpy as np

        # Reference cache layout (cli/data_commands.py:42-59): the database,
        # the FAISS index + ids map, the shared bm25 ids map, and two bm25s
        # directories of 6 files each.
        ref_cache = tmp_path / "ref_cache" / "20250101_000000"
        ref_cache.mkdir(parents=True)
        make_reference_db(ref_cache / "lean_explore.db")
        (ref_cache / "informalization_faiss.index").write_bytes(
            b"IVF-FLAT-OPAQUE-BYTES" * 10
        )
        (ref_cache / "informalization_faiss_ids_map.json").write_text(
            json.dumps(list(range(1, 13)))
        )
        (ref_cache / "bm25_ids_map.json").write_text(
            json.dumps(list(range(1, 13)))
        )
        for bm25_dir in ("bm25_name_spaced", "bm25_name_raw"):
            d = ref_cache / bm25_dir
            d.mkdir()
            for array_name in ("data", "indices", "indptr"):
                np.save(d / f"{array_name}.csc.index.npy", np.zeros(3))
            np.save(d / "nonoccurrence_array.index.npy", np.zeros(3))
            (d / "params.index.json").write_text(
                json.dumps({"method": "bm25+", "k1": 1.5, "b": 0.75})
            )
            (d / "vocab.index.json").write_text(json.dumps({"nat": 0}))

        out = tmp_path / "converted"
        result = CliRunner().invoke(
            data_group, ["convert", str(ref_cache), "--output", str(out)]
        )
        assert result.exit_code == 0, result.output
        assert "Converted 12 declarations (10 embedded)" in result.output

        results = self._serve_one(out, "reference declaration 3")
        assert results and results[0].name.startswith("Ref.decl")
