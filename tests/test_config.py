"""Config resolution tests (version chain, extraction discovery, mesh parse)."""

from lean_explore_tpu import config as config_mod
from lean_explore_tpu.config import (
    Config,
    is_complete_index,
    timestamped_directories,
)


class TestExtractionDiscovery:
    def test_timestamped_sorted_desc(self, tmp_path):
        for name in ["20250101_000000", "20260101_000000", "not_a_timestamp"]:
            (tmp_path / name).mkdir()
        dirs = timestamped_directories(tmp_path)
        assert [d.name for d in dirs] == ["20260101_000000", "20250101_000000"]

    def test_missing_root(self, tmp_path):
        assert timestamped_directories(tmp_path / "nope") == []

    def test_completeness_check(self, tmp_path):
        assert not is_complete_index(tmp_path)
        for name in config_mod.REQUIRED_INDEX_FILES:
            (tmp_path / name).write_text("")
        assert is_complete_index(tmp_path)

    def test_resolve_prefers_direct_db(self, tmp_path):
        (tmp_path / "declarations.db").write_text("")
        assert config_mod._resolve_active_data_path(tmp_path, "v1") == tmp_path

    def test_resolve_skips_incomplete_extractions(self, tmp_path):
        incomplete = tmp_path / "20260102_000000"
        incomplete.mkdir()
        complete = tmp_path / "20260101_000000"
        complete.mkdir()
        for name in config_mod.REQUIRED_INDEX_FILES:
            (complete / name).write_text("")
        resolved = config_mod._resolve_active_data_path(tmp_path, "v1")
        assert resolved == complete  # newer-but-incomplete is skipped

    def test_resolve_fallback_version(self, tmp_path):
        resolved = config_mod._resolve_active_data_path(tmp_path, "v9")
        assert resolved == tmp_path / "v9"


class TestVersionResolution:
    def test_env_wins(self, monkeypatch):
        monkeypatch.setenv("LEAN_EXPLORE_VERSION", "env-version")
        assert config_mod._active_version() == "env-version"

    def test_default_without_env_or_file(self, monkeypatch, tmp_path):
        monkeypatch.delenv("LEAN_EXPLORE_VERSION", raising=False)
        monkeypatch.setattr(
            config_mod.pathlib.Path, "home", staticmethod(lambda: tmp_path)
        )
        assert config_mod._active_version() == "v0.1.0"

    def test_marker_file(self, monkeypatch, tmp_path):
        monkeypatch.delenv("LEAN_EXPLORE_VERSION", raising=False)
        marker_dir = tmp_path / ".lean_explore_tpu"
        marker_dir.mkdir()
        (marker_dir / "active_version").write_text("20260101_000000\n")
        monkeypatch.setattr(
            config_mod.pathlib.Path, "home", staticmethod(lambda: tmp_path)
        )
        assert config_mod._active_version() == "20260101_000000"


class TestMeshShape:
    def test_empty(self, monkeypatch):
        monkeypatch.setattr(Config, "MESH_SHAPE", "")
        assert Config.mesh_shape() is None

    def test_pair(self, monkeypatch):
        monkeypatch.setattr(Config, "MESH_SHAPE", "2,4")
        assert Config.mesh_shape() == (2, 4)

    def test_single(self, monkeypatch):
        monkeypatch.setattr(Config, "MESH_SHAPE", "8")
        assert Config.mesh_shape() == (1, 8)
