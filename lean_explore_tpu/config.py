"""Centralized configuration: paths, env vars, artifact manifest, URLs.

Functional replacement for the reference's config layer
(/root/reference/src/lean_explore/config.py:108-267), with the same
environment variables so existing deployments can switch over unchanged,
plus TPU-specific knobs (mesh shape, corpus dtype, serving batch size).

The on-disk artifact set differs from the reference (FAISS/bm25s files are
replaced by packed-array TPU index artifacts, see index/artifacts.py):

    declarations.db            sqlite3 document store (id -> metadata)
    dense_embeddings.npy       L2-normalized corpus embeddings [N, D]
    dense_ids.npy              row -> declaration id map
    bm25_name_spaced.npz       CSR postings + params (spaced tokenizer)
    bm25_name_raw.npz          CSR postings + params (raw tokenizer)
    bm25_ids.npy               shared BM25 row -> declaration id map
    manifest.json              version, counts, dims, dtypes
"""

import os
import pathlib
import re

_TIMESTAMP_RE = re.compile(r"^\d{8}_\d{6}$")

REQUIRED_INDEX_FILES = [
    "declarations.db",
    "dense_embeddings.npy",
    "dense_ids.npy",
    "bm25_name_spaced.npz",
    "bm25_name_raw.npz",
    "bm25_ids.npy",
    "manifest.json",
]


def _active_version() -> str:
    """Resolve the active data version: env > active_version file > default.

    Mirrors reference config.py:11-30.
    """
    env_version = os.getenv("LEAN_EXPLORE_VERSION")
    if env_version:
        return env_version
    # Same derivation as CACHE_DIRECTORY below (this runs before the Config
    # class exists): the marker lives next to the cache dir, so a custom
    # LEAN_EXPLORE_CACHE_DIR reads the marker `data fetch` actually wrote
    # instead of silently falling back to the home-dir default.
    cache_dir = pathlib.Path(
        os.getenv(
            "LEAN_EXPLORE_CACHE_DIR",
            pathlib.Path.home() / ".lean_explore_tpu" / "cache",
        )
    )
    marker = cache_dir.parent / "active_version"
    if marker.exists():
        return marker.read_text().strip()
    return "v0.1.0"


def _data_directory() -> pathlib.Path:
    return pathlib.Path(
        os.getenv(
            "LEAN_EXPLORE_DATA_DIR",
            pathlib.Path(__file__).resolve().parent.parent / "data",
        )
    )


def timestamped_directories(data_directory: pathlib.Path) -> list[pathlib.Path]:
    """All YYYYMMDD_HHMMSS extraction dirs under data_directory, newest first."""
    if not data_directory.exists():
        return []
    dirs = [
        d
        for d in data_directory.iterdir()
        if d.is_dir() and _TIMESTAMP_RE.match(d.name)
    ]
    return sorted(dirs, key=lambda d: d.name, reverse=True)


def is_complete_index(directory: pathlib.Path) -> bool:
    """True when a directory holds every required index artifact."""
    return all((directory / name).exists() for name in REQUIRED_INDEX_FILES)


def _resolve_active_data_path(
    data_directory: pathlib.Path, version: str
) -> pathlib.Path:
    """Pick the serving data dir: direct > newest complete extraction > versioned.

    Same resolution chain as the reference (config.py:84-105); incomplete
    extraction dirs (crashed pipeline runs) are skipped.
    """
    if (data_directory / "declarations.db").exists():
        return data_directory
    for d in timestamped_directories(data_directory):
        if is_complete_index(d):
            return d
    return data_directory / version


class Config:
    """Application-wide settings, resolved once at import from the environment."""

    CACHE_DIRECTORY: pathlib.Path = pathlib.Path(
        os.getenv(
            "LEAN_EXPLORE_CACHE_DIR",
            pathlib.Path.home() / ".lean_explore_tpu" / "cache",
        )
    )
    """Downloaded-artifact cache (serving + MCP). Env: LEAN_EXPLORE_CACHE_DIR."""

    DATA_DIRECTORY: pathlib.Path = _data_directory()
    """Extraction pipeline output root. Env: LEAN_EXPLORE_DATA_DIR."""

    ACTIVE_VERSION: str = _active_version()
    """Active data version (env > ~/.lean_explore_tpu/active_version > default)."""

    ACTIVE_CACHE_PATH: pathlib.Path = CACHE_DIRECTORY / ACTIVE_VERSION
    """Serving artifacts for the active version (downloaded data)."""

    ACTIVE_DATA_PATH: pathlib.Path = _resolve_active_data_path(
        DATA_DIRECTORY, ACTIVE_VERSION
    )
    """Serving artifacts for locally-extracted data."""

    DATABASE_PATH: pathlib.Path = ACTIVE_CACHE_PATH / "declarations.db"
    """sqlite3 document store in the cache directory."""

    EXTRACTION_DATABASE_PATH: pathlib.Path = ACTIVE_DATA_PATH / "declarations.db"
    """sqlite3 document store written by the extraction pipeline."""

    # ------------------------------------------------------------------
    # Models
    # ------------------------------------------------------------------

    EMBEDDING_MODEL_NAME: str = os.getenv(
        "LEAN_EXPLORE_EMBEDDING_MODEL", "Qwen/Qwen3-Embedding-0.6B"
    )
    """Embedding model id or local path (reference engine.py:57)."""

    RERANKER_MODEL_NAME: str = os.getenv(
        "LEAN_EXPLORE_RERANKER_MODEL", "Qwen/Qwen3-Reranker-0.6B"
    )
    """Reranker model id or local path (reference engine.py:59)."""

    EMBEDDING_MAX_LENGTH: int = int(
        os.getenv("LEAN_EXPLORE_EMBEDDING_MAX_LENGTH", "512")
    )
    """Token truncation length for the embedder (reference engine.py:135).
    Env-overridable: padded sequence length is the compile shape, so a
    deployment whose corpus fits 128 tokens saves 4x encode compute."""

    RERANKER_MAX_LENGTH: int = int(
        os.getenv("LEAN_EXPLORE_RERANKER_MAX_LENGTH", "256")
    )
    """Token truncation length for the reranker (reference engine.py:147).
    Env-overridable, same compile-shape reasoning as the embedder's."""

    EMBEDDING_DIM: int = 1024
    """Embedding dimensionality (reference models/search_db.py:76)."""

    EMBEDDING_BATCH_SIZE: int = int(
        os.getenv("LEAN_EXPLORE_EMBEDDING_BATCH_SIZE", "8")
    )
    """Query-path embed batch size (reference util/embedding_client.py:13)."""

    RERANKER_BATCH_SIZE: int = int(os.getenv("LEAN_EXPLORE_RERANKER_BATCH_SIZE", "64"))
    """Reranker batch size. TPU default is larger than the reference's CPU/CUDA
    defaults (reranker_client.py:14-15) because bucketed bf16 batches are cheap."""

    # ------------------------------------------------------------------
    # TPU execution
    # ------------------------------------------------------------------

    CORPUS_DTYPE: str = os.getenv("LEAN_EXPLORE_CORPUS_DTYPE", "bfloat16")
    """On-device dtype for corpus embeddings: bfloat16 halves HBM traffic on the
    retrieval matmul; float32 gives exact FAISS-flat score parity."""

    MESH_SHAPE: str = os.getenv("LEAN_EXPLORE_MESH_SHAPE", "")
    """Optional 'data,corpus' mesh shape, e.g. '1,8'. Empty = single device."""

    SERVE_QUERY_BATCH: int = int(os.getenv("LEAN_EXPLORE_SERVE_QUERY_BATCH", "128"))
    """Max queries fused into one device step (the DP axis, BASELINE config 3)."""

    TOPK_CHUNK: int = int(os.getenv("LEAN_EXPLORE_TOPK_CHUNK", "8192"))
    """Corpus rows scored per chunk in the exact chunked top-k scan."""

    PRELOAD_METADATA: bool = os.getenv("LEAN_EXPLORE_PRELOAD_METADATA", "") not in (
        "", "0", "false",
    )
    """Load the whole declaration metadata table into memory at engine
    startup (high-QPS serving: removes per-batch sqlite hydration and JSON
    parsing from the fusion stage at the cost of startup time + RAM)."""

    # ------------------------------------------------------------------
    # Extraction
    # ------------------------------------------------------------------

    PACKAGES_ROOT: pathlib.Path = pathlib.Path(
        os.getenv(
            "LEAN_EXPLORE_PACKAGES_ROOT",
            pathlib.Path(__file__).resolve().parent.parent / "lean",
        )
    )
    """Per-package Lean workspaces root. Env: LEAN_EXPLORE_PACKAGES_ROOT."""

    DEFAULT_LEAN_VERSION: str = "4.24.0"

    EXTRACT_PACKAGES: set[str] = {
        "batteries",
        "init",
        "lean4",
        "mathlib",
        "physlean",
        "std",
    }
    """Package names accepted from doc-gen4 output (reference config.py:248-255)."""

    # ------------------------------------------------------------------
    # Remote endpoints
    # ------------------------------------------------------------------

    R2_ASSETS_BASE_URL: str = os.getenv(
        "LEAN_EXPLORE_R2_BASE_URL",
        "https://pub-48b75babc4664808b15520033423c765.r2.dev",
    )
    """Artifact download base URL (reference config.py:258-264)."""

    API_BASE_URL: str = os.getenv(
        "LEAN_EXPLORE_API_BASE_URL", "https://www.leanexplore.com/api/v2"
    )
    """Remote search API base URL (reference config.py:266-267)."""

    @staticmethod
    def get_latest_extraction_path() -> pathlib.Path | None:
        """Newest timestamped extraction dir, or None."""
        dirs = timestamped_directories(Config.DATA_DIRECTORY)
        return dirs[0] if dirs else None

    @staticmethod
    def get_latest_database_path() -> pathlib.Path | None:
        """declarations.db inside the newest extraction dir, if present."""
        latest = Config.get_latest_extraction_path()
        if latest and (latest / "declarations.db").exists():
            return latest / "declarations.db"
        return None

    @staticmethod
    def create_timestamped_extraction_path() -> pathlib.Path:
        """Create and return a new YYYYMMDD_HHMMSS extraction directory."""
        from datetime import datetime

        path = Config.DATA_DIRECTORY / datetime.now().strftime("%Y%m%d_%H%M%S")
        path.mkdir(parents=True, exist_ok=True)
        return path

    @staticmethod
    def mesh_shape() -> tuple[int, int] | None:
        """Parse MESH_SHAPE into (data, corpus) axis sizes, or None."""
        if not Config.MESH_SHAPE:
            return None
        parts = [int(p) for p in Config.MESH_SHAPE.split(",")]
        if len(parts) == 1:
            return (1, parts[0])
        return (parts[0], parts[1])
