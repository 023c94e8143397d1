"""Index artifact set: build, save, load, validate.

One directory holds everything the serving path needs (the functional
replacement for the reference's 6-artifact contract, SURVEY.md §1):

    declarations.db          sqlite3 document store
    dense_embeddings.npy     normalized f32 [N_emb, D]   (FAISS replacement)
    dense_ids.npy            dense row -> declaration id
    bm25_name_spaced.npz     CSR BM25+ index over spaced name tokens
    bm25_name_raw.npz        CSR BM25+ index over whole-name tokens
    bm25_ids.npy             shared BM25 row -> declaration id
    manifest.json            schema/version/counts/dims

Mirrors the reference's build semantics (extract/index.py): the BM25
indices cover *every* declaration; the dense index covers only rows with
embeddings.
"""

import json
import logging
import time
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from lean_explore_tpu.config import REQUIRED_INDEX_FILES
from lean_explore_tpu.index import dense as dense_mod
from lean_explore_tpu.index.bm25 import Bm25Index, Bm25Params
from lean_explore_tpu.index.dense import DenseIndex
from lean_explore_tpu.models import DeclarationStore
from lean_explore_tpu.search.tokenization import tokenize_raw, tokenize_spaced

logger = logging.getLogger(__name__)

MANIFEST_SCHEMA = 1

BM25_SPACED_FILE = "bm25_name_spaced.npz"
BM25_RAW_FILE = "bm25_name_raw.npz"
BM25_IDS_FILE = "bm25_ids.npy"
MANIFEST_FILE = "manifest.json"


@dataclass
class IndexArtifacts:
    """In-memory handle to a loaded artifact set."""

    dense: "DenseIndex"  # or parallel.ShardedDenseIndex (same search surface)
    bm25_spaced: Bm25Index
    bm25_raw: Bm25Index
    bm25_ids: np.ndarray
    manifest: dict


def build_bm25_name_indices(
    names: list[str], params: Bm25Params | None = None
) -> tuple[Bm25Index, Bm25Index]:
    """Two BM25+ name indices with per-doc token dedup (reference
    extract/index.py:254-256)."""
    params = params or Bm25Params()
    corpus_spaced = [sorted(set(tokenize_spaced(n))) for n in names]
    corpus_raw = [sorted(set(tokenize_raw(n))) for n in names]
    return Bm25Index.build(corpus_spaced, params), Bm25Index.build(corpus_raw, params)


def build_index_artifacts(
    store: DeclarationStore,
    output_directory: str | Path,
    *,
    embedding_dim: int | None = None,
) -> dict:
    """Build every index artifact from a populated declaration store.

    The store's own db file must already live at (or be copied to)
    output_directory/declarations.db by the caller/pipeline.

    Returns:
        The manifest dict.
    """
    output_directory = Path(output_directory)
    output_directory.mkdir(parents=True, exist_ok=True)

    all_ids: list[int] = []
    all_names: list[str] = []
    emb_ids: list[int] = []
    emb_rows: list[np.ndarray] = []
    for decl in store.iter_all():
        all_ids.append(decl.id)
        all_names.append(decl.name or "")
        if decl.informalization_embedding is not None:
            emb_ids.append(decl.id)
            emb_rows.append(
                np.asarray(decl.informalization_embedding, dtype=np.float32)
            )

    logger.info(
        "Building index artifacts: %d declarations, %d embedded",
        len(all_ids),
        len(emb_ids),
    )

    bm25_spaced, bm25_raw = build_bm25_name_indices(all_names)
    bm25_spaced.save(output_directory / BM25_SPACED_FILE)
    bm25_raw.save(output_directory / BM25_RAW_FILE)
    np.save(output_directory / BM25_IDS_FILE, np.asarray(all_ids, dtype=np.int64))

    if emb_rows:
        matrix = np.stack(emb_rows)
        dim = matrix.shape[1]
    else:
        dim = embedding_dim or 0
        matrix = np.zeros((0, dim), dtype=np.float32)
    # Pure host-side write: normalizing and saving f32 bytes needs no
    # device round trip (DenseIndex.build would place the padded matrix in
    # HBM and copy it back just to hit disk — two wasted transfers and a
    # possible OOM on small-HBM hosts for an offline build step). The
    # serving dtype/padding is a LOAD-time choice.
    norms = np.linalg.norm(matrix, axis=1, keepdims=True)
    normalized = (matrix / np.maximum(norms, 1e-12)).astype(np.float32)
    np.save(output_directory / dense_mod.EMBEDDINGS_FILE, normalized)
    np.save(
        output_directory / dense_mod.IDS_FILE,
        np.asarray(emb_ids, dtype=np.int64),
    )

    manifest = {
        "schema": MANIFEST_SCHEMA,
        "created_unix": int(time.time()),
        "n_declarations": len(all_ids),
        "n_embedded": len(emb_ids),
        "embedding_dim": dim,
        "bm25_method": bm25_spaced.params.method,
        "files": REQUIRED_INDEX_FILES,
    }
    (output_directory / MANIFEST_FILE).write_text(json.dumps(manifest, indent=2))
    logger.info("Index artifacts written to %s", output_directory)
    return manifest


def _load_dense(directory: Path, dense_dtype: str, mesh):
    """Single-device DenseIndex, or ShardedDenseIndex when a mesh is active.

    ``mesh`` may be a jax Mesh, None to consult ``Config.MESH_SHAPE``
    (env ``LEAN_EXPLORE_MESH_SHAPE``) — one env var turns multi-chip serving
    on for the whole product path (engine, service, MCP, CLI) — or False to
    force single-device regardless of config.
    """
    if mesh is None:
        from lean_explore_tpu.parallel.mesh import serve_mesh_from_config

        mesh = serve_mesh_from_config()
    if mesh is None or mesh is False:
        return DenseIndex.load(directory, dtype=dense_dtype)

    from lean_explore_tpu.index.dense import require_dense_artifacts
    from lean_explore_tpu.parallel.sharded import ShardedDenseIndex

    emb_path, ids_path = require_dense_artifacts(directory)
    from lean_explore_tpu.config import Config

    logger.info(
        "Loading dense index sharded over mesh %s", dict(mesh.shape)
    )
    return ShardedDenseIndex(
        np.load(emb_path),
        np.load(ids_path),
        mesh,
        dtype=dense_dtype,
        chunk=Config.TOPK_CHUNK,
    )


def load_index_artifacts(
    directory: str | Path, *, dense_dtype: str = "float32", mesh=None
) -> IndexArtifacts:
    """Load an artifact set; raises FileNotFoundError on incomplete dirs.

    Args:
        directory: Artifact directory.
        dense_dtype: On-device corpus dtype.
        mesh: Optional jax Mesh for corpus-sharded serving; defaults to the
            mesh configured by ``LEAN_EXPLORE_MESH_SHAPE`` (None = single
            device).
    """
    directory = Path(directory)
    manifest_path = directory / MANIFEST_FILE
    if not manifest_path.exists():
        raise FileNotFoundError(
            f"Index manifest not found at {manifest_path}. "
            "Run 'lean-explore data fetch' or the extraction pipeline first."
        )
    manifest = json.loads(manifest_path.read_text())
    schema = manifest.get("schema")
    if schema != MANIFEST_SCHEMA:
        raise ValueError(
            f"Index artifact schema {schema!r} at {directory} does not match "
            f"this build's schema {MANIFEST_SCHEMA} — the artifacts were "
            "produced by an incompatible version. Re-run the extraction "
            "pipeline or 'lean-explore data fetch' a matching release."
        )
    # Only the files THIS loader reads: declarations.db is validated by
    # SearchEngine (stores are frequently injected separately in tests
    # and scripts).
    index_files = (
        dense_mod.EMBEDDINGS_FILE,
        dense_mod.IDS_FILE,
        BM25_SPACED_FILE,
        BM25_RAW_FILE,
        BM25_IDS_FILE,
    )
    missing = [f for f in index_files if not (directory / f).exists()]
    if missing:
        raise FileNotFoundError(
            f"Index artifact set at {directory} is incomplete (missing "
            f"{', '.join(missing)}). Run 'lean-explore data fetch' or the "
            "extraction pipeline first."
        )
    return IndexArtifacts(
        dense=_load_dense(directory, dense_dtype, mesh),
        bm25_spaced=Bm25Index.load(directory / BM25_SPACED_FILE),
        bm25_raw=Bm25Index.load(directory / BM25_RAW_FILE),
        bm25_ids=np.load(directory / BM25_IDS_FILE),
        manifest=manifest,
    )
