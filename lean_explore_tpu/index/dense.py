"""HBM-resident dense retrieval index (the FAISS artifact replacement).

The artifact is a packed, L2-normalized float32 embedding matrix plus a
row -> declaration-id map (replacing the reference's IVF index + JSON map,
extract/index.py:95-119,176-182). At load time the matrix is pushed to
device HBM, optionally cast to bfloat16 (halves the bandwidth of the
retrieval matmul, which bounds throughput), optionally sharded over a mesh
(parallel/sharded.py).

Search is exact for small corpora and TPU-PartialReduce approximate
(recall@1000 ~ 0.99, recall@10 ~ 1.0) at scale — either way strictly
dominating the reference's IVF nprobe=64 candidate recall at a fraction of
its latency (see ops/dense.py).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from lean_explore_tpu.ops import dense_topk, l2_normalize

EMBEDDINGS_FILE = "dense_embeddings.npy"
IDS_FILE = "dense_ids.npy"

# Device matrix rows are padded to this multiple ONCE at construction so the
# retrieval kernels' alignment requirement never re-pads (= copies 600+ MB)
# inside the serving hot loop. Pad rows are masked by n_valid at search time.
ROW_ALIGN = 512


def require_dense_artifacts(directory: str | Path) -> tuple[Path, Path]:
    """(embeddings_path, ids_path), raising the guided FileNotFoundError
    when either is missing — ONE definition for the single-device and
    sharded load paths."""
    directory = Path(directory)
    emb_path = directory / EMBEDDINGS_FILE
    ids_path = directory / IDS_FILE
    for p in (emb_path, ids_path):
        if not p.exists():
            raise FileNotFoundError(
                f"Dense index artifact missing: {p}. Run 'lean-explore data "
                "fetch' or the extraction pipeline first."
            )
    return emb_path, ids_path


class DenseIndex:
    """Exact inner-product index over normalized embeddings."""

    def __init__(
        self,
        embeddings: jnp.ndarray,
        ids: np.ndarray,
        *,
        normalized: bool = True,
    ):
        """Wrap an embedding matrix already on device.

        Args:
            embeddings: [N, D] matrix (rows assumed L2-normalized when
                normalized=True; build() normalizes).
            ids: [N] declaration ids for each row.
            normalized: Set False to normalize here.
        """
        if embeddings.ndim != 2:
            raise ValueError("embeddings must be [N, D]")
        if embeddings.shape[0] != len(ids):
            raise ValueError("ids length must match embedding rows")
        if not normalized:
            embeddings = l2_normalize(embeddings)
        self.n = int(embeddings.shape[0])
        self.dim = int(embeddings.shape[1])
        padded = ((self.n + ROW_ALIGN - 1) // ROW_ALIGN) * ROW_ALIGN
        if padded != self.n:
            embeddings = jnp.pad(embeddings, ((0, padded - self.n), (0, 0)))
        self.embeddings = embeddings
        self.scales = None  # set for int8-quantized indices
        self.ids = np.asarray(ids, dtype=np.int64)

    @classmethod
    def build(
        cls,
        embeddings: np.ndarray,
        ids: np.ndarray,
        *,
        dtype: str | jnp.dtype = "float32",
    ) -> "DenseIndex":
        """Normalize (in f32) and place on device in the serving dtype.

        dtype "int8" quantizes per row (ops/quant.py): half bfloat16's HBM
        traffic and double the MXU throughput, small measured recall cost.
        """
        mat = np.asarray(embeddings, dtype=np.float32)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-12)
        if str(dtype) == "int8":
            from lean_explore_tpu.ops.quant import quantize_rows

            codes, scales = quantize_rows(mat)
            index = cls(jnp.asarray(codes), ids, normalized=True)
            pad = index.embeddings.shape[0] - len(scales)
            if pad:  # zero pad rows quantize to zero codes; scale value moot
                scales = np.pad(scales, (0, pad), constant_values=1.0)
            index.scales = jnp.asarray(scales)
            return index
        device_mat = jnp.asarray(mat, dtype=jnp.dtype(dtype))
        return cls(device_mat, ids, normalized=True)

    # ------------------------------------------------------------------
    # Persistence (always float32 on disk; dtype is a load-time choice)
    # ------------------------------------------------------------------

    def save(self, directory: str | Path) -> None:
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        if self.scales is not None:
            # Artifacts stay float32 on disk; dequantize the int8 codes.
            mat = np.asarray(self.embeddings, dtype=np.float32) * np.asarray(
                self.scales
            )[:, None]
        else:
            mat = np.asarray(self.embeddings, dtype=np.float32)
        np.save(directory / EMBEDDINGS_FILE, mat[: self.n])
        np.save(directory / IDS_FILE, self.ids)

    @classmethod
    def load(
        cls, directory: str | Path, *, dtype: str | jnp.dtype = "float32"
    ) -> "DenseIndex":
        emb_path, ids_path = require_dense_artifacts(directory)
        mat = np.load(emb_path)
        ids = np.load(ids_path)
        if str(dtype) == "int8":
            return cls.build(mat, ids, dtype="int8")
        return cls(jnp.asarray(mat, dtype=jnp.dtype(dtype)), ids, normalized=True)

    # ------------------------------------------------------------------
    # Search
    # ------------------------------------------------------------------

    def search(
        self,
        query_embeddings: jnp.ndarray | np.ndarray,
        k: int,
        *,
        method: str = "auto",
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k for a batch of queries (method "auto": exact on small
        corpora, approx at scale).

        Args:
            query_embeddings: [B, D] (normalized here for safety; mirrors the
                reference's faiss.normalize_L2 on the query, engine.py:242).
            k: neighbors per query (clamped to corpus size).
            method: ops.dense.dense_topk method.

        Returns:
            (scores [B, k] float32 np, declaration_ids [B, k] int64 np).
        """
        q = l2_normalize(jnp.asarray(query_embeddings, dtype=jnp.float32))
        k = min(k, self.n)
        # Bucket the batch dim (like encode_batch does for token batches):
        # every device program below is compiled per B, so an arbitrary
        # serving batch (e.g. a coalesced HTTP drain of 97 queries) would
        # otherwise trigger a fresh XLA/Pallas compile mid-request. Padding
        # to the standard buckets bounds live compiles to len(BATCH_BUCKETS)
        # shapes; pad rows are zero vectors whose results are sliced away.
        from lean_explore_tpu.models.tokenizer import bucket_batch

        b_valid = int(q.shape[0])
        b_padded = bucket_batch(b_valid)
        if b_padded != b_valid:
            q = jnp.pad(q, ((0, b_padded - b_valid), (0, 0)))
        if self.scales is not None:
            rows_padded = self.embeddings.shape[0]
            use_fused = (
                method in ("auto", "fused_pallas")
                and jax.default_backend() == "tpu"
                and rows_padded > 16384
            )
            if use_fused:
                from lean_explore_tpu.ops.pallas_retrieval import (
                    pallas_bin_topk_int8,
                )

                bins = 4096  # round-3 default; ops.dense fused_pallas notes
                batch = max(q.shape[0], 8)
                while bins * batch * 8 > 8 * 1024 * 1024 and bins > 1024:
                    bins //= 2  # VMEM cap; see ops.dense fused_pallas
                while bins > rows_padded and bins > 1024:
                    bins //= 2
                if k <= bins:
                    scores, rows = pallas_bin_topk_int8(
                        q,
                        self.embeddings,
                        self.scales,
                        jnp.asarray(self.n, dtype=jnp.int32),
                        k=k,
                        bins=bins,
                        recall_target=0.99,  # free over [B, bins]
                    )
                    rows = np.asarray(jax.device_get(rows))[:b_valid]
                    scores = np.asarray(jax.device_get(scores))[:b_valid]
                    return scores, self.ids[rows]
            from lean_explore_tpu.ops.quant import quantized_topk

            scores, rows = quantized_topk(
                q,
                self.embeddings,
                self.scales,
                jnp.asarray(self.n, dtype=jnp.int32),
                k=k,
                exact=(method == "full"),
            )
        else:
            from lean_explore_tpu.config import Config

            scores, rows = dense_topk(
                q,
                self.embeddings,
                k,
                n_valid=self.n,
                method=method,
                chunk=Config.TOPK_CHUNK,
            )
        rows = np.asarray(jax.device_get(rows))[:b_valid]
        scores = np.asarray(jax.device_get(scores))[:b_valid]
        return scores, self.ids[rows]

    def row_embeddings(self) -> np.ndarray:
        """Host copy of the (unpadded) matrix, float32 (int8 dequantizes,
        same as save())."""
        if self.scales is not None:
            return (
                np.asarray(self.embeddings, dtype=np.float32)
                * np.asarray(self.scales)[:, None]
            )[: self.n]
        return np.asarray(self.embeddings, dtype=np.float32)[: self.n]
