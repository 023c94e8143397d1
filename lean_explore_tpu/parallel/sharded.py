"""Corpus-sharded dense retrieval over a device mesh.

BASELINE config 5: corpus embedding rows are sharded across the ``corpus``
mesh axis, every device computes a local top-k over its shard (the fused
matmul+selection kernel on TPU, the exact chunked scan for small shards or
off-TPU), the per-shard (scores, global indices) are ``all_gather``-ed over
ICI, and each device finishes with a k-way merge — the collective the
reference has no analogue for (it is single-process; SURVEY.md §2c).

Queries ride the ``data`` axis (DP): a (data=2, corpus=4) mesh serves two
query sub-batches concurrently, each against the full corpus.
"""


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lean_explore_tpu.ops import l2_normalize
from lean_explore_tpu.ops.dense import NEG_INF, _scores_tile


def _local_topk_chunked(q, shard, row_offset, n_valid, k: int, chunk: int):
    """Exact top-k over one corpus shard; indices are global rows.

    Kept separate from ops.dense._chunked_topk because the shard-local
    validity mask differs: shard rows are padded HERE (inside shard_map,
    so any shard row count works — the single-device path pads at the
    caller), and a padded local row's GLOBAL column can fall inside the
    next shard's range, so validity needs both the local-row bound and
    the global n_valid bound.
    """
    batch = q.shape[0]
    rows = shard.shape[0]
    chunk = min(chunk, rows)
    padded = ((rows + chunk - 1) // chunk) * chunk
    if padded != rows:
        shard = jnp.pad(shard, ((0, padded - rows), (0, 0)))
    num_chunks = padded // chunk
    tiles = shard.reshape(num_chunks, chunk, shard.shape[1])
    k_chunk = min(k, chunk)

    def step(carry, inputs):
        best_s, best_i = carry
        tile, start = inputs
        scores = _scores_tile(q, tile)
        local_col = start + lax.broadcasted_iota(jnp.int32, (batch, chunk), 1)
        col = row_offset + local_col
        scores = jnp.where(
            (local_col < rows) & (col < n_valid), scores, NEG_INF
        )
        ts, tp = lax.top_k(scores, k_chunk)
        ti = row_offset + start + tp.astype(jnp.int32)
        cs = jnp.concatenate([best_s, ts], axis=1)
        ci = jnp.concatenate([best_i, ti], axis=1)
        best_s, pos = lax.top_k(cs, k)
        best_i = jnp.take_along_axis(ci, pos, axis=1)
        return (best_s, best_i), None

    init = (
        jnp.full((batch, k), NEG_INF, dtype=jnp.float32),
        jnp.zeros((batch, k), dtype=jnp.int32),
    )
    starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    (scores, idx), _ = lax.scan(step, init, (tiles, starts))
    return scores, idx


def _local_full_topk(q, shard, row_offset, n_valid, *, k):
    """Exact single-matmul top-k over one shard (the k > bins fallback —
    mirrors ops.dense dense_topk's _full_topk escape at dense.py:305)."""
    batch = q.shape[0]
    rows = shard.shape[0]
    scores = _scores_tile(q, shard)
    col = row_offset + lax.broadcasted_iota(jnp.int32, (batch, rows), 1)
    scores = jnp.where(col < n_valid, scores, NEG_INF)
    local_k = min(k, rows)
    s, pos = lax.top_k(scores, local_k)
    s, pos = _pad_local_k(s, pos, k, local_k)
    return s, row_offset + pos.astype(jnp.int32)


def _pad_local_k(s, pos, k: int, local_k: int):
    """Pad a [B, local_k] selection to [B, k] so all_gather shapes agree."""
    if local_k < k:
        s = jnp.pad(s, ((0, 0), (0, k - local_k)), constant_values=NEG_INF)
        pos = jnp.pad(pos, ((0, 0), (0, k - local_k)))
    return s, pos


def _shard_bins(rows: int, batch: int) -> int:
    """The fused kernel's bin count for one shard (VMEM-capped; see
    ops.dense fused_pallas rationale — round-3 default 4096)."""
    bins = 4096
    local_batch = max(batch, 8)
    while bins * local_batch * 8 > 8 * 1024 * 1024 and bins > 1024:
        bins //= 2
    while bins > rows and bins > 1024:
        bins //= 2
    return bins


def _local_topk_fused_common(
    kernel, q, rows: int, row_offset, n_valid, *, k, recall_target
):
    """Shared scaffolding for the f32/int8 fused per-shard selections:
    bins sizing, the k > bins exact fallback, local-k padding, and the
    packed-zero sentinel masking (round-4 fix — applied ONCE here so the
    twins cannot drift).

    ``kernel(local_valid, local_k, bins)`` runs the dtype-specific Pallas
    call and returns (scores, local positions).
    """
    local_k = min(k, rows)
    local_valid = jnp.clip(n_valid - row_offset, 0, rows)
    bins = _shard_bins(rows, q.shape[0])
    if local_k > bins:
        return None  # caller falls back to the exact scan
    s, pos = kernel(local_valid, local_k, bins)
    s, pos = _pad_local_k(s, pos, k, local_k)
    # Pad rows (any shard whose valid rows < local_k, not just fully
    # padded shards) yield packed-zero sentinels that unpack to -3.0
    # with pad-row indices; real scores are >= -1. Mask each such
    # candidate — and clamp its GLOBAL index to 0 (row_offset itself can
    # exceed n_valid on an all-pad shard) — so the cross-shard merge can
    # never surface an out-of-range id.
    sentinel = s <= -2.0
    s = jnp.where(sentinel, NEG_INF, s)
    idx = jnp.where(sentinel, 0, row_offset + pos.astype(jnp.int32))
    return s, idx


def _local_topk_fused(q, shard, row_offset, n_valid, *, k, recall_target):
    """Per-shard fused matmul+selection (ops/pallas_retrieval): the
    single-chip serving default, run under shard_map — each device's
    local n_valid is how many real rows its shard holds."""
    from lean_explore_tpu.ops.pallas_retrieval import pallas_bin_topk

    def kernel(local_valid, local_k, bins):
        return pallas_bin_topk(
            q,
            shard,
            local_valid,
            k=local_k,
            bins=bins,
            tile_rows=512,
            recall_target=max(recall_target, 0.99),  # free over [B, bins]
            interpret=jax.default_backend() != "tpu",
        )

    out = _local_topk_fused_common(
        kernel, q, shard.shape[0], row_offset, n_valid,
        k=k, recall_target=recall_target,
    )
    if out is None:  # k > bins: exact scan, like ops.dense dense_topk
        return _local_full_topk(q, shard, row_offset, n_valid, k=k)
    return out


def _local_topk_fused_int8(
    q, codes, scales, row_offset, n_valid, *, k, recall_target
):
    """Int8 twin of _local_topk_fused: per-shard fused selection over the
    quantized codes + per-row scales (BASELINE config 5 at the 9-package
    scale is exactly where int8's halved HBM footprint pays)."""
    from lean_explore_tpu.ops.pallas_retrieval import pallas_bin_topk_int8

    def kernel(local_valid, local_k, bins):
        return pallas_bin_topk_int8(
            q,
            codes,
            scales,
            local_valid,
            k=local_k,
            bins=bins,
            tile_rows=512,
            recall_target=max(recall_target, 0.99),
            interpret=jax.default_backend() != "tpu",
        )

    out = _local_topk_fused_common(
        kernel, q, codes.shape[0], row_offset, n_valid,
        k=k, recall_target=recall_target,
    )
    if out is None:
        # k > bins fallback: exact scan over dequantized scores.
        shard = codes.astype(jnp.float32) * scales[:, None]
        return _local_full_topk(q, shard, row_offset, n_valid, k=k)
    return out


def make_sharded_topk(
    mesh: Mesh, *, k: int, chunk: int = 8192, method: str = "chunked",
    recall_target: float = 0.95,
):
    """Build the jitted sharded top-k program for a mesh.

    Returns fn(queries [B, D], corpus [N, D], n_valid) -> (scores, idx),
    where B divides the ``data`` axis size and N the ``corpus`` axis size.
    method "approx" uses the TPU PartialReduce selection per shard (serving
    default at scale — see ops.dense._approx_topk); "chunked" is exact;
    "fused_int8" returns fn(queries, codes, scales, n_valid) over an
    int8-quantized corpus.
    """
    def _merge_shards(local_s, local_i, *, exact: bool):
        """Gather every shard's [B, k] candidates and re-select. Exact
        local methods keep the exact merge; approximate locals pair with
        the PartialReduce merge (lax.top_k over n_shards*k columns would
        dominate at high shard counts) at recall_target >= 0.99 — over a
        candidate set two orders smaller than the corpus a high target is
        measured free (ops.dense dense_topk rationale), so the merge adds
        no recall loss on top of the per-shard selection."""
        all_s = lax.all_gather(local_s, "corpus", axis=1, tiled=True)
        all_i = lax.all_gather(local_i, "corpus", axis=1, tiled=True)
        if exact:
            best_s, pos = lax.top_k(all_s, k)
        else:
            best_s, pos = lax.approx_max_k(
                all_s, k, recall_target=max(recall_target, 0.99)
            )
            pos = pos.astype(jnp.int32)
        best_i = jnp.take_along_axis(all_i, pos, axis=1)
        return best_s, best_i

    if method == "fused_int8":

        def inner_int8(q, codes, scales, n_valid):
            shard_rows = codes.shape[0]
            shard_idx = lax.axis_index("corpus")
            row_offset = shard_idx * shard_rows
            local_s, local_i = _local_topk_fused_int8(
                q, codes, scales, row_offset, n_valid[0],
                k=k, recall_target=recall_target,
            )
            return _merge_shards(local_s, local_i, exact=False)

        mapped = shard_map(
            inner_int8,
            mesh=mesh,
            in_specs=(P("data", None), P("corpus", None), P("corpus"), P()),
            out_specs=(P("data", None), P("data", None)),
            check_vma=False,
        )
        return jax.jit(mapped)

    def _local_topk_approx(q, shard, row_offset, n_valid):
        batch = q.shape[0]
        rows = shard.shape[0]
        scores = _scores_tile(q, shard)
        col = row_offset + lax.broadcasted_iota(jnp.int32, (batch, rows), 1)
        scores = jnp.where(col < n_valid, scores, NEG_INF)
        local_k = min(k, rows)
        s, pos = lax.approx_max_k(scores, local_k, recall_target=recall_target)
        s, pos = _pad_local_k(s, pos, k, local_k)
        # NEG_INF candidates (masked pad rows a shard with few valid rows
        # still selects) carry pad-row positions; clamp their GLOBAL index
        # to 0 so a NEG_INF survivor of the approximate merge can never
        # index past ids (same fix the fused twins got in round 4).
        masked = s <= NEG_INF / 2
        idx = jnp.where(masked, 0, row_offset + pos.astype(jnp.int32))
        return s, idx

    def inner(q, corpus, n_valid):
        shard_rows = corpus.shape[0]  # rows per device inside shard_map
        shard_idx = lax.axis_index("corpus")
        row_offset = shard_idx * shard_rows
        if method == "fused":
            local_s, local_i = _local_topk_fused(
                q, corpus, row_offset, n_valid[0],
                k=k, recall_target=recall_target,
            )
        elif method == "approx":
            local_s, local_i = _local_topk_approx(q, corpus, row_offset, n_valid[0])
        else:
            local_s, local_i = _local_topk_chunked(
                q, corpus, row_offset, n_valid[0], k=k, chunk=min(chunk, shard_rows)
            )
        return _merge_shards(local_s, local_i, exact=(method == "chunked"))

    mapped = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P("data", None), P("corpus", None), P()),
        out_specs=(P("data", None), P("data", None)),
        # The scan carry starts replicated and becomes device-varying after
        # the first merge; skip the varying-manual-axes check.
        check_vma=False,
    )
    return jax.jit(mapped)


class ShardedDenseIndex:
    """Mesh-sharded inner-product index.

    The corpus matrix is padded so rows divide evenly across the ``corpus``
    axis and placed with a row sharding; searches run the all-gather-merge
    program above. Selection is EXACT for the "chunked" method (small
    shards); the auto-selected "fused"/"approx" methods at scale are
    approximate per-shard selections at recall_target >= 0.99 with a
    >= 0.99 merge — the same recall story as the single-device
    ops.dense.dense_topk (measured recall@10 ~1.0, recall@1000 ~0.99).
    """

    def __init__(
        self,
        embeddings: np.ndarray,
        ids: np.ndarray,
        mesh: Mesh,
        *,
        dtype: str = "float32",
        chunk: int = 8192,
        method: str = "auto",
    ):
        if embeddings.shape[0] != len(ids):
            raise ValueError("ids length must match embedding rows")
        self.mesh = mesh
        self.ids = np.asarray(ids, dtype=np.int64)
        self.n = int(embeddings.shape[0])
        self.dim = int(embeddings.shape[1])
        self.chunk = chunk
        self.scales = None  # set for int8-quantized indices

        n_corpus = mesh.shape["corpus"]
        int8 = str(dtype) == "int8"
        if int8:
            method = "fused_int8"
        if method == "auto":
            # Same crossover as ops.dense.dense_topk, judged per shard: small
            # shards use the exact scan (cheap and bit-exact), large shards
            # the fused matmul+selection kernel (approx off-TPU).
            shard_rows = (self.n + n_corpus - 1) // n_corpus
            if shard_rows <= 16384:
                method = "chunked"
            elif jax.default_backend() == "tpu":
                method = "fused"
            else:
                method = "approx"
        self.method = method
        # Shards split evenly over the corpus axis; the fused kernels further
        # need per-shard rows aligned to their 512-row tile.
        align = n_corpus * (512 if method in ("fused", "fused_int8") else 1)
        padded = ((self.n + align - 1) // align) * align
        mat = np.zeros((max(padded, align), self.dim), dtype=np.float32)
        mat[: self.n] = np.asarray(embeddings, dtype=np.float32)
        norms = np.linalg.norm(mat[: self.n], axis=1, keepdims=True)
        mat[: self.n] /= np.maximum(norms, 1e-12)

        row_sharding = NamedSharding(mesh, P("corpus", None))
        if int8:
            from lean_explore_tpu.ops.quant import quantize_rows

            codes, scales = quantize_rows(mat[: self.n])
            pad = mat.shape[0] - self.n
            if pad:  # zero pad rows quantize to zero codes; scale moot
                codes = np.pad(codes, ((0, pad), (0, 0)))
                scales = np.pad(scales, (0, pad), constant_values=1.0)
            self.embeddings = jax.device_put(jnp.asarray(codes), row_sharding)
            self.scales = jax.device_put(
                jnp.asarray(scales, dtype=jnp.float32),
                NamedSharding(mesh, P("corpus")),
            )
        else:
            self.embeddings = jax.device_put(
                jnp.asarray(mat, dtype=jnp.dtype(dtype)), row_sharding
            )
        self._topk_fns: dict[int, object] = {}

    def search(self, query_embeddings, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Top-k across all shards (exactness per the class docstring);
        returns (scores, declaration ids)."""
        k = min(k, self.n)
        q = l2_normalize(jnp.asarray(query_embeddings, dtype=jnp.float32))
        n_data = self.mesh.shape["data"]
        batch = q.shape[0]
        padded_batch = ((batch + n_data - 1) // n_data) * n_data
        if padded_batch != batch:
            q = jnp.pad(q, ((0, padded_batch - batch), (0, 0)))
        q = jax.device_put(q, NamedSharding(self.mesh, P("data", None)))

        fn = self._topk_fns.get(k)
        if fn is None:
            fn = make_sharded_topk(
                self.mesh, k=k, chunk=self.chunk, method=self.method
            )
            self._topk_fns[k] = fn
        n_valid = jnp.asarray([self.n], dtype=jnp.int32)
        if self.scales is not None:
            scores, idx = fn(q, self.embeddings, self.scales, n_valid)
        else:
            scores, idx = fn(q, self.embeddings, n_valid)
        scores = np.asarray(jax.device_get(scores))[:batch]
        idx = np.asarray(jax.device_get(idx))[:batch]
        return scores, self.ids[idx]

    def row_embeddings(self) -> np.ndarray:
        """Host copy of the (unpadded) matrix, float32 — DenseIndex parity
        (int8 indices dequantize, mirroring DenseIndex.save)."""
        if self.scales is not None:
            return (
                np.asarray(self.embeddings, dtype=np.float32)
                * np.asarray(self.scales)[:, None]
            )[: self.n]
        return np.asarray(self.embeddings, dtype=np.float32)[: self.n]
