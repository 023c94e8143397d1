"""Exact dense top-k retrieval ops (the FAISS replacement).

The reference scores queries against the corpus with a FAISS IVF-Flat scan
(nprobe=64, approximate; /root/reference/src/lean_explore/search/engine.py:
240-250). On TPU the idiomatic design is an *exact* tiled inner-product
matmul over the HBM-resident corpus with a fused top-k — the MXU makes the
full scan cheaper than IVF pruning, and exact search dominates IVF recall by
construction.

Two exact algorithms, both with static shapes (jit-stable):

- ``chunked``: lax.scan over corpus chunks; per chunk matmul + top-k, merged
  into a running [B, k] buffer. Never materializes [B, N]; best when B is
  small or HBM is tight.

- ``windowed``: one big matmul to [B, N], max-reduce over windows of W rows,
  top-k over the N/W window maxima, gather the winning windows, final top-k
  over [B, k*W]. Exactness: if x is in the global top-k, fewer than k scores
  exceed x, so fewer than k windows have a maximum above x's window. Best
  throughput at large B (BASELINE config 3's 128-query serving).

Corpus embeddings may be bfloat16 (halves the HBM traffic that bounds this
op) or float32 (bit-exact parity with faiss.IndexFlatIP).

Padding: corpora are padded to tile multiples; rows >= n_valid are masked to
-inf before any selection so pad rows can never enter the top-k.
"""

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = float("-inf")

Method = Literal[
    "auto", "approx", "fused", "fused_pallas", "chunked", "windowed", "full"
]


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Row-normalize to unit L2 norm (mirrors faiss.normalize_L2)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
    return (x / jnp.maximum(norm, eps)).astype(x.dtype)


def pad_rows(x, multiple: int):
    """Zero-pad rows of [N, D] to a multiple; returns (padded, n_valid)."""
    n = x.shape[0]
    padded_n = ((n + multiple - 1) // multiple) * multiple
    if padded_n != n:
        x = jnp.pad(x, ((0, padded_n - n), (0, 0)))
    return x, n


def _scores_tile(q: jnp.ndarray, tile: jnp.ndarray) -> jnp.ndarray:
    """[B, D] x [T, D] -> [B, T] inner products with f32 accumulation.

    float32 corpora get HIGHEST precision (TPU default would round the
    multiplicands to bf16, breaking FAISS-flat score parity); bfloat16
    corpora — the bandwidth-optimal serving config — use the MXU natively.
    """
    precision = (
        lax.Precision.HIGHEST if tile.dtype == jnp.float32 else lax.Precision.DEFAULT
    )
    return lax.dot_general(
        q.astype(tile.dtype),
        tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _chunked_topk(q, corpus, n_valid, *, k: int, chunk: int):
    batch, _ = q.shape
    padded_n, dim = corpus.shape
    num_chunks = padded_n // chunk
    tiles = corpus.reshape(num_chunks, chunk, dim)
    k_chunk = min(k, chunk)

    def step(carry, inputs):
        best_scores, best_idx = carry
        tile, chunk_start = inputs
        scores = _scores_tile(q, tile)
        col = chunk_start + lax.broadcasted_iota(jnp.int32, (batch, chunk), 1)
        scores = jnp.where(col < n_valid, scores, NEG_INF)
        tile_scores, tile_pos = lax.top_k(scores, k_chunk)
        tile_idx = chunk_start + tile_pos.astype(jnp.int32)
        cand_scores = jnp.concatenate([best_scores, tile_scores], axis=1)
        cand_idx = jnp.concatenate([best_idx, tile_idx], axis=1)
        best_scores, best_pos = lax.top_k(cand_scores, k)
        best_idx = jnp.take_along_axis(cand_idx, best_pos, axis=1)
        return (best_scores, best_idx), None

    init = (
        jnp.full((batch, k), NEG_INF, dtype=jnp.float32),
        jnp.zeros((batch, k), dtype=jnp.int32),
    )
    starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    (scores, idx), _ = lax.scan(step, init, (tiles, starts))
    return scores, idx


@functools.partial(jax.jit, static_argnames=("k", "window"))
def _windowed_topk(q, corpus, n_valid, *, k: int, window: int):
    batch, _ = q.shape
    padded_n = corpus.shape[0]
    num_windows = padded_n // window

    scores = _scores_tile(q, corpus)
    col = lax.broadcasted_iota(jnp.int32, (batch, padded_n), 1)
    scores = jnp.where(col < n_valid, scores, NEG_INF)

    window_max = scores.reshape(batch, num_windows, window).max(axis=-1)
    _, win_idx = lax.top_k(window_max, k)  # [B, k] winning windows

    # Expand each winning window into its `window` member columns and gather.
    member = (
        win_idx[:, :, None] * window
        + lax.broadcasted_iota(jnp.int32, (1, 1, window), 2)
    ).reshape(batch, k * window)
    gathered = jnp.take_along_axis(scores, member, axis=1)
    out_scores, pos = lax.top_k(gathered, k)
    out_idx = jnp.take_along_axis(member, pos, axis=1)
    return out_scores, out_idx


@functools.partial(
    jax.jit, static_argnames=("k", "bins", "recall_target", "exact_epilogue")
)
def _scan_bin_topk(
    q,
    corpus,
    n_valid,
    *,
    k: int,
    bins: int = 8192,
    recall_target: float = 0.95,
    exact_epilogue: bool = False,
):
    """Fused-selection top-k as a pure-XLA scan (no Pallas).

    One matmul per super-tile of `bins` corpus rows, folded into a running
    per-query bin-max carry ([B, bins] value + super-tile id). The [B, N]
    score tensor never materializes; carry HBM traffic is 16*N*B bytes
    (independent of `bins`), far below the 2x154MB the unfused
    matmul->approx_max_k pipeline moves at the config-3 geometry. Same
    bin-survivorship approximation semantics as pallas_bin_topk
    (a top-k element is lost only to a better element in its bin).
    """
    n, dim = corpus.shape
    batch = q.shape[0]
    steps = n // bins
    tiles = corpus.reshape(steps, bins, dim)
    col = lax.broadcasted_iota(jnp.int32, (batch, bins), 1)

    def step(carry, inputs):
        best, best_p = carry
        tile, p = inputs
        scores = _scores_tile(q, tile)
        scores = jnp.where(p * bins + col < n_valid, scores, NEG_INF)
        better = scores > best
        best = jnp.where(better, scores, best)
        best_p = jnp.where(better, p, best_p)
        return (best, best_p), None

    init = (
        jnp.full((batch, bins), NEG_INF, dtype=jnp.float32),
        jnp.zeros((batch, bins), dtype=jnp.int32),
    )
    (vals, supertile), _ = lax.scan(
        step, init, (tiles, jnp.arange(steps, dtype=jnp.int32))
    )
    if exact_epilogue:
        top_scores, pos = lax.top_k(vals, k)
    else:
        top_scores, pos = lax.approx_max_k(vals, k, recall_target=recall_target)
        pos = pos.astype(jnp.int32)
    rows = jnp.take_along_axis(supertile, pos, axis=1) * bins + pos
    return top_scores, rows.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def _full_topk(q, corpus, n_valid, *, k: int):
    batch = q.shape[0]
    scores = _scores_tile(q, corpus)
    col = lax.broadcasted_iota(jnp.int32, (batch, corpus.shape[0]), 1)
    scores = jnp.where(col < n_valid, scores, NEG_INF)
    out_scores, out_idx = lax.top_k(scores, k)
    return out_scores, out_idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k", "recall_target"))
def _approx_topk(q, corpus, n_valid, *, k: int, recall_target: float):
    """TPU PartialReduce top-k: the serving default at scale.

    ~50x cheaper than exact lax.top_k at k=1000 over 300k rows on v5e
    (measured 2.7ms vs 145ms per 128-query batch). recall_target applies to
    the whole k-set; the extreme scores that decide final rankings are
    essentially never dropped — measured recall@10 is 1.0 even at
    recall_target 0.9, comfortably above the reference's IVF nprobe=64
    candidate recall (engine.py:247-249).
    """
    batch = q.shape[0]
    scores = _scores_tile(q, corpus)
    col = lax.broadcasted_iota(jnp.int32, (batch, corpus.shape[0]), 1)
    scores = jnp.where(col < n_valid, scores, NEG_INF)
    out_scores, out_idx = lax.approx_max_k(scores, k, recall_target=recall_target)
    return out_scores, out_idx.astype(jnp.int32)


def dense_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    k: int,
    *,
    n_valid: int | jnp.ndarray | None = None,
    method: Method = "auto",
    chunk: int = 8192,
    window: int = 16,
    recall_target: float = 0.95,
):
    """Top-k inner-product search (exact or approximate per ``method``).

    Args:
        queries: [B, D] query embeddings (any float dtype; accumulated f32).
            The fused/approx methods assume rows are L2-normalized (inner
            products in [-1, 1] — DenseIndex normalizes); raw scores below
            -3 degrade to bottom-ranked ties in the fused packing.
        corpus: [N, D] corpus embeddings, N padded or not (padding applied
            here when needed).
        k: Number of neighbors. Must be <= n_valid: checked when n_valid
            is static; under a traced n_valid the CALLER must clamp
            (index/dense.py does) or -inf pad entries appear in the tail.
        n_valid: Number of real corpus rows; defaults to corpus.shape[0].
        method: "approx", "chunked", "windowed", "full", "fused"/
            "fused_pallas" (the TPU serving default via "auto": fused
            matmul+bin-max selection, ops/pallas_retrieval.py), or "auto"
            (fused at scale on TPU, approx off-TPU, full for small corpora
            — where full IS exact and cheap).
        chunk: Chunk rows for the scan method.
        window: Window width for the windowed method.
        recall_target: Expected per-element recall of the approx method's
            k-set (the top of the set is effectively exact; see _approx_topk).

    Returns:
        (scores [B, k] float32, indices [B, k] int32) sorted descending.
        Indices are always < n_valid provided k <= n_valid.
    """
    if n_valid is None:
        n_valid = corpus.shape[0]
    static_n = int(n_valid) if not isinstance(n_valid, jax.core.Tracer) else None
    if static_n is not None and k > static_n:
        raise ValueError(f"k={k} exceeds corpus size {static_n}")

    n = corpus.shape[0]
    if method == "auto":
        if n <= max(4 * k, 16384):
            method = "full"  # small corpora: exact IS cheap
        elif jax.default_backend() == "tpu":
            # Fused matmul+selection kernel: measured 65.7k q/s vs 32.9k for
            # matmul+approx_max_k at config-3 (300k x 1024, B=128, k=1000),
            # recall@10 0.998 (docs/performance.md).
            method = "fused_pallas"
        else:
            method = "approx"

    n_valid = jnp.asarray(n_valid, dtype=jnp.int32)
    if method == "full":
        return _full_topk(queries, corpus, n_valid, k=k)
    if method == "approx":
        return _approx_topk(
            queries, corpus, n_valid, k=k, recall_target=recall_target
        )
    if method == "fused":
        bins = 8192
        while bins > corpus.shape[0] and bins > 1024:
            bins //= 2
        corpus, _ = pad_rows(corpus, bins)
        if k > bins:  # tiny corpora: the full scan is exact and cheap
            return _full_topk(queries, corpus, n_valid, k=k)
        return _scan_bin_topk(
            queries, corpus, n_valid, k=k, bins=bins,
            recall_target=recall_target,
        )
    if method == "fused_pallas":
        from lean_explore_tpu.ops.pallas_retrieval import pallas_bin_topk

        tile_rows = 512
        corpus, _ = pad_rows(corpus, tile_rows)
        # VMEM budget: the packed carry + output block cost 2*bins*B*4 bytes;
        # cap at ~8MB so large query batches (B=256/512) still fit a 16MB
        # core alongside the double-buffered corpus tiles.
        #
        # bins=4096 (round 3, was 8192): the round-3 tile/bins sweep on
        # hardware showed the raw kernel pass is 1.34 ms at config 3
        # regardless of tile_rows (512/1024/2048 identical — grid overhead
        # is NOT the limiter) while the k=1000 epilogue costs 0.21 ms over
        # [B, 8192] but only 0.08 ms over [B, 4096]: 1.56 -> 1.37-1.42
        # ms/batch at measured recall@10 0.9986 (bin-survivorship loss
        # ~10/4096 stays under the bf16 noise floor).
        batch = max(queries.shape[0], 8)
        bins = 4096
        while bins * batch * 8 > 8 * 1024 * 1024 and bins > 2 * tile_rows:
            bins //= 2
        while bins > corpus.shape[0] and bins > 2 * tile_rows:
            bins //= 2
        bins = max(bins, tile_rows)
        if k > bins:
            return _full_topk(queries, corpus, n_valid, k=k)
        # The fused epilogue selects over [B, bins] — two orders smaller
        # than [B, N] — so a high recall target there is free (measured:
        # rt=0.99 and rt=0.95 time identically at config 3).
        return pallas_bin_topk(
            queries,
            corpus,
            n_valid,
            k=k,
            bins=bins,
            tile_rows=tile_rows,
            recall_target=max(recall_target, 0.99),
            interpret=jax.default_backend() != "tpu",
        )
    if method == "chunked":
        corpus, _ = pad_rows(corpus, chunk)
        return _chunked_topk(queries, corpus, n_valid, k=k, chunk=chunk)
    if method == "windowed":
        corpus, _ = pad_rows(corpus, window)
        if k * window >= corpus.shape[0]:
            return _full_topk(queries, corpus, n_valid, k=k)
        return _windowed_topk(queries, corpus, n_valid, k=k, window=window)
    raise ValueError(f"unknown method {method!r}")
