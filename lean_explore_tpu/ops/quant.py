"""Int8-quantized dense retrieval.

Symmetric per-row int8 quantization of the corpus (and, at query time, the
query batch) lets the retrieval matmul run on the MXU's int8 path with
int32 accumulation: half the HBM traffic of bfloat16 and double the
matmul throughput, at a small, measured recall cost. Scores are rescaled to
float32 (q_scale_row x corpus_scale_col) before selection, so ranking
operates on calibrated inner products.

    quantize_rows   f32 [N, D] -> (int8 [N, D], f32 [N] scales)
    quantized_topk  same contract as ops.dense.dense_topk
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from lean_explore_tpu.ops.dense import NEG_INF


def quantize_rows(matrix: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization (host, numpy).

    scale_i = max|row_i| / 127; zero rows get scale 1 (all-zero codes).
    """
    matrix = np.asarray(matrix, dtype=np.float32)
    absmax = np.abs(matrix).max(axis=1)
    scales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    codes = np.clip(
        np.rint(matrix / scales[:, None]), -127, 127
    ).astype(np.int8)
    return codes, scales


def _quantize_rows_device(matrix: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Same quantization, on device (for query batches inside jit)."""
    absmax = jnp.max(jnp.abs(matrix), axis=1)
    scales = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    codes = jnp.clip(
        jnp.rint(matrix / scales[:, None]), -127, 127
    ).astype(jnp.int8)
    return codes, scales


@functools.partial(jax.jit, static_argnames=("k", "recall_target", "exact"))
def quantized_topk(
    queries: jnp.ndarray,
    corpus_codes: jnp.ndarray,
    corpus_scales: jnp.ndarray,
    n_valid: jnp.ndarray,
    *,
    k: int,
    recall_target: float = 0.95,
    exact: bool = False,
):
    """Top-k inner-product search over an int8-quantized corpus.

    Args:
        queries: [B, D] float queries (quantized per-row on device).
        corpus_codes: [N, D] int8.
        corpus_scales: [N] float32 per-row scales.
        n_valid: scalar int32 count of real rows.
        k: neighbors.
        recall_target: approx_max_k target (exact=False).
        exact: use exact lax.top_k selection instead.

    Returns:
        (scores [B, k] f32 — calibrated inner products, idx [B, k] i32).
    """
    batch = queries.shape[0]
    q_codes, q_scales = _quantize_rows_device(queries.astype(jnp.float32))
    raw = lax.dot_general(
        q_codes,
        corpus_codes,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = (
        raw.astype(jnp.float32)
        * q_scales[:, None]
        * corpus_scales[None, :]
    )
    col = lax.broadcasted_iota(jnp.int32, (batch, corpus_codes.shape[0]), 1)
    scores = jnp.where(col < n_valid, scores, NEG_INF)
    if exact:
        out_scores, out_idx = lax.top_k(scores, k)
    else:
        out_scores, out_idx = lax.approx_max_k(
            scores, k, recall_target=recall_target
        )
    return out_scores, out_idx.astype(jnp.int32)
