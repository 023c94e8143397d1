"""TPU compute ops: dense retrieval kernels, BM25 scoring, model kernels."""

from lean_explore_tpu.ops.dense import (
    dense_topk,
    l2_normalize,
    pad_rows,
)

__all__ = ["dense_topk", "l2_normalize", "pad_rows"]

from lean_explore_tpu.ops.quant import quantize_rows, quantized_topk  # noqa: E402

__all__ += ["quantize_rows", "quantized_topk"]
