"""Pallas fused retrieval kernels (the FAISS IVF scan hot-loop replacement,
reference search/engine.py:247-250).

Serving default — fused matmul + bin-max selection with packed provenance:
``pallas_bin_topk`` (bfloat16/float32) and ``pallas_bin_topk_int8`` compute
the corpus-tile inner products on the MXU and fold top-k selection into the
same pass via a per-query bin-max carry in VMEM scratch; the [B, N] score
tensor never reaches HBM and the epilogue selects over [B, bins] only.
Measured 85-103k q/s at the Mathlib serving geometry (docs/performance.md).

Exact path — ``fused_scores_wmax`` / ``pallas_windowed_topk``: one VMEM pass
computing matmul, pad masking, and a max-reduction over windows of W corpus
rows, feeding the exact windowed top-k (ops/dense.py for the exactness
argument). Scores are produced *transposed* ([N, B], corpus rows on the
sublane axis) so the window reduction is a leading-axis reshape+max, which
Mosaic lowers efficiently.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lean_explore_tpu.ops.dense import NEG_INF


def _fused_kernel(window: int, tile_rows: int):
    def kernel(n_valid_ref, q_ref, tile_ref, scores_ref, wmax_ref):
        j = pl.program_id(0)
        batch = q_ref.shape[0]
        # [TN, D] x [B, D]^T -> [TN, B]; f32 accumulation on the MXU.
        precision = (
            lax.Precision.HIGHEST
            if tile_ref.dtype == jnp.float32
            else lax.Precision.DEFAULT
        )
        scores = lax.dot_general(
            tile_ref[:],
            q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        row = j * tile_rows + lax.broadcasted_iota(
            jnp.int32, (tile_rows, batch), 0
        )
        scores = jnp.where(row < n_valid_ref[0], scores, NEG_INF)
        scores_ref[:] = scores
        wmax_ref[:] = scores.reshape(tile_rows // window, window, batch).max(axis=1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("window", "tile_rows", "interpret")
)
def fused_scores_wmax(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    n_valid: jnp.ndarray,
    *,
    window: int = 8,
    tile_rows: int = 1024,
    interpret: bool = False,
):
    """Run the fused kernel over the whole corpus.

    Args:
        queries: [B, D]; cast to the corpus dtype for the MXU feed.
        corpus: [N, D] with N % tile_rows == 0 (use ops.dense.pad_rows).
        n_valid: scalar int32 count of real rows.
        window: rows per max-window (tile_rows % window == 0).
        tile_rows: corpus rows per grid step.
        interpret: run in Pallas interpreter mode (CPU tests).

    Returns:
        (scores_t [N, B_pad] f32, wmax_t [N/window, B_pad] f32), both
        transposed; B_pad rounds B up to a multiple of 8 (the same Mosaic
        matvec-lowering bug the bin-topk wrappers dodge — bf16 dot_general
        at B=1 fails verification on hardware). Pad columns carry
        meaningless (zero-query) scores; pallas_windowed_topk slices them
        away, and direct callers must too.
    """
    n, dim = corpus.shape
    if queries.shape[0] % 8:
        queries = jnp.pad(
            queries, ((0, -queries.shape[0] % 8), (0, 0))
        )
    batch = queries.shape[0]
    if n % tile_rows != 0:
        raise ValueError(f"corpus rows {n} not a multiple of tile_rows {tile_rows}")
    if tile_rows % window != 0:
        raise ValueError(f"tile_rows {tile_rows} not a multiple of window {window}")
    num_tiles = n // tile_rows

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((batch, dim), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_rows, dim), lambda j, *_: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (tile_rows, batch), lambda j, *_: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_rows // window, batch),
                lambda j, *_: (j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )
    kernel = _fused_kernel(window, tile_rows)
    scores_t, wmax_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, batch), jnp.float32),
            jax.ShapeDtypeStruct((n // window, batch), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * batch * dim,
            bytes_accessed=n * dim * corpus.dtype.itemsize
            + n * batch * 4
            + (n // window) * batch * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(n_valid, dtype=jnp.int32).reshape(1),
        queries.astype(corpus.dtype),
        corpus,
    )
    return scores_t, wmax_t


# Inner products of L2-normalized rows lie in [-1, 1]; shifting by +3 maps
# them into [2, 4), a single f32 binade where (a) every value is positive,
# so float ordering equals integer-bit ordering, and (b) the low mantissa
# bits are a uniform absolute quantum (2^-22 * 2 per ulp).
_PACK_SHIFT = 3.0
# Guard against UNNORMALIZED inputs: a raw inner product <= -3 would shift
# negative, where float bit order inverts under max and the zero-initialized
# carry would silently beat every real candidate. Clamping to a tiny positive
# floor makes such scores tie at the bottom (correct-enough degradation) and
# keeps them strictly above pad rows' packed 0.0.
_PACK_FLOOR = 1e-30


def _dot_precision(dtype) -> lax.Precision:
    """HIGHEST for f32 corpora (FAISS-flat score parity — the TPU default
    would round multiplicands to bf16); MXU-native DEFAULT otherwise."""
    return (
        lax.Precision.HIGHEST if dtype == jnp.float32 else lax.Precision.DEFAULT
    )


def _accumulate_packed(
    j, scores, n_valid_ref, packed_acc, *, tile_rows, supertile, low_mask
):
    """Shared bin-max carry update: mask pad rows, shift+clamp, steal the
    low mantissa bits for the super-tile id, and fold this tile into the
    resident [bins, B] carry. ONE definition for the f32/int8/pipelined
    kernels so packing semantics (incl. the steal-bits ceiling-division fix
    and the unnormalized-input floor) cannot drift between them."""
    batch = scores.shape[1]
    row = j * tile_rows + lax.broadcasted_iota(
        jnp.int32, (tile_rows, batch), 0
    )
    shifted = jnp.where(
        row < n_valid_ref[0],
        jnp.maximum(scores + _PACK_SHIFT, _PACK_FLOOR),
        0.0,
    )
    bits = lax.bitcast_convert_type(shifted, jnp.int32)
    packed = lax.bitcast_convert_type(
        (bits & ~low_mask) | (j // supertile), jnp.float32
    )
    sl = pl.ds(lax.rem(j, supertile) * tile_rows, tile_rows)
    packed_acc[sl, :] = jnp.maximum(packed_acc[sl, :], packed)


def _unpack_topk(
    packed, *, k, steal_bits, bins, exact_epilogue, recall_target, real_batch
):
    """Shared epilogue: select over the [B, bins] packed carry, then strip
    the stolen provenance bits back out. Packed-float ordering == score
    ordering (all positive, one binade), so selection runs directly on the
    packed values and unpacking is elementwise — no provenance gather."""
    packed_t = packed.T  # [B, bins]
    if exact_epilogue:
        top_packed, bin_pos = lax.top_k(packed_t, k)
    else:
        top_packed, bin_pos = lax.approx_max_k(
            packed_t, k, recall_target=recall_target
        )
        bin_pos = bin_pos.astype(jnp.int32)
    bits = lax.bitcast_convert_type(top_packed, jnp.int32)
    low_mask = (1 << steal_bits) - 1
    winner_supertile = bits & low_mask
    top_scores = (
        lax.bitcast_convert_type(bits & ~low_mask, jnp.float32) - _PACK_SHIFT
    )
    rows = winner_supertile * bins + bin_pos
    return top_scores[:real_batch], rows[:real_batch].astype(jnp.int32)


def _bin_topk_kernel(tile_rows: int, bins: int, steal_bits: int):
    """Fused matmul + bin-max partial top-k with packed provenance.

    Per query, the carry is the max over each of `bins` interleaved corpus
    subsets — held in ONE f32 VMEM scratch array resident across the
    sequential grid. Provenance rides inside the score: the shifted score's
    low `steal_bits` mantissa bits are replaced by the super-tile id
    (bin b's winner in super-tile p is global row p*bins + b), so the
    epilogue needs no index gather at all. The packing error is
    2^steal_bits ulps of [2,4) (~6e-5 for 7 bits) — far below the bf16
    input noise floor. Pad rows become packed 0.0 and can never win.

    Global row r maps to bin r % bins; tiles are contiguous, so each grid
    step updates one contiguous [tile_rows] slice with a single elementwise
    max — no sort, no gather, O(N*B) VPU work fused into the MXU pass. The
    [N, B] score tensor never exists in HBM; outputs flush once.
    """
    supertile = bins // tile_rows
    low_mask = (1 << steal_bits) - 1

    def kernel(n_valid_ref, q_ref, tile_ref, packed_out, packed_acc):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            packed_acc[:] = jnp.zeros_like(packed_acc)

        scores = lax.dot_general(
            tile_ref[:],
            q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(tile_ref.dtype),
        )
        _accumulate_packed(
            j, scores, n_valid_ref, packed_acc,
            tile_rows=tile_rows, supertile=supertile, low_mask=low_mask,
        )

        @pl.when(j == pl.num_programs(0) - 1)
        def _flush():
            packed_out[:] = packed_acc[:]

    return kernel


def _bin_topk_kernel_int8(tile_rows: int, bins: int, steal_bits: int):
    """Int8 variant of _bin_topk_kernel: the matmul runs on the MXU's int8
    path with int32 accumulation (half bfloat16's HBM traffic), scores are
    calibrated in-kernel (per-row corpus scale x per-query scale) back to
    true inner products, then shifted/packed exactly like the f32 kernel.
    """
    supertile = bins // tile_rows
    low_mask = (1 << steal_bits) - 1

    def kernel(
        n_valid_ref, q_scales_ref, q_ref, tile_ref, scales_ref,
        packed_out, packed_acc,
    ):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            packed_acc[:] = jnp.zeros_like(packed_acc)

        raw = lax.dot_general(
            tile_ref[:],
            q_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scores = (
            raw.astype(jnp.float32)
            * scales_ref[:]  # [tile_rows, 1] corpus row scales
            * q_scales_ref[:]  # [1, batch] query scales
        )
        _accumulate_packed(
            j, scores, n_valid_ref, packed_acc,
            tile_rows=tile_rows, supertile=supertile, low_mask=low_mask,
        )

        @pl.when(j == pl.num_programs(0) - 1)
        def _flush():
            packed_out[:] = packed_acc[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "bins", "tile_rows", "recall_target", "exact_epilogue", "interpret"
    ),
)
def pallas_bin_topk_int8(
    queries: jnp.ndarray,
    corpus_codes: jnp.ndarray,
    corpus_scales: jnp.ndarray,
    n_valid: jnp.ndarray,
    *,
    k: int,
    bins: int = 8192,
    tile_rows: int = 512,
    recall_target: float = 0.95,
    exact_epilogue: bool = False,
    interpret: bool = False,
):
    """Fused-selection top-k over an int8-quantized corpus (ops/quant.py
    row quantization). Same contract and approximation semantics as
    pallas_bin_topk; scores are calibrated inner products.
    """
    from lean_explore_tpu.ops.quant import _quantize_rows_device

    n, dim = corpus_codes.shape
    real_batch = queries.shape[0]
    if real_batch % 8:  # Mosaic matvec-lowering bug at tiny B; see f32 twin
        queries = jnp.pad(queries, ((0, -real_batch % 8), (0, 0)))
    batch = queries.shape[0]
    if n % tile_rows != 0:
        raise ValueError(f"corpus rows {n} not a multiple of tile_rows {tile_rows}")
    if bins % tile_rows != 0:
        raise ValueError(f"bins {bins} not a multiple of tile_rows {tile_rows}")
    if k > bins:
        raise ValueError(f"k={k} exceeds bins={bins}")
    num_tiles = n // tile_rows
    # Ceiling division: a partial final super-tile still carries id
    # ceil(n/bins)-1, which must fit in the stolen bits (floor division
    # overflowed it whenever n % bins != 0 and n // bins was a power of two).
    n_supertiles = max(-(-n // bins), 1)
    steal_bits = max(int(n_supertiles - 1).bit_length(), 1)

    q_codes, q_scales = _quantize_rows_device(queries.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, batch), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((batch, dim), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_rows, dim), lambda j, *_: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_rows, 1), lambda j, *_: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (bins, batch), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((bins, batch), jnp.float32),
        ],
    )
    packed = pl.pallas_call(
        _bin_topk_kernel_int8(tile_rows, bins, steal_bits),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bins, batch), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * batch * dim,
            bytes_accessed=n * dim + bins * batch * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(n_valid, dtype=jnp.int32).reshape(1),
        q_scales.reshape(1, batch),
        q_codes,
        corpus_codes,
        corpus_scales.astype(jnp.float32).reshape(n, 1),
    )[0]

    return _unpack_topk(
        packed, k=k, steal_bits=steal_bits, bins=bins,
        exact_epilogue=exact_epilogue, recall_target=recall_target,
        real_batch=real_batch,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "bins", "tile_rows", "recall_target", "exact_epilogue", "interpret"
    ),
)
def pallas_bin_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    n_valid: jnp.ndarray,
    *,
    k: int,
    bins: int = 8192,
    tile_rows: int = 512,
    recall_target: float = 0.95,
    exact_epilogue: bool = False,
    interpret: bool = False,
):
    """Fused-selection top-k: one pass over the corpus, tiny epilogue.

    Same contract as ops.dense.dense_topk (scores [B, k] f32 desc, idx
    [B, k] i32 < n_valid). Approximate with the same bin-survivorship
    semantics as lax.approx_max_k: a top-k element is lost only when a
    better element shares its bin (probability < k/bins per element, and
    ~(10/bins) for the top-10 head, so recall@10 stays ~1.0). Returned
    scores carry the provenance-packing quantization (the low
    ceil(log2(N/bins)) mantissa bits of score+3.0, ~1e-4 absolute) — far
    below the bf16 corpus quantization already accepted on this path.

    Args:
        queries: [B, D]; cast to the corpus dtype for the MXU feed.
        corpus: [N, D] with N % tile_rows == 0 (ops.dense.pad_rows).
        n_valid: scalar int32 count of real rows.
        k: pool size (<= bins).
        bins: candidate bins per query; VMEM cost is 2*bins*B*4 bytes
            (packed f32 scratch + output block): 8192 fits comfortably at
            B=128 on a 16MB-VMEM core.
        tile_rows: corpus rows per grid step (bins % tile_rows == 0).
        recall_target: epilogue approx_max_k target over the [B, bins] carry.
        exact_epilogue: use exact lax.top_k over the carry (parity tests).
        interpret: Pallas interpreter mode (CPU tests).
    """
    n, dim = corpus.shape
    real_batch = queries.shape[0]
    # Tiny query batches trip a Mosaic matvec-lowering bug (bf16 dot_general
    # at B=1 fails verification) and underfill the lane axis anyway; pad the
    # batch to a multiple of 8 and slice the outputs back.
    if real_batch % 8:
        queries = jnp.pad(queries, ((0, -real_batch % 8), (0, 0)))
    batch = queries.shape[0]
    if n % tile_rows != 0:
        raise ValueError(f"corpus rows {n} not a multiple of tile_rows {tile_rows}")
    if bins % tile_rows != 0:
        raise ValueError(f"bins {bins} not a multiple of tile_rows {tile_rows}")
    if k > bins:
        raise ValueError(f"k={k} exceeds bins={bins}")
    num_tiles = n // tile_rows
    # Ceiling division: a partial final super-tile still carries id
    # ceil(n/bins)-1, which must fit in the stolen bits (floor division
    # overflowed it whenever n % bins != 0 and n // bins was a power of two).
    n_supertiles = max(-(-n // bins), 1)
    steal_bits = max(int(n_supertiles - 1).bit_length(), 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((batch, dim), lambda j, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_rows, dim), lambda j, *_: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (bins, batch), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((bins, batch), jnp.float32),
        ],
    )
    packed = pl.pallas_call(
        _bin_topk_kernel(tile_rows, bins, steal_bits),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bins, batch), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * batch * dim,
            bytes_accessed=n * dim * corpus.dtype.itemsize + bins * batch * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        jnp.asarray(n_valid, dtype=jnp.int32).reshape(1),
        queries.astype(corpus.dtype),
        corpus,
    )[0]

    return _unpack_topk(
        packed, k=k, steal_bits=steal_bits, bins=bins,
        exact_epilogue=exact_epilogue, recall_target=recall_target,
        real_batch=real_batch,
    )


def _bin_topk_pipelined_kernel(
    tile_rows: int, bins: int, steal_bits: int, num_tiles: int, n_buffers: int
):
    """Manually double-buffered twin of _bin_topk_kernel.

    MEASURED NEGATIVE, kept as the experiment that settles the floor-gap
    question: streaming the corpus through `n_buffers` explicit
    make_async_copy slots is bit-identical to the auto-pipelined grid
    kernel and EXACTLY as fast (1.37-1.40 ms vs 1.37 ms at config 3,
    across n_buffers 2/3/4 and tile_rows 512/1024). The grid pipeline was
    already overlapping DMA with compute; the pass is bound by the
    memory system's effective streaming bandwidth (~458 GB/s observed for
    this pattern vs the 819 GB/s spec sheet), not by pipelining. The
    remaining bandwidth lever is smaller bytes — the int8 corpus path.
    """
    supertile = bins // tile_rows
    low_mask = (1 << steal_bits) - 1

    def kernel(
        n_valid_ref, q_ref, corpus_hbm, packed_out, tiles_vmem, carry, sems
    ):
        carry[:] = jnp.zeros_like(carry)

        def tile_dma(slot, idx):
            return pltpu.make_async_copy(
                corpus_hbm.at[pl.ds(idx * tile_rows, tile_rows)],
                tiles_vmem.at[slot],
                sems.at[slot],
            )

        for slot in range(min(n_buffers - 1, num_tiles)):
            tile_dma(slot, slot).start()

        def body(j, _):
            slot = lax.rem(j, n_buffers)

            @pl.when(j + n_buffers - 1 < num_tiles)
            def _():
                tile_dma(
                    lax.rem(j + n_buffers - 1, n_buffers), j + n_buffers - 1
                ).start()

            tile_dma(slot, j).wait()
            scores = lax.dot_general(
                tiles_vmem[slot],
                q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(tiles_vmem.dtype),
            )
            _accumulate_packed(
                j, scores, n_valid_ref, carry,
                tile_rows=tile_rows, supertile=supertile, low_mask=low_mask,
            )
            return 0

        lax.fori_loop(0, num_tiles, body, 0)
        packed_out[:] = carry[:]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "bins", "tile_rows", "n_buffers", "recall_target",
        "exact_epilogue",
    ),
)
def pallas_bin_topk_pipelined(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    n_valid: jnp.ndarray,
    *,
    k: int,
    bins: int = 4096,
    tile_rows: int = 512,
    n_buffers: int = 3,
    recall_target: float = 0.95,
    exact_epilogue: bool = False,
):
    """pallas_bin_topk with manual DMA double/triple buffering.

    Same contract and packing semantics as pallas_bin_topk (shared unpack
    epilogue); the corpus stays in HBM (pltpu.ANY) and streams through
    VMEM slots driven by explicit async copies. TPU-only (no interpret
    mode — manual DMA semantics are not modeled by the interpreter; parity
    tests run on hardware via bench/TPU-marked tests).
    """
    n, dim = corpus.shape
    real_batch = queries.shape[0]
    if real_batch % 8:
        queries = jnp.pad(queries, ((0, -real_batch % 8), (0, 0)))
    batch = queries.shape[0]
    if n % tile_rows != 0:
        raise ValueError(f"corpus rows {n} not a multiple of tile_rows {tile_rows}")
    if bins % tile_rows != 0:
        raise ValueError(f"bins {bins} not a multiple of tile_rows {tile_rows}")
    if k > bins:
        raise ValueError(f"k={k} exceeds bins={bins}")
    num_tiles = n // tile_rows
    n_supertiles = max(-(-n // bins), 1)
    steal_bits = max(int(n_supertiles - 1).bit_length(), 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(
                (batch, dim), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # corpus stays in HBM
        ],
        out_specs=[
            pl.BlockSpec(
                (bins, batch), lambda j, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_buffers, tile_rows, dim), corpus.dtype),
            pltpu.VMEM((bins, batch), jnp.float32),
            pltpu.SemaphoreType.DMA((n_buffers,)),
        ],
    )
    packed = pl.pallas_call(
        _bin_topk_pipelined_kernel(
            tile_rows, bins, steal_bits, num_tiles, n_buffers
        ),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bins, batch), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * batch * dim,
            bytes_accessed=n * dim * corpus.dtype.itemsize + bins * batch * 4,
            transcendentals=0,
        ),
    )(
        jnp.asarray(n_valid, dtype=jnp.int32).reshape(1),
        queries.astype(corpus.dtype),
        corpus,
    )[0]

    return _unpack_topk(
        packed, k=k, steal_bits=steal_bits, bins=bins,
        exact_epilogue=exact_epilogue, recall_target=recall_target,
        real_batch=real_batch,
    )


@functools.partial(
    jax.jit, static_argnames=("k", "window", "tile_rows", "interpret")
)
def pallas_windowed_topk(
    queries: jnp.ndarray,
    corpus: jnp.ndarray,
    n_valid: jnp.ndarray,
    *,
    k: int,
    window: int = 8,
    tile_rows: int = 1024,
    interpret: bool = False,
):
    """Exact top-k built on the fused kernel.

    Same contract as ops.dense.dense_topk: (scores [B, k] f32, idx [B, k] i32),
    descending, indices < n_valid for k <= n_valid.
    """
    real_batch = queries.shape[0]
    scores_t, wmax_t = fused_scores_wmax(
        queries,
        corpus,
        n_valid,
        window=window,
        tile_rows=tile_rows,
        interpret=interpret,
    )
    batch = scores_t.shape[1]  # fused pads B to a multiple of 8
    _, win_idx = lax.top_k(wmax_t.T, k)  # [B_pad, k]
    member = (
        win_idx[:, :, None] * window
        + lax.broadcasted_iota(jnp.int32, (1, 1, window), 2)
    ).reshape(batch, k * window)
    gathered = jnp.take_along_axis(scores_t, member.T, axis=0).T
    out_scores, pos = lax.top_k(gathered, k)
    out_idx = jnp.take_along_axis(member, pos, axis=1)
    return out_scores[:real_batch], out_idx[:real_batch]
