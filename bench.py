"""Benchmark: batched dense retrieval at Mathlib scale on real TPU.

BASELINE config 3: ~300k-declaration corpus (synthetic embeddings at the
exact serving geometry: 1024-d, L2-normalized), 128-query batches, k=1000
(the engine's faiss_k default). Prints ONE JSON line:

    {"metric": ..., "value": QPS, "unit": "queries/sec", "vs_baseline": x}

vs_baseline = TPU QPS / estimated faiss-cpu IVF QPS on this host. faiss is
not installable here (zero egress; see PARITY.md), so the baseline is an
exact numpy scan (matmul + argpartition) scaled by the fraction of the
corpus the reference's IVF configuration actually scans: nprobe=64 of
nlist=max(256, sqrt(N)) cells (reference extract/index.py:95-104,
engine.py:247-249), plus the nlist-probe quantizer matmul. The raw
exact-scan comparison is reported alongside as vs_exact_cpu_scan — it is
the larger, *less* honest number (the reference never serves an exact
scan). recall@10 of the bfloat16 serving path is measured against a float32
HIGHEST-precision exact search computed on device in the same line.

Environment notes (axon relay): host<->device transfers ride a tunnel with
~0.5s per-dispatch RPC latency, highly variable bulk bandwidth, and
memoization of identical repeat executions. The benchmark is therefore
designed to be tunnel-proof: all tensors are GENERATED ON DEVICE
(jax.random), distinct query batches are chained inside one executable
(lax.map) so the RPC amortizes, and only scalar results cross the tunnel.

Env overrides: BENCH_N, BENCH_B, BENCH_K, BENCH_DIM, BENCH_DTYPE,
BENCH_ITERS, BENCH_DISPATCHES, BENCH_METHOD, BENCH_CPU_N (baseline corpus
rows; scaled up to full N).
"""

import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_model_forward(mode: str) -> None:
    """BENCH_MODE=encode|rerank: Qwen3-0.6B-geometry forward throughput
    (hot loop #2, reference reranker_client.py:110-141). Random bf16
    weights at the real architecture; distinct inputs per rep."""
    import time

    import jax
    import jax.numpy as jnp

    from lean_explore_tpu.models import qwen3

    batch = int(os.environ.get("BENCH_B", 64))
    seq = int(os.environ.get("BENCH_T", 512 if mode == "encode" else 256))
    reps = int(os.environ.get("BENCH_DISPATCHES", 3))

    config = qwen3.Qwen3Config(
        vocab_size=151_936,
        hidden_size=1024,
        num_hidden_layers=28,
        num_attention_heads=16,
        num_key_value_heads=8,
        head_dim=128,
        intermediate_size=3072,
    )
    params = jax.device_put(
        qwen3.init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )
    fused = os.environ.get("BENCH_FUSED_QKV", "0") == "1"
    if fused:
        params = qwen3.fuse_params_for_serving(params)
    int8 = os.environ.get("BENCH_INT8", "0") == "1"
    if int8:
        params = qwen3.quantize_params_int8(params)
    jax.block_until_ready(params)
    log(
        f"0.6B params placed; mode={mode} B={batch} T={seq} "
        f"int8={int8} fused_qkv={fused}"
    )

    def make_inputs(i):
        ids = jax.random.randint(
            jax.random.PRNGKey(100 + i),
            (batch, seq),
            1,
            config.vocab_size,
            dtype=jnp.int32,
        )
        return ids, jnp.ones((batch, seq), jnp.int32)

    if mode == "encode":
        fn = lambda ids, mask: qwen3.embed_pool(params, config, ids, mask)
    else:
        fn = lambda ids, mask: qwen3.rerank_scores(
            params, config, ids, mask, token_true=5, token_false=6
        )

    inputs = [make_inputs(i) for i in range(reps + 1)]
    jax.block_until_ready(inputs)
    float(fn(*inputs[0]).sum())  # compile
    t0 = time.perf_counter()
    for i in range(reps):
        float(fn(*inputs[i + 1]).sum())
    elapsed = (time.perf_counter() - t0) / reps
    throughput = batch / elapsed

    # MFU accounting: trunk GEMM FLOPs (the attention score/value products
    # and the single-position LM head are counted too) over the v5e bf16
    # peak. Attention is counted as the FULL [T, T] masked matmul — that is
    # what the einsum path executes (the causal mask is additive bias, not a
    # skipped computation), so this measures hardware utilization of the ops
    # actually issued. A causal "model FLOPs" convention would halve the
    # attention term. Elementwise work (RMSNorm/RoPE/softmax/SiLU) is
    # excluded, as is padding waste.
    h, dh = config.hidden_size, config.head_dim
    nq, nkv, inter = (
        config.num_attention_heads,
        config.num_key_value_heads,
        config.intermediate_size,
    )
    gemm_per_token = 2 * h * (nq * dh + 2 * nkv * dh + nq * dh + 3 * inter)
    attn_per_token = 2 * 2 * nq * dh * seq  # QK^T + PV over all T keys
    flops_per_token = config.num_hidden_layers * (
        gemm_per_token + attn_per_token
    )
    total_flops = batch * seq * flops_per_token
    if mode != "encode":
        # Last-position pair logits: rerank_scores reads only the two
        # scored vocabulary columns (_pair_logits), NOT the full [H, V]
        # head — count exactly what the device executes.
        total_flops += 2 * batch * h * 2
    v5e_peak = 197e12  # bf16 FLOP/s per chip
    mfu = total_flops / elapsed / v5e_peak
    print(
        json.dumps(
            {
                "metric": f"qwen3_0.6b_{mode}_b{batch}_t{seq}_"
                + ("int8" if int8 else "bf16")
                + ("_fusedqkv" if fused else ""),
                "value": round(throughput, 2),
                "unit": "texts/sec" if mode == "encode" else "pairs/sec",
                "vs_baseline": None,
                "batch_latency_ms": round(elapsed * 1000, 2),
                "model_tflops": round(total_flops / 1e12, 2),
                "achieved_tflops_per_s": round(total_flops / elapsed / 1e12, 1),
                "mfu_vs_v5e_bf16_peak": round(mfu, 3),
                "platform": jax.devices()[0].platform,
            }
        )
    )


def bench_forward_anatomy() -> None:
    """BENCH_MODE=anatomy: itemize the trunk forward's non-GEMM cost.

    Round-3 verdict: the 31.8% serving MFU was explained as "VPU-bound"
    without an itemized split. This mode measures it by ablation at the
    0.6B geometry: each variant removes ONE op family (RMSNorm, RoPE,
    softmax, SiLU) while keeping every matmul, so full - variant ~= that
    family's wall-clock share (XLA refuses nothing here: ablated graphs
    are strictly smaller). BENCH_T picks the regime: 32 = serving
    queries, 128 = production-length rerank suffixes.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lean_explore_tpu.models import qwen3

    batch = int(os.environ.get("BENCH_B", 64))
    seq = int(os.environ.get("BENCH_T", 128))
    reps = int(os.environ.get("BENCH_DISPATCHES", 3))
    config = _qwen06b_config()
    params = jax.device_put(
        qwen3.init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )
    jax.block_until_ready(params)
    log(f"anatomy at B={batch} T={seq} (0.6B bf16)")

    nq, nkv, dh = (
        config.num_attention_heads,
        config.num_key_value_heads,
        config.head_dim,
    )
    eps = config.rms_norm_eps

    def forward(params, ids, mask, *, norm=True, rope=True, softmax=True,
                silu=True):
        # params is an ARGUMENT (not a closure capture): captured device
        # arrays become jaxpr constants and send XLA constant handling
        # through the 0.6B weights, inflating compile time enormously.
        b, t = ids.shape
        x = jnp.take(params["embed"], ids, axis=0)
        cos, sin = qwen3._rope_tables(config, t)
        causal = jnp.tril(jnp.ones((t, t), dtype=bool))
        valid = mask.astype(bool)[:, None, None, :]
        bias = jnp.where(causal[None, None] & valid, 0.0, -1e9).astype(
            jnp.float32
        )

        def rms(v, w):
            return qwen3._rms_norm(v, w, eps) if norm else v * 1.0

        def layer(x, p):
            h = rms(x, p["input_norm"])
            q = (h @ p["q_proj"]).reshape(b, t, nq, dh)
            k = (h @ p["k_proj"]).reshape(b, t, nkv, dh)
            v = (h @ p["v_proj"]).reshape(b, t, nkv, dh)
            q, k = rms(q, p["q_norm"]), rms(k, p["k_norm"])
            if rope:
                q = qwen3._apply_rope(q, cos, sin)
                k = qwen3._apply_rope(k, cos, sin)
            group = nq // nkv
            qg = q.reshape(b, t, nkv, group, dh)
            scores = jnp.einsum(
                "btkgd,bskd->bkgts", qg, k,
                preferred_element_type=jnp.float32,
            ) * (dh**-0.5)
            scores = scores + bias[:, :, None, :, :]
            if softmax:
                probs = jax.nn.softmax(
                    scores.astype(jnp.float32), axis=-1
                ).astype(q.dtype)
            else:
                probs = (scores * (1.0 / t)).astype(q.dtype)
            attn = jnp.einsum("bkgts,bskd->btkgd", probs, v).reshape(
                b, t, nq * dh
            )
            x = x + attn @ p["o_proj"]
            h = rms(x, p["post_norm"])
            gate = h @ p["gate_proj"]
            act = jax.nn.silu(gate) if silu else gate
            mlp = (act * (h @ p["up_proj"])) @ p["down_proj"]
            return x + mlp, None

        x, _ = lax.scan(layer, x, params["layers"])
        return rms(x, params["final_norm"]).sum()

    variants = {
        "full": {},
        "no_rmsnorm": {"norm": False},
        "no_rope": {"rope": False},
        "no_softmax": {"softmax": False},
        "no_silu": {"silu": False},
        "gemm_only": {
            "norm": False, "rope": False, "softmax": False, "silu": False
        },
    }
    ids = jax.random.randint(
        jax.random.PRNGKey(1), (reps + 1, batch, seq), 1, config.vocab_size,
        dtype=jnp.int32,
    )
    mask = jnp.ones((batch, seq), jnp.int32)
    rows = {}
    for name, kw in variants.items():
        fn = jax.jit(lambda p, i, m, kw=kw: forward(p, i, m, **kw))
        t0 = time.perf_counter()
        float(fn(params, ids[0], mask))  # compile
        log(f"{name}: compiled in {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for r in range(reps):
            float(fn(params, ids[r + 1], mask))
        rows[name] = (time.perf_counter() - t0) / reps * 1000.0
        log(f"{name}: {rows[name]:.1f} ms")

    full = rows["full"]
    print(
        json.dumps(
            {
                "metric": f"forward_anatomy_b{batch}_t{seq}_bf16",
                "value": round(full, 2),
                "unit": "ms/batch (full forward)",
                "vs_baseline": None,
                "variants_ms": {k: round(v, 2) for k, v in rows.items()},
                "op_cost_ms": {
                    k.removeprefix("no_"): round(full - v, 2)
                    for k, v in rows.items()
                    if k.startswith("no_")
                },
                "gemm_only_ms": round(rows["gemm_only"], 2),
                "platform": jax.devices()[0].platform,
            }
        )
    )


def _synthetic_name(i: int, words: list) -> str:
    return f"Pkg{i % 7}.ns{i % 53}.{words[i % 3000]}{i}"


def _make_synthetic_store(db_path: str, n: int, *, informal_words: int = 0,
                          embeddings=None):
    """Shared synthetic corpus for the fusion/pipeline benches.

    Dependencies reference the ACTUAL names of declarations i+1..i+3 (the
    earlier per-mode copies suffixed deps with i-j, so no dependency ever
    resolved and the benchmarked dependency-boost stage ran on an empty
    graph). Returns (store, words, names).
    """
    from lean_explore_tpu.models import Declaration, DeclarationStore

    words = [f"w{i}" for i in range(3000)]
    store = DeclarationStore(db_path, create=True)
    rows, names = [], []
    for i in range(n):
        name = _synthetic_name(i, words)
        names.append(name)
        deps = (
            json.dumps(
                [_synthetic_name(i + j, words) for j in range(1, i % 4 + 1)]
            )
            if i % 3
            else None
        )
        rows.append(
            Declaration(
                name=name,
                module=f"Pkg{i % 7}.Mod{i % 101}",
                source_text=f"def {name} := x{i}",
                source_link=f"https://example/{i}",
                dependencies=deps,
                # informal_words pads informalizations toward production
                # length (Mathlib informalizations run 50-100 tokens; the
                # short default is the round-1/2 geometry).
                informalization=(
                    f"**Thing {i}.** does {words[i % 3000]} "
                    f"{words[(i * 7) % 3000]} stuff {i % 200}"
                    + "".join(
                        f" {words[(i * 11 + j) % 3000]}"
                        for j in range(informal_words)
                    )
                ),
                informalization_embedding=(
                    embeddings[i].tolist() if embeddings is not None else None
                ),
            )
        )
        if len(rows) == 10_000:
            store.insert_many(rows)
            rows = []
    if rows:
        store.insert_many(rows)
    return store, words, names


def bench_fusion_pipeline() -> None:
    """BENCH_MODE=fusion: the full hybrid serving pipeline minus model
    forwards (BM25 spaced+raw retrieve -> dense candidate pool -> RRF ->
    dependency boost with sqlite hydration -> package filter). Measures the
    host+fusion overhead that surrounds the model/matmul hot loops."""
    import asyncio
    import tempfile
    import time

    import numpy as np

    from lean_explore_tpu.index import build_index_artifacts
    from lean_explore_tpu.models import Declaration, DeclarationStore
    from lean_explore_tpu.search.engine import SearchEngine

    n = int(os.environ.get("BENCH_N", 100_000))
    batch = int(os.environ.get("BENCH_B", 128))
    dim = int(os.environ.get("BENCH_DIM", 1024))
    reps = int(os.environ.get("BENCH_DISPATCHES", 3))

    rng = np.random.default_rng(0)
    log(f"building synthetic artifact set: {n} declarations ...")
    tmp = tempfile.mkdtemp(prefix="bench_fusion_")
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    store, words, _ = _make_synthetic_store(
        f"{tmp}/declarations.db", n, embeddings=vecs
    )
    build_index_artifacts(store, tmp)
    log("artifacts built")

    class RandomEmbedder:
        async def embed(self, texts, is_query=False):
            from lean_explore_tpu.util.embedding_client import EmbeddingResponse

            out = rng.standard_normal((len(texts), dim)).astype(np.float32)
            return EmbeddingResponse(
                texts=list(texts), embeddings=out.tolist(), model="bench"
            )

    engine = SearchEngine(
        tmp,
        store=store,
        embedding_client=RandomEmbedder(),
        reranker_client=None,
        preload_metadata=os.environ.get("BENCH_PRELOAD", "1") == "1",
    )
    queries = [f"{words[i % 3000]} nat thing {i % 97}" for i in range(batch)]

    async def run_batch():
        return await engine.search_batch(queries, rerank_top=0, limit=20)

    asyncio.run(run_batch())  # warm (compiles dense program)
    t0 = time.perf_counter()
    for _ in range(reps):
        asyncio.run(run_batch())
    elapsed = (time.perf_counter() - t0) / reps
    qps = batch / elapsed
    import jax

    print(
        json.dumps(
            {
                "metric": f"hybrid_fusion_pipeline_qps_n{n}_b{batch}_norerank",
                "value": round(qps, 2),
                "unit": "queries/sec",
                "vs_baseline": None,
                "batch_latency_ms": round(elapsed * 1000, 2),
                "platform": jax.devices()[0].platform,
            }
        )
    )


def _make_bench_tokenizer(tmp_dir: str):
    """Word-level tokenizer over the bench vocabulary (incl. true/false)."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    vocab = {"<pad>": 0, "<unk>": 1, "<eos>": 2, "true": 3, "false": 4}
    for i in range(3000):
        vocab[f"w{i}"] = len(vocab)
    for w in (
        "instruct", "given", "a", "web", "search", "query", "retrieve",
        "relevant", "passages", "that", "answer", "the", "find", "lean",
        "math", "declarations", "nat", "thing", "does", "stuff", ":", ".",
        "<", ">", "**", "4",
    ):
        vocab.setdefault(w, len(vocab))
    for i in range(200):
        vocab.setdefault(str(i), len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(f"{tmp_dir}/tokenizer.json")
    return PreTrainedTokenizerFast(
        tokenizer_file=f"{tmp_dir}/tokenizer.json",
        pad_token="<pad>",
        eos_token="<eos>",
        unk_token="<unk>",
    )


def _qwen06b_config():
    from lean_explore_tpu.models import qwen3

    return qwen3.Qwen3Config(
        vocab_size=4096,  # bench tokenizer vocab; embed table row count only
        hidden_size=1024,
        num_hidden_layers=28,
        num_attention_heads=16,
        num_key_value_heads=8,
        head_dim=128,
        intermediate_size=3072,
    )


def bench_full_pipeline() -> None:
    """BENCH_MODE=pipeline: BASELINE config 4 — the reference's full local
    hot path (engine.py:534-606) end-to-end: encode -> dense + BM25 ->
    RRF -> dependency boost -> cross-encoder rerank (top 50) -> final
    fusion, through the REAL engine and REAL clients at the real 0.6B
    geometry (random bf16 weights). Reports QPS, per-stage timings, and an
    honest torch-CPU estimate of the same per-query work (the reference's
    actual runtime) measured with the installed transformers stack."""
    import asyncio
    import tempfile
    import time

    import jax
    import jax.numpy as jnp

    from lean_explore_tpu.index import IndexArtifacts
    from lean_explore_tpu.index.artifacts import build_bm25_name_indices
    from lean_explore_tpu.index.dense import DenseIndex
    from lean_explore_tpu.models import Declaration, DeclarationStore, qwen3
    from lean_explore_tpu.ops import l2_normalize
    from lean_explore_tpu.search.engine import SearchEngine
    from lean_explore_tpu.util.embedding_client import EmbeddingClient
    from lean_explore_tpu.util.profiling import StageTimings
    from lean_explore_tpu.util.reranker_client import RerankerClient

    n = int(os.environ.get("BENCH_N", 300_000))
    batch = int(os.environ.get("BENCH_B", 128))
    rerank_top = int(os.environ.get("BENCH_RERANK_TOP", 50))
    reps = int(os.environ.get("BENCH_DISPATCHES", 2))
    run_torch = os.environ.get("BENCH_TORCH", "1") == "1"

    tmp = tempfile.mkdtemp(prefix="bench_pipeline_")
    tokenizer = _make_bench_tokenizer(tmp)
    config = _qwen06b_config()

    log("initializing 0.6B-geometry clients (random bf16 weights) ...")
    embed_params = jax.device_put(
        qwen3.init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    )
    rerank_params = jax.device_put(
        qwen3.init_params(config, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
    )
    jax.block_until_ready((embed_params, rerank_params))

    embedder = EmbeddingClient.from_components(
        embed_params,
        config,
        tokenizer,
        model_name="bench-qwen3-0.6b-embed",
        model_dir=tmp,
        max_length=512,
        batch_size=batch,
        query_prompt="instruct : given a web search query retrieve : ",
    )

    rerank_int8 = os.environ.get("BENCH_RERANK_INT8", "0") == "1"
    reranker = RerankerClient.from_components(
        qwen3.quantize_params_int8(rerank_params)
        if rerank_int8
        else rerank_params,
        config,
        tokenizer,
        model_name="bench-qwen3-0.6b-rerank",
        model_dir=tmp,
        max_length=256,
        instruction="find relevant lean 4 math declarations",
        batch_size=int(os.environ.get("BENCH_RERANK_BATCH", 128)),
        int8=rerank_int8,
    )

    # Corpus: metadata rows on host sqlite; dense matrix generated on device
    # (bulk tunnel uploads are pathological; values don't affect throughput).
    log(f"building {n}-row metadata store + on-device dense index ...")
    store, words, names = _make_synthetic_store(
        f"{tmp}/declarations.db",
        n,
        informal_words=int(os.environ.get("BENCH_INFORMAL_WORDS", 0)),
    )

    corpus = jax.jit(
        lambda key: l2_normalize(
            jax.random.normal(key, (n, config.hidden_size), jnp.float32)
        ).astype(jnp.bfloat16)
    )(jax.random.PRNGKey(2))
    jax.block_until_ready(corpus)
    dense = DenseIndex(corpus, np.arange(1, n + 1), normalized=True)
    bm25_spaced, bm25_raw = build_bm25_name_indices(names)
    artifacts = IndexArtifacts(
        dense=dense,
        bm25_spaced=bm25_spaced,
        bm25_raw=bm25_raw,
        bm25_ids=np.arange(1, n + 1),
        manifest={"bench": True},
    )
    engine = SearchEngine(
        tmp,
        store=store,
        artifacts=artifacts,
        embedding_client=embedder,
        reranker_client=reranker,
        preload_metadata=os.environ.get("BENCH_PRELOAD", "1") == "1",
    )
    log("artifacts ready; warming (compiles encode/dense/rerank programs) ...")

    def queries_for(rep):
        return [
            f"{words[(i * 13 + rep * 31) % 3000]} nat thing {(i + rep) % 97}"
            for i in range(batch)
        ]

    bm25_k = int(os.environ.get("BENCH_BM25_K", 1000))

    async def run_batch(qs, timings):
        return await engine.search_batch(
            qs, limit=20, rerank_top=rerank_top, bm25_k=bm25_k,
            timings=timings,
        )

    asyncio.run(run_batch(queries_for(999), StageTimings()))  # warm/compile
    log("warm done; timing ...")
    reps = max(reps, 1)  # BENCH_DISPATCHES=0 would divide by zero below
    stage_totals: dict[str, float] = {}
    t0 = time.perf_counter()
    for rep in range(reps):
        timings = StageTimings()
        results = asyncio.run(run_batch(queries_for(rep), timings))
        for stage, ms in timings.as_dict().items():
            stage_totals[stage] = stage_totals.get(stage, 0.0) + ms
    elapsed = (time.perf_counter() - t0) / reps
    qps = batch / elapsed
    if not all(results):  # not assert: must survive python -O
        raise RuntimeError("pipeline returned empty results")
    stage_ms = {k: round(v / reps, 1) for k, v in stage_totals.items()}
    log(f"stage ms/batch: {stage_ms}")

    cpu_qps = None
    if run_torch:
        # Match the baseline's sequence length to the benchmarked document
        # regime: ~32 tokens for the short default, longer when
        # BENCH_INFORMAL_WORDS pads toward production lengths (a T=32
        # baseline against ~100-token TPU documents would skew vs_baseline).
        informal_words = int(os.environ.get("BENCH_INFORMAL_WORDS", 0))
        baseline_seq = min(256, 32 + int(informal_words * 1.3))
        cpu_qps = _torch_pipeline_baseline(
            tokenizer, batch, rerank_top, seq=baseline_seq
        )

    print(
        json.dumps(
            {
                "metric": f"e2e_hybrid_rerank{rerank_top}_qps_n{n}_b{batch}"
                + ("_rerank-int8" if reranker.int8 else ""),
                "value": round(qps, 2),
                "unit": "queries/sec",
                "vs_baseline": (
                    round(qps / cpu_qps, 2) if cpu_qps else None
                ),
                "baseline": "torch-cpu 0.6B encode+rerank estimate (installed "
                "transformers stack, sequence length matched to the "
                "benchmarked document regime)",
                "batch_latency_ms": round(elapsed * 1000, 1),
                "stage_ms": stage_ms,
                "cpu_estimate_qps": round(cpu_qps, 3) if cpu_qps else None,
                "platform": jax.devices()[0].platform,
            }
        )
    )


def _torch_pipeline_baseline(
    tokenizer, batch: int, rerank_top: int, seq: int = 32
):
    """Per-query torch-CPU cost of the model work the reference does:
    1 query encode + rerank_top cross-encoder pairs, at 0.6B, measured with
    the installed torch/transformers (the reference's runtime) at ``seq``
    tokens per sequence (matched to the benchmarked document regime)."""
    try:
        import torch
        import transformers
    except ImportError:
        return None
    log("torch-CPU baseline: one 0.6B forward (this takes a minute) ...")
    cfg = transformers.Qwen3Config(
        vocab_size=4096,
        hidden_size=1024,
        intermediate_size=3072,
        num_hidden_layers=28,
        num_attention_heads=16,
        num_key_value_heads=8,
        head_dim=128,
        tie_word_embeddings=True,
    )
    with torch.no_grad():
        model = transformers.Qwen3ForCausalLM(cfg).eval()
        ids = torch.randint(5, 3000, (8, seq))
        t0 = time.perf_counter()
        model(input_ids=ids)
        per_pair = (time.perf_counter() - t0) / 8  # seconds per sequence
    # Reference per query: 1 encode forward + rerank_top rerank forwards
    # at the same sequence-length regime as the TPU side above.
    per_query = per_pair * (rerank_top + 1)
    log(
        f"torch-CPU: {per_pair * 1000:.0f} ms/sequence -> "
        f"{1 / per_query:.3f} q/s at rerank_top={rerank_top}"
    )
    return 1.0 / per_query


def main() -> None:
    mode = os.environ.get("BENCH_MODE", "retrieval")
    if mode in ("encode", "rerank"):
        bench_model_forward(mode)
        return
    if mode == "fusion":
        bench_fusion_pipeline()
        return
    if mode == "anatomy":
        bench_forward_anatomy()
        return
    if mode == "pipeline":
        bench_full_pipeline()
        return
    n = int(os.environ.get("BENCH_N", 300_000))
    batch = int(os.environ.get("BENCH_B", 128))
    k = int(os.environ.get("BENCH_K", 1000))
    dim = int(os.environ.get("BENCH_DIM", 1024))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    iters = int(os.environ.get("BENCH_ITERS", 64))
    dispatches = int(os.environ.get("BENCH_DISPATCHES", 3))
    method = os.environ.get("BENCH_METHOD", "fused_pallas")
    cpu_n = int(os.environ.get("BENCH_CPU_N", 75_000))

    import jax
    import jax.numpy as jnp

    from lean_explore_tpu.ops import dense_topk, l2_normalize
    from lean_explore_tpu.ops.dense import _full_topk

    devices = jax.devices()
    log(f"devices: {devices}")

    # ------------------------------------------------------------------
    # All benchmark data is generated on device: no bulk tunnel traffic.
    # ------------------------------------------------------------------
    log(f"generating corpus [{n}, {dim}] and {iters} query batches on device ...")

    # Rows aligned to the kernels' tile multiple so no padding copy happens
    # inside the timed loop (DenseIndex pre-pads the same way at load time).
    padded_n = ((n + 511) // 512) * 512

    # BENCH_ANISO=1: anisotropic corpus — a narrow cone around a shared mean
    # direction, the geometry real text-embedding models produce (pairwise
    # cosines ~0.5-0.9, dense near-ties). Exercises the selection kernels in
    # the regime the round-1 verdict flagged as unmeasured; isotropic
    # Gaussian remains the default for continuity with prior rounds.
    aniso = os.environ.get("BENCH_ANISO", "0") == "1"

    @jax.jit
    def gen_corpus(key):
        g = jax.random.normal(key, (padded_n, dim), jnp.float32)
        if aniso:
            mean_dir = l2_normalize(
                jax.random.normal(jax.random.PRNGKey(42), (1, dim), jnp.float32)
            )
            g = mean_dir + 0.35 * g
        c = l2_normalize(g)
        row = jax.lax.broadcasted_iota(jnp.int32, (padded_n, 1), 0)
        return jnp.where(row < n, c, 0.0)

    @jax.jit
    def gen_queries(key):
        q = jax.random.normal(key, (iters, batch, dim), dtype=jnp.float32)
        if aniso:  # queries live in the same cone as the corpus
            mean_dir = l2_normalize(
                jax.random.normal(jax.random.PRNGKey(42), (1, dim), jnp.float32)
            )
            q = mean_dir[None] + 0.35 * q
        return l2_normalize(q)

    corpus_f32 = gen_corpus(jax.random.PRNGKey(0))
    corpus_scales = None
    if dtype == "int8":
        from lean_explore_tpu.ops.quant import _quantize_rows_device

        corpus, corpus_scales = jax.jit(_quantize_rows_device)(corpus_f32)
    else:
        corpus = corpus_f32.astype(jnp.dtype(dtype))
        if dtype == "float32":
            corpus_f32 = corpus
    stacked = gen_queries(jax.random.PRNGKey(1))
    jax.block_until_ready((corpus, stacked))

    # HBM headroom at serving residency (corpus + query sets + f32 oracle
    # copy; the oracle is bench-only — production residency is lower).
    mem = devices[0].memory_stats() or {}
    hbm_used = mem.get("bytes_in_use")
    hbm_limit = mem.get("bytes_limit")
    if hbm_used is not None:
        log(
            f"HBM: {hbm_used / 2**30:.2f} GiB in use"
            + (f" of {hbm_limit / 2**30:.2f} GiB" if hbm_limit else "")
        )

    def search_fn(q, corpus_arg, kk):
        if corpus_scales is not None:
            if method == "fused_pallas":
                from lean_explore_tpu.ops.pallas_retrieval import (
                    pallas_bin_topk_int8,
                )

                return pallas_bin_topk_int8(
                    q, corpus_arg, corpus_scales, jnp.asarray(n, jnp.int32),
                    k=kk,
                )
            from lean_explore_tpu.ops.quant import quantized_topk

            return quantized_topk(
                q, corpus_arg, corpus_scales, jnp.asarray(n, jnp.int32), k=kk
            )
        return dense_topk(q, corpus_arg, kk, n_valid=n, method=method)

    # ------------------------------------------------------------------
    # Correctness: bf16 serving path vs f32 HIGHEST exact search, on device.
    # ------------------------------------------------------------------
    log("recall@10 check (device-side oracle) ...")

    @jax.jit
    def recall_at_10(qs, serving_corpus, exact_corpus):
        # The serving config retrieves a k-candidate pool; final rankings use
        # its head. recall@10 therefore compares the top-10 of the k-pool
        # against the exact top-10.
        _, got = search_fn(qs, serving_corpus, k)
        _, want = _full_topk(qs, exact_corpus, jnp.int32(n), k=10)
        hits = (got[:, :10, None] == want[:, None, :]).any(axis=2)
        return hits.mean()

    recall = float(recall_at_10(stacked[0], corpus, corpus_f32))
    log(f"recall@10 (bf16 serving vs f32 exact): {recall:.4f}")

    # ------------------------------------------------------------------
    # Throughput: iters distinct batches chained per dispatch.
    # ------------------------------------------------------------------
    def run_many(qs, corpus_arg):
        def one(q):
            scores, idx = search_fn(q, corpus_arg, k)
            # Reduce outputs on device; returning [iters, B, k] arrays would
            # meter tunnel bandwidth, not device throughput.
            return scores[:, 0].sum() + idx.sum()

        return jax.lax.map(one, qs).sum()

    run_many = jax.jit(run_many)
    log(f"compiling chained program ({iters} batches/dispatch) ...")
    t0 = time.perf_counter()
    jax.block_until_ready(run_many(stacked, corpus))
    log(f"compile+first dispatch: {time.perf_counter() - t0:.2f}s")

    keys = jax.random.split(jax.random.PRNGKey(2), dispatches)
    query_sets = [gen_queries(key) for key in keys]
    jax.block_until_ready(query_sets)

    log(f"timing {dispatches} dispatches x {iters} batches ...")
    t0 = time.perf_counter()
    for qs in query_sets:
        jax.block_until_ready(run_many(qs, corpus))
    elapsed = time.perf_counter() - t0
    total_queries = batch * iters * dispatches
    tpu_qps = total_queries / elapsed
    per_batch_ms = elapsed / (iters * dispatches) * 1000.0
    log(
        f"TPU: {tpu_qps:.1f} q/s, {per_batch_ms:.3f} ms/batch amortized "
        f"({elapsed:.2f}s for {total_queries} queries)"
    )

    # ------------------------------------------------------------------
    # CPU baseline: identical exact search in numpy. Run on a corpus slice
    # and scale the per-query cost linearly to full N (the scan is linear in
    # rows; this avoids minutes of wall time without changing the rate).
    # ------------------------------------------------------------------
    log(f"CPU baseline on {cpu_n} rows (scaled to {n}) ...")
    rng = np.random.default_rng(0)
    cpu_corpus = rng.standard_normal((cpu_n, dim)).astype(np.float32)
    cpu_corpus /= np.linalg.norm(cpu_corpus, axis=1, keepdims=True)
    cpu_queries = rng.standard_normal((batch, dim)).astype(np.float32)
    cpu_k = min(k, cpu_n - 1)
    t0 = time.perf_counter()
    cpu_scores = cpu_queries @ cpu_corpus.T
    np.argpartition(-cpu_scores, cpu_k - 1, axis=1)
    cpu_exact_elapsed = (time.perf_counter() - t0) * (n / cpu_n)
    cpu_exact_qps = batch / cpu_exact_elapsed

    # Estimated faiss-cpu IVF at the reference's serving config: scans
    # nprobe/nlist of the corpus, plus the quantizer's nlist-probe matmul.
    nlist = max(256, int(np.sqrt(n)))
    scan_fraction = min(64 / nlist, 1.0) + nlist / n
    cpu_ivf_qps = cpu_exact_qps / scan_fraction
    log(
        f"CPU exact scan: {cpu_exact_qps:.1f} q/s; estimated IVF "
        f"(nlist={nlist}, nprobe=64, scans {scan_fraction:.1%}): "
        f"{cpu_ivf_qps:.1f} q/s"
    )

    print(
        json.dumps(
            {
                "metric": f"dense_retrieval_qps_n{n}_b{batch}_k{k}_{dtype}"
                + ("_aniso" if aniso else ""),
                "value": round(tpu_qps, 2),
                "unit": "queries/sec",
                "vs_baseline": round(tpu_qps / cpu_ivf_qps, 2),
                "baseline": "estimated faiss-cpu IVF nprobe=64 on this host",
                "vs_exact_cpu_scan": round(tpu_qps / cpu_exact_qps, 2),
                "recall_at_10": round(recall, 4),
                "batch_latency_ms": round(per_batch_ms, 3),
                "cpu_ivf_estimate_qps": round(cpu_ivf_qps, 2),
                "cpu_exact_scan_qps": round(cpu_exact_qps, 2),
                "platform": devices[0].platform,
                "method": method,
                **(
                    {
                        "hbm_gib_in_use": round(hbm_used / 2**30, 2),
                        "hbm_gib_limit": (
                            round(hbm_limit / 2**30, 2) if hbm_limit else None
                        ),
                    }
                    if hbm_used is not None
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
