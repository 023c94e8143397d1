"""Cross-encoder reranker client: Qwen3-Reranker as a batched JAX forward.

Behavioral replacement for the reference's torch causal-LM reranker
(/root/reference/src/lean_explore/util/reranker_client.py:31-204): identical
``<Instruct>/<Query>/<Document>`` pair formatting, identical last-token
true/false softmax scoring, same response schema — run as a jitted bf16
forward that computes the LM head only at the final position.
"""

import asyncio
import logging
import os
import threading
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel

from lean_explore_tpu.models import qwen3 as qwen3_mod
from lean_explore_tpu.models.hf_loader import load_params
from lean_explore_tpu.models.tokenizer import encode_batch, load_tokenizer

logger = logging.getLogger(__name__)

DEFAULT_INSTRUCTION = "Find relevant Lean 4 math declarations"


def format_pair(
    query: str, document: str, instruction: str = DEFAULT_INSTRUCTION
) -> str:
    """The reference pair template (reference reranker_client.py:96-108).

    The SINGLE definition: RerankerClient scores with it and the
    cross-encoder training stack imports it, so training can never drift
    from the serving format (they previously each carried a verbatim
    copy with nothing pinning the two strings together).
    """
    return (
        f"<Instruct>: {instruction}\n<Query>: {query}\n"
        f"<Document>: {document}"
    )
DEFAULT_BATCH_SIZE = 64


class RerankerResponse(BaseModel):
    """Response from a rerank operation (schema parity with reference)."""

    query: str
    scores: list[float]
    model: str


class RerankerClient:
    """Scores query-document pairs with P("true") from a causal LM."""

    def __init__(
        self,
        model_name: str = "Qwen/Qwen3-Reranker-0.6B",
        *,
        model_dir: str | Path | None = None,
        max_length: int = 512,
        instruction: str = DEFAULT_INSTRUCTION,
        batch_size: int | None = None,
        dtype: str | None = None,
        mesh=None,
    ):
        """Load tokenizer + params.

        Args:
            model_name: HF id (reporting) or local path.
            model_dir: Local checkpoint directory (see EmbeddingClient).
            max_length: Pair truncation length (engine passes 256).
            instruction: Task instruction in the pair template.
            batch_size: Falls back to LEAN_EXPLORE_RERANKER_BATCH_SIZE env,
                then 64 (TPU default; reference uses 16 CUDA / 32 CPU).
            dtype: Parameter dtype on device. None (default) resolves to
                "int8" when LEAN_EXPLORE_RERANKER_INT8=1, else "bfloat16";
                an EXPLICIT dtype always wins over the env var (so parity/
                drift measurements can pin full precision regardless of the
                serving environment).
            mesh: Optional jax Mesh with a ``data`` axis: parameters are
                replicated and the grouped prefix-KV path shards query
                GROUPS over the axis (parallel/rerank.py) — rerank, the
                dominant serving stage, then scales ~linearly in devices.
        """
        from lean_explore_tpu.util.embedding_client import _resolve_model_dir

        self.model_name = model_name
        resolved = Path(model_dir) if model_dir else _resolve_model_dir(model_name)
        self.model_dir = resolved
        self.max_length = max_length
        self.instruction = instruction
        if batch_size is not None and batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        env_batch = os.getenv("LEAN_EXPLORE_RERANKER_BATCH_SIZE")
        self.batch_size = (
            batch_size
            if batch_size is not None
            else (int(env_batch) if env_batch else DEFAULT_BATCH_SIZE)
        )
        logger.info("Loading reranker model %s from %s", model_name, resolved)
        self.tokenizer = load_tokenizer(resolved)
        # HF fast tokenizers are not re-entrant across threads ("Already
        # borrowed"); concurrent rerank()/rerank_pairs() calls dispatch via
        # asyncio.to_thread, so all tokenizer use is serialized here.
        self._tokenizer_lock = threading.Lock()
        # dtype="int8" (or LEAN_EXPLORE_RERANKER_INT8=1 when dtype is left
        # unset): W8A8 dynamic quantization of the trunk projections
        # (qwen3.quantize_params_int8) — the int8 MXU path doubles the peak
        # FLOP rate on v5e. Norms, attention, logits stay bf16/f32. Works
        # through every scoring path including the grouped prefix-KV one.
        if dtype is None:
            dtype = (
                "int8"
                if os.getenv("LEAN_EXPLORE_RERANKER_INT8") == "1"
                else "bfloat16"
            )
        self.int8 = dtype == "int8"
        load_dtype = jnp.bfloat16 if self.int8 else jnp.dtype(dtype)
        self.params, self.config = load_params(resolved, dtype=load_dtype)
        if os.getenv("LEAN_EXPLORE_FUSED_QKV") == "1":
            self.params = qwen3_mod.fuse_params_for_serving(self.params)
        if self.int8:
            self.params = qwen3_mod.quantize_params_int8(self.params)
        self.mesh = mesh
        self._sharded_scorers: dict = {}
        if mesh is not None:
            from lean_explore_tpu.parallel.rerank import replicate_params

            self.params = replicate_params(self.params, mesh)
            logger.info(
                "reranker DP over %d devices", mesh.shape["data"]
            )
        self.token_true_id = self.tokenizer.convert_tokens_to_ids("true")
        self.token_false_id = self.tokenizer.convert_tokens_to_ids("false")
        if self.token_true_id is None or self.token_false_id is None:
            raise ValueError(
                f"Tokenizer at {resolved} lacks 'true'/'false' tokens required "
                "for reranker scoring."
            )

    @classmethod
    def from_components(
        cls,
        params,
        config,
        tokenizer,
        *,
        model_name: str = "in-memory",
        model_dir=None,
        max_length: int = 512,
        instruction: str = DEFAULT_INSTRUCTION,
        batch_size: int = 64,
        int8: bool = False,
    ) -> "RerankerClient":
        """Build a client around already-loaded params/config/tokenizer.

        The ONE sanctioned way to construct without a checkpoint directory
        (benchmarks with random weights, tests): it sets every instance
        attribute the scoring paths touch — including the tokenizer lock —
        so adding an attribute to __init__ must be mirrored HERE, not in
        ad-hoc object.__new__ call sites that silently miss it (that broke
        BENCH_MODE=pipeline once). ``params`` are taken as-is; pass
        int8=True iff they are already quantized. Single-device only.
        """
        self = object.__new__(cls)
        self.model_name = model_name
        self.model_dir = model_dir
        self.max_length = max_length
        self.instruction = instruction
        self.batch_size = batch_size
        self.tokenizer = tokenizer
        self._tokenizer_lock = threading.Lock()
        self.int8 = int8
        self.params, self.config = params, config
        self.mesh = None
        self._sharded_scorers = {}
        self.token_true_id = tokenizer.convert_tokens_to_ids("true")
        self.token_false_id = tokenizer.convert_tokens_to_ids("false")
        if self.token_true_id is None or self.token_false_id is None:
            raise ValueError(
                "Tokenizer lacks 'true'/'false' tokens required for "
                "reranker scoring."
            )
        return self

    def _format_pair(self, query: str, document: str) -> str:
        """Reference pair template (reranker_client.py:96-108)."""
        return format_pair(query, document, self.instruction)

    def _truncate_docs(self, documents: list[str], cap: int) -> list[str]:
        """Truncate documents to ~``cap`` tokens of text (cascade prescreen
        on paths without the prefix/suffix split: the doc is tokenized
        alone, capped, and decoded — a close approximation of capping the
        in-context suffix, adequate for a prescreen whose contract is rank
        agreement, not exact scores)."""
        with self._tokenizer_lock:
            ids = self.tokenizer(
                documents, truncation=True, max_length=cap,
                add_special_tokens=False,
            )["input_ids"]
            return [self.tokenizer.decode(row) for row in ids]

    def _score_encoded(self, encoded: list) -> list[np.ndarray]:
        """Score many padded buckets with minimal device dispatches.

        Buckets sharing a padded (B, T) shape — the common case, thanks to
        the tokenizer's shape bucketing — are stacked and scored by ONE
        chained program (rerank_scores_chained), so a 50-bucket rerank pays
        a handful of dispatches instead of 50 round-trips. Group sizes pad
        to powers of two to bound the compile set. Returns one [B_pad]
        score array per input bucket.
        """
        chain = 8  # buckets per chained dispatch; fixed so compiles stay bounded
        groups: dict[tuple, list[int]] = {}
        for idx, batch in enumerate(encoded):
            groups.setdefault(batch.input_ids.shape, []).append(idx)

        results: list[np.ndarray | None] = [None] * len(encoded)
        fetches = []
        for indices in groups.values():
            full = len(indices) // chain * chain
            for base in range(0, full, chain):
                members = indices[base : base + chain]
                ids = np.stack([encoded[i].input_ids for i in members])
                mask = np.stack([encoded[i].attention_mask for i in members])
                scores = qwen3_mod.rerank_scores_chained(
                    self.params,
                    self.config,
                    jnp.asarray(ids),
                    jnp.asarray(mask),
                    token_true=int(self.token_true_id),
                    token_false=int(self.token_false_id),
                )
                fetches.append((members, scores))
            for idx in indices[full:]:
                batch = encoded[idx]
                scores = qwen3_mod.rerank_scores(
                    self.params,
                    self.config,
                    jnp.asarray(batch.input_ids),
                    jnp.asarray(batch.attention_mask),
                    token_true=int(self.token_true_id),
                    token_false=int(self.token_false_id),
                )
                fetches.append(([idx], scores))
        for members, scores in fetches:
            host = np.asarray(scores)
            if len(members) == 1:
                results[members[0]] = host
            else:
                for position, idx in enumerate(members):
                    results[idx] = host[position]
        return results

    def rerank_sync(
        self, query: str, documents: list[str], batch_size: int | None = None
    ) -> RerankerResponse:
        """Score documents against the query synchronously."""
        if not documents:
            return RerankerResponse(query=query, scores=[], model=self.model_name)
        if batch_size is not None and batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        step = batch_size if batch_size is not None else self.batch_size
        pairs = [self._format_pair(query, d) for d in documents]
        with self._tokenizer_lock:
            encoded = [
                encode_batch(
                    self.tokenizer,
                    pairs[start : start + step],
                    max_length=self.max_length,
                )
                for start in range(0, len(pairs), step)
            ]
        all_scores: list[float] = []
        for batch, scores in zip(encoded, self._score_encoded(encoded)):
            all_scores.extend(float(s) for s in scores[: batch.n_valid])
        return RerankerResponse(query=query, scores=all_scores, model=self.model_name)

    def rerank_pairs_sync(
        self, queries: list[str], documents: list[str]
    ) -> list[float]:
        """Score pairs where each document has its own query.

        TPU-first extension used by the batched engine: pairs from *different*
        queries share device batches, so a 128-query step runs one padded
        forward instead of 128 small ones. Pairs are scored in length-sorted
        order (character length tracks token length closely) so each device
        batch pads to its own bucket instead of the global maximum — short
        candidates stop paying for the longest informalization in the step.
        All buckets are tokenized-and-dispatched before any result is
        fetched, so tokenization of bucket i+1 overlaps device compute of
        bucket i.
        """
        if len(queries) != len(documents):
            raise ValueError("queries and documents must align")
        if not documents:
            return []
        pairs = [self._format_pair(q, d) for q, d in zip(queries, documents)]
        order = sorted(range(len(pairs)), key=lambda i: len(pairs[i]))
        scores = [0.0] * len(pairs)
        chunks = [
            order[start : start + self.batch_size]
            for start in range(0, len(order), self.batch_size)
        ]
        with self._tokenizer_lock:
            encoded = [
                encode_batch(
                    self.tokenizer,
                    [pairs[i] for i in chunk],
                    max_length=self.max_length,
                )
                for chunk in chunks
            ]
        for chunk, bucket_scores in zip(chunks, self._score_encoded(encoded)):
            for i, s in zip(chunk, bucket_scores):
                scores[i] = float(s)
        return scores

    async def rerank_pairs(
        self, queries: list[str], documents: list[str]
    ) -> list[float]:
        return await asyncio.to_thread(self.rerank_pairs_sync, queries, documents)

    # ------------------------------------------------------------------
    # Shared-prefix KV path
    # ------------------------------------------------------------------

    MIN_SHARED_PREFIX = 4  # tokens; below this the split costs more than it saves

    def rerank_grouped_cascade_sync(
        self,
        queries: list[str],
        docs_grouped: list[list[str]],
        *,
        stage1_doc_tokens: int,
        keep: int,
    ) -> list[list[float]]:
        """Two-stage rerank: truncated prescreen, full-length rescore.

        Production-length documents (~100 tokens) make the cross-encoder
        FLOP-bound (anatomy bench: 45% MFU with elementwise ops measured
        at ~0 — no kernel fusion to win, docs/performance.md). The
        remaining lever is scoring fewer long tokens: stage 1 scores every
        pair with documents truncated to ``stage1_doc_tokens`` suffix
        tokens, stage 2 rescores only each query's top-``keep`` at full
        length. Composition is ordinal, the standard multi-stage-ranking
        contract: rescored candidates carry their stage-2 scores;
        pruned candidates keep their stage-1 relative order in a thin
        band strictly BELOW every rescored score. Raw mixing
        of the two score families is not sound — truncated and
        full-length P(true) are differently calibrated, and when
        truncated scores run systematically higher the pruned tail
        (the stage-1 WORST candidates) floats above the rescored top
        (measured: recall@10 0.46 at keep=40/50 under raw mixing vs
        0.96 for the full pipeline; docs/performance.md). Quality is
        governed by stage-1 gold coverage — P(gold's truncated-score
        rank <= keep): at a coverage-complete ``stage1_doc_tokens`` the
        cascade matches or beats the full pipeline (measured 32,8:
        recall@1 +0.04, recall@10 identical, 2x production-length
        throughput), while lossy caps rank gold worse than random and
        collapse regardless of ``keep`` (measured <=16 tokens on
        22-word documents); at keep >= n_docs it equals the full
        pipeline exactly. Measure coverage for a deployment's document
        lengths with scripts/measure_prescreen_coverage.py. Still an
        OPT-IN (LEAN_EXPLORE_RERANK_CASCADE="32,8") since pruned
        candidates never see full-length scoring; the measured frontier
        on the trained pipeline is in docs/performance.md.
        """
        if keep <= 0 or stage1_doc_tokens <= 0:
            raise ValueError("keep and stage1_doc_tokens must be positive")
        # Stage 1 only for groups that actually need pruning: a group with
        # len(docs) <= keep rescores everything at full length anyway, so
        # its truncated prescreen would be pure wasted compute (and at
        # keep >= rerank_top the cascade now equals the full pipeline's
        # cost exactly, as the docstring promises).
        need = [i for i, docs in enumerate(docs_grouped) if len(docs) > keep]
        stage1: dict[int, list[float]] = {}
        if need:
            scored = self.rerank_grouped_sync(
                [queries[i] for i in need],
                [docs_grouped[i] for i in need],
                suffix_cap=stage1_doc_tokens,
            )
            stage1 = dict(zip(need, scored))
        rescore_q: list[str] = []
        rescore_docs: list[list[str]] = []
        slots: list[list[int]] = []
        for gi, (query, docs) in enumerate(zip(queries, docs_grouped)):
            if gi in stage1:
                top = sorted(
                    range(len(docs)),
                    key=lambda i: stage1[gi][i],
                    reverse=True,
                )[:keep]
            else:
                # Nothing pruned: full-length rescore of everything.
                top = list(range(len(docs)))
            rescore_q.append(query)
            rescore_docs.append([docs[i] for i in top])
            slots.append(top)
        stage2 = self.rerank_grouped_sync(rescore_q, rescore_docs)
        out = [
            list(stage1[gi]) if gi in stage1 else [0.0] * len(docs)
            for gi, docs in enumerate(docs_grouped)
        ]
        for gi, (top, rescored) in enumerate(zip(slots, stage2)):
            for pos, score in zip(top, rescored):
                out[gi][pos] = score
            kept = set(top)
            pruned = [i for i in range(len(out[gi])) if i not in kept]
            if pruned and rescored:
                # Ordinal composition: pruned candidates keep stage-1 order
                # in a THIN band just under the worst rescored score. The
                # band must be thin because downstream fusion min-max
                # normalizes the group's rerank scores — a wide tail would
                # stretch the range and compress the rescored candidates'
                # normalized spread until bm25/dep noise outvotes them
                # (measured: recall@1 0.49 vs 0.80 at keep=25 with
                # stage-1-spacing-preserving placement).
                floor = min(rescored)
                order = sorted(
                    pruned, key=lambda i: stage1[gi][i], reverse=True
                )
                for j, i in enumerate(order):
                    out[gi][i] = floor - 1e-4 * (j + 1)
        return out

    def rerank_grouped_sync(
        self,
        queries: list[str],
        docs_grouped: list[list[str]],
        *,
        suffix_cap: int | None = None,
    ) -> list[list[float]]:
        """Score each query's documents with shared-prefix KV reuse.

        Every pair of a query shares the identical
        ``<Instruct>+<Query>+<Document>:`` token prefix (reference
        reranker_client.py:96-108); the flat path recomputes it once per
        document — at rerank_top=50 that is 50x redundant trunk work on the
        longest part of the pair. Here the shared prefix (computed as the
        longest common *token* prefix across the group, so BPE boundary
        merges can never desync it) runs once per query through
        ``prefix_kv``; document suffixes run as chunked [C, D, S] batches
        attending to the cached prefix (rerank_scores_grouped), with RoPE
        positions offset to their true location in the unsplit pair.
        Scores are numerically the full forward's (same positions, same
        visible keys); a parity test pins this.

        Disable with LEAN_EXPLORE_RERANK_PREFIX=0 (falls back to the flat
        cross-query path).
        """
        if len(queries) != len(docs_grouped):
            raise ValueError("queries and docs_grouped must align")
        if os.getenv("LEAN_EXPLORE_RERANK_PREFIX", "1") == "0":
            flat_q = [
                q for q, docs in zip(queries, docs_grouped) for _ in docs
            ]
            flat_d = [d for docs in docs_grouped for d in docs]
            if suffix_cap is not None:
                # Cascade prescreen without the prefix/suffix split: cap the
                # documents by token count so stage 1 still runs truncated
                # (it previously ran at FULL length here — costing more
                # than no cascade while claiming a prescreen happened).
                flat_d = self._truncate_docs(flat_d, suffix_cap)
            flat = self.rerank_pairs_sync(flat_q, flat_d)
            out, start = [], 0
            for docs in docs_grouped:
                out.append(flat[start : start + len(docs)])
                start += len(docs)
            return out

        from lean_explore_tpu.models.tokenizer import bucket_batch, bucket_length

        results: list[list[float]] = [[] for _ in queries]
        # group records: (out_idx, shared_prefix_tokens, suffix_token_lists)
        records: list[tuple[int, list[int], list[list[int]]]] = []
        fallback_q: list[str] = []
        fallback_d: list[str] = []
        fallback_slots: list[tuple[int, int]] = []  # (group, position)

        for gi, (query, docs) in enumerate(zip(queries, docs_grouped)):
            if not docs:
                continue
            pairs = [self._format_pair(query, d) for d in docs]
            with self._tokenizer_lock:
                token_lists = self.tokenizer(
                    pairs, truncation=True, max_length=self.max_length
                )["input_ids"]
            # Longest common token prefix across the group. Slice equality
            # compares at C speed; a per-token Python loop here costs
            # O(docs x prefix_len) interpreter steps per group, straight
            # latency on the host-bound path. Rows almost always match the
            # running prefix wholesale (identical <Instruct>+<Query>), so
            # the common case is one slice compare; mismatches bisect.
            row0 = token_lists[0]
            shared = len(row0)
            for row in token_lists[1:]:
                limit = min(shared, len(row))
                if row[:limit] == row0[:limit]:
                    shared = limit
                    continue
                lo, hi = 0, limit  # row[:lo] == row0[:lo]; mismatch <= hi
                while lo < hi:
                    mid = (lo + hi + 1) // 2
                    if row[:mid] == row0[:mid]:
                        lo = mid
                    else:
                        hi = mid - 1
                shared = lo
                if shared == 0:
                    break
            shared = min(shared, min(len(row) for row in token_lists) - 1)
            if shared < self.MIN_SHARED_PREFIX:
                for pos, doc in enumerate(docs):
                    fallback_q.append(query)
                    fallback_d.append(doc)
                    fallback_slots.append((gi, pos))
                results[gi] = [0.0] * len(docs)
                continue
            suffixes = [row[shared:] for row in token_lists]
            if suffix_cap is not None:
                # Cascade stage 1: truncated document suffixes. The shared
                # prefix (instruction + query) is never truncated.
                suffixes = [sfx[:suffix_cap] for sfx in suffixes]
            records.append((gi, token_lists[0][:shared], suffixes))

        pad_id = self.tokenizer.pad_token_id
        if pad_id is None:
            pad_id = self.tokenizer.eos_token_id or 0

        # Groups are partitioned by suffix-length bucket (a group's bucket is
        # its longest document) so short informalizations never pad to one
        # outlier's length; each partition runs one prefix_kv + one grouped
        # dispatch. D pads to the partition's max document count exactly —
        # rerank_top is constant in production, so the compile set stays
        # tiny without bucket-rounding 50 docs up to 64. Suffix buckets are
        # finer than the global LENGTH_BUCKETS: with the prefix cached, the
        # suffix is all that is forwarded, and typical
        # "name: informalization" suffixes are 12-20 tokens — padding them
        # to 32 would double the rerank FLOPs.
        suffix_buckets = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256)
        by_bucket: dict[int, list[tuple[int, int, list[list[int]]]]] = {}
        for rec in records:
            s_bucket = bucket_length(
                max(len(sfx) for sfx in rec[2]),
                self.max_length,
                buckets=suffix_buckets,
            )
            by_bucket.setdefault(s_bucket, []).append(rec)

        fetches = []
        for s_bucket, recs in sorted(by_bucket.items()):
            chunk = min(4, bucket_batch(len(recs)))
            # DP over the mesh: shard_map splits the group axis evenly, so
            # G pads to a multiple of (devices x chunk); pad groups carry
            # one valid token and their scores are discarded below.
            g_align = chunk * (
                self.mesh.shape["data"] if self.mesh is not None else 1
            )
            g_pad = ((len(recs) + g_align - 1) // g_align) * g_align
            d_pad = max(len(r[2]) for r in recs)
            p_pad = bucket_length(max(len(r[1]) for r in recs), self.max_length)
            prefix_ids = np.full((g_pad, p_pad), pad_id, dtype=np.int32)
            prefix_mask = np.zeros((g_pad, p_pad), dtype=np.int32)
            suffix_ids = np.full((g_pad, d_pad, s_bucket), pad_id, dtype=np.int32)
            suffix_mask = np.zeros((g_pad, d_pad, s_bucket), dtype=np.int32)
            pos_offset = np.zeros((g_pad,), dtype=np.int32)
            for row, (gi, head, suffixes) in enumerate(recs):
                # Prefix tokens are identical across the group's pairs by
                # construction; the record carries the first pair's prefix
                # slice, so no pair is tokenized twice on the host-bound path.
                shared = len(head)
                prefix_ids[row, :shared] = head
                prefix_mask[row, :shared] = 1
                pos_offset[row] = shared
                for di, sfx in enumerate(suffixes):
                    sfx = sfx[:s_bucket]
                    suffix_ids[row, di, : len(sfx)] = sfx
                    suffix_mask[row, di, : len(sfx)] = 1
            # Pad rows/docs keep one valid token so softmax and pooling
            # indices stay benign; their scores are discarded.
            prefix_mask[len(recs) :, 0] = 1
            flat_mask = suffix_mask.reshape(g_pad * d_pad, s_bucket)
            empty = ~flat_mask.any(axis=1)
            flat_mask[empty, 0] = 1

            if self.mesh is not None:
                scorer = self._sharded_scorers.get(chunk)
                if scorer is None:
                    from lean_explore_tpu.parallel.rerank import (
                        make_sharded_grouped_scorer,
                    )

                    scorer = make_sharded_grouped_scorer(
                        self.config,
                        self.mesh,
                        token_true=int(self.token_true_id),
                        token_false=int(self.token_false_id),
                        group_chunk=chunk,
                    )
                    self._sharded_scorers[chunk] = scorer
                scores = scorer(
                    self.params,
                    jnp.asarray(prefix_ids),
                    jnp.asarray(prefix_mask),
                    jnp.asarray(suffix_ids),
                    jnp.asarray(suffix_mask),
                    jnp.asarray(pos_offset),
                )
            else:
                pk, pv = qwen3_mod.prefix_kv(
                    self.params,
                    self.config,
                    jnp.asarray(prefix_ids),
                    jnp.asarray(prefix_mask),
                )
                scores = qwen3_mod.rerank_scores_grouped(
                    self.params,
                    self.config,
                    pk,
                    pv,
                    jnp.asarray(prefix_mask),
                    jnp.asarray(suffix_ids),
                    jnp.asarray(suffix_mask),
                    jnp.asarray(pos_offset),
                    token_true=int(self.token_true_id),
                    token_false=int(self.token_false_id),
                    group_chunk=chunk,
                )
            fetches.append((recs, scores))

        for recs, scores in fetches:
            host = np.asarray(scores)
            for row, (gi, _head, suffixes) in enumerate(recs):
                results[gi] = [float(s) for s in host[row, : len(suffixes)]]

        if fallback_q:
            if suffix_cap is not None:
                # Honor the cascade prescreen on tiny-prefix groups too
                # (same doc-token truncation as the flat path above).
                fallback_d = self._truncate_docs(fallback_d, suffix_cap)
            flat = self.rerank_pairs_sync(fallback_q, fallback_d)
            for (gi, pos), score in zip(fallback_slots, flat):
                results[gi][pos] = score
        return results

    async def rerank_grouped(
        self, queries: list[str], docs_grouped: list[list[str]]
    ) -> list[list[float]]:
        cascade = os.getenv("LEAN_EXPLORE_RERANK_CASCADE")
        if cascade:
            try:
                stage1_tokens, keep = (int(x) for x in cascade.split(","))
            except ValueError:
                raise ValueError(
                    "LEAN_EXPLORE_RERANK_CASCADE must be "
                    "'<stage1_doc_tokens>,<keep>', e.g. '32,8'"
                ) from None
            return await asyncio.to_thread(
                self.rerank_grouped_cascade_sync,
                queries,
                docs_grouped,
                stage1_doc_tokens=stage1_tokens,
                keep=keep,
            )
        return await asyncio.to_thread(
            self.rerank_grouped_sync, queries, docs_grouped
        )

    async def rerank(
        self,
        query: str,
        documents: list[str],
        batch_size: int | None = None,
    ) -> RerankerResponse:
        """Async surface matching the reference (reranker_client.py:164-204)."""
        return await asyncio.to_thread(
            self.rerank_sync, query, documents, batch_size
        )
