"""Qwen3 decoder trunk in pure JAX — the compute core of the embedder and
reranker.

Replaces the reference's torch model clients (sentence-transformers encoder,
/root/reference/src/lean_explore/util/embedding_client.py:58-101; causal-LM
reranker, util/reranker_client.py:71-141) with jitted, batched forward
passes designed for the TPU:

- Layer parameters are stacked along a leading axis and the trunk runs as a
  single ``lax.scan`` — one compiled layer body regardless of depth.
- Matmuls run in the param dtype (bfloat16 for serving) with f32
  accumulation; RMSNorm/softmax/logits are computed in f32.
- Positions are ``arange(T)`` irrespective of padding, matching HF
  transformers' default ``position_ids`` handling so scores are comparable
  with the reference's torch path for both right-padded (embedder) and
  left-padded (reranker) batches.

Architecture notes (Qwen3 family): GQA attention with per-head RMSNorm on Q
and K before RoPE (q_norm/k_norm), rotate-half RoPE, SwiGLU MLP, optional
tied LM head.
"""

import functools
import json
import os
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@dataclass(frozen=True)
class Qwen3Config:
    """Shape/hyperparameter config (subset of HF config.json)."""

    vocab_size: int
    hidden_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_key_value_heads: int
    head_dim: int
    intermediate_size: int
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    tie_word_embeddings: bool = True

    @classmethod
    def from_hf(cls, cfg: dict) -> "Qwen3Config":
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            num_hidden_layers=cfg["num_hidden_layers"],
            num_attention_heads=cfg["num_attention_heads"],
            num_key_value_heads=cfg["num_key_value_heads"],
            head_dim=cfg.get(
                "head_dim", cfg["hidden_size"] // cfg["num_attention_heads"]
            ),
            intermediate_size=cfg["intermediate_size"],
            rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
            rope_theta=cfg.get("rope_theta", 1_000_000.0),
            tie_word_embeddings=cfg.get("tie_word_embeddings", True),
        )

    @classmethod
    def from_dir(cls, path: str | Path) -> "Qwen3Config":
        config_path = Path(path) / "config.json"
        if not config_path.exists():
            raise FileNotFoundError(
                f"No HF model config at {config_path}. Pass a local directory "
                "containing config.json + *.safetensors (model downloads are "
                "not performed by this framework)."
            )
        with open(config_path) as f:
            return cls.from_hf(json.load(f))

    @classmethod
    def tiny(cls, vocab_size: int = 512) -> "Qwen3Config":
        """Small config for tests and compile checks."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            intermediate_size=128,
        )


# ----------------------------------------------------------------------
# Parameter pytree
# ----------------------------------------------------------------------
#
# {
#   "embed":      [V, H]
#   "layers": {                        (leading axis = layer, scanned)
#     "input_norm":   [L, H]
#     "q_proj":       [L, H, NH*DH]    (transposed from HF [out, in])
#     "k_proj":       [L, H, NKV*DH]
#     "v_proj":       [L, H, NKV*DH]
#     "o_proj":       [L, NH*DH, H]
#     "q_norm":       [L, DH]
#     "k_norm":       [L, DH]
#     "post_norm":    [L, H]
#     "gate_proj":    [L, H, I]
#     "up_proj":      [L, H, I]
#     "down_proj":    [L, I, H]
#   }
#   "final_norm": [H]
#   "lm_head":    [H, V] or None (tied -> embed.T used)
# }


def init_params(config: Qwen3Config, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random-normal initialized params (tests, compile checks, training)."""
    keys = iter(jax.random.split(key, 16))
    h, dh = config.hidden_size, config.head_dim
    nq, nkv = config.num_attention_heads, config.num_key_value_heads
    inter, layers = config.intermediate_size, config.num_hidden_layers

    def w(key, *shape, scale=0.02):
        return (jax.random.normal(key, shape, dtype=jnp.float32) * scale).astype(
            dtype
        )

    params = {
        "embed": w(next(keys), config.vocab_size, h),
        "layers": {
            "input_norm": jnp.ones((layers, h), dtype=dtype),
            "q_proj": w(next(keys), layers, h, nq * dh),
            "k_proj": w(next(keys), layers, h, nkv * dh),
            "v_proj": w(next(keys), layers, h, nkv * dh),
            "o_proj": w(next(keys), layers, nq * dh, h),
            "q_norm": jnp.ones((layers, dh), dtype=dtype),
            "k_norm": jnp.ones((layers, dh), dtype=dtype),
            "post_norm": jnp.ones((layers, h), dtype=dtype),
            "gate_proj": w(next(keys), layers, h, inter),
            "up_proj": w(next(keys), layers, h, inter),
            "down_proj": w(next(keys), layers, inter, h),
        },
        "final_norm": jnp.ones((h,), dtype=dtype),
        "lm_head": None
        if config.tie_word_embeddings
        else w(next(keys), h, config.vocab_size),
    }
    return params


def _rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    scale = lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (xf * scale).astype(x.dtype) * weight


def _rope_tables(config: Qwen3Config, seq_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables [T, DH] (rotate-half convention, f32)."""
    dh = config.head_dim
    inv_freq = 1.0 / (
        config.rope_theta ** (np.arange(0, dh, 2, dtype=np.float64) / dh)
    )
    angles = np.arange(seq_len, dtype=np.float64)[:, None] * inv_freq[None, :]
    emb = np.concatenate([angles, angles], axis=-1)
    return jnp.asarray(np.cos(emb), jnp.float32), jnp.asarray(np.sin(emb), jnp.float32)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    # x: [B, T, N, DH]; cos/sin: [T, DH]
    c = cos[None, :, None, :].astype(x.dtype)
    s = sin[None, :, None, :].astype(x.dtype)
    return x * c + _rotate_half(x) * s


def _attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
) -> jnp.ndarray:
    """GQA attention. q: [B,T,NQ,DH], k/v: [B,T,NKV,DH], bias: [B,1,T,T]."""
    b, t, nq, dh = q.shape
    nkv = k.shape[2]
    group = nq // nkv
    qg = q.reshape(b, t, nkv, group, dh)
    scores = jnp.einsum(
        "btkgd,bskd->bkgts", qg, k, preferred_element_type=jnp.float32
    ) * (dh**-0.5)
    scores = scores + bias[:, :, None, :, :]  # [B,NKV,G,T,T] broadcast over (k,g)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgts,bskd->btkgd", probs, v)
    return out.reshape(b, t, nq * dh)


def _attention_flash(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attention_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Pallas flash attention: never materializes the [T, T] prob tensor.

    The einsum path writes ~B*NQ*T^2 of probabilities to HBM per layer
    (over 1 GB per layer at B=64, T=512); the flash kernel keeps the
    softmax streaming in VMEM. KV heads are repeated to the Q head count
    (the TPU kernel wants equal head counts). Padding is expressed as
    segment ids: pad tokens live in segment 0, valid tokens in segment 1,
    so cross-segment attention is masked; pad rows' outputs are garbage and
    discarded by the mask-aware pooling.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, t, nq, dh = q.shape
    group = nq // k.shape[2]
    qh = q.transpose(0, 2, 1, 3)
    kh = jnp.repeat(k.transpose(0, 2, 1, 3), group, axis=1)
    vh = jnp.repeat(v.transpose(0, 2, 1, 3), group, axis=1)
    seg = attention_mask.astype(jnp.int32)
    out = flash_attention(
        qh,
        kh,
        vh,
        segment_ids=SegmentIds(q=seg, kv=seg),
        causal=True,
        sm_scale=dh**-0.5,
    )
    return out.transpose(0, 2, 1, 3).reshape(b, t, nq * dh)


FLASH_MIN_SEQ = 256


def _use_flash(seq_len: int) -> bool:
    """Opt-in via LEAN_EXPLORE_FLASH_ATTENTION=1 (TPU, seq >= 256 only).

    Measured on v5e at the Qwen3-0.6B serving geometry (B=64, T=512,
    GQA 16/8): the einsum path is ~1.3x FASTER than the Pallas flash kernel
    (453ms vs 583ms per batch) — the kv-head repeat and the kernel's block
    configuration outweigh the avoided prob materialization at these sizes.
    Flash becomes worthwhile for much longer sequences; it stays available
    behind the flag.
    """
    if not os.environ.get("LEAN_EXPLORE_FLASH_ATTENTION"):
        return False
    if seq_len < FLASH_MIN_SEQ or seq_len % 128 != 0:
        return False
    return jax.default_backend() == "tpu"


def _layer_body(
    x: jnp.ndarray,
    p: dict,
    *,
    shape3: tuple,
    nq: int,
    nkv: int,
    dh: int,
    eps: float,
    rope,
    attend,
):
    """One transformer layer: the SINGLE definition of the
    norm -> qkv -> q/k-norm -> RoPE -> attention -> o_proj -> post-norm ->
    MLP sequence. The full forward, the prefix-KV builder, and the
    suffix-over-cached-KV scorer all wrap this with their own ``attend``
    closure and RoPE position handling — so a numerical fix lands in every
    path at once and the grouped rerank scores cannot drift from the full
    forward they are parity-pinned against.

    Returns (new_x, (k_rotated, v)): callers that cache KV keep the aux
    (keys are cached post-RoPE, matching what the full forward attends to);
    others drop it.
    """
    h = _rms_norm(x, p["input_norm"], eps)
    q, k, v = _qkv(h, p, shape3, nq, nkv, dh)
    q = _rms_norm(q, p["q_norm"], eps)
    k = _rms_norm(k, p["k_norm"], eps)
    q = rope(q)
    k = rope(k)
    attn_out = attend(q, k, v)
    x = x + _proj(attn_out, p["o_proj"])
    h = _rms_norm(x, p["post_norm"], eps)
    return x + _mlp(h, p), (k, v)


@functools.partial(jax.jit, static_argnames=("config", "flash"))
def _forward_hidden_impl(
    params: dict,
    config: Qwen3Config,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    *,
    flash: bool,
) -> jnp.ndarray:
    batch, seq = input_ids.shape
    x = jnp.take(params["embed"], input_ids, axis=0)
    cos, sin = _rope_tables(config, seq)

    if flash:
        bias = None
    else:
        causal = jnp.tril(jnp.ones((seq, seq), dtype=bool))
        valid_key = attention_mask.astype(bool)[:, None, None, :]  # [B,1,1,T]
        allowed = causal[None, None, :, :] & valid_key
        bias = jnp.where(allowed, 0.0, -1e9).astype(jnp.float32)  # [B,1,T,T]

    nq, nkv, dh = (
        config.num_attention_heads,
        config.num_key_value_heads,
        config.head_dim,
    )
    eps = config.rms_norm_eps

    def layer(x, p):
        if flash:
            attend = lambda q, k, v: _attention_flash(  # noqa: E731
                q, k, v, attention_mask
            )
        else:
            attend = lambda q, k, v: _attention(q, k, v, bias)  # noqa: E731
        new_x, _ = _layer_body(
            x, p, shape3=(batch, seq), nq=nq, nkv=nkv, dh=dh, eps=eps,
            rope=lambda t: _apply_rope(t, cos, sin), attend=attend,
        )
        return new_x, None

    x, _ = lax.scan(lambda carry, p: layer(carry, p), x, params["layers"])
    return _rms_norm(x, params["final_norm"], eps)


def forward_hidden(
    params: dict,
    config: Qwen3Config,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    *,
    flash: bool | None = None,
) -> jnp.ndarray:
    """Trunk forward: [B, T] ids + 0/1 mask -> final-norm hidden [B, T, H].

    flash=None defers to _use_flash: the Pallas flash-attention path is
    OPT-IN via LEAN_EXPLORE_FLASH_ATTENTION=1 (measured 1.3x slower than
    the einsum at the serving shapes, docs/performance.md) and off
    otherwise. The env var is read at TRACE time — jitted callers bake the
    choice into each compiled (config, shape) executable, so toggling it
    mid-process does not affect shapes already compiled.
    """
    if flash is None:
        flash = _use_flash(int(input_ids.shape[1]))
    return _forward_hidden_impl(
        params, config, input_ids, attention_mask, flash=flash
    )


def _last_valid_index(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Index of the last 1 in each mask row (padding-side agnostic)."""
    seq = attention_mask.shape[1]
    positions = jnp.arange(seq)[None, :]
    return jnp.max(
        jnp.where(attention_mask.astype(bool), positions, -1), axis=1
    ).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("config",))
def embed_pool(
    params: dict,
    config: Qwen3Config,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Embedding forward: last-valid-token hidden state, L2-normalized [B, H].

    Matches Qwen3-Embedding's last-token pooling + normalize (the
    sentence-transformers module stack the reference relies on).
    """
    hidden = forward_hidden(params, config, input_ids, attention_mask)
    last = _last_valid_index(attention_mask)
    pooled = jnp.take_along_axis(hidden, last[:, None, None], axis=1)[:, 0, :]
    pooled = pooled.astype(jnp.float32)
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
    )


@functools.partial(jax.jit, static_argnames=("config",))
def embed_pool_from_ids(
    params: dict,
    config: Qwen3Config,
    input_ids: jnp.ndarray,
    lengths: jnp.ndarray,
) -> jnp.ndarray:
    """embed_pool with the [B, T] mask expanded in-graph from row lengths.

    The encode stage is host-bound on small serving hosts (round-3
    performance.md: 283 ms around a 58 ms forward); shipping the ids plus
    a [B] length vector instead of a full [B, T] mask halves the
    host->device transfer on the encode hot path. Deriving validity from
    LENGTHS (which the host tokenizer knows exactly) rather than from
    pad-token counting makes the mask correct even when document text
    literally contains the pad/eos special string — HF fast tokenizers
    encode such occurrences as the special id by default, which an
    ids-only pad-count would misread as padding and silently truncate
    the real tail (including the pooled EOS). Rows must be right-padded
    with contiguous content from column 0; every row keeps at least one
    valid position (padding-only bucket rows pool column 0 and are
    discarded), exactly like encode_batch's host mask.
    """
    seq = input_ids.shape[1]
    valid_len = jnp.clip(lengths, 1, seq)
    mask = (
        jnp.arange(seq)[None, :] < valid_len[:, None]
    ).astype(jnp.int32)
    return embed_pool(params, config, input_ids, mask)


def _lm_head(params: dict, hidden: jnp.ndarray) -> jnp.ndarray:
    head = params.get("lm_head")
    if head is None:
        head = params["embed"].T
    return (hidden.astype(jnp.float32) @ head.astype(jnp.float32))


def _pair_logits(
    params: dict, hidden: jnp.ndarray, token_false: int, token_true: int
) -> jnp.ndarray:
    """Logits at exactly (false, true) -> [B, 2] (f32).

    Reranker scoring only reads two vocabulary columns; slicing the head
    before the matmul replaces a [B, V] f32 GEMM (~2 TFLOP per 6400-pair
    batch at the 151k Qwen3 vocab, on the TPU's slow f32 path) with a
    [B, H]x[H, 2] sliver. Column-exact: each logit is the same dot product.
    """
    head = params.get("lm_head")
    if head is None:
        cols = params["embed"][jnp.array([token_false, token_true])].T
    else:
        cols = head[:, jnp.array([token_false, token_true])]
    return hidden.astype(jnp.float32) @ cols.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("config",))
def last_token_logits(
    params: dict,
    config: Qwen3Config,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Logits at the last valid position only [B, V] (f32).

    Computing the head on one position instead of all T avoids the [B, T, V]
    logits tensor the reference's torch path materializes
    (reranker_client.py:127)."""
    hidden = forward_hidden(params, config, input_ids, attention_mask)
    last = _last_valid_index(attention_mask)
    pooled = jnp.take_along_axis(hidden, last[:, None, None], axis=1)[:, 0, :]
    return _lm_head(params, pooled)


@functools.partial(jax.jit, static_argnames=("config", "token_true", "token_false"))
def rerank_scores(
    params: dict,
    config: Qwen3Config,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    *,
    token_true: int,
    token_false: int,
) -> jnp.ndarray:
    """P("true") from the last-token true/false logits [B] (f32).

    Softmax over the two logits, exactly the reference's scoring
    (reranker_client.py:129-138). Only the two scored vocabulary columns
    are computed (_pair_logits)."""
    hidden = forward_hidden(params, config, input_ids, attention_mask)
    last = _last_valid_index(attention_mask)
    pooled = jnp.take_along_axis(hidden, last[:, None, None], axis=1)[:, 0, :]
    pair = _pair_logits(params, pooled, token_false, token_true)
    return jax.nn.softmax(pair, axis=1)[:, 1]


@functools.partial(jax.jit, static_argnames=("config",))
def prefix_kv(
    params: dict,
    config: Qwen3Config,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward a batch of shared pair prefixes, returning per-layer K/V.

    A rerank step scores ~50 documents per query, and every pair shares the
    identical ``<Instruct>+<Query>+<Document>:`` token prefix (reference
    reranker_client.py:96-108) — recomputing it per document is pure waste.
    This runs the trunk once over the prefixes and collects the post-RoPE,
    post-norm K and V of every layer, which ``rerank_scores_grouped`` then
    attends to from the much shorter document suffixes.

    Args:
        input_ids: [G, P] right-padded prefix tokens (one row per query).
        attention_mask: [G, P] 0/1 validity.

    Returns:
        (k, v), each [L, G, P, NKV, DH] in the param dtype.
    """
    batch, seq = input_ids.shape
    x = jnp.take(params["embed"], input_ids, axis=0)
    cos, sin = _rope_tables(config, seq)
    causal = jnp.tril(jnp.ones((seq, seq), dtype=bool))
    valid_key = attention_mask.astype(bool)[:, None, None, :]
    bias = jnp.where(causal[None, None] & valid_key, 0.0, -1e9).astype(jnp.float32)

    nq, nkv, dh = (
        config.num_attention_heads,
        config.num_key_value_heads,
        config.head_dim,
    )
    eps = config.rms_norm_eps

    def layer(x, p):
        return _layer_body(
            x, p, shape3=(batch, seq), nq=nq, nkv=nkv, dh=dh, eps=eps,
            rope=lambda t: _apply_rope(t, cos, sin),
            attend=lambda q, k, v: _attention(q, k, v, bias),
        )

    _, (ks, vs) = lax.scan(lambda carry, p: layer(carry, p), x, params["layers"])
    return ks, vs


def _suffix_attention(
    q: jnp.ndarray,
    pk: jnp.ndarray,
    pv: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
) -> jnp.ndarray:
    """Attention of suffix queries over [prefix-KV ‖ suffix-KV].

    q: [C, D, S, NQ, DH]; pk/pv: [C, P, NKV, DH] (shared across each group's
    D documents — broadcast in the einsum, never materialized per row);
    k/v: [C, D, S, NKV, DH]; bias: [C, D, 1, S, P+S] (the GQA group axis
    is inserted HERE via bias[:, :, :, None, :, :] — callers must not
    pre-insert it).
    """
    c, d, s, nq, dh = q.shape
    p = pk.shape[1]
    nkv = k.shape[3]
    group = nq // nkv
    qg = q.reshape(c, d, s, nkv, group, dh)
    scores_p = jnp.einsum(
        "cdtkge,cpke->cdkgtp", qg, pk, preferred_element_type=jnp.float32
    )
    scores_s = jnp.einsum(
        "cdtkge,cduke->cdkgtu", qg, k, preferred_element_type=jnp.float32
    )
    scores = jnp.concatenate([scores_p, scores_s], axis=-1) * (dh**-0.5)
    scores = scores + bias[:, :, :, None, :, :]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out_p = jnp.einsum("cdkgtp,cpke->cdtkge", probs[..., :p], pv)
    out_s = jnp.einsum("cdkgtu,cduke->cdtkge", probs[..., p:], v)
    return (out_p + out_s).reshape(c, d, s, nq * dh)


def _suffix_forward_scores(
    params: dict,
    config: Qwen3Config,
    pk_c: jnp.ndarray,
    pv_c: jnp.ndarray,
    prefix_mask: jnp.ndarray,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    pos_offset: jnp.ndarray,
    cos_full: jnp.ndarray,
    sin_full: jnp.ndarray,
    token_true: int,
    token_false: int,
) -> jnp.ndarray:
    """A chunk of C query groups: suffixes [C, D, S] attend prefix KV
    [L, C, P] (each group's D documents share its prefix by broadcast)."""
    c, d, s = input_ids.shape
    nq, nkv, dh = (
        config.num_attention_heads,
        config.num_key_value_heads,
        config.head_dim,
    )
    eps = config.rms_norm_eps

    x = jnp.take(params["embed"], input_ids, axis=0)
    # Suffix token t sits at absolute position pos_offset + t, exactly where
    # it would be in the unsplit pair forward.
    pos = pos_offset[:, None] + jnp.arange(s)[None, :]  # [C, S]
    cos = cos_full[pos]  # [C, S, DH]
    sin = sin_full[pos]

    def rope(t):  # t: [C, D, S, N, DH]
        cc = cos[:, None, :, None, :].astype(t.dtype)
        ss = sin[:, None, :, None, :].astype(t.dtype)
        return t * cc + _rotate_half(t) * ss

    causal = jnp.tril(jnp.ones((s, s), dtype=bool))
    valid_suffix = attention_mask.astype(bool)[:, :, None, None, :]  # [C,D,1,1,S]
    bias_s = jnp.where(causal[None, None, None] & valid_suffix, 0.0, -1e9)
    bias_p = jnp.where(
        prefix_mask.astype(bool)[:, None, None, None, :], 0.0, -1e9
    )  # [C,1,1,1,P]
    bias = jnp.concatenate(
        [
            jnp.broadcast_to(bias_p, (c, d, 1, s, prefix_mask.shape[1])),
            bias_s,
        ],
        axis=-1,
    ).astype(jnp.float32)  # [C, D, 1, S, P+S]

    def layer(x, scanned):
        p, pk, pv = scanned
        new_x, _ = _layer_body(
            x, p, shape3=(c, d, s), nq=nq, nkv=nkv, dh=dh, eps=eps,
            rope=rope,
            attend=lambda q, k, v: _suffix_attention(q, pk, pv, k, v, bias),
        )
        return new_x, None

    x, _ = lax.scan(layer, x, (params["layers"], pk_c, pv_c))
    hidden = _rms_norm(x, params["final_norm"], eps)
    flat_mask = attention_mask.reshape(c * d, s)
    last = _last_valid_index(flat_mask)
    flat_hidden = hidden.reshape(c * d, s, -1)
    pooled = jnp.take_along_axis(flat_hidden, last[:, None, None], axis=1)[:, 0, :]
    pair = _pair_logits(params, pooled, token_false, token_true)
    return jax.nn.softmax(pair, axis=1)[:, 1].reshape(c, d)


@functools.partial(
    jax.jit,
    static_argnames=("config", "token_true", "token_false", "group_chunk"),
)
def rerank_scores_grouped(
    params: dict,
    config: Qwen3Config,
    pk: jnp.ndarray,
    pv: jnp.ndarray,
    prefix_mask: jnp.ndarray,
    suffix_ids: jnp.ndarray,
    suffix_mask: jnp.ndarray,
    pos_offset: jnp.ndarray,
    *,
    token_true: int,
    token_false: int,
    group_chunk: int = 4,
) -> jnp.ndarray:
    """P("true") for G query groups of D document suffixes each: -> [G, D].

    Args:
        pk/pv: [L, G, P, NKV, DH] from ``prefix_kv``.
        prefix_mask: [G, P].
        suffix_ids/suffix_mask: [G, D, S] right-padded document suffixes.
        pos_offset: [G] int32 — each group's true (unpadded) prefix length.
        group_chunk: query groups per scan step (G % group_chunk == 0).

    The outer ``lax.scan`` walks `group_chunk` groups at a time; each
    group's prefix KV broadcasts over its D documents in the attention
    einsum (no per-row gather — a flat per-row-KV layout measured SLOWER
    than the baseline it was meant to beat: 1976-2572 ms vs grouped
    1644 ms at the 0.6B config-4 geometry). Measured on hardware the
    forward is VPU/layout-bound at these short suffixes, so larger chunks
    don't pay: chunk 1/4/8/16 = 1708/1686/2104/2447 ms — 4 is the default;
    the win over the unsplit baseline (2702 ms) comes from not recomputing
    the prefix, not from bigger matmuls.
    """
    g, d, s = suffix_ids.shape
    if g % group_chunk:
        raise ValueError(f"G={g} not a multiple of group_chunk={group_chunk}")
    pmax = pk.shape[2]
    cos_full, sin_full = _rope_tables(config, pmax + s)
    n_chunks = g // group_chunk

    def one(idx, xs):
        ids, mask, off = xs
        start = idx * group_chunk
        pk_c = lax.dynamic_slice_in_dim(pk, start, group_chunk, axis=1)
        pv_c = lax.dynamic_slice_in_dim(pv, start, group_chunk, axis=1)
        pmask_c = lax.dynamic_slice_in_dim(
            prefix_mask, start, group_chunk, axis=0
        )
        scores = _suffix_forward_scores(
            params,
            config,
            pk_c,
            pv_c,
            pmask_c,
            ids,
            mask,
            off,
            cos_full,
            sin_full,
            token_true,
            token_false,
        )
        return idx + 1, scores

    _, out = lax.scan(
        one,
        0,
        (
            suffix_ids.reshape(n_chunks, group_chunk, d, s),
            suffix_mask.reshape(n_chunks, group_chunk, d, s),
            pos_offset.reshape(n_chunks, group_chunk),
        ),
    )
    return out.reshape(g, d)


# ----------------------------------------------------------------------
# Int8 trunk (W8A8 dynamic) — reranker throughput path
# ----------------------------------------------------------------------
#
# The v5e MXU runs int8xint8->int32 at 2x the bf16 FLOP rate (394 vs 197
# TOPS), and the rerank forward is the pipeline's dominant device cost at
# production document lengths. This path quantizes every linear projection
# to int8 (per-output-channel weight scales) and dynamically quantizes
# activations per token (max-abs row scales); attention einsums, norms,
# RoPE, softmax and the logit head stay bf16/f32. Opt-in via
# RerankerClient(dtype="int8") / LEAN_EXPLORE_RERANKER_INT8=1; score drift
# vs the bf16 forward is measured with a trained checkpoint in
# tests/models_nn/test_qwen3_int8.py and docs/performance.md.

_INT8_PROJS = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj",
    "down_proj", "qkv_proj", "gate_up_proj",  # fused serving layout
)


def quantize_params_int8(params: dict) -> dict:
    """Per-output-channel int8 quantization of the linear projections.

    Returns a params pytree where each proj leaf is replaced by a dict
    ``{"w8": int8 [L, in, out], "scale": f32 [L, 1, out]}``; all other
    leaves (embed, norms, lm_head) are unchanged.
    """

    def quant(w):
        wf = jnp.asarray(w, jnp.float32)
        scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0  # [L,1,O]
        scale = jnp.maximum(scale, 1e-12)
        w8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        return {"w8": w8, "scale": scale}

    layers = dict(params["layers"])
    for name in _INT8_PROJS:
        if name in layers:  # per-projection OR fused serving layout
            layers[name] = quant(layers[name])
    out = dict(params)
    out["layers"] = layers
    return out


def _linear_q8(h: jnp.ndarray, q: dict) -> jnp.ndarray:
    """Dynamic W8A8 linear: h [..., H] @ {w8 [H, O], scale [1, O]}.

    Activations are quantized per row (per token) with max-abs scales, the
    matmul accumulates int8xint8->int32 on the MXU, and the two scale
    vectors rescale the result back to h's dtype.
    """
    hf = h.astype(jnp.float32)
    a_scale = jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0
    a_scale = jnp.maximum(a_scale, 1e-12)
    h8 = jnp.clip(jnp.round(hf / a_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        h8,
        q["w8"],
        (((h8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * a_scale * q["scale"]).astype(h.dtype)


def _proj(h: jnp.ndarray, p) -> jnp.ndarray:
    """One linear projection: dense weight matrix or int8 quant dict.

    Every trunk entry point (embed_pool, rerank_scores, prefix_kv, the
    grouped suffix forward) projects through this dispatch, so
    ``quantize_params_int8`` output works everywhere without twin
    forwards; the pytree structure difference simply traces a separate
    jit specialization.
    """
    if isinstance(p, dict):
        return _linear_q8(h, p)
    return h @ p


def fuse_params_for_serving(params: dict) -> dict:
    """Concatenate q/k/v and gate/up weights into single GEMM operands.

    Three [H, *] projections from the same activation become one
    [H, (NQ+2*NKV)*DH] matmul (and gate/up one [H, 2I]) — fewer, larger
    GEMMs for the small-row serving regime. Column-exact: each output
    column is the identical dot product, so scores are bit-compatible
    with the unfused layout (a parity test pins this). Serving-only —
    the training stack and HF import/export keep the per-projection
    layout; int8-quantized pytrees are rejected (quantize AFTER fusing
    if both are wanted).
    """
    layers = dict(params["layers"])
    if "qkv_proj" in layers:
        raise ValueError(
            "params are already fused for serving (qkv_proj present); "
            "fuse_params_for_serving is not idempotent — fuse the "
            "per-projection checkpoint once"
        )
    for name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        if isinstance(layers.get(name), dict):
            raise ValueError(
                "fuse_params_for_serving expects dense weights; apply "
                "quantize_params_int8 after fusing"
            )
    layers["qkv_proj"] = jnp.concatenate(
        [layers.pop("q_proj"), layers.pop("k_proj"), layers.pop("v_proj")],
        axis=-1,
    )
    layers["gate_up_proj"] = jnp.concatenate(
        [layers.pop("gate_proj"), layers.pop("up_proj")], axis=-1
    )
    return {**params, "layers": layers}


def _qkv(h: jnp.ndarray, p: dict, lead: tuple, nq: int, nkv: int, dh: int):
    """Project q/k/v from either the fused or the per-projection layout."""
    if "qkv_proj" in p:
        qkv = _proj(h, p["qkv_proj"])
        q, k, v = jnp.split(qkv, [nq * dh, (nq + nkv) * dh], axis=-1)
    else:
        q = _proj(h, p["q_proj"])
        k = _proj(h, p["k_proj"])
        v = _proj(h, p["v_proj"])
    return (
        q.reshape(*lead, nq, dh),
        k.reshape(*lead, nkv, dh),
        v.reshape(*lead, nkv, dh),
    )


def _mlp(h: jnp.ndarray, p: dict) -> jnp.ndarray:
    """SwiGLU MLP from either the fused or the per-projection layout."""
    if "gate_up_proj" in p:
        gate, up = jnp.split(_proj(h, p["gate_up_proj"]), 2, axis=-1)
    else:
        gate, up = _proj(h, p["gate_proj"]), _proj(h, p["up_proj"])
    return _proj(jax.nn.silu(gate) * up, p["down_proj"])


@functools.partial(
    jax.jit, static_argnames=("config", "token_true", "token_false")
)
def rerank_scores_chained(
    params: dict,
    config: Qwen3Config,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    *,
    token_true: int,
    token_false: int,
) -> jnp.ndarray:
    """rerank_scores over stacked same-shape buckets: [G, B, T] -> [G, B].

    One device dispatch scores G batches via lax.scan of the forward —
    on RPC-fronted deployments (and the axon relay) the fixed per-dispatch
    latency otherwise dominates multi-bucket rerank calls."""

    def one(_, xm):
        ids, mask = xm
        return None, rerank_scores(
            params, config, ids, mask,
            token_true=token_true, token_false=token_false,
        )

    _, scores = jax.lax.scan(one, None, (input_ids, attention_mask))
    return scores
