"""Embedding client: batched JAX Qwen3 forward passes.

Drop-in behavioral replacement for the reference's sentence-transformers
client (/root/reference/src/lean_explore/util/embedding_client.py:29-106):
same ``embed(texts, is_query) -> EmbeddingResponse`` surface, same
asymmetric query prompt, env-overridable batch size — but the forward pass
is a jitted bf16 JAX program with bucketed padding instead of a torch
``encode`` loop.
"""

import asyncio
import json
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

DEFAULT_BATCH_SIZE = 64

# Qwen3-Embedding's published asymmetric query prompt (the value
# sentence-transformers reads from config_sentence_transformers.json when the
# reference passes prompt_name="query", embedding_client.py:90-99).
DEFAULT_QUERY_PROMPT = (
    "Instruct: Given a web search query, retrieve relevant passages that "
    "answer the query\nQuery: "
)


class EmbeddingResponse(BaseModel):
    """Response from embedding generation (schema parity with reference)."""

    texts: list[str]
    embeddings: list[list[float]]
    model: str


def _read_query_prompt(model_dir: Path) -> str:
    """Prefer the checkpoint's own sentence-transformers prompt config."""
    cfg = model_dir / "config_sentence_transformers.json"
    if cfg.exists():
        try:
            prompts = json.loads(cfg.read_text()).get("prompts", {})
            if isinstance(prompts, dict) and isinstance(
                prompts.get("query"), str
            ):
                return prompts["query"]
        except (json.JSONDecodeError, OSError, AttributeError):
            # AttributeError: valid JSON with a non-dict root — graceful
            # fallback is this function's whole purpose.
            logger.warning("Unreadable %s; using default query prompt", cfg)
    return DEFAULT_QUERY_PROMPT


class EmbeddingClient:
    """Client for generating text embeddings on TPU."""

    def __init__(
        self,
        model_name: str,
        *,
        model_dir: str | Path | None = None,
        max_length: int | None = 512,
        batch_size: int | None = None,
        dtype: str = "bfloat16",
        query_prompt: str | None = None,
        append_eos: bool = True,
        mesh=None,
    ):
        """Load tokenizer + params and prepare the jitted forward.

        Args:
            model_name: HF id (reporting) or a local directory path.
            model_dir: Local checkpoint directory; defaults to model_name when
                that is an existing path, else $LEAN_EXPLORE_MODELS_DIR/<name>.
            max_length: Token truncation length (reference engine.py:135).
            batch_size: Device batch; falls back to
                LEAN_EXPLORE_EMBEDDING_BATCH_SIZE env, then 64 (TPU default).
            dtype: Parameter dtype on device (bfloat16 serving, float32 parity).
            query_prompt: Override the asymmetric query prefix.
            append_eos: Append EOS before pooling (Qwen3 embedding convention).
            mesh: Optional jax Mesh with a ``data`` axis: parameters are
                replicated and each batch is sharded over ``data`` (DP), so
                corpus embedding scales across chips (the index-build hot
                loop, reference extract/embeddings.py:262-296).
        """
        self.model_name = model_name
        resolved = Path(model_dir) if model_dir else _resolve_model_dir(model_name)
        self.model_dir = resolved
        if batch_size is not None and batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {batch_size}")
        self.max_length = max_length if max_length is not None else 512
        env_batch = os.getenv("LEAN_EXPLORE_EMBEDDING_BATCH_SIZE")
        self.batch_size = (
            batch_size
            if batch_size is not None
            else (int(env_batch) if env_batch else DEFAULT_BATCH_SIZE)
        )
        self.append_eos = append_eos
        logger.info("Loading embedding model %s from %s", model_name, resolved)
        self.tokenizer = load_tokenizer(resolved)
        # HF fast tokenizers are not re-entrant across threads ("Already
        # borrowed"); concurrent embed()/embed_device() calls run via
        # asyncio.to_thread, so tokenizer use is serialized here (same
        # guard as RerankerClient).
        self._tokenizer_lock = threading.Lock()
        self.params, self.config = load_params(resolved, dtype=jnp.dtype(dtype))
        if os.getenv("LEAN_EXPLORE_FUSED_QKV") == "1":
            # Column-exact GEMM fusion (qwen3.fuse_params_for_serving);
            # opt-in while the measured win is being characterized.
            self.params = qwen3_mod.fuse_params_for_serving(self.params)
        self.query_prompt = (
            query_prompt if query_prompt is not None else _read_query_prompt(resolved)
        )
        self.mesh = mesh
        self._data_sharding = None
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_data = mesh.shape["data"]
            self._data_sharding = NamedSharding(mesh, P("data", None))
            self.params = jax.device_put(self.params, NamedSharding(mesh, P()))
            # Each device batch must split evenly over the data axis.
            self.batch_size = max(
                n_data, (self.batch_size // n_data) * n_data
            )
            logger.info(
                "embedding DP over %d devices (batch %d)", n_data, self.batch_size
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
        batch_size: int = 64,
        append_eos: bool = True,
        query_prompt: str = "",
    ) -> "EmbeddingClient":
        """Build a client around already-loaded params/config/tokenizer.

        The ONE sanctioned way to construct without a checkpoint directory
        (benchmarks with random weights, tests): it sets every instance
        attribute the scoring paths touch, so adding an attribute to
        __init__ must be mirrored HERE — not in ad-hoc object.__new__
        call sites that silently miss it. Single-device only.
        """
        self = object.__new__(cls)
        self.model_name = model_name
        self.model_dir = model_dir
        self.max_length = max_length
        self.batch_size = batch_size
        self.append_eos = append_eos
        self.tokenizer = tokenizer
        self._tokenizer_lock = threading.Lock()
        self.params, self.config = params, config
        self.query_prompt = query_prompt
        self.mesh = None
        self._data_sharding = None
        return self

    def _device_batch(self, ids: np.ndarray, mask: np.ndarray):
        """Place one padded token batch, sharding rows over the mesh if set."""
        if self._data_sharding is None:
            return jnp.asarray(ids), jnp.asarray(mask)
        import jax

        n_data = self.mesh.shape["data"]
        rows = ids.shape[0]
        padded = ((rows + n_data - 1) // n_data) * n_data
        if padded != rows:
            pad = ((0, padded - rows), (0, 0))
            ids = np.pad(ids, pad)
            mask = np.pad(mask, pad)
            mask[rows:, 0] = 1  # fully-masked rows upset pooling; keep 1 token
        return (
            jax.device_put(jnp.asarray(ids), self._data_sharding),
            jax.device_put(jnp.asarray(mask), self._data_sharding),
        )

    @property
    def dim(self) -> int:
        return self.config.hidden_size

    def embed_device(self, texts: list[str], is_query: bool = False):
        """Embed texts -> L2-normalized device array [len(texts), H].

        The device-native entry point: callers that feed the result straight
        into on-device retrieval (SearchEngine's dense stage) avoid the
        device->host->device round trip of the wire-format ``embed``.
        """
        if not texts:
            return jnp.zeros((0, self.config.hidden_size), jnp.float32)
        prompted = (
            [self.query_prompt + t for t in texts] if is_query else list(texts)
        )
        out = []
        for start in range(0, len(prompted), self.batch_size):
            chunk = prompted[start : start + self.batch_size]
            with self._tokenizer_lock:
                batch = encode_batch(
                    self.tokenizer,
                    chunk,
                    max_length=self.max_length,
                    append_eos=self.append_eos,
                )
            if self._data_sharding is None:
                # Ids + [B] lengths dispatch: the [B, T] mask is expanded
                # in-graph (qwen3.embed_pool_from_ids) — half the
                # host->device transfer on the encode hot path, with
                # validity taken from the tokenizer's exact row lengths.
                emb = qwen3_mod.embed_pool_from_ids(
                    self.params,
                    self.config,
                    np.asarray(batch.input_ids),
                    np.asarray(
                        batch.attention_mask.sum(axis=1), dtype=np.int32
                    ),
                )
            else:
                ids, mask = self._device_batch(
                    np.asarray(batch.input_ids),
                    np.asarray(batch.attention_mask),
                )
                emb = qwen3_mod.embed_pool(self.params, self.config, ids, mask)
            out.append(emb[: batch.n_valid])
        return out[0] if len(out) == 1 else jnp.concatenate(out, axis=0)

    def embed_sync(self, texts: list[str], is_query: bool = False) -> np.ndarray:
        """Embed texts -> float32 [len(texts), H], L2-normalized."""
        return np.asarray(self.embed_device(texts, is_query))

    async def embed(
        self, texts: list[str], is_query: bool = False
    ) -> EmbeddingResponse:
        """Async wrapper matching the reference surface (embedding_client.py:73)."""
        embeddings = await asyncio.to_thread(self.embed_sync, texts, is_query)
        return EmbeddingResponse(
            texts=list(texts),
            embeddings=[row.tolist() for row in embeddings],
            model=self.model_name,
        )


def _resolve_model_dir(model_name: str) -> Path:
    """Resolve a model id to a local directory (no downloads in this env)."""
    direct = Path(model_name)
    if direct.exists():
        return direct
    root = os.getenv("LEAN_EXPLORE_MODELS_DIR")
    if root:
        candidate = Path(root) / model_name.replace("/", "--")
        if candidate.exists():
            return candidate
        candidate = Path(root) / model_name.split("/")[-1]
        if candidate.exists():
            return candidate
    raise FileNotFoundError(
        f"Model {model_name!r} not found locally. Set LEAN_EXPLORE_MODELS_DIR "
        "to a directory containing the checkpoint, or pass model_dir."
    )
