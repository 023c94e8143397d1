"""Export trained JAX params as an HF-format checkpoint directory.

The exact inverse of models/hf_loader.load_params: the scan-stacked layer
pytree is unstacked, linear weights are transposed back to HF's [out, in],
and the result is written as ``model.safetensors`` + ``config.json`` so
``EmbeddingClient`` (and any HF consumer) can load the trained embedder —
e.g. by pointing ``LEAN_EXPLORE_EMBEDDING_MODEL`` at the exported directory.
The reference consumes its models frozen from the hub (reference
util/embedding_client.py:58-66); this closes the loop for models trained
with the in-repo stack (train/contrastive.py).
"""

import json
import logging
import shutil
from pathlib import Path

import numpy as np

from lean_explore_tpu.models.qwen3 import Qwen3Config

logger = logging.getLogger(__name__)

_TOKENIZER_FILES = (
    "tokenizer.json",
    "tokenizer_config.json",
    "special_tokens_map.json",
    "vocab.json",
    "merges.txt",
)


def config_to_hf(config: Qwen3Config) -> dict:
    """HF config.json dict for a Qwen3Config (Qwen3Config.from_hf inverse)."""
    return {
        "architectures": ["Qwen3ForCausalLM"],
        "model_type": "qwen3",
        "vocab_size": config.vocab_size,
        "hidden_size": config.hidden_size,
        "num_hidden_layers": config.num_hidden_layers,
        "num_attention_heads": config.num_attention_heads,
        "num_key_value_heads": config.num_key_value_heads,
        "head_dim": config.head_dim,
        "intermediate_size": config.intermediate_size,
        "rms_norm_eps": config.rms_norm_eps,
        "rope_theta": config.rope_theta,
        "tie_word_embeddings": config.tie_word_embeddings,
    }


def export_hf_checkpoint(
    params: dict,
    config: Qwen3Config,
    out_dir: str | Path,
    *,
    tokenizer_dir: str | Path | None = None,
    query_prompt: str | None = None,
) -> Path:
    """Write params as an HF checkpoint EmbeddingClient can load.

    Args:
        params: The qwen3 parameter pytree (host or device arrays).
        config: Matching model config.
        out_dir: Output directory (created; existing tensors overwritten).
        tokenizer_dir: If given, tokenizer files are copied from here so the
            exported directory is self-contained.
        query_prompt: If given, written to config_sentence_transformers.json
            as the asymmetric ``query`` prompt (the field EmbeddingClient
            prefers over its built-in default).
    """
    from safetensors.numpy import save_file

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    # A leftover sharded-checkpoint index would make hf_loader prefer the
    # OLD shard files over the fresh model.safetensors written below —
    # silently serving pre-training weights. Remove the sharded layout.
    index = out_dir / "model.safetensors.index.json"
    if index.exists():
        index.unlink()
        for shard in out_dir.glob("model-*-of-*.safetensors"):
            shard.unlink()

    def host(x) -> np.ndarray:
        return np.asarray(x, dtype=np.float32)

    layers = params["layers"]
    transposed = {
        "q_proj", "k_proj", "v_proj", "o_proj",
        "gate_proj", "up_proj", "down_proj",
    }
    hf_layer_names = {
        "input_norm": "input_layernorm.weight",
        "q_proj": "self_attn.q_proj.weight",
        "k_proj": "self_attn.k_proj.weight",
        "v_proj": "self_attn.v_proj.weight",
        "o_proj": "self_attn.o_proj.weight",
        "q_norm": "self_attn.q_norm.weight",
        "k_norm": "self_attn.k_norm.weight",
        "post_norm": "post_attention_layernorm.weight",
        "gate_proj": "mlp.gate_proj.weight",
        "up_proj": "mlp.up_proj.weight",
        "down_proj": "mlp.down_proj.weight",
    }
    tensors: dict[str, np.ndarray] = {
        "model.embed_tokens.weight": host(params["embed"]),
        "model.norm.weight": host(params["final_norm"]),
    }
    for key, hf_name in hf_layer_names.items():
        stacked = host(layers[key])
        for i in range(config.num_hidden_layers):
            mat = stacked[i]
            if key in transposed:
                mat = mat.T
            tensors[f"model.layers.{i}.{hf_name}"] = np.ascontiguousarray(mat)
    if not config.tie_word_embeddings:
        tensors["lm_head.weight"] = np.ascontiguousarray(
            host(params["lm_head"]).T
        )

    save_file(tensors, str(out_dir / "model.safetensors"))
    (out_dir / "config.json").write_text(
        json.dumps(config_to_hf(config), indent=2)
    )
    if tokenizer_dir is not None:
        tokenizer_dir = Path(tokenizer_dir)
        for name in _TOKENIZER_FILES:
            src = tokenizer_dir / name
            if src.exists():
                shutil.copy(src, out_dir / name)
    if query_prompt is not None:
        (out_dir / "config_sentence_transformers.json").write_text(
            json.dumps({"prompts": {"query": query_prompt}})
        )
    logger.info("exported HF checkpoint: %s (%d tensors)", out_dir, len(tensors))
    return out_dir
