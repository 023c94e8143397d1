"""Load HF safetensors checkpoints into the JAX Qwen3 parameter pytree.

Handles single-file and sharded (``model.safetensors.index.json``)
checkpoints. Linear weights are transposed from HF's [out, in] to [in, out]
and per-layer tensors are stacked along a leading layer axis for the
``lax.scan`` trunk (models/qwen3.py).
"""

import json
import logging
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from lean_explore_tpu.models.qwen3 import Qwen3Config

logger = logging.getLogger(__name__)


def _open_checkpoint(model_dir: Path) -> dict[str, np.ndarray]:
    """Read every tensor from the checkpoint into host numpy arrays."""
    from safetensors import safe_open

    index_path = model_dir / "model.safetensors.index.json"
    if index_path.exists():
        with open(index_path) as f:
            weight_map: dict[str, str] = json.load(f)["weight_map"]
        files = sorted(set(weight_map.values()))
    else:
        single = model_dir / "model.safetensors"
        if not single.exists():
            candidates = sorted(model_dir.glob("*.safetensors"))
            if not candidates:
                raise FileNotFoundError(
                    f"No safetensors checkpoint found under {model_dir}"
                )
            files = [c.name for c in candidates]
        else:
            files = [single.name]

    tensors: dict[str, np.ndarray] = {}
    for fname in files:
        with safe_open(model_dir / fname, framework="numpy") as f:
            for key in f.keys():
                tensors[key] = f.get_tensor(key)
    return tensors


def _maybe_strip_prefix(tensors: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Sentence-transformers checkpoints may not carry the lm head / may nest
    under 'model.'; normalize to HF causal-LM naming rooted at 'model.'."""
    if any(k.startswith("model.") for k in tensors):
        return tensors
    return {f"model.{k}" if not k.startswith("lm_head") else k: v
            for k, v in tensors.items()}


def load_params(
    model_dir: str | Path, *, dtype=jnp.bfloat16
) -> tuple[dict, Qwen3Config]:
    """Load (params, config) from an HF model directory."""
    model_dir = Path(model_dir)
    config = Qwen3Config.from_dir(model_dir)
    raw = _maybe_strip_prefix(_open_checkpoint(model_dir))
    logger.info("Loaded %d tensors from %s", len(raw), model_dir)

    def take(name: str) -> np.ndarray:
        if name not in raw:
            raise KeyError(
                f"Tensor {name!r} missing from checkpoint {model_dir} "
                f"(have {len(raw)} tensors)"
            )
        return raw[name].astype(np.float32)

    layers = config.num_hidden_layers

    def stack(pattern: str, transpose: bool) -> jnp.ndarray:
        mats = []
        for i in range(layers):
            m = take(pattern.format(i=i))
            mats.append(m.T if transpose else m)
        return jnp.asarray(np.stack(mats), dtype=dtype)

    prefix = "model.layers.{i}."
    params = {
        "embed": jnp.asarray(take("model.embed_tokens.weight"), dtype=dtype),
        "layers": {
            "input_norm": stack(prefix + "input_layernorm.weight", False),
            "q_proj": stack(prefix + "self_attn.q_proj.weight", True),
            "k_proj": stack(prefix + "self_attn.k_proj.weight", True),
            "v_proj": stack(prefix + "self_attn.v_proj.weight", True),
            "o_proj": stack(prefix + "self_attn.o_proj.weight", True),
            "q_norm": stack(prefix + "self_attn.q_norm.weight", False),
            "k_norm": stack(prefix + "self_attn.k_norm.weight", False),
            "post_norm": stack(prefix + "post_attention_layernorm.weight", False),
            "gate_proj": stack(prefix + "mlp.gate_proj.weight", True),
            "up_proj": stack(prefix + "mlp.up_proj.weight", True),
            "down_proj": stack(prefix + "mlp.down_proj.weight", True),
        },
        "final_norm": jnp.asarray(take("model.norm.weight"), dtype=dtype),
        "lm_head": None,
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(take("lm_head.weight").T, dtype=dtype)
    return params, config
