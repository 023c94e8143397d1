"""Contrastive (InfoNCE) fine-tuning of the Qwen3 embedder over a mesh.

The reference has no training at all (its models are consumed frozen);
a production retrieval stack needs domain fine-tuning, so the framework
ships a sharded training step:

- ``data`` axis: batch data-parallelism (gradients all-reduced by GSPMD).
- ``model`` axis: tensor parallelism — attention heads and MLP hidden are
  sharded per ``param_partition_specs``; XLA inserts the all-reduces.
- Pipeline/expert parallelism are structurally N/A for this 0.6B dense
  decoder (no MoE; depth fits one device); the corpus axis used at serving
  time (parallel/sharded.py) is this workload's sequence-parallel analogue.

In-batch negatives: query i's positive is document i, every other document
in the global batch is a negative.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lean_explore_tpu.models import qwen3
from lean_explore_tpu.models.qwen3 import Qwen3Config


def param_partition_specs(config: Qwen3Config) -> dict:
    """PartitionSpec pytree for the Qwen3 params (TP over 'model')."""
    return {
        "embed": P(None, None),  # replicated: gathered by token ids
        "layers": {
            "input_norm": P(None, None),
            "q_proj": P(None, None, "model"),
            "k_proj": P(None, None, "model"),
            "v_proj": P(None, None, "model"),
            "o_proj": P(None, "model", None),
            "q_norm": P(None, None),
            "k_norm": P(None, None),
            "post_norm": P(None, None),
            "gate_proj": P(None, None, "model"),
            "up_proj": P(None, None, "model"),
            "down_proj": P(None, "model", None),
        },
        "final_norm": P(None),
        "lm_head": P(None, "model") if not config.tie_word_embeddings else None,
    }


def shard_params(params: dict, mesh: Mesh, config: Qwen3Config) -> dict:
    """Place a parameter pytree onto the mesh with TP shardings."""
    specs = param_partition_specs(config)
    return jax.tree.map(
        lambda value, spec: (
            None if value is None else jax.device_put(value, NamedSharding(mesh, spec))
        ),
        params,
        specs,
        is_leaf=lambda x: x is None,
    )


class ContrastiveBatch(NamedTuple):
    """One training batch of (query, positive-document) pairs."""

    query_ids: jnp.ndarray  # [B, Tq] int32
    query_mask: jnp.ndarray  # [B, Tq] int32
    doc_ids: jnp.ndarray  # [B, Td] int32
    doc_mask: jnp.ndarray  # [B, Td] int32
    # True at [i, j] (i != j) when doc_j is the SAME text as doc_i: the
    # pair source emits multiple queries per document (name + title +
    # paraphrases), so a batch can contain duplicate positives — without
    # masking, InfoNCE penalizes the true duplicate as a negative.
    doc_dup_mask: jnp.ndarray  # [B, B] bool


def infonce_loss(
    params: dict,
    config: Qwen3Config,
    batch: ContrastiveBatch,
    temperature: float = 0.05,
) -> tuple[jnp.ndarray, dict]:
    """Symmetric InfoNCE with in-batch negatives (duplicate-positive
    columns masked out — see ContrastiveBatch.doc_dup_mask)."""
    q = qwen3.embed_pool(params, config, batch.query_ids, batch.query_mask)
    d = qwen3.embed_pool(params, config, batch.doc_ids, batch.doc_mask)
    logits = (q @ d.T) / temperature  # [B, B] f32
    logits = jnp.where(batch.doc_dup_mask, -1e9, logits)
    labels = jnp.arange(logits.shape[0])
    loss_q = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_d = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    loss = 0.5 * (loss_q.mean() + loss_d.mean())
    accuracy = jnp.mean(jnp.argmax(logits, axis=1) == labels)
    return loss, {"loss": loss, "accuracy": accuracy}


def make_optimizer(
    learning_rate: float = 1e-5, weight_decay: float = 0.01
) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, weight_decay=weight_decay)


def make_train_step(
    config: Qwen3Config,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    temperature: float = 0.05,
):
    """Jitted sharded train step: (params, opt_state, batch) -> updated.

    Params carry TP shardings, the batch carries data shardings; GSPMD
    inserts the gradient all-reduce over ``data`` and the TP collectives
    over ``model``.
    """

    def step(params, opt_state, batch: ContrastiveBatch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: infonce_loss(p, config, batch, temperature), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    batch_sharding = ContrastiveBatch(
        *(NamedSharding(mesh, P("data", None)) for _ in range(5))
    )
    specs = param_partition_specs(config)
    param_sharding = jax.tree.map(
        lambda spec: None if spec is None else NamedSharding(mesh, spec),
        specs,
        is_leaf=lambda x: x is None or isinstance(x, P),
    )
    return jax.jit(
        step,
        in_shardings=(param_sharding, None, batch_sharding),
        out_shardings=(param_sharding, None, None),
    )


def init_train_state(
    config: Qwen3Config,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    *,
    seed: int = 0,
    dtype=jnp.float32,
):
    """Random-init params sharded over the mesh + matching opt state.

    The optimizer init runs under jit so the moments inherit their params'
    shardings; any leaf XLA leaves on a single device (scalars like the
    adam step count) is then committed mesh-replicated, so checkpoints
    restore onto placements the train step accepts.
    """
    params = qwen3.init_params(config, jax.random.PRNGKey(seed), dtype=dtype)
    params = shard_params(params, mesh, config)
    opt_state = jax.jit(optimizer.init)(params)
    opt_state = commit_to_mesh(opt_state, mesh)
    return params, opt_state


def commit_to_mesh(tree, mesh: Mesh):
    """Re-place any single-device leaf as mesh-replicated."""

    def fix(leaf):
        if leaf is None or isinstance(
            getattr(leaf, "sharding", None), NamedSharding
        ):
            return leaf
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree.map(fix, tree, is_leaf=lambda x: x is None)
