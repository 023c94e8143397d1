"""DP-sharded cross-encoder rerank over a device mesh.

Rerank dominates serving cost (docs/performance.md: ~1.1-8 s of every
config-4 batch), and query groups are embarrassingly parallel — each
group's prefix-KV forward and document-suffix scoring touch only its own
rows. This module shards the GROUP axis over the mesh's ``data`` axis
with ``shard_map``: every device runs the identical grouped pipeline
(qwen3.prefix_kv + rerank_scores_grouped, including its internal
group-chunk scan) on its shard, parameters replicated, ZERO collectives
(the gather back to the host is the only cross-device movement).
Multi-chip serving therefore scales the rerank stage ~linearly in
devices — the reference has no analogue (single-process torch,
SURVEY.md §2c).

The retrieval path uses a 2D (data, corpus) mesh; rerank wants every
device on one ``data`` axis, so ``rerank_data_mesh`` builds a flat 1D
view over the same devices.
"""

import logging

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lean_explore_tpu.models import qwen3
from lean_explore_tpu.models.qwen3 import Qwen3Config

logger = logging.getLogger(__name__)


def rerank_data_mesh(source: Mesh | None = None, devices=None) -> Mesh:
    """1D ('data',) mesh over a source mesh's devices (or jax.devices())."""
    if devices is None:
        devices = (
            source.devices.flatten() if source is not None else jax.devices()
        )
    import numpy as np

    return Mesh(np.asarray(list(devices)), ("data",))


def replicate_params(params: dict, mesh: Mesh) -> dict:
    """Place a parameter pytree replicated on every mesh device."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: None if x is None else jax.device_put(x, sharding),
        params,
        is_leaf=lambda x: x is None,
    )


def make_sharded_grouped_scorer(
    config: Qwen3Config,
    mesh: Mesh,
    *,
    token_true: int,
    token_false: int,
    group_chunk: int,
):
    """Jitted scorer: (params, prefix_ids [G,P], prefix_mask, suffix_ids
    [G,D,S], suffix_mask, pos_offset [G]) -> [G, D] P(true).

    G must be a multiple of mesh data size x group_chunk (the caller pads;
    pad groups carry one valid token and their scores are discarded).
    Scores are numerically the single-device grouped path's — each shard
    runs the identical program on its rows (a parity test pins this).
    """

    def local(params, p_ids, p_mask, s_ids, s_mask, off):
        pk, pv = qwen3.prefix_kv(params, config, p_ids, p_mask)
        return qwen3.rerank_scores_grouped(
            params, config, pk, pv, p_mask, s_ids, s_mask, off,
            token_true=token_true,
            token_false=token_false,
            group_chunk=group_chunk,
        )

    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(),  # params: replicated
            P("data", None),
            P("data", None),
            P("data", None, None),
            P("data", None, None),
            P("data"),
        ),
        out_specs=P("data"),
    )
    return jax.jit(sharded)
