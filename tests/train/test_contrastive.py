"""Sharded contrastive training tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lean_explore_tpu.models.qwen3 import Qwen3Config
from lean_explore_tpu.parallel import TRAIN_AXES, make_mesh
from lean_explore_tpu.train import (
    ContrastiveBatch,
    infonce_loss,
    init_train_state,
    make_optimizer,
    make_train_step,
)


def make_batch(rng, batch=8, seq=8, vocab=512) -> ContrastiveBatch:
    ids = rng.integers(1, vocab, size=(2, batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), dtype=np.int32)
    return ContrastiveBatch(
        query_ids=jnp.asarray(ids[0]),
        query_mask=jnp.asarray(mask),
        doc_ids=jnp.asarray(ids[1]),
        doc_mask=jnp.asarray(mask),
        doc_dup_mask=jnp.zeros((batch, batch), dtype=bool),
    )


class TestTraining:
    @pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4), (8, 1)])
    def test_train_step_decreases_loss(self, mesh_shape):
        config = Qwen3Config.tiny()
        mesh = make_mesh(mesh_shape, axis_names=TRAIN_AXES)
        optimizer = make_optimizer(learning_rate=1e-3)
        params, opt_state = init_train_state(config, mesh, optimizer)
        step = make_train_step(config, mesh, optimizer)

        batch = make_batch(np.random.default_rng(0))
        losses = []
        for _ in range(4):
            params, opt_state, metrics = step(params, opt_state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_params_are_tp_sharded(self):
        config = Qwen3Config.tiny()
        mesh = make_mesh((2, 4), axis_names=TRAIN_AXES)
        optimizer = make_optimizer()
        params, _ = init_train_state(config, mesh, optimizer)
        spec = params["layers"]["q_proj"].sharding.spec
        assert spec == jax.sharding.PartitionSpec(None, None, "model")

    def test_loss_identity_batch(self):
        """Identical query/doc token streams -> diagonal dominant, acc 1.0
        after the encoder maps them identically."""
        config = Qwen3Config.tiny()
        params_key = jax.random.PRNGKey(0)
        from lean_explore_tpu.models import qwen3

        params = qwen3.init_params(config, params_key)
        rng = np.random.default_rng(1)
        ids = jnp.asarray(rng.integers(1, 512, size=(4, 8)).astype(np.int32))
        mask = jnp.ones((4, 8), dtype=jnp.int32)
        batch = ContrastiveBatch(
            ids, mask, ids, mask, jnp.zeros((4, 4), dtype=bool)
        )
        loss, metrics = infonce_loss(params, config, batch)
        assert float(metrics["accuracy"]) == 1.0
        assert float(loss) >= 0.0
