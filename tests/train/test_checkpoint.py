"""Orbax checkpoint round-trip on the sharded train state."""

import jax
import numpy as np
import pytest

from lean_explore_tpu.models.qwen3 import Qwen3Config
from lean_explore_tpu.parallel import TRAIN_AXES, make_mesh
from lean_explore_tpu.train import (
    init_train_state,
    latest_checkpoint,
    make_optimizer,
    restore_checkpoint,
    save_checkpoint,
)


class TestCheckpoint:
    def test_round_trip_preserves_values_and_sharding(self, tmp_path):
        config = Qwen3Config.tiny()
        mesh = make_mesh((2, 4), axis_names=TRAIN_AXES)
        optimizer = make_optimizer()
        params, opt_state = init_train_state(config, mesh, optimizer, seed=3)

        save_checkpoint(tmp_path, 7, params, opt_state)
        found = latest_checkpoint(tmp_path)
        assert found is not None and found[0] == 7

        template_params, template_opt = init_train_state(
            config, mesh, optimizer, seed=99
        )
        restored = restore_checkpoint(
            found[1], {"params": template_params, "opt_state": template_opt}
        )
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["embed"]),
            np.asarray(params["embed"]),
        )
        q = restored["params"]["layers"]["q_proj"]
        assert q.sharding.spec == jax.sharding.PartitionSpec(None, None, "model")

    def test_latest_of_many(self, tmp_path):
        config = Qwen3Config.tiny()
        mesh = make_mesh((1, 8), axis_names=TRAIN_AXES)
        optimizer = make_optimizer()
        params, opt_state = init_train_state(config, mesh, optimizer)
        save_checkpoint(tmp_path, 1, params, opt_state)
        save_checkpoint(tmp_path, 12, params, opt_state)
        step, _ = latest_checkpoint(tmp_path)
        assert step == 12

    def test_latest_none(self, tmp_path):
        assert latest_checkpoint(tmp_path / "void") is None
