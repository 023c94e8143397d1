"""Device mesh construction for sharded serving and training.

Axes:
- ``data``: query batch (DP) / training batch.
- ``corpus``: corpus embedding rows (the "long axis" of this workload —
  SURVEY.md §5; the analogue of sequence/context parallelism for a
  retrieval engine).
- ``model``: tensor-parallel axis for the encoder/reranker during training.

Single-host TPU slices put all axes over ICI; multi-host deployments get
DCN on the outermost (data) axis via jax.distributed — standard JAX device
order already reflects that.
"""

import logging

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger(__name__)

SERVE_AXES = ("data", "corpus")
TRAIN_AXES = ("data", "model")


def make_mesh(
    shape: tuple[int, int] | None = None,
    *,
    axis_names: tuple[str, str] = SERVE_AXES,
    devices=None,
) -> Mesh:
    """Build a 2D mesh over the available devices.

    Args:
        shape: (axis0, axis1) sizes; default (1, n_devices) — all devices on
            the second axis (corpus sharding / tensor parallel).
        axis_names: Mesh axis names.
        devices: Device list; defaults to jax.devices().
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (1, len(devices))
    total = shape[0] * shape[1]
    if total > len(devices):
        raise ValueError(
            f"mesh shape {shape} needs {total} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:total]).reshape(shape)
    logger.info("Mesh %s over %d devices (%s)", shape, total, axis_names)
    return Mesh(grid, axis_names)


def serve_mesh_from_config() -> Mesh | None:
    """Build the serving mesh from ``Config.MESH_SHAPE``, or None.

    One env var (``LEAN_EXPLORE_MESH_SHAPE=data,corpus`` e.g. ``2,4``) turns
    multi-chip serving on: ``load_index_artifacts`` consults this and places
    the dense index as a ``ShardedDenseIndex`` over the returned mesh — the
    product path for BASELINE config 5 (the reference has no analogue; it is
    single-process, SURVEY.md §2c).
    """
    from lean_explore_tpu.config import Config

    shape = Config.mesh_shape()
    if shape is None:
        return None
    return make_mesh(shape, axis_names=SERVE_AXES)
