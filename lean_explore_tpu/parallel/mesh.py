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


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX (DCN) for cross-host meshes.

    Single-host pods need nothing — ICI connects all local chips and
    ``make_mesh`` sees every device. Across hosts, call this once per
    process before any device use (arguments default to the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars);
    afterwards ``jax.devices()`` spans the fleet and the same
    ``LEAN_EXPLORE_MESH_SHAPE`` knob shards the corpus across all of it.
    Mesh layout guidance: keep the ``corpus`` axis within a host's ICI
    domain and put ``data`` (independent query sub-batches — one all_gather
    per batch, no other cross-shard traffic) on the DCN boundary.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.devices()),
    )


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
