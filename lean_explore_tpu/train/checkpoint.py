"""Training checkpoint/resume via orbax.

The serving side's "checkpointing" is versioned artifact sets plus
stage-resumable pipeline state (SURVEY.md §5); the training side gets real
device-aware checkpoints: sharded params + optimizer state + step counter,
saved/restored with orbax so multi-host meshes work unchanged.
"""

import logging
import re
from pathlib import Path
from typing import Any

logger = logging.getLogger(__name__)


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(
    directory: str | Path,
    step: int,
    params: Any,
    opt_state: Any,
) -> Path:
    """Write one checkpoint under directory/step_<N> (overwrites)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).resolve()
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / f"step_{step:08d}"
    checkpointer = _checkpointer()
    checkpointer.save(
        path, {"params": params, "opt_state": opt_state}, force=True
    )
    checkpointer.wait_until_finished()
    logger.info("checkpoint saved: %s", path)
    return path


_STEP_DIR = re.compile(r"^step_(\d+)$")


def latest_checkpoint(directory: str | Path) -> tuple[int, Path] | None:
    """(step, path) of the newest COMMITTED checkpoint, or None.

    Matches ``step_<digits>`` exactly: an interrupted orbax save leaves a
    ``step_N.orbax-checkpoint-tmp`` directory that a bare ``step_*`` glob
    would select (it sorts after the committed dir), crashing resume with
    a ValueError exactly when checkpoint recovery is needed.
    """
    directory = Path(directory)
    if not directory.exists():
        return None
    candidates = [
        (int(m.group(1)), p)
        for p in directory.glob("step_*")
        if (m := _STEP_DIR.match(p.name))
    ]
    if not candidates:
        return None
    return max(candidates)


def restore_checkpoint(
    path: str | Path,
    template: dict,
) -> dict:
    """Restore {params, opt_state} shaped/sharded like ``template``.

    The template (e.g. freshly-initialized state from init_train_state)
    supplies dtypes and shardings. Restored leaves are re-placed onto the
    template leaf's exact sharding: orbax can bring scalars back on a
    single device, which would then clash with mesh-placed params inside
    the jitted train step.
    """
    import jax

    checkpointer = _checkpointer()
    restored = checkpointer.restore(Path(path).resolve(), template)
    logger.info("checkpoint restored: %s", path)

    def replace(restored_leaf, template_leaf):
        if restored_leaf is None or not hasattr(template_leaf, "sharding"):
            return restored_leaf
        return jax.device_put(restored_leaf, template_leaf.sharding)

    return jax.tree.map(
        replace, restored, template, is_leaf=lambda x: x is None
    )
