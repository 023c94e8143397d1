"""Platform selection helpers for entry points.

Some TPU dev environments install a sitecustomize that force-prepends the
TPU platform to jax_platforms, silently overriding JAX_PLATFORMS=cpu from
the environment. Entry points that honor a user's explicit CPU request
(virtual host meshes, tests, smoke runs) call this before first device use.
"""

import logging
import os

logger = logging.getLogger(__name__)


def honor_cpu_platform_request() -> bool:
    """Pin jax to CPU when the environment asked for it; returns True if
    pinned. No-op when the backend is already initialized."""
    wants_cpu = "cpu" in os.environ.get("JAX_PLATFORMS", "").lower() or (
        "xla_force_host_platform_device_count" in os.environ.get("XLA_FLAGS", "")
    )
    if not wants_cpu:
        return False
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        return True
    except RuntimeError:
        logger.warning("backend already initialized; cannot switch to cpu")
        return False
