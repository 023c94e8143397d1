"""Remote API client layer."""

from lean_explore_tpu.api.client import ApiClient

__all__ = ["ApiClient"]
