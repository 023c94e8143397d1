"""Logging setup (parity: reference util/logging.py:7-22)."""

import logging


def setup_logging(verbose: bool = False) -> None:
    """Configure root logging; quiet noisy third-party loggers."""
    logging.basicConfig(
        level=logging.DEBUG if verbose else logging.INFO,
        format="%(asctime)s - %(levelname)s - [%(name)s] - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    for noisy in ("httpx", "httpcore", "urllib3", "jax", "absl"):
        logging.getLogger(noisy).setLevel(logging.WARNING)
