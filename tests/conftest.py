"""Shared test fixtures.

JAX is forced onto a virtual 8-device CPU mesh (set before any jax import)
so sharding/collective tests run anywhere; the real TPU is exercised only by
bench.py and tests marked ``tpu``.
"""

import os

# The axon sitecustomize force-prepends the TPU platform to jax_platforms,
# ignoring JAX_PLATFORMS=cpu from the environment. Tests must never touch the
# chip, so set the XLA flag first, then override the jax config directly.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import json

import numpy as np
import pytest

from lean_explore_tpu.models import Declaration, DeclarationStore


@pytest.fixture
def memory_store() -> DeclarationStore:
    """Empty in-memory declaration store with schema created."""
    store = DeclarationStore(":memory:", create=True)
    yield store
    store.close()


def make_declaration(
    name: str = "Nat.add",
    module: str = "Init.Nat",
    dependencies: list[str] | None = None,
    informalization: str | None = "**Addition of naturals.** Adds two numbers.",
    embedding: list[float] | None = None,
    docstring: str | None = "Adds two natural numbers.",
) -> Declaration:
    return Declaration(
        name=name,
        module=module,
        docstring=docstring,
        source_text=f"def {name} := fun a b => a + b",
        source_link=f"https://github.com/example/repo#{name}",
        dependencies=json.dumps(dependencies) if dependencies is not None else None,
        informalization=informalization,
        informalization_embedding=embedding,
    )


@pytest.fixture
def sample_declarations() -> list[Declaration]:
    return [
        make_declaration("Nat.add", "Init.Nat", dependencies=["Nat"]),
        make_declaration(
            "Nat.mul",
            "Init.Nat",
            dependencies=["Nat", "Nat.add"],
            informalization="**Multiplication.** Multiplies two naturals.",
        ),
        make_declaration(
            "List.map",
            "Init.List",
            dependencies=["List"],
            informalization="**List map.** Applies a function to each element.",
        ),
        make_declaration(
            "Prod.mk",
            "Init.Prod",
            dependencies=None,
            informalization=None,
            docstring=None,
        ),
    ]


@pytest.fixture
def populated_store(memory_store, sample_declarations) -> DeclarationStore:
    memory_store.insert_many(sample_declarations)
    return memory_store


def random_unit_rows(n: int, d: int, seed: int = 0) -> np.ndarray:
    """Random L2-normalized float32 matrix [n, d]."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)
