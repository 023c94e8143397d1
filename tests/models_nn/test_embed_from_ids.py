"""embed_pool_from_ids parity: in-graph masks == encode_batch host masks.

The ids+lengths encode dispatch ships half the bytes of an explicit
[B, T] mask; these tests pin the in-graph mask expansion to the host path
for every padding/bucketing configuration the client produces — including
the case that killed the earlier pad-counting derivation: document text
containing the literal pad/eos token id mid-row.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lean_explore_tpu.models import qwen3  # noqa: E402
from lean_explore_tpu.models.qwen3 import Qwen3Config  # noqa: E402

PAD, EOS = 0, 2


@pytest.fixture(scope="module")
def model():
    config = Qwen3Config.tiny()
    params = qwen3.init_params(config, jax.random.PRNGKey(0))
    return config, params


def make_right_padded(rows: list[list[int]], seq: int, pad: int):
    """Host reference: exactly encode_batch's layout (pad rows keep one
    valid position via the forced first column)."""
    n = len(rows)
    ids = np.full((n, seq), pad, dtype=np.int32)
    mask = np.zeros((n, seq), dtype=np.int32)
    for i, row in enumerate(rows):
        ids[i, : len(row)] = row
        mask[i, : len(row)] = 1
    for i, row in enumerate(rows):
        if not row:
            mask[i, 0] = 1
    return ids, mask


def lengths_of(mask: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(mask.sum(axis=1).astype(np.int32))


class TestEmbedFromIds:
    def test_matches_host_mask(self, model):
        config, params = model
        rows = [[5, 6, 7, EOS], [9, 10, EOS], [11, EOS], []]
        ids, mask = make_right_padded(rows, 8, PAD)
        want = np.asarray(
            qwen3.embed_pool(params, config, jnp.asarray(ids), jnp.asarray(mask))
        )
        got = np.asarray(
            qwen3.embed_pool_from_ids(
                params, config, jnp.asarray(ids), lengths_of(mask)
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_matches_host_mask_eos_is_pad(self, model):
        """pad == eos (Qwen BPE convention): the appended EOS must stay
        valid. Length-based masks get this for free where pad-counting
        needed a +1 correction."""
        config, params = model
        pad = EOS  # pad token IS the eos token
        rows = [[5, 6, 7, EOS], [9, 10, EOS], [11, EOS]]
        n, seq = len(rows), 8
        ids = np.full((n, seq), pad, dtype=np.int32)
        mask = np.zeros((n, seq), dtype=np.int32)
        for i, row in enumerate(rows):
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        want = np.asarray(
            qwen3.embed_pool(params, config, jnp.asarray(ids), jnp.asarray(mask))
        )
        got = np.asarray(
            qwen3.embed_pool_from_ids(
                params, config, jnp.asarray(ids), lengths_of(mask)
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_pad_token_inside_content_stays_valid(self, model):
        """Text that tokenizes to the pad id MID-ROW (e.g. a document
        containing the literal '<|endoftext|>' string) must not shorten
        the mask — the regression the lengths-based contract fixes."""
        config, params = model
        pad = EOS
        row = [5, EOS, 7, 8, EOS]  # interior pad-valued ids are content
        seq = 8
        ids = np.full((1, seq), pad, dtype=np.int32)
        ids[0, : len(row)] = row
        mask = np.zeros((1, seq), dtype=np.int32)
        mask[0, : len(row)] = 1
        want = np.asarray(
            qwen3.embed_pool(params, config, jnp.asarray(ids), jnp.asarray(mask))
        )
        got = np.asarray(
            qwen3.embed_pool_from_ids(
                params, config, jnp.asarray(ids), lengths_of(mask)
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_full_length_row(self, model):
        """A row truncated at max_length (eos at the last column) must not
        overflow the clip."""
        config, params = model
        pad = EOS
        seq = 6
        row = [5, 6, 7, 8, 9, EOS]  # completely full
        ids = np.asarray([row], dtype=np.int32)
        mask = np.ones((1, seq), dtype=np.int32)
        want = np.asarray(
            qwen3.embed_pool(params, config, jnp.asarray(ids), jnp.asarray(mask))
        )
        got = np.asarray(
            qwen3.embed_pool_from_ids(
                params, config, jnp.asarray(ids), lengths_of(mask)
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestClientPath:
    def test_embed_device_matches_mesh_host_mask_path(self, tmp_path):
        """The single-device ids+lengths path and the mesh host-mask path
        produce identical embeddings for the same client inputs."""
        from lean_explore_tpu.parallel import SERVE_AXES, make_mesh
        from lean_explore_tpu.util.embedding_client import EmbeddingClient

        from tests.helpers import make_tiny_model_dir

        ckpt = make_tiny_model_dir(tmp_path / "m", with_st_prompt=True)
        texts = [f"nat add {i} the sum of two" for i in range(5)]
        fast = EmbeddingClient(str(ckpt), dtype="float32", batch_size=8)
        mesh = make_mesh((8, 1), axis_names=SERVE_AXES)
        host_mask = EmbeddingClient(
            str(ckpt), dtype="float32", batch_size=8, mesh=mesh
        )
        got = fast.embed_sync(texts, is_query=True)
        want = host_mask.embed_sync(texts, is_query=True)
        np.testing.assert_allclose(got, want, atol=1e-5)
