"""Fused q/k/v + gate/up serving layout: column-exact parity.

fuse_params_for_serving concatenates same-activation projections into
single GEMM operands; each output column is the identical dot product, so
every scoring path must match the per-projection layout to float
tolerance (bit-exactness is expected on one platform; a tiny tolerance
covers XLA reassociating epilogue fusions differently between layouts).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lean_explore_tpu.models import qwen3  # noqa: E402
from lean_explore_tpu.models.qwen3 import Qwen3Config  # noqa: E402

TOKEN_TRUE, TOKEN_FALSE = 3, 4


@pytest.fixture(scope="module")
def setup():
    config = Qwen3Config.tiny()
    params = qwen3.init_params(config, jax.random.PRNGKey(0))
    fused = qwen3.fuse_params_for_serving(params)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(5, 500, size=(6, 12)).astype(np.int32))
    mask = np.ones((6, 12), dtype=np.int32)
    mask[1, 8:] = 0
    return config, params, fused, ids, jnp.asarray(mask)


class TestFusedLayout:
    def test_layout_shapes(self, setup):
        config, params, fused, *_ = setup
        nq, nkv, dh = (
            config.num_attention_heads,
            config.num_key_value_heads,
            config.head_dim,
        )
        layers = fused["layers"]
        assert "q_proj" not in layers and "gate_proj" not in layers
        assert layers["qkv_proj"].shape == (
            config.num_hidden_layers,
            config.hidden_size,
            (nq + 2 * nkv) * dh,
        )
        assert layers["gate_up_proj"].shape == (
            config.num_hidden_layers,
            config.hidden_size,
            2 * config.intermediate_size,
        )

    def test_embed_pool_parity(self, setup):
        config, params, fused, ids, mask = setup
        want = np.asarray(qwen3.embed_pool(params, config, ids, mask))
        got = np.asarray(qwen3.embed_pool(fused, config, ids, mask))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rerank_scores_parity(self, setup):
        config, params, fused, ids, mask = setup
        want = np.asarray(
            qwen3.rerank_scores(
                params, config, ids, mask,
                token_true=TOKEN_TRUE, token_false=TOKEN_FALSE,
            )
        )
        got = np.asarray(
            qwen3.rerank_scores(
                fused, config, ids, mask,
                token_true=TOKEN_TRUE, token_false=TOKEN_FALSE,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_grouped_prefix_path_parity(self, setup):
        config, params, fused, *_ = setup
        rng = np.random.default_rng(3)
        g, d, p_len, s_len = 4, 3, 6, 4
        prefix_ids = rng.integers(5, 500, size=(g, p_len)).astype(np.int32)
        prefix_mask = np.ones((g, p_len), dtype=np.int32)
        suffix_ids = rng.integers(5, 500, size=(g, d, s_len)).astype(np.int32)
        suffix_mask = np.ones((g, d, s_len), dtype=np.int32)
        offs = np.full((g,), p_len, dtype=np.int32)

        def run(pp):
            pk, pv = qwen3.prefix_kv(
                pp, config, jnp.asarray(prefix_ids), jnp.asarray(prefix_mask)
            )
            return np.asarray(
                qwen3.rerank_scores_grouped(
                    pp, config, pk, pv,
                    jnp.asarray(prefix_mask),
                    jnp.asarray(suffix_ids),
                    jnp.asarray(suffix_mask),
                    jnp.asarray(offs),
                    token_true=TOKEN_TRUE, token_false=TOKEN_FALSE,
                    group_chunk=2,
                )
            )

        np.testing.assert_allclose(run(fused), run(params), atol=1e-6)

    def test_int8_composes_after_fusing(self, setup):
        config, params, fused, ids, mask = setup
        q8 = qwen3.quantize_params_int8(fused)
        assert set(q8["layers"]["qkv_proj"]) == {"w8", "scale"}
        got = np.asarray(
            qwen3.rerank_scores(
                q8, config, ids, mask,
                token_true=TOKEN_TRUE, token_false=TOKEN_FALSE,
            )
        )
        assert np.all(np.isfinite(got))

    def test_rejects_quantized_input(self, setup):
        config, params, *_ = setup
        q8 = qwen3.quantize_params_int8(params)
        with pytest.raises(ValueError, match="dense weights"):
            qwen3.fuse_params_for_serving(q8)

    def test_client_env_opt_in(self, tmp_path, monkeypatch):
        from lean_explore_tpu.util.embedding_client import EmbeddingClient

        from tests.helpers import make_tiny_model_dir

        ckpt = make_tiny_model_dir(tmp_path / "m", with_st_prompt=True)
        texts = ["nat add the sum of two", "list map function"]
        plain = EmbeddingClient(str(ckpt), dtype="float32").embed_sync(
            texts, is_query=True
        )
        monkeypatch.setenv("LEAN_EXPLORE_FUSED_QKV", "1")
        client = EmbeddingClient(str(ckpt), dtype="float32")
        assert "qkv_proj" in client.params["layers"]
        fused_out = client.embed_sync(texts, is_query=True)
        np.testing.assert_allclose(fused_out, plain, atol=1e-5)
