"""Int8 (W8A8 dynamic) trunk: structure, fidelity, and client integration.

The int8 path exists for rerank throughput (v5e int8 MXU peak is 2x bf16);
these tests pin that quantized scoring tracks the dense forward closely
enough to preserve rankings, and that it works through EVERY scoring path
(flat, chained, grouped prefix-KV) because _proj dispatches per leaf.
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
    q8 = qwen3.quantize_params_int8(params)
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(5, 500, size=(8, 16)).astype(np.int32))
    mask = np.ones((8, 16), dtype=np.int32)
    mask[2, 10:] = 0  # one padded row
    return config, params, q8, ids, jnp.asarray(mask)


class TestQuantizeParams:
    def test_proj_leaves_become_quant_dicts(self, setup):
        config, params, q8, *_ = setup
        for name in qwen3._INT8_PROJS:
            if name not in q8["layers"]:  # fused-layout-only names
                continue
            leaf = q8["layers"][name]
            assert set(leaf) == {"w8", "scale"}
            assert leaf["w8"].dtype == jnp.int8
            assert leaf["w8"].shape == params["layers"][name].shape
        # Non-projection leaves untouched.
        assert q8["embed"] is params["embed"]
        assert q8["layers"]["input_norm"] is params["layers"]["input_norm"]

    def test_dequantized_weights_close(self, setup):
        _, params, q8, *_ = setup
        w = np.asarray(params["layers"]["q_proj"], np.float32)
        leaf = q8["layers"]["q_proj"]
        deq = np.asarray(leaf["w8"], np.float32) * np.asarray(leaf["scale"])
        # Per-channel int8: max error is half a quantization step.
        step = np.asarray(leaf["scale"])
        assert np.all(np.abs(deq - w) <= step * 0.5 + 1e-7)


class TestScoringFidelity:
    def test_rerank_scores_track_dense_forward(self, setup):
        config, params, q8, ids, mask = setup
        want = np.asarray(
            qwen3.rerank_scores(
                params, config, ids, mask,
                token_true=TOKEN_TRUE, token_false=TOKEN_FALSE,
            )
        )
        got = np.asarray(
            qwen3.rerank_scores(
                q8, config, ids, mask,
                token_true=TOKEN_TRUE, token_false=TOKEN_FALSE,
            )
        )
        assert got.shape == want.shape
        assert np.all(np.isfinite(got))
        # P(true) drift bound for the random tiny trunk; the trained-model
        # drift is measured end-to-end in the client test below.
        assert np.max(np.abs(got - want)) < 0.15

    def test_embed_pool_works_quantized(self, setup):
        config, params, q8, ids, mask = setup
        want = np.asarray(qwen3.embed_pool(params, config, ids, mask))
        got = np.asarray(qwen3.embed_pool(q8, config, ids, mask))
        assert got.shape == want.shape
        # Normalized embeddings stay close in cosine.
        cos = np.sum(got * want, axis=1)
        assert cos.min() > 0.98


class TestClientIntegration:
    def test_int8_client_preserves_trained_ranking(self, tmp_path):
        """Int8 scoring keeps the f32 client's pairwise ranking on real
        grouped calls (the production path: prefix_kv +
        rerank_scores_grouped run with quantized projections through
        _proj). Trained-checkpoint drift is measured in
        scripts/measure_int8_drift.py / docs/performance.md."""
        from lean_explore_tpu.util.reranker_client import RerankerClient

        from tests.helpers import make_tiny_model_dir

        ckpt = make_tiny_model_dir(tmp_path / "m")
        f32 = RerankerClient(str(ckpt), model_dir=ckpt, dtype="float32")
        q8 = RerankerClient(str(ckpt), model_dir=ckpt, dtype="int8")
        assert q8.int8

        queries = ["nat add comm", "list map function"]
        docs = [
            ["the sum of two natural numbers", "continuous function map",
             "prime numbers of a b", "addition of natural numbers"],
            ["function map of a list", "the sum of two numbers",
             "nat add of two", "continuous prime function"],
        ]
        want = f32.rerank_grouped_sync(queries, docs)
        got = q8.rerank_grouped_sync(queries, docs)
        for w_row, g_row in zip(want, got):
            assert np.argsort(w_row).tolist() == np.argsort(g_row).tolist()
            assert np.max(np.abs(np.asarray(w_row) - np.asarray(g_row))) < 0.1

    def test_env_flag_enables_int8(self, tmp_path, monkeypatch):
        from lean_explore_tpu.util.reranker_client import RerankerClient

        from tests.helpers import make_tiny_model_dir

        ckpt = make_tiny_model_dir(tmp_path / "m")
        monkeypatch.setenv("LEAN_EXPLORE_RERANKER_INT8", "1")
        client = RerankerClient(str(ckpt), model_dir=ckpt)
        assert client.int8
        out = client.rerank_sync("nat add", ["the sum of two", "list map"])
        assert len(out.scores) == 2
        assert all(np.isfinite(out.scores))
