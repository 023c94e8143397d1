"""HF-checkpoint export: exact roundtrip through models/hf_loader, and
servability of an exported directory via EmbeddingClient."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from lean_explore_tpu.models import qwen3
from lean_explore_tpu.models.hf_loader import load_params
from lean_explore_tpu.models.qwen3 import Qwen3Config
from lean_explore_tpu.train.export import config_to_hf, export_hf_checkpoint


def _tree_allclose(a, b):
    flat_a = jax.tree.leaves(a, is_leaf=lambda x: x is None)
    flat_b = jax.tree.leaves(b, is_leaf=lambda x: x is None)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        if x is None or y is None:
            assert x is None and y is None
            continue
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32), atol=1e-6
        )


class TestExportRoundtrip:
    def test_params_roundtrip(self, tmp_path):
        config = Qwen3Config.tiny()
        params = qwen3.init_params(config, jax.random.PRNGKey(7))
        out = export_hf_checkpoint(params, config, tmp_path / "ckpt")
        loaded, loaded_config = load_params(out, dtype=jnp.float32)
        assert loaded_config == config
        _tree_allclose(params, loaded)

    def test_untied_head_roundtrip(self, tmp_path):
        config = Qwen3Config(
            vocab_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1, head_dim=16,
            intermediate_size=48, tie_word_embeddings=False,
        )
        params = qwen3.init_params(config, jax.random.PRNGKey(8))
        assert params["lm_head"] is not None
        out = export_hf_checkpoint(params, config, tmp_path / "ckpt")
        loaded, loaded_config = load_params(out, dtype=jnp.float32)
        assert not loaded_config.tie_word_embeddings
        _tree_allclose(params, loaded)

    def test_config_to_hf_inverse(self):
        config = Qwen3Config.tiny()
        assert Qwen3Config.from_hf(config_to_hf(config)) == config

    def test_forward_parity_after_roundtrip(self, tmp_path):
        config = Qwen3Config.tiny()
        params = qwen3.init_params(config, jax.random.PRNGKey(9))
        out = export_hf_checkpoint(params, config, tmp_path / "ckpt")
        loaded, _ = load_params(out, dtype=jnp.float32)
        ids = jnp.asarray([[5, 6, 7, 0], [9, 3, 0, 0]], dtype=jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 0, 0]], dtype=jnp.int32)
        want = qwen3.embed_pool(params, config, ids, mask)
        got = qwen3.embed_pool(loaded, config, ids, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


class TestExportedServing:
    def test_embedding_client_loads_export(self, tmp_path):
        """An exported checkpoint is a complete EmbeddingClient model dir
        (weights + tokenizer + asymmetric prompt)."""
        from lean_explore_tpu.train.synthetic import build_wordlevel_tokenizer
        from lean_explore_tpu.util.embedding_client import EmbeddingClient

        tok_dir = build_wordlevel_tokenizer(
            ["the monoid of a group", "query :"], tmp_path / "tok"
        )
        config = Qwen3Config.tiny(vocab_size=16)
        params = qwen3.init_params(config, jax.random.PRNGKey(10))
        out = export_hf_checkpoint(
            params, config, tmp_path / "ckpt",
            tokenizer_dir=tok_dir, query_prompt="query : ",
        )
        assert json.loads(
            (out / "config_sentence_transformers.json").read_text()
        ) == {"prompts": {"query": "query : "}}
        client = EmbeddingClient(str(out), dtype="float32", max_length=16)
        assert client.query_prompt == "query : "
        vecs = client.embed_sync(["the monoid of a group"])
        assert vecs.shape == (1, config.hidden_size)
        np.testing.assert_allclose(np.linalg.norm(vecs[0]), 1.0, atol=1e-5)
