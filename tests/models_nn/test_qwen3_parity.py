"""Qwen3 JAX trunk parity vs torch/transformers on tiny random checkpoints.

Plays the role the reference's external-model tests play
(tests/util/reranker_client_test.py:196-201) but fully offline: a tiny
random-weight HF Qwen3 checkpoint is created locally, saved as safetensors,
loaded by our loader, and outputs are compared position-by-position.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from lean_explore_tpu.models import qwen3
from lean_explore_tpu.models.hf_loader import load_params

TINY = dict(
    vocab_size=512,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    rms_norm_eps=1e-6,
    rope_theta=1_000_000.0,
    max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    """Random-weight HF Qwen3 checkpoint on disk (tied embeddings)."""
    torch.manual_seed(0)
    cfg = transformers.Qwen3Config(
        **TINY, tie_word_embeddings=True, attention_bias=False
    )
    model = transformers.Qwen3ForCausalLM(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_qwen3")
    model.save_pretrained(path, safe_serialization=True)
    return path, model


@pytest.fixture(scope="module")
def loaded(tiny_checkpoint):
    path, torch_model = tiny_checkpoint
    params, config = load_params(path, dtype=jnp.float32)
    return params, config, torch_model


def _masks():
    """(ids, mask) cases: full, right-padded, left-padded."""
    rng = np.random.default_rng(1)
    batch, seq = 3, 12
    ids = rng.integers(1, TINY["vocab_size"], size=(batch, seq))
    full = np.ones((batch, seq), dtype=np.int64)
    right = full.copy()
    right[0, 8:] = 0
    right[1, 5:] = 0
    left = full.copy()
    left[0, :4] = 0
    left[2, :7] = 0
    return ids, {"full": full, "right_padded": right, "left_padded": left}


@pytest.mark.parametrize("mask_kind", ["full", "right_padded", "left_padded"])
class TestTrunkParity:
    def test_hidden_states(self, loaded, mask_kind):
        params, config, torch_model = loaded
        ids, masks = _masks()
        mask = masks[mask_kind]

        with torch.no_grad():
            want = (
                torch_model.model(
                    input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask),
                ).last_hidden_state.numpy()
            )
        got = np.asarray(
            qwen3.forward_hidden(params, config, jnp.asarray(ids), jnp.asarray(mask))
        )
        valid = mask.astype(bool)
        np.testing.assert_allclose(got[valid], want[valid], atol=2e-4, rtol=2e-4)

    def test_last_token_logits(self, loaded, mask_kind):
        params, config, torch_model = loaded
        ids, masks = _masks()
        mask = masks[mask_kind]

        with torch.no_grad():
            all_logits = torch_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).logits.numpy()
        last = (mask * np.arange(mask.shape[1])[None, :]).max(axis=1)
        want = all_logits[np.arange(len(ids)), last]

        got = np.asarray(
            qwen3.last_token_logits(
                params, config, jnp.asarray(ids), jnp.asarray(mask)
            )
        )
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)


class TestRerankScores:
    def test_matches_torch_softmax(self, loaded):
        """P(true) matches the reference's stacked-logit softmax
        (reranker_client.py:129-138) computed with torch."""
        params, config, torch_model = loaded
        ids, masks = _masks()
        mask = masks["left_padded"]  # the reranker uses left padding
        token_true, token_false = 11, 22

        with torch.no_grad():
            logits = torch_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).logits[:, -1, :]
        # Reference semantics: the final sequence position, which equals the
        # last *valid* position under left padding.
        stacked = torch.stack(
            [logits[:, token_false], logits[:, token_true]], dim=1
        )
        want = torch.nn.functional.log_softmax(stacked, dim=1)[:, 1].exp().numpy()

        got = np.asarray(
            qwen3.rerank_scores(
                params,
                config,
                jnp.asarray(ids),
                jnp.asarray(mask),
                token_true=token_true,
                token_false=token_false,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
        assert np.all((got >= 0) & (got <= 1))


class TestEmbedPool:
    def test_unit_norm_and_pooling_position(self, loaded):
        params, config, _ = loaded
        ids, masks = _masks()
        mask = masks["right_padded"]
        out = np.asarray(
            qwen3.embed_pool(params, config, jnp.asarray(ids), jnp.asarray(mask))
        )
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)

        # Pooled vector equals the normalized hidden state at the last valid
        # position.
        hidden = np.asarray(
            qwen3.forward_hidden(params, config, jnp.asarray(ids), jnp.asarray(mask))
        )
        row0 = hidden[0, 7]  # row 0 has 8 valid tokens -> index 7
        row0 = row0 / np.linalg.norm(row0)
        np.testing.assert_allclose(out[0], row0, atol=1e-5)

    def test_padding_side_invariance(self, loaded):
        """Same tokens, left- vs right-padded, give (nearly) the same
        embedding: RoPE positions differ but relative attention structure is
        identical for a causal model over the valid span... verify empirically
        that the *right* answer is produced for each layout independently."""
        params, config, torch_model = loaded
        rng = np.random.default_rng(5)
        tokens = rng.integers(1, TINY["vocab_size"], size=(1, 6))
        seq = 10
        right_ids = np.concatenate(
            [tokens, np.zeros((1, seq - 6), dtype=np.int64)], axis=1
        )
        right_mask = (right_ids != 0).astype(np.int64)
        with torch.no_grad():
            want = torch_model.model(
                input_ids=torch.tensor(right_ids),
                attention_mask=torch.tensor(right_mask),
            ).last_hidden_state.numpy()[0, 5]
        got = np.asarray(
            qwen3.embed_pool(
                params, config, jnp.asarray(right_ids), jnp.asarray(right_mask)
            )
        )[0]
        np.testing.assert_allclose(
            got, want / np.linalg.norm(want), atol=2e-4, rtol=2e-4
        )


class TestUntiedHead:
    def test_untied_lm_head_load(self, tmp_path):
        torch.manual_seed(1)
        cfg = transformers.Qwen3Config(
            **TINY, tie_word_embeddings=False, attention_bias=False
        )
        model = transformers.Qwen3ForCausalLM(cfg).eval()
        model.save_pretrained(tmp_path, safe_serialization=True)
        params, config = load_params(tmp_path, dtype=jnp.float32)
        assert params["lm_head"] is not None

        ids = np.array([[1, 2, 3, 4]])
        mask = np.ones_like(ids)
        with torch.no_grad():
            want = model(input_ids=torch.tensor(ids)).logits[:, -1, :].numpy()
        got = np.asarray(
            qwen3.last_token_logits(params, config, jnp.asarray(ids), jnp.asarray(mask))
        )
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-4)


class TestScanTrunk:
    def test_init_params_shapes(self):
        import jax

        config = qwen3.Qwen3Config.tiny()
        params = qwen3.init_params(config, jax.random.PRNGKey(0))
        assert params["layers"]["q_proj"].shape == (2, 64, 64)
        assert params["embed"].shape == (512, 64)
        out = qwen3.forward_hidden(
            params,
            config,
            jnp.ones((2, 8), dtype=jnp.int32),
            jnp.ones((2, 8), dtype=jnp.int32),
        )
        assert out.shape == (2, 8, 64)
        assert np.all(np.isfinite(np.asarray(out)))
