"""encode_batch bucketing and padding semantics."""

import numpy as np
import pytest

from lean_explore_tpu.models.tokenizer import (
    EncodedBatch,
    bucket_batch,
    bucket_length,
    encode_batch,
    load_tokenizer,
)
from tests.helpers import make_tiny_model_dir


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    return load_tokenizer(make_tiny_model_dir(tmp_path_factory.mktemp("tokb")))


class TestBuckets:
    def test_length_buckets(self):
        assert bucket_length(5, 512) == 32
        assert bucket_length(33, 512) == 64
        assert bucket_length(400, 512) == 512
        assert bucket_length(10, 16) == 16  # capped at max_length

    def test_batch_buckets(self):
        assert bucket_batch(1) == 1
        assert bucket_batch(3) == 4
        assert bucket_batch(100) == 128
        assert bucket_batch(300) == 384  # rounds to multiple of top bucket


class TestEncodeBatch:
    def test_static_bucket_shapes(self, tokenizer):
        out = encode_batch(tokenizer, ["nat add", "sum of two numbers"], max_length=512)
        assert out.input_ids.shape == (2, 32)
        assert out.n_valid == 2
        # pad rows beyond n_valid keep one valid token for benign softmax
        out3 = encode_batch(tokenizer, ["a", "b", "c"], max_length=512)
        assert out3.input_ids.shape[0] == 4
        assert out3.attention_mask[3, 0] == 1
        assert out3.attention_mask[3, 1:].sum() == 0

    def test_truncation(self, tokenizer):
        long_text = "nat " * 600
        out = encode_batch(tokenizer, [long_text], max_length=64)
        assert out.input_ids.shape[1] == 64
        assert out.attention_mask[0].sum() == 64

    def test_append_eos(self, tokenizer):
        out = encode_batch(tokenizer, ["nat add"], max_length=512, append_eos=True)
        n_valid_tokens = int(out.attention_mask[0].sum())
        assert out.input_ids[0, n_valid_tokens - 1] == tokenizer.eos_token_id

    def test_eos_within_budget(self, tokenizer):
        out = encode_batch(tokenizer, ["nat " * 100], max_length=16, append_eos=True)
        assert out.input_ids.shape[1] == 16
        assert out.input_ids[0, 15] == tokenizer.eos_token_id

    def test_no_bucket_padding(self, tokenizer):
        out = encode_batch(
            tokenizer, ["nat add mul"], max_length=512, pad_to_buckets=False
        )
        assert out.input_ids.shape == (1, 3)

    def test_mask_matches_ids(self, tokenizer):
        out = encode_batch(tokenizer, ["nat add", "sum"], max_length=512)
        for row in range(2):
            n = int(out.attention_mask[row].sum())
            assert np.all(out.attention_mask[row, :n] == 1)
            assert np.all(out.attention_mask[row, n:] == 0)
