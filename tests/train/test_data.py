"""Contrastive data pipeline tests: pairs from store + fixed-shape batches."""

import numpy as np
import pytest

from lean_explore_tpu.models import DeclarationStore
from lean_explore_tpu.train import ContrastiveDataLoader, pairs_from_store
from tests.conftest import make_declaration
from tests.helpers import make_tiny_model_dir


class TestPairs:
    def test_pairs_from_store(self, memory_store):
        memory_store.insert_many(
            [
                make_declaration(
                    "Nat.add", informalization="**Addition.** adds naturals"
                ),
                make_declaration("NoInf", informalization=None),
                make_declaration("Plain", informalization="no bold header here"),
            ]
        )
        pairs = pairs_from_store(memory_store)
        # Nat.add -> name + title queries; Plain -> name query only
        assert ("Nat.add", "**Addition.** adds naturals") in pairs
        assert ("Addition.", "**Addition.** adds naturals") in pairs
        assert ("Plain", "no bold header here") in pairs
        assert len(pairs) == 3


class TestLoader:
    @pytest.fixture(scope="class")
    def tokenizer(self, tmp_path_factory):
        from lean_explore_tpu.models.tokenizer import load_tokenizer

        model_dir = make_tiny_model_dir(tmp_path_factory.mktemp("tok"))
        return load_tokenizer(model_dir)

    def test_fixed_shapes_across_batches(self, tokenizer):
        pairs = [(f"nat add {i}", f"the sum of two natural numbers {i}")
                 for i in range(10)]
        loader = ContrastiveDataLoader(
            tokenizer, pairs, batch_size=4, query_max_length=8, doc_max_length=16
        )
        batches = list(loader.epoch())
        assert len(batches) == 2  # 10 // 4, trailing pair dropped
        for b in batches:
            assert b.query_ids.shape == (4, 8)
            assert b.doc_ids.shape == (4, 16)
            assert b.query_mask.sum() > 0

    def test_shuffling_differs_across_epochs(self, tokenizer):
        # extraN words are in the tiny tokenizer's vocab, so each pair gets
        # distinct token ids (OOV words would all collapse to <unk>).
        pairs = [(f"extra{i}", f"extra{i} extra{i+1}") for i in range(16)]
        loader = ContrastiveDataLoader(tokenizer, pairs, batch_size=8)
        first = np.asarray(next(iter(loader.epoch())).query_ids)
        second = np.asarray(next(iter(loader.epoch())).query_ids)
        assert not np.array_equal(first, second)

    def test_empty_pairs_raise(self, tokenizer):
        with pytest.raises(ValueError):
            ContrastiveDataLoader(tokenizer, [])

    def test_feeds_train_step(self, tokenizer):
        """End-to-end: loader batches drive one sharded train step."""
        from lean_explore_tpu.models.qwen3 import Qwen3Config
        from lean_explore_tpu.parallel import TRAIN_AXES, make_mesh
        from lean_explore_tpu.train import (
            init_train_state, make_optimizer, make_train_step)

        config = Qwen3Config.tiny(vocab_size=128)
        mesh = make_mesh((4, 2), axis_names=TRAIN_AXES)
        optimizer = make_optimizer(learning_rate=1e-3)
        params, opt_state = init_train_state(config, mesh, optimizer)
        step = make_train_step(config, mesh, optimizer)
        pairs = [(f"nat add {i}", f"sum of naturals {i}") for i in range(8)]
        loader = ContrastiveDataLoader(
            tokenizer, pairs, batch_size=8, query_max_length=8, doc_max_length=8
        )
        batch = next(iter(loader))
        params, opt_state, metrics = step(params, opt_state, batch)
        assert np.isfinite(float(metrics["loss"]))
