"""Cross-encoder (reranker) training tests on the virtual CPU mesh."""

import numpy as np
import pytest

from lean_explore_tpu.models.qwen3 import Qwen3Config
from lean_explore_tpu.parallel import TRAIN_AXES, make_mesh
from lean_explore_tpu.train import (
    CrossEncoderBatch,
    CrossEncoderDataLoader,
    cross_encoder_loss,
    init_train_state,
    make_ce_train_step,
    make_optimizer,
)
from lean_explore_tpu.train.cross_encoder import format_pair
from lean_explore_tpu.train.synthetic import (
    build_wordlevel_tokenizer,
    make_corpus,
    make_reranker_examples,
    reranker_document,
)

TOKEN_TRUE, TOKEN_FALSE = 7, 8


def make_batch(rng, batch=8, seq=12, vocab=512) -> CrossEncoderBatch:
    import jax.numpy as jnp

    ids = rng.integers(10, vocab, size=(batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), dtype=np.int32)
    labels = rng.integers(0, 2, size=(batch,)).astype(np.int32)
    return CrossEncoderBatch(
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels)
    )


class TestCrossEncoderTraining:
    @pytest.mark.parametrize("mesh_shape", [(4, 2), (8, 1)])
    def test_train_step_decreases_loss(self, mesh_shape):
        config = Qwen3Config.tiny()
        mesh = make_mesh(mesh_shape, axis_names=TRAIN_AXES)
        optimizer = make_optimizer(learning_rate=1e-3)
        params, opt_state = init_train_state(config, mesh, optimizer)
        step = make_ce_train_step(
            config, mesh, optimizer,
            token_true=TOKEN_TRUE, token_false=TOKEN_FALSE,
        )
        batch = make_batch(np.random.default_rng(0))
        losses = []
        for _ in range(5):
            params, opt_state, metrics = step(params, opt_state, batch)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_loss_matches_serving_score_direction(self):
        """Training the (false, true) readout moves RerankerClient-visible
        P(true): after fitting a separable toy batch, rerank_scores puts
        positives above negatives."""
        import jax
        import jax.numpy as jnp

        from lean_explore_tpu.models import qwen3

        config = Qwen3Config.tiny()
        params = qwen3.init_params(config, jax.random.PRNGKey(0))
        mesh = make_mesh((8, 1), axis_names=TRAIN_AXES)
        optimizer = make_optimizer(learning_rate=3e-3)
        params, opt_state = init_train_state(config, mesh, optimizer)
        step = make_ce_train_step(
            config, mesh, optimizer,
            token_true=TOKEN_TRUE, token_false=TOKEN_FALSE,
        )
        # Separable task: label = "does token 42 appear at position 3".
        rng = np.random.default_rng(1)
        ids = rng.integers(10, 40, size=(16, 8)).astype(np.int32)
        labels = np.arange(16) % 2
        ids[labels == 1, 3] = 42
        batch = CrossEncoderBatch(
            jnp.asarray(ids),
            jnp.ones((16, 8), dtype=jnp.int32),
            jnp.asarray(labels.astype(np.int32)),
        )
        for _ in range(60):
            params, opt_state, metrics = step(params, opt_state, batch)
        assert float(metrics["accuracy"]) == 1.0
        host_params = jax.device_get(params)
        scores = np.asarray(
            qwen3.rerank_scores(
                host_params, config, jnp.asarray(ids),
                jnp.ones((16, 8), dtype=jnp.int32),
                token_true=TOKEN_TRUE, token_false=TOKEN_FALSE,
            )
        )
        assert scores[labels == 1].min() > scores[labels == 0].max()

    def test_loss_finite_with_padding(self):
        import jax
        import jax.numpy as jnp

        from lean_explore_tpu.models import qwen3

        config = Qwen3Config.tiny()
        params = qwen3.init_params(config, jax.random.PRNGKey(0))
        ids = jnp.asarray(np.full((4, 10), 3, dtype=np.int32))
        mask = np.zeros((4, 10), dtype=np.int32)
        mask[:, :4] = 1  # right padding
        batch = CrossEncoderBatch(
            ids, jnp.asarray(mask), jnp.asarray(np.array([0, 1, 0, 1], np.int32))
        )
        loss, metrics = cross_encoder_loss(
            params, config, batch,
            token_true=TOKEN_TRUE, token_false=TOKEN_FALSE,
        )
        assert np.isfinite(float(loss))


class TestRerankerExamples:
    def test_examples_shape_and_labels(self):
        corpus = make_corpus(n_decls=200, n_concepts=40, n_eval=16, seed=3)
        examples = make_reranker_examples(corpus, np.random.default_rng(0))
        # 2 base query forms always; fragment+typo for ~variant_fraction
        # of declarations. Each form contributes (1 pos + 2 neg).
        assert corpus.n_train * 6 < len(examples) < corpus.n_train * 12
        n_pos = sum(y for _, _, y in examples)
        assert n_pos * 3 == len(examples)
        for q, doc, label in examples[:50]:
            assert isinstance(q, str) and q
            assert ": " in doc  # engine document format "name: informalization"
            assert label in (0, 1)

    def test_name_variants_off_restores_two_forms(self):
        corpus = make_corpus(n_decls=100, n_concepts=30, n_eval=8, seed=3)
        examples = make_reranker_examples(
            corpus, np.random.default_rng(0), name_variants=False
        )
        assert len(examples) == corpus.n_train * 6

    def test_variant_query_forms_present(self):
        corpus = make_corpus(n_decls=200, n_concepts=40, n_eval=4, seed=9)
        examples = make_reranker_examples(
            corpus, np.random.default_rng(1), variant_fraction=1.0
        )
        assert len(examples) == corpus.n_train * 12
        names = {d.name for d in corpus.declarations}
        queries = [q for q, _, y in examples if y == 1]
        fragments = [q for q in queries if " " in q and "." not in q and "*" not in q]
        typos = [
            q for q in queries
            if "." in q and q not in names and " " not in q
        ]
        assert fragments and typos

    def test_positives_use_engine_document_format(self):
        corpus = make_corpus(n_decls=100, n_concepts=30, n_eval=8, seed=4)
        decl = corpus.declarations[0]
        assert (
            reranker_document(decl)
            == f"{decl.name}: {decl.informalization}"
        )

    def test_hard_negatives_share_concepts(self):
        corpus = make_corpus(n_decls=300, n_concepts=30, n_eval=8, seed=5)
        examples = make_reranker_examples(corpus, np.random.default_rng(1))
        doc_to_triple = {
            reranker_document(d): set(t)
            for d, t in zip(corpus.declarations, corpus.triples)
        }
        # Examples come in (pos, hard, random) runs per query form; check
        # the hard slot overlaps the positive in >= 2 concepts.
        n_checked = 0
        for i in range(0, len(examples) - 2, 3):
            (q, pos_doc, y1), (_, hard_doc, y2) = examples[i], examples[i + 1]
            assert (y1, y2) == (1, 0)
            overlap = doc_to_triple[pos_doc] & doc_to_triple[hard_doc]
            assert len(overlap) >= 2
            n_checked += 1
            if n_checked >= 40:
                break
        assert n_checked

    def test_no_mislabeled_positive(self):
        """Negative docs never equal the query's true document."""
        corpus = make_corpus(n_decls=150, n_concepts=30, n_eval=8, seed=6)
        examples = make_reranker_examples(corpus, np.random.default_rng(2))
        for i in range(0, len(examples) - 2, 3):
            pos = examples[i][1]
            assert examples[i + 1][1] != pos
            assert examples[i + 2][1] != pos


class TestDataLoader:
    def test_fixed_shapes_and_template(self, tmp_path):
        corpus = make_corpus(n_decls=80, n_concepts=24, n_eval=8, seed=7)
        examples = make_reranker_examples(corpus, np.random.default_rng(0))
        tok_dir = build_wordlevel_tokenizer(
            corpus.texts(), tmp_path / "tok",
            extra_texts=(format_pair("q", "d"), "true false"),
        )
        from lean_explore_tpu.models.tokenizer import load_tokenizer

        tokenizer = load_tokenizer(tok_dir)
        assert tokenizer.convert_tokens_to_ids("true") != tokenizer.unk_token_id
        loader = CrossEncoderDataLoader(
            tokenizer, examples, batch_size=16, max_length=48
        )
        shapes = set()
        it = iter(loader)
        for _ in range(4):
            batch = next(it)
            shapes.add(batch.input_ids.shape)
            assert batch.labels.shape == (16,)
            assert set(np.asarray(batch.labels)) <= {0, 1}
        assert shapes == {(16, 48)}

    def test_truncation_augment_matches_serving_semantics(self, tmp_path):
        """Augmented docs must be token-prefixes (the cascade prescreen's
        tokenize-cap-decode), applied at ~the requested rate, and off by
        default."""
        corpus = make_corpus(
            n_decls=80, n_concepts=24, n_eval=8, seed=7, body_sentences=5
        )
        examples = make_reranker_examples(corpus, np.random.default_rng(0))
        tok_dir = build_wordlevel_tokenizer(
            corpus.texts(), tmp_path / "tok",
            extra_texts=(format_pair("q", "d"), "true false"),
        )
        from lean_explore_tpu.models.tokenizer import load_tokenizer

        tokenizer = load_tokenizer(tok_dir)
        loader = CrossEncoderDataLoader(
            tokenizer, examples, batch_size=16, max_length=48,
            truncation_augment=0.5, truncation_caps=(8, 24), seed=3,
        )

        # The truncation helper itself: exact tokenize-cap-decode parity
        # with RerankerClient._truncate_docs on a long doc.
        doc = examples[0][1]
        ids_full = tokenizer(doc, add_special_tokens=False)["input_ids"]
        assert len(ids_full) > 24  # body_sentences=5 docs are ~110 words
        capped = loader._truncate_doc(doc, 12)
        ids_capped = tokenizer(capped, add_special_tokens=False)["input_ids"]
        assert ids_capped == ids_full[:12]

        # Rate: drive one epoch's chunk transform via the public iterator
        # by comparing encoded lengths against an unaugmented twin.
        plain = CrossEncoderDataLoader(
            tokenizer, examples, batch_size=16, max_length=48, seed=3
        )
        aug_lens = [
            int(b.attention_mask.sum())
            for _, b in zip(range(8), iter(loader))
        ]
        plain_lens = [
            int(b.attention_mask.sum())
            for _, b in zip(range(8), iter(plain))
        ]
        # Same example order (same seed) -> shorter total valid length
        # exactly when augmentation truncated something.
        assert sum(aug_lens) < sum(plain_lens)
