"""Properties of the synthetic Lean-shaped training corpus."""

import numpy as np

from lean_explore_tpu.models.tokenizer import encode_batch, load_tokenizer
from lean_explore_tpu.train.synthetic import (
    build_wordlevel_tokenizer,
    make_corpus,
)


class TestMakeCorpus:
    def test_shapes_and_uniqueness(self):
        corpus = make_corpus(n_decls=300, n_concepts=60, n_eval=40, seed=1)
        names = [d.name for d in corpus.declarations]
        assert len(names) == 300
        assert len(set(names)) == 300  # sorted-triple uniqueness
        assert len(corpus.eval_queries) == 40
        assert corpus.n_train == 240

    def test_eval_targets_held_out(self):
        corpus = make_corpus(n_decls=200, n_concepts=50, n_eval=30, seed=2)
        train_names = {d.name for d in corpus.declarations[: corpus.n_train]}
        for _, target in corpus.eval_queries:
            assert target not in train_names

    def test_queries_share_no_words_with_names(self):
        """The lexical escape hatch is closed: eval queries are phrased in
        synonyms, names and bodies in base words."""
        corpus = make_corpus(n_decls=100, n_concepts=40, n_eval=20, seed=3)
        base_words = {c.base for c in corpus.concepts}
        for query, _ in corpus.eval_queries:
            assert not set(query.split()) & base_words

    def test_informalization_has_bold_title(self):
        from lean_explore_tpu.models.search_types import extract_bold_description

        corpus = make_corpus(n_decls=20, n_concepts=20, n_eval=4, seed=4)
        for d in corpus.declarations:
            assert extract_bold_description(d.informalization)


class TestBodySentences:
    def test_default_is_single_sentence(self):
        a = make_corpus(n_decls=50, n_concepts=30, n_eval=8, seed=5)
        b = make_corpus(
            n_decls=50, n_concepts=30, n_eval=8, seed=5, body_sentences=1
        )
        assert [d.informalization for d in a.declarations] == [
            d.informalization for d in b.declarations
        ]

    def test_production_length_and_title_leading(self):
        """body_sentences=5 reaches the ~110-word production regime with
        the discriminative bold title still first (the prescreen-cascade
        assumption: a small doc-token cap captures the title)."""
        from lean_explore_tpu.models.search_types import extract_bold_description

        short = make_corpus(n_decls=80, n_concepts=40, n_eval=10, seed=6)
        long = make_corpus(
            n_decls=80, n_concepts=40, n_eval=10, seed=6, body_sentences=5
        )
        words = [len(d.informalization.split()) for d in long.declarations]
        assert 95 <= float(np.median(words)) <= 125
        for s, l in zip(short.declarations, long.declarations):
            assert s.name == l.name
            assert l.informalization.startswith("**")
            assert extract_bold_description(
                l.informalization
            ) == extract_bold_description(s.informalization)
            # extra prose extends, never replaces, the parity body
            assert l.informalization.startswith(s.informalization)

    def test_extra_sentences_reuse_only_base_words(self):
        """Later sentences restate the declaration's base words amid
        shared filler — they must not leak eval-query synonyms."""
        corpus = make_corpus(
            n_decls=60, n_concepts=30, n_eval=10, seed=7, body_sentences=4
        )
        synonyms = {c.synonym for c in corpus.concepts}
        for d in corpus.declarations:
            body = d.informalization.split("**")[-1]
            assert not set(body.split()) & synonyms


class TestNameQueries:
    def test_classes_and_targets(self):
        from lean_explore_tpu.train.synthetic import make_name_queries

        corpus = make_corpus(n_decls=300, n_concepts=60, n_eval=20, seed=1)
        classes = make_name_queries(
            corpus, np.random.default_rng(0), n_per_class=15
        )
        assert set(classes) == {"name_exact", "name_fragment", "name_typo"}
        names = {d.name for d in corpus.declarations}
        train_names = {d.name for d in corpus.declarations[: corpus.n_train]}
        for rows in classes.values():
            assert rows
            for _, target in rows:
                assert target in names and target not in train_names

    def test_exact_queries_are_names(self):
        from lean_explore_tpu.train.synthetic import make_name_queries

        corpus = make_corpus(n_decls=200, n_concepts=50, n_eval=16, seed=2)
        classes = make_name_queries(corpus, np.random.default_rng(1))
        for q, target in classes["name_exact"]:
            assert q == target

    def test_typo_is_single_char_edit_preserving_structure(self):
        from lean_explore_tpu.train.synthetic import make_name_queries

        corpus = make_corpus(n_decls=200, n_concepts=50, n_eval=16, seed=3)
        classes = make_name_queries(corpus, np.random.default_rng(2))
        for q, target in classes["name_typo"]:
            assert q != target
            assert len(q) == len(target)
            diffs = [i for i, (x, y) in enumerate(zip(q, target)) if x != y]
            assert len(diffs) == 1
            # Structure chars untouched: tokenization splits identically.
            assert target[diffs[0]] not in "._"

    def test_fragment_words_come_from_target_name(self):
        from lean_explore_tpu.train.synthetic import make_name_queries

        corpus = make_corpus(n_decls=200, n_concepts=50, n_eval=16, seed=4)
        classes = make_name_queries(corpus, np.random.default_rng(3))
        for q, target in classes["name_fragment"]:
            for word in q.split():
                assert word in target


class TestTokenizer:
    def test_vocabulary_covers_corpus_without_blowup(self, tmp_path):
        corpus = make_corpus(n_decls=400, n_concepts=80, n_eval=32, seed=5)
        tok_dir = build_wordlevel_tokenizer(
            corpus.texts(), tmp_path, extra_texts=("query : ",)
        )
        tok = load_tokenizer(tok_dir)
        # O(concepts) vocabulary, not O(declarations): names decompose.
        assert tok.vocab_size < 2 * 80 + 100
        unk = tok.unk_token_id
        batch = encode_batch(tok, corpus.texts()[:200], max_length=64)
        n = batch.n_valid
        assert not np.any(batch.input_ids[:n] == unk)

    def test_snake_case_names_decompose(self, tmp_path):
        tok_dir = build_wordlevel_tokenizer(
            ["Mathlib.Algebra.foo_bar.of_baz lemma foo bar baz of"], tmp_path
        )
        tok = load_tokenizer(tok_dir)
        ids_compound = tok("foo_bar")["input_ids"]
        ids_words = [tok("foo")["input_ids"][0], tok("bar")["input_ids"][0]]
        assert ids_compound == ids_words
