"""guard_store_vocab: vocabulary-mismatch gate for eval scripts.

Every eval script (eval_cascade / calibrate_cascade /
measure_prescreen_coverage) calls this on BOTH index paths — rebuild
and --data-dir — so pointing a measurement at checkpoints trained on a
different corpus regime fails loudly instead of committing numbers that
describe uniform <unk> filler.
"""

import pytest

from lean_explore_tpu.evaluation import guard_store_vocab
from lean_explore_tpu.models import DeclarationStore
from lean_explore_tpu.models.tokenizer import load_tokenizer
from lean_explore_tpu.train.synthetic import build_wordlevel_tokenizer
from tests.conftest import make_declaration


def _store(tmp_path, texts):
    store = DeclarationStore(tmp_path / "declarations.db", create=True)
    store.insert_many(
        [
            make_declaration(name=f"Nat.d{i}", informalization=t)
            for i, t in enumerate(texts)
        ]
    )
    return store


def test_matching_vocabulary_passes(tmp_path):
    texts = ["adds two naturals together", "maps a list of naturals"]
    tok = load_tokenizer(build_wordlevel_tokenizer(texts, tmp_path / "tok"))
    store = _store(tmp_path, texts)
    guard_store_vocab(store, tok)  # must not raise
    store.close()


def test_mismatched_vocabulary_exits(tmp_path):
    tok = load_tokenizer(
        build_wordlevel_tokenizer(["adds two naturals"], tmp_path / "tok")
    )
    store = _store(
        tmp_path,
        ["cohomology spectral sequence convergence"] * 4,
    )
    with pytest.raises(SystemExit, match="vocabulary mismatch"):
        guard_store_vocab(store, tok)
    store.close()
