"""Synthetic Lean-shaped corpus for end-to-end embedder training and eval.

Real Qwen3 weights and the real Mathlib corpus are unreachable in the build
environment (PARITY.md), so this module manufactures a corpus with the same
*shape* as the extraction pipeline's output (reference extract flow:
declarations with names, modules, source text, and ``**Title.** body``
informalizations) plus a retrieval task that is genuinely learnable and not
solvable lexically:

- Every mathematical "concept" has a **base word** (used in declaration
  names and informalization bodies) and a disjoint **synonym** (used in
  informal titles and in evaluation queries). The two share no characters,
  so name-BM25 cannot match synonym queries and a random-init embedder has
  no token-overlap shortcut at the name level.
- Training pairs come from the standard loader (train/data.pairs_from_store:
  the declaration name and the bold title are the query forms), so the
  synonym -> base alignment is learned only through contrastive training.
- Evaluation queries use a *different* phrasing template over the synonyms
  and target declarations *held out of training entirely* — the model must
  embed unseen documents (new combinations of seen concepts) at index time,
  exactly the production regime when new Mathlib declarations land.
"""

import itertools
import json
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from lean_explore_tpu.models.store import Declaration

_ROOTS = (
    "Mathlib.Algebra", "Mathlib.Topology", "Mathlib.Order",
    "Mathlib.Analysis", "Mathlib.CategoryTheory", "Mathlib.NumberTheory",
)
_CONSONANTS = "bcdfgklmnprstvz"
_VOWELS = "aeiou"

# Distinct filler templates: bodies (base words), titles and eval queries
# (synonym words). Titles and queries share the synonym vocabulary but not
# their phrasing, so eval is not a memorized-string lookup.
_BODY_TEMPLATE = (
    "A lemma stating that the {b0} of every {b1} preserves {b2} under "
    "composition ."
)
_TITLE_TEMPLATE = "**The {s0} of a {s1} with {s2}.**"
_QUERY_TEMPLATE = "which {s0} of some {s1} keeps {s2}"


@dataclass(frozen=True)
class Concept:
    base: str
    synonym: str


@dataclass
class SyntheticCorpus:
    declarations: list[Declaration]
    concepts: list[Concept]
    # (query text, target declaration name); targets are all in the
    # held-out tail [n_train, n) of `declarations`.
    eval_queries: list[tuple[str, str]]
    n_train: int

    def texts(self) -> list[str]:
        """Every text the tokenizer must cover (docs, names, queries)."""
        out = []
        for d in self.declarations:
            out.append(d.informalization)
            out.append(d.name)
        out.extend(q for q, _ in self.eval_queries)
        return out


def _word(rng: np.random.Generator, syllables: int) -> str:
    return "".join(
        _CONSONANTS[rng.integers(len(_CONSONANTS))]
        + _VOWELS[rng.integers(len(_VOWELS))]
        for _ in range(syllables)
    )


def make_concepts(n: int, rng: np.random.Generator) -> list[Concept]:
    """n concepts with globally unique, non-overlapping base/synonym words."""
    seen: set[str] = set()
    concepts: list[Concept] = []
    while len(concepts) < n:
        base = _word(rng, 3)
        syn = _word(rng, 4)
        if base in seen or syn in seen or base == syn:
            continue
        seen.add(base)
        seen.add(syn)
        concepts.append(Concept(base, syn))
    return concepts


def make_corpus(
    *,
    n_decls: int = 2000,
    n_concepts: int = 240,
    n_eval: int = 256,
    holdout_fraction: float = 0.2,
    seed: int = 0,
) -> SyntheticCorpus:
    """Build the corpus, its concept vocabulary, and held-out eval queries."""
    rng = np.random.default_rng(seed)
    concepts = make_concepts(n_concepts, rng)

    triples: list[tuple[int, int, int]] = []
    used: set[frozenset] = set()
    while len(triples) < n_decls:
        pick = tuple(sorted(rng.choice(n_concepts, size=3, replace=False)))
        key = frozenset(pick)
        if key in used:
            continue
        used.add(key)
        triples.append(pick)

    declarations: list[Declaration] = []
    for i, (a, b, c) in enumerate(triples):
        ca, cb, cc = concepts[a], concepts[b], concepts[c]
        root = _ROOTS[i % len(_ROOTS)]
        # Concept triples are unique as sorted sets, so this name is unique
        # without a numeric suffix (which would bloat the tokenizer with one
        # token per declaration).
        name = f"{root}.{ca.base}_{cb.base}.of_{cc.base}"
        title = _TITLE_TEMPLATE.format(s0=ca.synonym, s1=cb.synonym, s2=cc.synonym)
        body = _BODY_TEMPLATE.format(b0=ca.base, b1=cb.base, b2=cc.base)
        declarations.append(
            Declaration(
                name=name,
                module=f"{root}.Basic",
                source_text=f"theorem {name} : ∀ x, {ca.base} x = {cb.base} x",
                source_link=f"https://github.com/example/mathlib/{i}",
                dependencies=None,
                informalization=f"{title} {body}",
                informalization_embedding=None,
            )
        )

    n_train = int(n_decls * (1.0 - holdout_fraction))
    holdout = list(range(n_train, n_decls))
    picks = rng.choice(len(holdout), size=min(n_eval, len(holdout)), replace=False)
    eval_queries = []
    for p in picks:
        i = holdout[int(p)]
        a, b, c = triples[i]
        query = _QUERY_TEMPLATE.format(
            s0=concepts[a].synonym, s1=concepts[b].synonym, s2=concepts[c].synonym
        )
        eval_queries.append((query, declarations[i].name))

    return SyntheticCorpus(
        declarations=declarations,
        concepts=concepts,
        eval_queries=eval_queries,
        n_train=n_train,
    )


def build_wordlevel_tokenizer(
    texts: list[str], out_dir: str | Path, *, extra_texts: tuple[str, ...] = ()
) -> Path:
    """Write a WordLevel HF tokenizer covering every token in `texts`.

    Matches the checkpoint layout load_tokenizer expects (tokenizer.json +
    tokenizer_config.json). Vocabulary order is deterministic (sorted).
    """
    from tokenizers import Tokenizer, models, pre_tokenizers

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # Whitespace keeps snake_case compounds whole; splitting on "_" too
    # gives subword-style sharing between declaration names and prose (and
    # keeps the vocabulary at O(concepts), not O(declarations)).
    pre = pre_tokenizers.Sequence(
        [
            pre_tokenizers.Whitespace(),
            pre_tokenizers.CharDelimiterSplit("_"),
        ]
    )
    tokens: set[str] = set()
    for text in itertools.chain(texts, extra_texts):
        tokens.update(tok for tok, _ in pre.pre_tokenize_str(text))

    vocab = {"<pad>": 0, "<unk>": 1, "<eos>": 2}
    for tok in sorted(tokens):
        vocab.setdefault(tok, len(vocab))

    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre
    tok.save(str(out_dir / "tokenizer.json"))
    (out_dir / "tokenizer_config.json").write_text(
        json.dumps(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "pad_token": "<pad>",
                "eos_token": "<eos>",
                "unk_token": "<unk>",
                "model_max_length": 512,
            }
        )
    )
    return out_dir
