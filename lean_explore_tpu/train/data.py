"""Training data: contrastive (query, document) pairs from a declaration store.

Queries are derived from what users actually type (declaration names and
the informal titles the pipeline generates); documents are the
informalizations the serving index embeds — so fine-tuning optimizes
exactly the retrieval geometry the engine searches.
"""

import logging
from collections.abc import Iterator

import jax.numpy as jnp
import numpy as np

from lean_explore_tpu.models import DeclarationStore
from lean_explore_tpu.models.search_types import extract_bold_description
from lean_explore_tpu.models.tokenizer import encode_batch
from lean_explore_tpu.train.contrastive import ContrastiveBatch

logger = logging.getLogger(__name__)


def pairs_from_store(store: DeclarationStore) -> list[tuple[str, str]]:
    """(query, positive document) pairs for every informalized declaration.

    Two query forms per declaration: the spaced name ("Nat.add_comm" ->
    "Nat add_comm"-ish lexical query) and the informal title from the
    ``**Title.**`` header when present (semantic query).
    """
    pairs: list[tuple[str, str]] = []
    for decl in store.iter_all(with_embeddings=False):
        if not decl.informalization:
            continue
        document = decl.informalization
        pairs.append((decl.name, document))
        title = extract_bold_description(decl.informalization)
        if title:
            pairs.append((title, document))
    logger.info("built %d contrastive pairs", len(pairs))
    return pairs


class ContrastiveDataLoader:
    """Shuffled, tokenized, fixed-shape batches of contrastive pairs."""

    def __init__(
        self,
        tokenizer,
        pairs: list[tuple[str, str]],
        *,
        batch_size: int = 32,
        query_max_length: int = 64,
        doc_max_length: int = 256,
        seed: int = 0,
        append_eos: bool = True,
    ):
        if not pairs:
            raise ValueError("no training pairs")
        if len(pairs) < batch_size:
            raise ValueError(
                f"{len(pairs)} pairs < batch_size {batch_size}: every epoch "
                "would yield zero full batches and iteration would spin "
                "forever (partial batches are dropped for static shapes)"
            )
        self.tokenizer = tokenizer
        self.pairs = pairs
        self.batch_size = batch_size
        self.query_max_length = query_max_length
        self.doc_max_length = doc_max_length
        # Serving parity: EmbeddingClient appends EOS and last-token-pools
        # it (Qwen3-Embedding convention); training must pool the same
        # position or the served embedding is read at a token the
        # objective never optimized.
        self.append_eos = append_eos
        self._rng = np.random.default_rng(seed)

    def _encode(self, texts: list[str], max_length: int):
        """Tokenize to a FIXED [batch, max_length] shape so every batch hits
        the same compiled train step."""
        batch = encode_batch(
            self.tokenizer, texts, max_length=max_length,
            pad_to_buckets=False, append_eos=self.append_eos,
        )
        ids = batch.input_ids
        mask = batch.attention_mask
        pad = max_length - ids.shape[1]
        if pad > 0:
            pad_id = self.tokenizer.pad_token_id or 0
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=pad_id)
            mask = np.pad(mask, ((0, 0), (0, pad)))
        return jnp.asarray(ids), jnp.asarray(mask)

    def epoch(self) -> Iterator[ContrastiveBatch]:
        """One shuffled pass; trailing partial batch is dropped (static
        shapes keep the train step un-recompiled)."""
        order = self._rng.permutation(len(self.pairs))
        for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
            chunk = [self.pairs[i] for i in order[start : start + self.batch_size]]
            q_ids, q_mask = self._encode(
                [q for q, _ in chunk], self.query_max_length
            )
            d_ids, d_mask = self._encode(
                [d for _, d in chunk], self.doc_max_length
            )
            docs = np.array([d for _, d in chunk], dtype=object)
            dup = (docs[:, None] == docs[None, :]) & ~np.eye(
                len(chunk), dtype=bool
            )
            yield ContrastiveBatch(
                q_ids, q_mask, d_ids, d_mask, jnp.asarray(dup)
            )

    def __iter__(self) -> Iterator[ContrastiveBatch]:
        while True:
            yield from self.epoch()
