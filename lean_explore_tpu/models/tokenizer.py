"""Tokenizer loading and static-shape batch encoding.

JAX traces one program per input shape, so batches are padded to a small set
of (batch, length) buckets: the cost of a few extra pad tokens is far below
a recompile. This replaces the dynamic-shape tokenize-then-forward style of
the reference's torch clients (util/embedding_client.py:88-101).
"""

import logging
from dataclasses import dataclass
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

LENGTH_BUCKETS = (32, 64, 128, 256, 512)
BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


def load_tokenizer(model_dir: str | Path):
    """Load a fast HF tokenizer from a local model directory."""
    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(str(model_dir), local_files_only=True)


def unk_fraction(tokenizer, texts: list[str], max_texts: int = 64) -> float:
    """Fraction of <unk> tokens when ``tokenizer`` encodes a text sample.

    Guards evaluations against vocabulary mismatch: scoring a corpus whose
    words a trained WordLevel tokenizer has never seen silently maps them
    all to <unk>, and the measurement then describes uniform filler
    rather than the intended text (e.g. running a long-doc eval against
    short-doc checkpoints). Returns 0.0 when the tokenizer has no unk id.
    """
    unk_id = getattr(tokenizer, "unk_token_id", None)
    if unk_id is None or not texts:
        return 0.0
    rows = tokenizer(list(texts[:max_texts]))["input_ids"]
    total = sum(len(r) for r in rows)
    if not total:
        return 0.0
    return sum(1 for r in rows for t in r if t == unk_id) / total


def bucket_length(n: int, max_length: int, buckets=LENGTH_BUCKETS) -> int:
    """Smallest bucket >= n, capped at max_length."""
    for b in buckets:
        if b >= max_length:
            return max_length
        if n <= b:
            return b
    return max_length


def bucket_batch(n: int, buckets=BATCH_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    # Above the largest bucket: round up to a multiple of it.
    top = buckets[-1]
    return ((n + top - 1) // top) * top


@dataclass
class EncodedBatch:
    """Padded token batch; rows >= n_valid are padding-only."""

    input_ids: np.ndarray  # [B_pad, T_pad] int32
    attention_mask: np.ndarray  # [B_pad, T_pad] int32
    n_valid: int


def encode_batch(
    tokenizer,
    texts: list[str],
    *,
    max_length: int,
    pad_to_buckets: bool = True,
    append_eos: bool = False,
) -> EncodedBatch:
    """Tokenize, truncate, and pad to bucketed static shapes.

    Args:
        tokenizer: HF tokenizer.
        texts: Input strings (non-empty list).
        max_length: Hard truncation length.
        pad_to_buckets: Pad (batch, length) up to bucket sizes.
        append_eos: Append the EOS token inside the length budget (Qwen3
            embedding models pool the EOS position).
    """
    enc = tokenizer(
        list(texts),
        truncation=True,
        max_length=max_length - 1 if append_eos else max_length,
        padding=False,
    )
    ids_list = enc["input_ids"]
    if append_eos and tokenizer.eos_token_id is not None:
        ids_list = [row + [tokenizer.eos_token_id] for row in ids_list]

    longest = max(len(row) for row in ids_list)
    target_len = (
        bucket_length(longest, max_length) if pad_to_buckets else longest
    )
    target_len = max(target_len, 1)
    n = len(ids_list)
    target_batch = bucket_batch(n) if pad_to_buckets else n

    pad_id = tokenizer.pad_token_id
    if pad_id is None:
        pad_id = tokenizer.eos_token_id or 0
    input_ids = np.full((target_batch, target_len), pad_id, dtype=np.int32)
    mask = np.zeros((target_batch, target_len), dtype=np.int32)
    for i, row in enumerate(ids_list):
        row = row[:target_len]
        input_ids[i, : len(row)] = row
        mask[i, : len(row)] = 1
    # Pad rows carry a single valid token so masked softmax rows stay benign
    # and pooling indices are in range; their outputs are discarded.
    mask[n:, 0] = 1
    return EncodedBatch(input_ids=input_ids, attention_mask=mask, n_valid=n)
