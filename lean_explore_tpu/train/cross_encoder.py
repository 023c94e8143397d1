"""Cross-encoder (reranker) fine-tuning: the true/false readout objective.

The reference consumes Qwen3-Reranker frozen — a causal LM scoring
``<Instruct>/<Query>/<Document>`` pairs by P("true") from the last-token
true/false logits (reference util/reranker_client.py:96-141). This module
trains exactly that readout: binary softmax cross-entropy over the
(false, true) logit pair at the last valid position, on labeled
(query, document, match?) triples. The trained checkpoint exports through
train/export.export_hf_checkpoint and drops straight into
util/reranker_client.RerankerClient (which reads the same two vocabulary
columns), so the serving path needs no changes to use it.

Parallelism mirrors train/contrastive.py: TP over the ``model`` axis via
param_partition_specs, DP over ``data``; GSPMD inserts the collectives.
"""

from collections.abc import Iterator
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lean_explore_tpu.models import qwen3
from lean_explore_tpu.models.qwen3 import Qwen3Config
from lean_explore_tpu.models.tokenizer import encode_batch
from lean_explore_tpu.train.contrastive import param_partition_specs

# Re-exported from the serving client: training MUST see byte-identical
# pair formatting to what RerankerClient serves, so both sides import the
# one definition instead of carrying copies that could drift.
from lean_explore_tpu.util.reranker_client import (  # noqa: E402
    DEFAULT_INSTRUCTION,
    format_pair,
)


class CrossEncoderBatch(NamedTuple):
    """One training batch of formatted pairs with 0/1 match labels."""

    input_ids: jnp.ndarray  # [B, T] int32
    attention_mask: jnp.ndarray  # [B, T] int32
    labels: jnp.ndarray  # [B] int32; 1 = match ("true"), 0 = non-match


def cross_encoder_loss(
    params: dict,
    config: Qwen3Config,
    batch: CrossEncoderBatch,
    *,
    token_true: int,
    token_false: int,
) -> tuple[jnp.ndarray, dict]:
    """Binary CE over the (false, true) logits at the last valid token.

    Label 1 maps to the "true" column — the same column RerankerClient's
    softmax reads as P(true), so minimizing this loss directly calibrates
    the serving score.
    """
    hidden = qwen3.forward_hidden(
        params, config, batch.input_ids, batch.attention_mask
    )
    # Same last-valid-token selection the serving scorer uses — shared so
    # a padding-side change can't decouple the trained objective from the
    # served score.
    last = qwen3._last_valid_index(batch.attention_mask)
    pooled = jnp.take_along_axis(hidden, last[:, None, None], axis=1)[:, 0, :]
    pair = qwen3._pair_logits(params, pooled, token_false, token_true)  # [B, 2]
    loss = optax.softmax_cross_entropy_with_integer_labels(
        pair, batch.labels
    ).mean()
    accuracy = jnp.mean(jnp.argmax(pair, axis=1) == batch.labels)
    return loss, {"loss": loss, "accuracy": accuracy}


def make_ce_train_step(
    config: Qwen3Config,
    mesh: Mesh,
    optimizer: optax.GradientTransformation,
    *,
    token_true: int,
    token_false: int,
):
    """Jitted sharded train step: (params, opt_state, batch) -> updated."""

    def step(params, opt_state, batch: CrossEncoderBatch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: cross_encoder_loss(
                p, config, batch,
                token_true=token_true, token_false=token_false,
            ),
            has_aux=True,
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    batch_sharding = CrossEncoderBatch(
        NamedSharding(mesh, P("data", None)),
        NamedSharding(mesh, P("data", None)),
        NamedSharding(mesh, P("data")),
    )
    specs = param_partition_specs(config)
    param_sharding = jax.tree.map(
        lambda spec: None if spec is None else NamedSharding(mesh, spec),
        specs,
        is_leaf=lambda x: x is None or isinstance(x, P),
    )
    return jax.jit(
        step,
        in_shardings=(param_sharding, None, batch_sharding),
        out_shardings=(param_sharding, None, None),
    )


class CrossEncoderDataLoader:
    """Shuffled, tokenized, fixed-shape batches of labeled pair examples.

    ``examples`` are (query, document, label) triples; each batch formats
    them with the serving pair template and pads to a FIXED [batch,
    max_length] shape so every step hits one compiled program.
    """

    def __init__(
        self,
        tokenizer,
        examples: list[tuple[str, str, int]],
        *,
        batch_size: int = 64,
        max_length: int = 96,
        instruction: str = DEFAULT_INSTRUCTION,
        seed: int = 0,
        truncation_augment: float = 0.0,
        truncation_caps: tuple[int, int] = (24, 96),
    ):
        if not examples:
            raise ValueError("no training examples")
        if len(examples) < batch_size:
            raise ValueError(
                f"{len(examples)} examples < batch_size {batch_size}: every "
                "epoch would yield zero full batches and iteration would "
                "spin forever (partial batches are dropped for static "
                "shapes)"
            )
        self.tokenizer = tokenizer
        self.examples = examples
        self.batch_size = batch_size
        self.max_length = max_length
        self.instruction = instruction
        self.truncation_augment = truncation_augment
        self.truncation_caps = truncation_caps
        self._rng = np.random.default_rng(seed)

    def _truncate_doc(self, doc: str, cap: int) -> str:
        """Tokenize-cap-decode, byte-matching the serving cascade's
        prescreen truncation (util/reranker_client.py:_truncate_docs) so
        the augmented training distribution IS the prescreen's input
        distribution."""
        ids = self.tokenizer(
            doc, truncation=True, max_length=cap, add_special_tokens=False
        )["input_ids"]
        return self.tokenizer.decode(ids)

    def _encode(self, texts: list[str]):
        batch = encode_batch(
            self.tokenizer, texts, max_length=self.max_length,
            pad_to_buckets=False,
        )
        ids, mask = batch.input_ids, batch.attention_mask
        pad = self.max_length - ids.shape[1]
        if pad > 0:
            pad_id = self.tokenizer.pad_token_id or 0
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=pad_id)
            mask = np.pad(mask, ((0, 0), (0, pad)))
        return jnp.asarray(ids), jnp.asarray(mask)

    def epoch(self) -> Iterator[CrossEncoderBatch]:
        order = self._rng.permutation(len(self.examples))
        for start in range(
            0, len(order) - self.batch_size + 1, self.batch_size
        ):
            chunk = [
                self.examples[i] for i in order[start : start + self.batch_size]
            ]
            if self.truncation_augment > 0.0:
                # Truncation augmentation: with probability p, the model
                # sees the pair at a random doc-token cap. MEASURED
                # NEGATIVE at 200k scale (two attempts — full-length
                # direct recall 0.994 -> 0.719 and -> 0.125): deleting
                # body prose destroys query-paraphrase generalization,
                # invisibly to train accuracy. Kept off-default as the
                # documented experiment; docs/performance.md
                # "Truncation-augmented training".
                lo, hi = self.truncation_caps
                chunk = [
                    (
                        q,
                        self._truncate_doc(
                            d, int(self._rng.integers(lo, hi + 1))
                        )
                        if self._rng.random() < self.truncation_augment
                        else d,
                        y,
                    )
                    for q, d, y in chunk
                ]
            ids, mask = self._encode(
                [format_pair(q, d, self.instruction) for q, d, _ in chunk]
            )
            labels = jnp.asarray(
                np.fromiter((y for _, _, y in chunk), np.int32, len(chunk))
            )
            yield CrossEncoderBatch(ids, mask, labels)

    def __iter__(self) -> Iterator[CrossEncoderBatch]:
        while True:
            yield from self.epoch()
