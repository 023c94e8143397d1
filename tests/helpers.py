"""Test helpers: tiny local model checkpoints with real tokenizers.

Builds a complete offline "HF model directory" (tokenizer.json + config.json
+ model.safetensors) so client/engine tests exercise the real load path —
the offline analogue of the reference's external-model tests.
"""

import json
from pathlib import Path

_WORDS = [
    "true", "false", "nat", "add", "mul", "list", "map", "comm", "the",
    "sum", "of", "two", "natural", "numbers", "a", "b", "function",
    "continuous", "prime", "query", "document", "instruct", "find",
    "relevant", "lean", "math", "declarations", "addition", "retrieve",
    "passages", "that", "answer", "web", "search", "given", ":", ".", ",",
    "<", ">", "4", "multiplication", "applies", "each", "element",
]


def make_tiny_model_dir(
    path: Path,
    *,
    seed: int = 0,
    hidden_size: int = 64,
    with_st_prompt: bool = False,
) -> Path:
    """Write a tiny random Qwen3 checkpoint + WordLevel tokenizer to path."""
    import torch
    import transformers
    from tokenizers import Tokenizer, models, pre_tokenizers

    path.mkdir(parents=True, exist_ok=True)

    vocab = {"<pad>": 0, "<unk>": 1, "<eos>": 2}
    for w in _WORDS:
        vocab.setdefault(w, len(vocab))
    vocab_size = 128
    i = 0
    while len(vocab) < vocab_size:
        vocab.setdefault(f"extra{i}", len(vocab))
        i += 1

    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.save(str(path / "tokenizer.json"))
    (path / "tokenizer_config.json").write_text(
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

    torch.manual_seed(seed)
    cfg = transformers.Qwen3Config(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=hidden_size * 2,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=hidden_size // 4,
        max_position_embeddings=512,
        tie_word_embeddings=True,
        attention_bias=False,
    )
    transformers.Qwen3ForCausalLM(cfg).save_pretrained(
        path, safe_serialization=True
    )

    if with_st_prompt:
        (path / "config_sentence_transformers.json").write_text(
            json.dumps({"prompts": {"query": "query : "}})
        )
    return path
