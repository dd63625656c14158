"""Offline test fixtures: tiny HF-compatible char tokenizer + tiny Llama.

The real recipes point at meta-llama/Qwen checkpoints; this builds a fully
local stand-in (char-level WordLevel tokenizer + random tiny LlamaForCausalLM
saved with save_pretrained) so the whole LLM-guided path runs with zero
network egress — the test-strategy analog of the reference's tiny random
models (SURVEY.md §4).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional


def make_tiny_llm_dir(
    out_dir: Path,
    extra_chars: str = "abc",
    hidden_size: int = 32,
    intermediate_size: int = 48,
    num_layers: int = 2,
    num_heads: int = 4,
    num_kv_heads: int = 2,
    seed: int = 0,
) -> Path:
    """Create <out_dir> with config.json/model weights/tokenizer files."""
    import torch
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Split
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # vocab: id 0 = '!' (the reference notes blank_id 0 is llama3's '!',
    # llm_guided_asr_model.py:78-80), then specials + template chars
    chars = list("!\"#()->:HYPBIAS,. ") + list("abcdefghijklmnopqrstuvwxyz") + list(extra_chars)
    vocab = {}
    for ch in chars:
        if ch not in vocab:
            vocab[ch] = len(vocab)
    for tok in ("<unk>", "<s>", "</s>", "<pad>"):
        vocab[tok] = len(vocab)

    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Split("", "isolated")
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>", bos_token="<s>", eos_token="</s>", pad_token="<pad>",
    )
    fast.save_pretrained(out_dir)

    cfg = LlamaConfig(
        vocab_size=len(vocab),
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_hidden_layers=num_layers,
        num_attention_heads=num_heads,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        bos_token_id=vocab["<s>"],
        eos_token_id=vocab["</s>"],
        pad_token_id=vocab["<pad>"],
    )
    torch.manual_seed(seed)
    model = LlamaForCausalLM(cfg)
    model.save_pretrained(out_dir)
    return out_dir
