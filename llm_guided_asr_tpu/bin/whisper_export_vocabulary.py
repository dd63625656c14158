#!/usr/bin/env python3
"""Export a Whisper tokenizer's vocabulary as an ESPnet token list.

Rebuild of espnet2/bin/whisper_export_vocabulary.py (asr.sh token-list
generation for token_type=whisper): one token per line ordered by id, the
BPE space marker 'Ġ' rendered as a literal space, the timestamp tokens
(`<|0.00|>`, `<|0.02|>`, ...) appended up to the full model vocabulary
size, and an optional speaker-change symbol for SOT-style training.

The reference wraps openai-whisper's tokenizer; this environment's whisper
token_type rides HF tokenizers (text/tokenizers.py:164), so the tokenizer
here comes from an HF whisper model dir/name (--hf_tokenizer). Both resolve
the same vocabulary.
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

logger = logging.getLogger(__name__)

# openai-whisper's language registry (whisper/tokenizer.py LANGUAGES):
# code set used to validate --whisper_language, accepting full names too
# (the reference's LANGUAGES_CODE_MAPPING does the same normalization).
_WHISPER_LANGUAGES = {
    "en": "english", "zh": "chinese", "de": "german", "es": "spanish",
    "ru": "russian", "ko": "korean", "fr": "french", "ja": "japanese",
    "pt": "portuguese", "tr": "turkish", "pl": "polish", "ca": "catalan",
    "nl": "dutch", "ar": "arabic", "sv": "swedish", "it": "italian",
    "id": "indonesian", "hi": "hindi", "fi": "finnish", "vi": "vietnamese",
    "he": "hebrew", "uk": "ukrainian", "el": "greek", "ms": "malay",
    "cs": "czech", "ro": "romanian", "da": "danish", "hu": "hungarian",
    "ta": "tamil", "no": "norwegian", "th": "thai", "ur": "urdu",
    "hr": "croatian", "bg": "bulgarian", "lt": "lithuanian", "la": "latin",
    "mi": "maori", "ml": "malayalam", "cy": "welsh", "sk": "slovak",
    "te": "telugu", "fa": "persian", "lv": "latvian", "bn": "bengali",
    "sr": "serbian", "az": "azerbaijani", "sl": "slovenian", "kn": "kannada",
    "et": "estonian", "mk": "macedonian", "br": "breton", "eu": "basque",
    "is": "icelandic", "hy": "armenian", "ne": "nepali", "mn": "mongolian",
    "bs": "bosnian", "kk": "kazakh", "sq": "albanian", "sw": "swahili",
    "gl": "galician", "mr": "marathi", "pa": "punjabi", "si": "sinhala",
    "km": "khmer", "sn": "shona", "yo": "yoruba", "so": "somali",
    "af": "afrikaans", "oc": "occitan", "ka": "georgian", "be": "belarusian",
    "tg": "tajik", "sd": "sindhi", "gu": "gujarati", "am": "amharic",
    "yi": "yiddish", "lo": "lao", "uz": "uzbek", "fo": "faroese",
    "ht": "haitian creole", "ps": "pashto", "tk": "turkmen", "nn": "nynorsk",
    "mt": "maltese", "sa": "sanskrit", "lb": "luxembourgish", "my": "myanmar",
    "bo": "tibetan", "tl": "tagalog", "mg": "malagasy", "as": "assamese",
    "tt": "tatar", "haw": "hawaiian", "ln": "lingala", "ha": "hausa",
    "ba": "bashkir", "jw": "javanese", "su": "sundanese",
}
_NAME_TO_CODE = {v: k for k, v in _WHISPER_LANGUAGES.items()}

# reference whisper_export_vocabulary.py:87 full model vocab sizes
_FULL_VOCAB = {"whisper_en": 51864, "whisper_multilingual": 51865}


def _normalize_language(language: str) -> str:
    lang = language.lower()
    if lang in _WHISPER_LANGUAGES:
        return lang
    if lang in _NAME_TO_CODE:
        return _NAME_TO_CODE[lang]
    raise ValueError(f"language unsupported for Whisper model: {language}")


def export_vocabulary(
    output: str,
    whisper_model: str,
    hf_tokenizer: str,
    whisper_language: str = "en",
    whisper_task: str = "transcribe",
    add_token_file_name: str = "none",
    sot_asr: bool = False,
    speaker_change_symbol: str = "<sc>",
    full_vocab_size: int = 0,
):
    """Write the whisper token list (id-ordered, one token per line)."""
    from transformers import AutoTokenizer

    if whisper_model not in _FULL_VOCAB:
        raise ValueError(f"tokenizer unsupported: {whisper_model}")
    if whisper_model == "whisper_multilingual":
        _normalize_language(whisper_language)
        if whisper_task not in ("transcribe", "translate"):
            raise ValueError(f"task: {whisper_task} unsupported for Whisper model")

    tok = AutoTokenizer.from_pretrained(hf_tokenizer)
    if add_token_file_name != "none":
        added = [
            line.rstrip("\n")
            for line in open(add_token_file_name, encoding="utf-8")
            if line.rstrip("\n")
        ]
        tok.add_tokens(added)

    vocab = tok.get_vocab()  # token -> id
    inv = {i: t for t, i in vocab.items()}
    vocab_size = max(inv) + 1
    # drop tokens already of timestamp form so padding below stays aligned
    # (HF whisper tokenizers may or may not carry them as added tokens)
    while vocab_size > 0 and inv.get(vocab_size - 1, "").startswith("<|") and (
        inv[vocab_size - 1].rstrip("|>").lstrip("<|").replace(".", "").isdigit()
    ):
        vocab_size -= 1

    full = full_vocab_size or _FULL_VOCAB[whisper_model]
    if add_token_file_name != "none":
        full += len(added)

    out = sys.stdout if output == "-" else None
    if out is None:
        p = Path(output)
        p.parent.mkdir(parents=True, exist_ok=True)
        out = p.open("w", encoding="utf-8")
    n = 0
    with out:
        for i in range(vocab_size):
            out.write(inv.get(i, f"<unused_{i}>").replace("Ġ", " ") + "\n")
            n += 1
        for i in range(max(0, full - vocab_size)):
            out.write(f"<|{i * 0.02:.2f}|>\n")
            n += 1
        if sot_asr:
            out.write(speaker_change_symbol + "\n")
            n += 1
    logger.info(f"exported {n} whisper tokens from {hf_tokenizer}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output": "-",
        "whisper_model": None,
        "hf_tokenizer": None,
        "whisper_language": "en",
        "whisper_task": "transcribe",
        "add_token_file_name": "none",
        "sot_asr": False,
        "speaker_change_symbol": "<sc>",
        "full_vocab_size": 0,
    })
    logging.basicConfig(level=logging.INFO)
    if not config.get("whisper_model") or not config.get("hf_tokenizer"):
        raise SystemExit("--whisper_model and --hf_tokenizer are required")
    export_vocabulary(
        config["output"], config["whisper_model"], config["hf_tokenizer"],
        whisper_language=config.get("whisper_language", "en"),
        whisper_task=config.get("whisper_task", "transcribe"),
        add_token_file_name=config.get("add_token_file_name", "none"),
        sot_asr=bool(config.get("sot_asr", False)),
        speaker_change_symbol=config.get("speaker_change_symbol", "<sc>"),
        full_vocab_size=int(config.get("full_vocab_size", 0)),
    )


if __name__ == "__main__":
    main()
