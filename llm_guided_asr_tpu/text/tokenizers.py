"""Tokenizers and token-id conversion.

Rebuild of espnet2/text/: char_tokenizer.py, word_tokenizer.py,
hugging_face_tokenizer.py, token_id_converter.py,
hugging_face_token_id_converter.py, build_tokenizer.py.

sentencepiece is not available in this image; BPE models are supported via
HuggingFace tokenizers (which cover the LLM-guided path — the fork's headline
recipes use --token_type hugging_face, run.sh:36-37).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence, Union


class AbsTokenizer:
    def text2tokens(self, line: str) -> List[str]:
        raise NotImplementedError

    def tokens2text(self, tokens: Iterable[str]) -> str:
        raise NotImplementedError


class CharTokenizer(AbsTokenizer):
    """espnet2/text/char_tokenizer.py: char-level with <space> and non_linguistic symbols."""

    def __init__(
        self,
        non_linguistic_symbols: Optional[Iterable[str]] = None,
        space_symbol: str = "<space>",
        remove_non_linguistic_symbols: bool = False,
    ):
        self.space_symbol = space_symbol
        self.non_linguistic_symbols = set(non_linguistic_symbols or [])
        self.remove_non_linguistic_symbols = remove_non_linguistic_symbols

    def text2tokens(self, line: str) -> List[str]:
        tokens = []
        while line:
            matched = False
            for sym in self.non_linguistic_symbols:
                if line.startswith(sym):
                    if not self.remove_non_linguistic_symbols:
                        tokens.append(sym)
                    line = line[len(sym):]
                    matched = True
                    break
            if matched:
                continue
            ch = line[0]
            tokens.append(self.space_symbol if ch == " " else ch)
            line = line[1:]
        return tokens

    def tokens2text(self, tokens: Iterable[str]) -> str:
        return "".join(" " if t == self.space_symbol else t for t in tokens)


class WordTokenizer(AbsTokenizer):
    """espnet2/text/word_tokenizer.py: whitespace split."""

    def __init__(self, delimiter: Optional[str] = None):
        self.delimiter = delimiter

    def text2tokens(self, line: str) -> List[str]:
        return line.split(self.delimiter)

    def tokens2text(self, tokens: Iterable[str]) -> str:
        return (self.delimiter or " ").join(tokens)


class HuggingFaceTokenizer(AbsTokenizer):
    """espnet2/text/hugging_face_tokenizer.py: AutoTokenizer wrapper (lazy)."""

    def __init__(self, model_name_or_path: str):
        self.model = model_name_or_path
        self._tok = None

    @property
    def tokenizer(self):
        if self._tok is None:
            from transformers import AutoTokenizer

            self._tok = AutoTokenizer.from_pretrained(self.model)
        return self._tok

    def text2tokens(self, line: str) -> List[str]:
        return self.tokenizer.tokenize(line)

    def tokens2text(self, tokens: Iterable[str]) -> str:
        return self.tokenizer.convert_tokens_to_string(list(tokens)).strip()


class TokenIDConverter:
    """espnet2/text/token_id_converter.py: token list <-> id, unk fallback."""

    def __init__(self, token_list: Union[Path, str, Sequence[str]], unk_symbol: str = "<unk>"):
        if isinstance(token_list, (str, Path)):
            with open(token_list, encoding="utf-8") as f:
                self.token_list = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        else:
            self.token_list = list(token_list)
        self.token2id: Dict[str, int] = {}
        for i, t in enumerate(self.token_list):
            if t in self.token2id:
                raise RuntimeError(f"duplicated token: {t}")
            self.token2id[t] = i
        self.unk_symbol = unk_symbol
        if unk_symbol not in self.token2id:
            raise RuntimeError(f"unk symbol {unk_symbol!r} not in token list")
        self.unk_id = self.token2id[unk_symbol]

    def get_num_vocabulary_size(self) -> int:
        return len(self.token_list)

    def ids2tokens(self, ids: Iterable[int]) -> List[str]:
        return [self.token_list[int(i)] for i in ids]

    def tokens2ids(self, tokens: Iterable[str]) -> List[int]:
        return [self.token2id.get(t, self.unk_id) for t in tokens]


class HuggingFaceTokenIDConverter:
    """espnet2/text/hugging_face_token_id_converter.py."""

    def __init__(self, model_name_or_path: str):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)

    def get_num_vocabulary_size(self) -> int:
        return self.tokenizer.vocab_size

    def ids2tokens(self, ids: Iterable[int]) -> List[str]:
        return self.tokenizer.convert_ids_to_tokens(list(int(i) for i in ids))

    def tokens2ids(self, tokens: Iterable[str]) -> List[int]:
        return self.tokenizer.convert_tokens_to_ids(list(tokens))


def build_tokenizer(
    token_type: str,
    bpemodel: Optional[str] = None,
    non_linguistic_symbols: Optional[Iterable[str]] = None,
    space_symbol: str = "<space>",
    delimiter: Optional[str] = None,
    g2p: Optional[str] = None,
) -> AbsTokenizer:
    """espnet2/text/build_tokenizer.py dispatch."""
    if token_type == "char":
        return CharTokenizer(non_linguistic_symbols, space_symbol)
    if token_type == "word":
        return WordTokenizer(delimiter)
    if token_type == "hugging_face":
        if bpemodel is None:
            raise ValueError("token_type=hugging_face requires bpemodel (HF model name)")
        return HuggingFaceTokenizer(bpemodel)
    if token_type == "phn":
        from llm_guided_asr_tpu.text.phoneme import PhonemeTokenizer

        return PhonemeTokenizer(g2p or "rule_en", non_linguistic_symbols)
    if token_type == "whisper":
        # whisper's multilingual BPE rides the HF tokenizer (the reference
        # wraps openai-whisper's tokenizer; both resolve the same vocab)
        if bpemodel is None:
            raise ValueError("token_type=whisper requires bpemodel "
                             "(HF whisper model dir/name)")
        return HuggingFaceTokenizer(bpemodel)
    if token_type == "bpe":
        raise NotImplementedError(
            "sentencepiece is not available in this environment; "
            "use token_type=hugging_face or char"
        )
    raise ValueError(f"unknown token_type: {token_type}")
