"""Prompt-template machinery for LLM-guided ASR.

Rebuild of the template handling in espnet2/asr/llm/llama.py:56-101
(template split on the literal ``((HYP))``) and the prompt packing of
prepare_prompt (llama.py:103-163) — but as a *static-shape on-device* packer:
[prefix | hyp | suffix | response] segments are scattered to per-row offsets
with validity masks, so the whole training forward stays inside one jit
(the reference loops over rows on the host and re-tokenizes).

The packed layout places hyp padding mid-row; LlamaModel computes RoPE
positions as cumsum(valid)-1 and masks pads from attention, which is
numerically identical to the reference's contiguous layout (tested in
test_llama.py::test_midrow_padding_equals_contiguous).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PromptTemplate:
    """Static token-id segments of the templated prompt.

    Optional contextual biasing (the fork's llama_new.py variant): when the
    template contains a ``((BIAS))`` marker, ``mid_ids`` holds the static
    tokens between the bias-word segment and the hypothesis, and per-utterance
    bias words are packed at the marker position.
    """

    prefix_ids: Tuple[int, ...]  # [bos] + template-before-((BIAS) or (HYP))
    suffix_ids: Tuple[int, ...]  # template-after-((HYP))
    start_of_response_id: int  # sos for the guided decoder (llama.py:74-92)
    end_of_response_id: int
    pad_id: int
    mid_ids: Optional[Tuple[int, ...]] = None  # between ((BIAS)) and ((HYP))

    @property
    def has_bias_slot(self) -> bool:
        return self.mid_ids is not None

    @property
    def prefix_len(self) -> int:
        return len(self.prefix_ids)

    @property
    def suffix_len(self) -> int:
        return len(self.suffix_ids)


def _find_marker(tokens, marker: str, max_marker_tokens: int = 10):
    for i in range(len(tokens)):
        for w in range(1, max_marker_tokens + 1):
            joined = "".join(tokens[i : i + w])
            # tokenizers may decorate with word-boundary markers; strip common ones
            cleaned = joined.replace("▁", " ").replace("Ġ", " ").strip()
            if cleaned == marker:
                return i, w
    return None


def split_template(
    tokenizer,
    template_prompt: Optional[str],
    bos_token_id: int,
    eos_token_id: int,
    pad_token: Optional[str] = None,
    hyp_marker: str = "((HYP))",
    bias_marker: str = "((BIAS))",
    max_marker_tokens: int = 8,
) -> PromptTemplate:
    """Tokenize the template and split at ``((HYP))`` (and optional ``((BIAS))``).

    Unlike the reference's fixed marker length (5 for llama2 BPE, 4 for
    llama3, llama.py:61), the marker span is searched over 1..max_marker_tokens
    so any tokenizer works.
    """
    pad_id = (
        tokenizer.convert_tokens_to_ids(pad_token)
        if pad_token is not None
        else (tokenizer.pad_token_id if tokenizer.pad_token_id is not None else 0)
    )
    if pad_id is None:
        pad_id = 0
    if not template_prompt:
        return PromptTemplate(
            prefix_ids=(bos_token_id,),
            suffix_ids=(),
            start_of_response_id=bos_token_id,
            end_of_response_id=eos_token_id,
            pad_id=pad_id,
        )
    tokens = tokenizer.tokenize(template_prompt)
    found = _find_marker(tokens, hyp_marker, max_marker_tokens)
    if found is None:
        raise ValueError(f"marker {hyp_marker!r} not found in template tokens: {tokens}")
    i, w = found
    before_hyp = tokens[:i]
    suffix = tokenizer.convert_tokens_to_ids(tokens[i + w :])
    mid = None
    bias_found = _find_marker(before_hyp, bias_marker, max_marker_tokens)
    if bias_found is not None:
        bi, bw = bias_found
        mid = tuple(tokenizer.convert_tokens_to_ids(before_hyp[bi + bw :]))
        before_hyp = before_hyp[:bi]
    prefix = [bos_token_id] + tokenizer.convert_tokens_to_ids(before_hyp)
    # response delimiter: the literal double-quote token wrapping ((HYP))
    # (llama.py:74-80 hardcodes 29908 / 1; we resolve it from the tokenizer)
    quote_id = tokenizer.convert_tokens_to_ids('"')
    if quote_id is None or quote_id == tokenizer.unk_token_id:
        quote_id = bos_token_id
    return PromptTemplate(
        prefix_ids=tuple(prefix),
        suffix_ids=tuple(suffix),
        start_of_response_id=quote_id,
        end_of_response_id=quote_id,
        pad_id=pad_id,
        mid_ids=mid,
    )


def pack_segments(
    statics: Sequence[Tuple[int, ...]],  # n+1 static id tuples
    variables: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],  # n of ([B, L], [B])
    pad_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scatter interleaved [s0 | v0 | s1 | v1 | ... | sn] rows, static shape.

    Returns (ids [B, total], valid [B, total], var_starts [B, n]) where
    var_starts[:, i] is the per-row offset of variable segment i.
    """
    assert len(statics) == len(variables) + 1
    b = variables[0][0].shape[0] if variables else 1
    total = sum(len(s) for s in statics) + sum(v.shape[1] for v, _ in variables)
    pos = jnp.arange(total)[None, :]  # [1, total]

    ids = jnp.full((b, total), pad_id, jnp.int32)
    valid = jnp.zeros((b, total), bool)
    offset = jnp.zeros((b, 1), jnp.int32)  # running per-row offset
    var_starts = []
    for i, static in enumerate(statics):
        if len(static):
            arr = jnp.asarray(static, jnp.int32)
            idx = jnp.clip(pos - offset, 0, len(static) - 1)
            seg = arr[idx]
            inside = (pos >= offset) & (pos < offset + len(static))
            ids = jnp.where(inside, seg, ids)
            valid = valid | inside
            offset = offset + len(static)
        if i < len(variables):
            v, vlen = variables[i]
            var_starts.append(offset[:, 0])
            if v.shape[1] > 0:
                idx = jnp.broadcast_to(
                    jnp.clip(pos - offset, 0, v.shape[1] - 1), (b, total)
                )
                seg = jnp.take_along_axis(v, idx.astype(jnp.int32), axis=1)
                inside = (pos >= offset) & (pos < offset + vlen[:, None])
                ids = jnp.where(inside, seg, ids)
                valid = valid | inside
            offset = offset + vlen[:, None]
    starts = (
        jnp.stack(var_starts, axis=1) if var_starts else jnp.zeros((b, 0), jnp.int32)
    )
    return ids, valid, starts.astype(jnp.int32)


def pack_prompt(
    template: PromptTemplate,
    hyp: jnp.ndarray,  # [B, H] first-pass hyp token ids (left-aligned)
    hyp_lengths: jnp.ndarray,  # [B]
    resp: jnp.ndarray,  # [B, L] response-so-far ids (ys_in incl. sos)
    resp_lengths: jnp.ndarray,  # [B]
    bias: Optional[jnp.ndarray] = None,  # [B, W] per-utterance biasing tokens
    bias_lengths: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pack [prefix | (bias | mid |) hyp | suffix | resp]; returns
    (ids, valid, resp_start)."""
    if template.has_bias_slot and bias is not None:
        statics = [template.prefix_ids, template.mid_ids, template.suffix_ids, ()]
        var_parts = [(bias, bias_lengths), (hyp, hyp_lengths), (resp, resp_lengths)]
    else:
        statics = [template.prefix_ids, template.suffix_ids, ()]
        var_parts = [(hyp, hyp_lengths), (resp, resp_lengths)]
    ids, valid, starts = pack_segments(statics, var_parts, template.pad_id)
    return ids, valid, starts[:, -1]


def expand_token_ids(
    map_ids: jnp.ndarray,  # [Vc, M] per-CTC-token LLM-id expansions
    map_lens: jnp.ndarray,  # [Vc]
    hyp: jnp.ndarray,  # [B, H] CTC-vocab ids (left-aligned)
    hyp_lengths: jnp.ndarray,  # [B]
    pad_id: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mixed-vocab bridge: expand CTC-vocab hyp ids to LLM-vocab ids on device.

    The reference detokenizes the BPE hyp to text and re-tokenizes with the
    LLM tokenizer on the host inside the training step
    (transformer_decoder.py:1002-1010,1029-1034); here the mapping
    CTC-token -> LLM-token-ids is precomputed once (build_ctc_to_llm_map) and
    applied as a gather + scatter, keeping the whole step on-chip. Per-token
    expansion equals full-string retokenization whenever BPE pieces
    retokenize independently (exact for word-boundary pieces; boundary merges
    across pieces are the documented approximation).

    Returns (ids [B, H*M], lengths [B]).
    """
    b, hmax = hyp.shape
    m = map_ids.shape[1]
    out_w = hmax * m
    tok_valid = jnp.arange(hmax)[None, :] < hyp_lengths[:, None]
    safe = jnp.clip(hyp, 0, map_ids.shape[0] - 1)
    exp = map_ids[safe]  # [B, H, M]
    lens = jnp.where(tok_valid, map_lens[safe], 0)  # [B, H]
    starts = jnp.cumsum(lens, axis=1) - lens
    pos = starts[:, :, None] + jnp.arange(m)[None, None, :]  # [B, H, M]
    ok = jnp.arange(m)[None, None, :] < lens[:, :, None]
    pos = jnp.where(ok, pos, out_w)  # out-of-range -> dropped by scatter
    out = jnp.full((b, out_w), pad_id, jnp.int32)
    bidx = jnp.broadcast_to(jnp.arange(b)[:, None, None], pos.shape)
    out = out.at[bidx, pos].set(exp.astype(jnp.int32), mode="drop")
    return out, jnp.sum(lens, axis=1).astype(jnp.int32)


def build_ctc_to_llm_map(ctc_token_list, tokenizer, max_expand: int = 8):
    """Precompute the CTC-token -> LLM-token-ids table (host side, once).

    Sentencepiece-style word markers are converted to spaces; special tokens
    (<blank>, <unk>, <sos/eos>, ...) expand to nothing.
    """
    vc = len(ctc_token_list)
    ids = np.zeros((vc, max_expand), np.int32)
    lens = np.zeros((vc,), np.int32)
    for i, tok in enumerate(ctc_token_list):
        if tok.startswith("<") and tok.endswith(">"):
            continue
        text = tok.replace("▁", " ").replace("Ġ", " ")
        e = tokenizer(text, add_special_tokens=False)["input_ids"][:max_expand]
        ids[i, : len(e)] = e
        lens[i] = len(e)
    return ids, lens


def gather_response(
    hidden: jnp.ndarray,  # [B, total, D]
    resp_start: jnp.ndarray,  # [B]
    l_max: int,
) -> jnp.ndarray:
    """Gather the response-position hidden states -> [B, l_max, D]."""
    b, total, d = hidden.shape
    idx = resp_start[:, None] + jnp.arange(l_max)[None, :]
    idx = jnp.clip(idx, 0, total - 1)
    return jnp.take_along_axis(hidden, idx[..., None], axis=1)
