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
    """Static token-id segments of the templated prompt."""

    prefix_ids: Tuple[int, ...]  # [bos] + template-before-((HYP))
    suffix_ids: Tuple[int, ...]  # template-after-((HYP))
    start_of_response_id: int  # sos for the guided decoder (llama.py:74-92)
    end_of_response_id: int
    pad_id: int

    @property
    def prefix_len(self) -> int:
        return len(self.prefix_ids)

    @property
    def suffix_len(self) -> int:
        return len(self.suffix_ids)


def split_template(
    tokenizer,
    template_prompt: Optional[str],
    bos_token_id: int,
    eos_token_id: int,
    pad_token: Optional[str] = None,
    hyp_marker: str = "((HYP))",
    max_marker_tokens: int = 8,
) -> PromptTemplate:
    """Tokenize the template and split at the ``((HYP))`` marker.

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
    found = None
    for i in range(len(tokens)):
        for w in range(1, max_marker_tokens + 1):
            joined = "".join(tokens[i : i + w])
            # tokenizers may decorate with word-boundary markers; strip common ones
            cleaned = joined.replace("▁", " ").replace("Ġ", " ").strip()
            if cleaned == hyp_marker:
                found = (i, w)
                break
        if found:
            break
    if found is None:
        raise ValueError(f"marker {hyp_marker!r} not found in template tokens: {tokens}")
    i, w = found
    prefix = [bos_token_id] + tokenizer.convert_tokens_to_ids(tokens[:i])
    suffix = tokenizer.convert_tokens_to_ids(tokens[i + w :])
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
    )


def pack_prompt(
    template: PromptTemplate,
    hyp: jnp.ndarray,  # [B, H] first-pass hyp token ids (left-aligned)
    hyp_lengths: jnp.ndarray,  # [B]
    resp: jnp.ndarray,  # [B, L] response-so-far ids (ys_in incl. sos)
    resp_lengths: jnp.ndarray,  # [B]
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Scatter [prefix | hyp | suffix | resp] into a static [B, P+H+S+L] row.

    Returns (ids, valid, resp_start) where resp_start[b] is the index of the
    first response token — response hidden states live at
    ids[b, resp_start[b] : resp_start[b] + resp_lengths[b]].
    """
    b, h_max = hyp.shape
    l_max = resp.shape[1]
    p, s = template.prefix_len, template.suffix_len
    total = p + h_max + s + l_max
    pos = jnp.arange(total)[None, :]  # [1, total]

    hyp_end = p + hyp_lengths[:, None]  # [B, 1]
    suf_end = hyp_end + s
    resp_end = suf_end + resp_lengths[:, None]

    prefix_arr = jnp.asarray(template.prefix_ids, jnp.int32) if p else jnp.zeros((0,), jnp.int32)
    suffix_arr = jnp.asarray(template.suffix_ids, jnp.int32) if s else jnp.zeros((0,), jnp.int32)

    # segment gathers with clipped indices (validity decided by range tests)
    idx_hyp = jnp.broadcast_to(jnp.clip(pos - p, 0, max(h_max - 1, 0)), (b, total))
    from_hyp = jnp.take_along_axis(hyp, idx_hyp.astype(jnp.int32), axis=1)
    idx_suf = jnp.clip(pos - hyp_end, 0, max(s - 1, 0))
    from_suf = suffix_arr[idx_suf] if s else jnp.zeros((b, total), jnp.int32)
    if l_max > 0:
        idx_resp = jnp.broadcast_to(jnp.clip(pos - suf_end, 0, l_max - 1), (b, total))
        from_resp = jnp.take_along_axis(resp, idx_resp.astype(jnp.int32), axis=1)
    else:
        from_resp = jnp.zeros((b, total), jnp.int32)
    from_pre = prefix_arr[jnp.clip(pos, 0, max(p - 1, 0))] if p else jnp.zeros((1, total), jnp.int32)

    in_pre = pos < p
    in_hyp = (pos >= p) & (pos < hyp_end)
    in_suf = (pos >= hyp_end) & (pos < suf_end)
    in_resp = (pos >= suf_end) & (pos < resp_end)

    ids = jnp.where(
        in_pre, jnp.broadcast_to(from_pre, (b, total)),
        jnp.where(in_hyp, from_hyp, jnp.where(in_suf, from_suf, jnp.where(in_resp, from_resp, template.pad_id))),
    ).astype(jnp.int32)
    valid = in_pre | in_hyp | in_suf | in_resp
    resp_start = (p + hyp_lengths + s).astype(jnp.int32)
    return ids, valid, resp_start


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
