"""Length-mask utilities (jnp analogs of espnet nets_utils.make_pad_mask etc.).

Reference behavior: espnet/nets/pytorch_backend/nets_utils.py (make_pad_mask),
espnet/nets/pytorch_backend/transformer/mask.py (subsequent_mask).  All masks
here follow the *valid* convention (True = keep) which composes more naturally
with ``jnp.where`` than the reference's pad-is-True convention.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_valid_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """[B] lengths -> [B, maxlen] bool, True where position < length."""
    pos = jnp.arange(maxlen, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def make_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """[B] lengths -> [B, maxlen] bool, True at padded positions (reference convention)."""
    return ~make_valid_mask(lengths, maxlen)


def subsequent_mask(size: int, dtype=jnp.bool_) -> jnp.ndarray:
    """[size, size] lower-triangular causal mask (True = attend)."""
    return jnp.tril(jnp.ones((size, size), dtype=dtype))


def causal_attn_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """[B] -> [B, maxlen, maxlen] combined causal+padding attention mask."""
    valid = make_valid_mask(lengths, maxlen)  # [B, L]
    return valid[:, None, :] & subsequent_mask(maxlen)[None, :, :]


def mask_fill(x: jnp.ndarray, valid: jnp.ndarray, fill_value=0.0) -> jnp.ndarray:
    """Zero (or fill) positions where ``valid`` is False; valid broadcast over x."""
    while valid.ndim < x.ndim:
        valid = valid[..., None]
    return jnp.where(valid, x, jnp.asarray(fill_value, dtype=x.dtype))
