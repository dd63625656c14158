"""Enhancement loss criterions + solver wrappers.

Rebuilds the reference's two-level loss abstraction
(espnet2/enh/loss/criterions/{time_domain,tf_domain}.py and
espnet2/enh/loss/wrappers/{pit_solver,fixed_order,mixit_solver}.py) as pure
JAX functions:

- a *criterion* maps ``(ref [B,N], est [B,N], lengths [B]) -> per-utt loss
  [B]`` (lower is better); frequency-domain criterions STFT internally.
- a *wrapper* (solver) maps stacked multi-source tensors
  ``(refs [S,B,N], ests [E,B,N], lengths)`` to a scalar loss:
  permutation-invariant (PIT), fixed-order, or mixture-invariant (MixIT)
  assignment of estimates to references.

All assignment enumeration happens at trace time (S, E are static and
small); the per-assignment criterion evaluations batch onto the device with
no host round trips.
"""

from __future__ import annotations

import itertools
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.utils.masks import make_valid_mask

EPS = 1e-8


# ---------------------------------------------------------------- criterions


def _masked(ref, est, lengths):
    valid = make_valid_mask(lengths, ref.shape[1]).astype(ref.dtype)
    return ref * valid, est * valid, valid


def si_snr_loss(ref, est, lengths):
    """Negative scale-invariant SNR (time_domain.py SISNRLoss)."""
    from llm_guided_asr_tpu.models.enh import si_snr

    return -si_snr(ref, est, lengths)


def snr_loss(ref, est, lengths):
    """Plain SNR loss (time_domain.py SNRLoss): -20 log10 ||ref||/||est-ref||."""
    ref, est, _ = _masked(ref, est, lengths)
    noise = est - ref
    snr = 20.0 * (
        jnp.log10(jnp.maximum(jnp.linalg.norm(ref, axis=1), EPS))
        - jnp.log10(jnp.maximum(jnp.linalg.norm(noise, axis=1), EPS))
    )
    return -snr


def ci_sdr_loss(ref, est, lengths, filter_length: int = 128):
    """Convolutive-transfer-function-invariant SDR (time_domain.py CISDRLoss,
    Boeddeker et al. 2021): the reference may pass through any length-L FIR
    filter before comparison.

    Solves the normal equations ``R h = r`` per utterance (R = Toeplitz
    autocorrelation of ref, r = ref/est cross-correlation), both computed via
    one FFT; the projected target is ``conv(ref, h)``.
    """
    ref, est, _ = _masked(ref, est, lengths)
    n = ref.shape[1]
    L = filter_length
    nfft = 1
    while nfft < n + L:
        nfft *= 2
    rf = jnp.fft.rfft(ref, nfft, axis=1)
    ef = jnp.fft.rfft(est, nfft, axis=1)
    # autocorrelation lags 0..L-1 and cross-correlation lags 0..L-1
    acorr = jnp.fft.irfft(rf * jnp.conj(rf), nfft, axis=1)[:, :L]  # [B, L]
    xcorr = jnp.fft.irfft(ef * jnp.conj(rf), nfft, axis=1)[:, :L]  # [B, L]
    idx = jnp.abs(jnp.arange(L)[:, None] - jnp.arange(L)[None, :])
    R = acorr[:, idx]  # [B, L, L] symmetric Toeplitz
    R = R + (1e-4 * acorr[:, :1, None] + EPS) * jnp.eye(L)  # diagonal loading
    h = jnp.linalg.solve(R.astype(jnp.float32), xcorr.astype(jnp.float32)[..., None])
    # filtered reference: conv(ref, h) truncated to n samples
    hf = jnp.fft.rfft(h[..., 0].astype(ref.dtype), nfft, axis=1)
    target = jnp.fft.irfft(rf * hf, nfft, axis=1)[:, :n]
    noise = est - target
    ratio = (jnp.sum(target**2, axis=1) + EPS) / (jnp.sum(noise**2, axis=1) + EPS)
    return -10.0 * jnp.log10(ratio)


def mse_time_loss(ref, est, lengths):
    ref, est, valid = _masked(ref, est, lengths)
    n = jnp.maximum(jnp.sum(valid, axis=1), 1.0)
    return jnp.sum((ref - est) ** 2, axis=1) / n


def l1_time_loss(ref, est, lengths):
    ref, est, valid = _masked(ref, est, lengths)
    n = jnp.maximum(jnp.sum(valid, axis=1), 1.0)
    return jnp.sum(jnp.abs(ref - est), axis=1) / n


def _spec(x, n_fft, hop):
    from llm_guided_asr_tpu.ops.frontend import stft

    return stft(x, n_fft=n_fft, hop_length=hop)


def mse_spec_loss(ref, est, lengths, n_fft: int = 512, hop: int = 128):
    """Complex-spectrum MSE (tf_domain.py FrequencyDomainMSE on spectrum)."""
    ref, est, _ = _masked(ref, est, lengths)
    d = _spec(ref, n_fft, hop) - _spec(est, n_fft, hop)
    return jnp.mean(jnp.real(d) ** 2 + jnp.imag(d) ** 2, axis=(1, 2))


def l1_spec_loss(ref, est, lengths, n_fft: int = 512, hop: int = 128):
    """L1 on (Re, Im, |.|) like tf_domain.py FrequencyDomainL1."""
    ref, est, _ = _masked(ref, est, lengths)
    rs, es = _spec(ref, n_fft, hop), _spec(est, n_fft, hop)
    return jnp.mean(
        jnp.abs(jnp.real(rs) - jnp.real(es))
        + jnp.abs(jnp.imag(rs) - jnp.imag(es))
        + jnp.abs(jnp.abs(rs) - jnp.abs(es)),
        axis=(1, 2),
    )


def abs_coherence_loss(ref, est, lengths, n_fft: int = 512, hop: int = 128):
    """1 - |time coherence| per frequency, averaged
    (tf_domain.py FrequencyDomainAbsCoherence)."""
    ref, est, _ = _masked(ref, est, lengths)
    rs, es = _spec(ref, n_fft, hop), _spec(est, n_fft, hop)
    num = jnp.abs(jnp.sum(rs * jnp.conj(es), axis=1))  # [B, F]
    den = jnp.sqrt(jnp.sum(jnp.abs(rs) ** 2, axis=1)
                   * jnp.sum(jnp.abs(es) ** 2, axis=1)) + EPS
    return 1.0 - jnp.mean(num / den, axis=1)


def multi_res_l1_spec_loss(ref, est, lengths,
                           fft_sizes=(512, 256, 128)):
    """Multi-resolution L1 on STFT magnitudes
    (time_domain.py MultiResL1SpecLoss)."""
    ref, est, _ = _masked(ref, est, lengths)
    tot = 0.0
    for n_fft in fft_sizes:
        rs = jnp.abs(_spec(ref, n_fft, n_fft // 4))
        es = jnp.abs(_spec(est, n_fft, n_fft // 4))
        tot = tot + jnp.mean(jnp.abs(rs - es), axis=(1, 2))
    return tot / len(fft_sizes)


CRITERIONS: dict = {
    "si_snr": si_snr_loss,
    "snr": snr_loss,
    "ci_sdr": ci_sdr_loss,
    "mse_time": mse_time_loss,
    "l1_time": l1_time_loss,
    "mse_spec": mse_spec_loss,
    "l1_spec": l1_spec_loss,
    "abs_coherence": abs_coherence_loss,
    "multi_res_l1_spec": multi_res_l1_spec_loss,
}


# ------------------------------------------------------------------ wrappers


def pit_loss(refs: jnp.ndarray, ests: jnp.ndarray, lengths: jnp.ndarray,
             criterion: Callable) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Permutation-invariant training (wrappers/pit_solver.py): the
    assignment of estimates to references minimizing the mean criterion,
    chosen per utterance.  Returns (scalar loss, perm [B, S])."""
    s = refs.shape[0]
    # pairwise criterion matrix [S_ref, S_est, B]
    pair = jnp.stack(
        [jnp.stack([criterion(refs[i], ests[j], lengths) for j in range(s)])
         for i in range(s)]
    )
    perms = list(itertools.permutations(range(s)))
    losses = jnp.stack(
        [jnp.mean(jnp.stack([pair[i, p[i]] for i in range(s)]), axis=0)
         for p in perms]
    )  # [P, B]
    best = jnp.argmin(losses, axis=0)
    perm_arr = jnp.asarray(perms)[best]  # [B, S]
    return jnp.mean(jnp.min(losses, axis=0)), perm_arr


def fixed_order_loss(refs, ests, lengths, criterion):
    """wrappers/fixed_order.py: mean criterion under the identity assignment."""
    s = refs.shape[0]
    loss = jnp.mean(
        jnp.stack([criterion(refs[i], ests[i], lengths) for i in range(s)])
    )
    perm = jnp.tile(jnp.arange(s)[None], (refs.shape[1], 1))
    return loss, perm


def mixit_loss(refs: jnp.ndarray, ests: jnp.ndarray, lengths: jnp.ndarray,
               criterion: Callable) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mixture-invariant training (wrappers/mixit_solver.py, Wisdom et al.
    2020): each of E estimates is assigned to one of R reference *mixtures*;
    the criterion compares each reference mixture to the sum of its assigned
    estimates, minimized over all R^E binary assignment matrices.

    refs: [R, B, N] reference mixtures; ests: [E, B, N] estimated sources.
    Returns (scalar loss, best assignment [B, E] of estimate -> ref index).
    """
    r, e = refs.shape[0], ests.shape[0]
    assignments = list(itertools.product(range(r), repeat=e))
    losses = []
    for asm in assignments:
        a = jax.nn.one_hot(jnp.asarray(asm), r, dtype=ests.dtype)  # [E, R]
        mixes = jnp.einsum("er,ebn->rbn", a, ests)  # [R, B, N]
        losses.append(jnp.mean(
            jnp.stack([criterion(refs[i], mixes[i], lengths) for i in range(r)]),
            axis=0,
        ))
    losses = jnp.stack(losses)  # [A, B]
    best = jnp.argmin(losses, axis=0)
    asm_arr = jnp.asarray(assignments)[best]  # [B, E]
    return jnp.mean(jnp.min(losses, axis=0)), asm_arr


WRAPPERS: dict = {
    "pit": pit_loss,
    "fixed_order": fixed_order_loss,
    "mixit": mixit_loss,
}


def build_criterion(name: str, **kw) -> Callable:
    if name not in CRITERIONS:
        raise ValueError(f"unknown enh criterion '{name}' (have {sorted(CRITERIONS)})")
    fn = CRITERIONS[name]
    return partial(fn, **kw) if kw else fn


def build_wrapper(name: str) -> Callable:
    if name not in WRAPPERS:
        raise ValueError(f"unknown enh loss wrapper '{name}' (have {sorted(WRAPPERS)})")
    return WRAPPERS[name]
