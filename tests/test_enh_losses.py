"""Enh loss criterions + solver wrappers (models/enh_losses.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from llm_guided_asr_tpu.models.enh import pit_si_snr_loss
from llm_guided_asr_tpu.models.enh_losses import (
    CRITERIONS,
    abs_coherence_loss,
    build_criterion,
    build_wrapper,
    ci_sdr_loss,
    fixed_order_loss,
    mixit_loss,
    pit_loss,
    si_snr_loss,
    snr_loss,
)

SR = 16000


def tone(freq, n, amp=0.4, phase=0.0):
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * freq * t + phase)).astype(np.float32)


def _sigs(n=4000):
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))
    lens = jnp.asarray([n, n // 2])
    return ref, noise, lens


@pytest.mark.parametrize("name", sorted(CRITERIONS))
def test_criterion_prefers_exact_reconstruction(name):
    ref, noise, lens = _sigs()
    crit = build_criterion(name)
    good = np.asarray(crit(ref, ref, lens))
    bad = np.asarray(crit(ref, ref + 0.5 * noise, lens))
    assert good.shape == (2,)
    assert np.all(np.isfinite(good)) and np.all(np.isfinite(bad))
    assert np.all(good < bad), f"{name}: {good} !< {bad}"


def test_ci_sdr_invariant_to_short_filter_but_snr_is_not():
    ref, _, _ = _sigs()
    lens = jnp.asarray([4000, 4000])
    # est = ref passed through a short FIR (delay + echo)
    h = np.zeros(16, np.float32)
    h[3], h[9] = 0.9, -0.35
    est = jnp.asarray(
        np.stack([np.convolve(np.asarray(r), h)[:4000] for r in ref])
    )
    ci = np.asarray(ci_sdr_loss(ref, est, lens, filter_length=32))
    plain = np.asarray(snr_loss(ref, est, lens))
    assert np.all(ci < -30), ci  # filter-invariant: near-perfect SDR
    assert np.all(plain > -5), plain  # plain SNR sees the distortion


def test_si_snr_scale_invariance_vs_snr():
    ref, _, _ = _sigs()
    lens = jnp.asarray([4000, 4000])
    scaled = 3.7 * ref
    si = np.asarray(si_snr_loss(ref, scaled, lens))
    sn = np.asarray(snr_loss(ref, scaled, lens))
    assert np.all(si < -60)  # scale-invariant: perfect
    assert np.all(sn > -15)  # plain SNR penalizes the gain


def test_pit_matches_legacy_si_snr_pit():
    rng = np.random.default_rng(1)
    refs = jnp.asarray(rng.standard_normal((3, 2, 2000)).astype(np.float32))
    ests = refs[jnp.asarray([2, 0, 1])] + 0.01 * jnp.asarray(
        rng.standard_normal((3, 2, 2000)).astype(np.float32))
    lens = jnp.asarray([2000, 1500])
    legacy_loss, legacy_perm = pit_si_snr_loss(refs, ests, lens)
    loss, perm = pit_loss(refs, ests, lens, si_snr_loss)
    assert float(loss) == pytest.approx(float(legacy_loss), abs=1e-4)
    assert np.array_equal(np.asarray(perm), np.asarray(legacy_perm))
    # and it found the planted permutation ref[i] <- est at position
    assert list(np.asarray(perm)[0]) == [1, 2, 0]


def test_fixed_order_identity():
    refs, noise, lens = _sigs()
    refs = refs[None].repeat(2, 0)  # [2, B, N]
    swapped = refs[jnp.asarray([1, 0])] * 0 + refs  # identity here
    loss, perm = fixed_order_loss(refs, refs, lens, si_snr_loss)
    assert float(loss) < -60
    assert np.array_equal(np.asarray(perm), np.tile([0, 1], (2, 1)))


def test_mixit_recovers_grouping():
    # 4 sources, 2 reference mixtures = {s0+s2}, {s1+s3}
    n = 3000
    srcs = jnp.asarray(np.stack([
        tone(300, n), tone(700, n), tone(1100, n), tone(1900, n)
    ]))[:, None, :]  # [4, 1, N]
    refs = jnp.stack([srcs[0, 0] + srcs[2, 0], srcs[1, 0] + srcs[3, 0]])[:, None]
    lens = jnp.asarray([n])
    loss, asm = mixit_loss(refs, srcs, lens, snr_loss)
    assert float(loss) < -50  # exact regrouping exists
    assert list(np.asarray(asm)[0]) == [0, 1, 0, 1]


def test_enh_model_trains_with_alternative_losses():
    import jax
    import optax

    from llm_guided_asr_tpu.models.enh import EnhConfig, ESPnetEnhancementModel

    for loss_type, wrapper in [("snr", "pit"), ("multi_res_l1_spec", "fixed_order")]:
        cfg = EnhConfig(num_spk=2, n_fft=256, hop_length=128,
                        separator_type="rnn", hidden=16, layers=1,
                        loss_type=loss_type, loss_wrapper=wrapper)
        model = ESPnetEnhancementModel(cfg)
        n = 2000
        s1 = jnp.asarray(tone(350, n))[None]
        s2 = jnp.asarray(tone(1500, n))[None]
        mix = s1 + s2
        lens = jnp.asarray([n])
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            mix, lens, s1, s2, deterministic=True,
        )
        params = variables["params"]
        (loss, _), g = jax.value_and_grad(
            lambda p: model.apply({"params": p}, mix, lens, s1, s2,
                                  deterministic=True)[:2],
            has_aux=True,
        )(params)
        assert np.isfinite(float(loss)), (loss_type, wrapper)
        assert all(np.all(np.isfinite(np.asarray(x)))
                   for x in jax.tree_util.tree_leaves(g)), (loss_type, wrapper)


def test_unknown_names_raise():
    with pytest.raises(ValueError):
        build_criterion("bogus")
    with pytest.raises(ValueError):
        build_wrapper("bogus")
