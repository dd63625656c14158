"""Extra separation architectures (models/enh_extra.py).

Mirrors the reference enh separator zoo breadth
(espnet2/enh/separator/{transformer,dptnet,bsrnn,dccrn,dpcl}_separator.py):
forward shapes + a training step for every architecture, plus
deep-clustering loss/k-means invariants and tone-separation overfits for the
cheap paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llm_guided_asr_tpu.models.enh import EnhConfig, ESPnetEnhancementModel
from llm_guided_asr_tpu.models.enh_extra import dpcl_loss, kmeans_masks

SR = 16000


def tone(freq, n, amp=0.4):
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _build(sep, **kw):
    cfg = EnhConfig(num_spk=2, n_fft=256, hop_length=128, separator_type=sep,
                    hidden=32, layers=2, **kw)
    return cfg, ESPnetEnhancementModel(cfg)


@pytest.mark.parametrize("sep", ["transformer", "dptnet", "bsrnn", "dccrn", "dpcl"])
def test_forward_and_grad_step(sep):
    cfg, model = _build(sep, num_bands=4)
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
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
    # inference path: separate() emits per-source waveforms of the mix length
    ests, _ = model.apply({"params": params}, mix, lens, method=model.separate)
    assert ests.shape == (2, 1, n)
    assert np.all(np.isfinite(np.asarray(ests)))


@pytest.mark.slow
@pytest.mark.parametrize("sep", ["transformer", "bsrnn"])
def test_enh_extra_overfits_two_tone_separation(sep):
    cfg, model = _build(sep, num_bands=4)
    n = 4000
    s1 = jnp.asarray(tone(350, n))[None]
    s2 = jnp.asarray(tone(1500, n))[None]
    mix = s1 + s2
    lens = jnp.asarray([n])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        mix, lens, s1, s2, deterministic=True,
    )
    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, _), g = jax.value_and_grad(
            lambda p: model.apply({"params": p}, mix, lens, s1, s2,
                                  deterministic=True)[:2],
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(150):
        params, opt, loss = step(params, opt)
    si = -float(loss)
    assert si > 10.0, f"{sep}: separation SI-SNR too low: {si}"


def test_dpcl_loss_zero_on_oracle_embeddings():
    # V = Y (one-hot dominant-source rows) => ||VV^T - YY^T||^2 == 0
    b, t, f, s = 1, 6, 8, 2
    rng = np.random.default_rng(0)
    refs = jnp.asarray(rng.random((s, b, t, f)).astype(np.float32))
    dom = jnp.argmax(refs, axis=0)  # [B, T, F]
    emb = jax.nn.one_hot(dom, s)  # [B, T, F, S] == unit-norm rows
    mix = jnp.max(refs, axis=0)
    loss0 = float(dpcl_loss(emb, refs, mix))
    assert loss0 == pytest.approx(0.0, abs=1e-8)
    # a wrong (uniform) embedding scores strictly worse
    emb_bad = jnp.ones((b, t, f, s)) / np.sqrt(s)
    assert float(dpcl_loss(emb_bad, refs, mix)) > loss0 + 1e-3


def test_kmeans_masks_recovers_separated_clusters():
    # two well-separated clusters along the frequency axis -> binary masks
    b, t, f, d = 1, 5, 8, 3
    lo = np.tile(np.array([1.0, 0.0, 0.0], np.float32), (b, t, f // 2, 1))
    hi = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (b, t, f - f // 2, 1))
    emb = jnp.asarray(np.concatenate([lo, hi], axis=2))
    masks = kmeans_masks(emb, num_spk=2, iters=5)
    assert masks.shape == (2, b, t, f)
    m = np.asarray(masks)
    # each bin assigned to exactly one source; each half uniform
    assert np.allclose(m.sum(0), 1.0)
    for half in (m[:, 0, :, : f // 2], m[:, 0, :, f // 2:]):
        assert (half.std(axis=(1, 2)) < 1e-6).all()
    # the two halves got different labels
    assert m[0, 0, 0, 0] != m[0, 0, 0, -1]


@pytest.mark.slow
def test_dpcl_overfit_then_kmeans_separates():
    cfg, model = _build("dpcl", emb_dim=8)
    n = 4000
    s1 = jnp.asarray(tone(350, n))[None]
    s2 = jnp.asarray(tone(1500, n))[None]
    mix = s1 + s2
    lens = jnp.asarray([n])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        mix, lens, s1, s2, deterministic=True,
    )
    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, _), g = jax.value_and_grad(
            lambda p: model.apply({"params": p}, mix, lens, s1, s2,
                                  deterministic=True)[:2],
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    _, _, loss0 = step(params, opt)
    for _ in range(120):
        params, opt, loss = step(params, opt)
    assert float(loss) < 0.5 * float(loss0)
    # k-means over the learned embeddings separates the tones
    ests, _ = model.apply({"params": params}, mix, lens, method=model.separate)
    from llm_guided_asr_tpu.models.enh import pit_si_snr_loss

    refs = jnp.concatenate([s1[None], s2[None]], axis=0)
    pit, _ = pit_si_snr_loss(refs, ests, lens)
    assert -float(pit) > 5.0, f"dpcl k-means separation too weak: {-float(pit)}"
