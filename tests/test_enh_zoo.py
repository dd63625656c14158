"""Second half of the enh separator zoo (models/enh_zoo.py).

Completes one-for-one coverage of the reference separator registry
(espnet2/enh/separator/{dan,dpcl_e2e,svoice,fasnet,uses,tfgridnetv2,
tfgridnetv3,ineube,neural_beamformer}_separator.py): forward shapes + a
training gradient step per architecture, multichannel paths, the SVoice
multi-scale loss, DAN's oracle-vs-kmeans attractor modes, and the mfMCWF
least-squares beamformer invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from llm_guided_asr_tpu.models.enh import EnhConfig, ESPnetEnhancementModel

SR = 16000


def tone(freq, n, amp=0.4, phase=0.0):
    t = np.arange(n) / SR
    return (amp * np.sin(2 * np.pi * freq * t + phase)).astype(np.float32)


def _build(sep, **kw):
    cfg = EnhConfig(num_spk=2, n_fft=256, hop_length=128, separator_type=sep,
                    hidden=32, layers=2, **kw)
    return cfg, ESPnetEnhancementModel(cfg)


def _train_and_infer(model, mix, lens, s1, s2, n):
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
    ests, _ = model.apply({"params": params}, mix, lens, method=model.separate)
    assert ests.shape == (2, mix.shape[0], n)
    assert np.all(np.isfinite(np.asarray(ests)))
    return params


@pytest.mark.parametrize("sep,kw", [
    ("dan", {"emb_dim": 8}),
    ("dpcl_e2e", {"emb_dim": 8}),
    ("svoice", {"svoice_kernel": 8, "chunk_size": 16}),
    ("uses", {"uses_segment": 8, "memory_size": 2}),
    ("tfgridnetv2", {"tf_channels": 8, "emb_ks": 2, "emb_hs": 2}),
    ("tfgridnetv3", {"tf_channels": 8, "emb_ks": 2, "emb_hs": 2}),
])
def test_forward_and_grad_step(sep, kw):
    cfg, model = _build(sep, **kw)
    n = 2000
    s1 = jnp.asarray(tone(350, n))[None]
    s2 = jnp.asarray(tone(1500, n))[None]
    mix = s1 + s2
    lens = jnp.asarray([n])
    _train_and_infer(model, mix, lens, s1, s2, n)


@pytest.mark.parametrize("sep,kw", [
    ("fasnet", {"fasnet_win": 128, "fasnet_context": 32}),
    ("ineube", {"n_chunks": 1}),
    ("neural_beamformer", {}),
    ("uses", {"uses_segment": 8, "memory_size": 2}),
])
def test_multichannel_forward_and_grad(sep, kw):
    """Multichannel mixtures [B, N, C]: references stay single-channel."""
    cfg, model = _build(sep, **kw)
    n, c = 2000, 2
    s1 = tone(350, n)
    s2 = tone(1500, n)
    # mic 2 sees a small delay of each source (simulated spatial diversity)
    mix = np.stack([
        s1 + s2,
        np.roll(s1, 3) + np.roll(s2, 7),
    ], axis=-1)[None]  # [1, N, 2]
    mix = jnp.asarray(mix)
    lens = jnp.asarray([n])
    _train_and_infer(model, mix, lens, jnp.asarray(s1)[None],
                     jnp.asarray(s2)[None], n)


def test_svoice_multiscale_shapes():
    """all_scales=True returns one decoded waveform per block [L, S, B, N]."""
    from llm_guided_asr_tpu.models.enh_zoo import SVoiceSeparator

    cfg = EnhConfig(num_spk=2, separator_type="svoice", hidden=32, layers=3,
                    svoice_kernel=8, chunk_size=16)
    sep = SVoiceSeparator(cfg)
    n = 1600
    wave = jnp.asarray(np.random.default_rng(0).standard_normal((2, n)),
                       jnp.float32)
    v = sep.init(jax.random.PRNGKey(0), wave, True, all_scales=True)
    out = sep.apply(v, wave, True, all_scales=True)
    assert out.shape == (3, 2, 2, n)
    last = sep.apply(v, wave, True, all_scales=False)
    np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(last),
                               rtol=1e-5, atol=1e-6)


def test_dan_oracle_vs_kmeans_attractors():
    """Oracle (train) and k-means (inference) attractors both produce valid
    softmax masks that sum to one across sources."""
    from llm_guided_asr_tpu.models.enh_zoo import DANSeparator

    cfg = EnhConfig(num_spk=2, separator_type="dan", hidden=32, layers=2,
                    emb_dim=8)
    sep = DANSeparator(cfg)
    b, t, f = 2, 12, 17
    rng = np.random.default_rng(1)
    mag = jnp.asarray(np.abs(rng.standard_normal((b, t, f))), jnp.float32)
    refs = jnp.asarray(np.abs(rng.standard_normal((2, b, t, f))), jnp.float32)
    v = sep.init(jax.random.PRNGKey(0), mag, refs, True)
    m_oracle = sep.apply(v, mag, refs, True)
    m_kmeans = sep.apply(v, mag, None, True)
    for m in (m_oracle, m_kmeans):
        assert m.shape == (2, b, t, f)
        np.testing.assert_allclose(np.asarray(m.sum(0)), 1.0, atol=1e-5)


def test_soft_kmeans_separates_clusters():
    """Two well-separated blobs -> gamma assigns each blob to one cluster."""
    from llm_guided_asr_tpu.models.enh_zoo import soft_kmeans

    rng = np.random.default_rng(2)
    a = rng.standard_normal((40, 4)) * 0.05 + np.array([3.0, 0, 0, 0])
    b = rng.standard_normal((40, 4)) * 0.05 + np.array([-3.0, 0, 0, 0])
    v = jnp.asarray(np.concatenate([a, b])[None], jnp.float32)
    gamma, centers = soft_kmeans(v, 2, alpha=5.0, iterations=6)
    hard = np.asarray(jnp.argmax(gamma[0], axis=-1))
    # each blob maps to a single (distinct) cluster
    assert len(set(hard[:40])) == 1 and len(set(hard[40:])) == 1
    assert hard[0] != hard[40]


def test_mfmcwf_recovers_filterable_target():
    """When the target is an exact per-frequency linear combination of the
    mic signals, the least-squares multi-frame Wiener filter recovers it."""
    from llm_guided_asr_tpu.models.enh_zoo import mfmcwf

    rng = np.random.default_rng(3)
    b, t, f, c = 1, 30, 9, 2
    mix = (rng.standard_normal((b, t, f, c))
           + 1j * rng.standard_normal((b, t, f, c))).astype(np.complex64)
    w_true = (rng.standard_normal((f, c))
              + 1j * rng.standard_normal((f, c))).astype(np.complex64)
    target = np.einsum("btfc,fc->btf", mix, w_true)
    out = mfmcwf(jnp.asarray(mix), jnp.asarray(target), n_chunks=1,
                 tik_eps=1e-10)
    err = np.abs(np.asarray(out) - target).mean() / np.abs(target).mean()
    assert err < 1e-3


def test_ineube_output_stages():
    """output_from selects dnn1 / mfmcwf / dnn2 and all stages emit [S,B,T,F]."""
    from llm_guided_asr_tpu.models.enh_zoo import INeuBeSeparator

    rng = np.random.default_rng(4)
    b, t, f, c = 1, 10, 9, 2
    spec = jnp.asarray(rng.standard_normal((b, t, f, c))
                       + 1j * rng.standard_normal((b, t, f, c)))
    for stage in ("dnn1", "mfmcwf", "dnn2"):
        cfg = EnhConfig(num_spk=2, separator_type="ineube", hidden=8,
                        layers=1, n_chunks=1, output_from=stage)
        sep = INeuBeSeparator(cfg)
        v = sep.init(jax.random.PRNGKey(0), spec, True)
        out = sep.apply(v, spec, True)
        assert out.shape == (2, b, t, f)
        assert np.all(np.isfinite(np.asarray(out.real)))


def test_registry_covers_reference_zoo():
    """The separator registry now lists 20 choices (reference one-for-one)."""
    import llm_guided_asr_tpu.models.enh as enh_mod
    import inspect

    src = inspect.getsource(enh_mod.ESPnetEnhancementModel.setup)
    names = [ln.split('"')[1] for ln in src.splitlines() if '": ' in ln]
    assert len(names) >= 20
    for required in ("dan", "dpcl_e2e", "svoice", "fasnet", "uses",
                     "tfgridnetv2", "tfgridnetv3", "ineube",
                     "neural_beamformer"):
        assert required in names
