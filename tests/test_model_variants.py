"""Config-driven transducer + maskctc through ASRTask/Speech2Text; decode_long."""

import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).parent))

BASE_ENC = {
    "output_size": 32, "attention_heads": 2, "linear_units": 64, "num_blocks": 1,
    "use_cnn_module": False, "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
}


def _train(tmp_path, extra_cfg):
    from test_e2e_tiny import TOKEN_LIST, make_corpus

    from llm_guided_asr_tpu.tasks.asr import ASRTask

    root = tmp_path / "c"
    make_corpus(root, n_train=8, n_valid=2)
    (root / "tokens.txt").write_text("\n".join(TOKEN_LIST) + "\n")
    exp = tmp_path / "exp"
    config = {
        "token_type": "char", "token_list": str(root / "tokens.txt"),
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "normalize": "utterance_mvn",
        "encoder": "conformer", "encoder_conf": BASE_ENC,
        "optim": "adam", "optim_conf": {"lr": 0.002}, "scheduler": "none",
        "batch_type": "sorted", "batch_size": 8, "max_epoch": 2,
        "keep_nbest_models": 1, "log_interval": 50,
        "speech_pad_multiple": 4000, "text_pad_multiple": 4,
        "train_data_path_and_name_and_type": [
            [str(root / "train" / "wav.scp"), "speech", "sound"],
            [str(root / "train" / "text"), "text", "text"]],
        "valid_data_path_and_name_and_type": [
            [str(root / "valid" / "wav.scp"), "speech", "sound"],
            [str(root / "valid" / "text"), "text", "text"]],
        "output_dir": str(exp),
    }
    config.update(extra_cfg)
    f = tmp_path / "t.yaml"
    f.write_text(yaml.safe_dump(config))
    ASRTask.main(["--config", str(f)])
    return root, exp


def _decode_one(root, exp, **kw):
    from llm_guided_asr_tpu.bin.asr_inference import Speech2Text
    from llm_guided_asr_tpu.data.fileio import SoundScpReader

    s2t = Speech2Text(exp / "config.yaml", exp / "valid.loss.best.msgpack",
                      speech_pad_multiple=4000, **kw)
    reader = SoundScpReader(root / "valid" / "wav.scp")
    uid = next(iter(reader.keys()))
    _, wav = reader[uid]
    return s2t, wav, s2t(wav)


def test_transducer_via_task_and_inference(tmp_path):
    root, exp = _train(tmp_path, {
        "model": "transducer",
        "decoder_conf": {"decoder_type": "stateless", "embed_size": 32,
                         "hidden_size": 32},
        "model_conf": {"joint_size": 32, "aux_ctc_weight": 0.1},
    })
    s2t, wav, results = _decode_one(root, exp)
    assert s2t.is_transducer
    text, tokens, ids, hyp = results[0]
    assert isinstance(text, str)
    assert all(0 < i < 6 for i in ids)


def test_maskctc_via_task_and_inference(tmp_path):
    root, exp = _train(tmp_path, {
        "model": "maskctc",
        "decoder_conf": {"attention_heads": 2, "linear_units": 64, "num_blocks": 1,
                         "dropout_rate": 0.0},
        "model_conf": {"ctc_weight": 0.5},
    })
    s2t, wav, results = _decode_one(root, exp)
    assert s2t.is_maskctc
    text, tokens, ids, hyp = results[0]
    assert all(i < 6 for i in ids)  # no <mask> leaks into output


def test_bf16_train_dtype(tmp_path):
    root, exp = _train(tmp_path, {
        "model_conf": {"ctc_weight": 0.5},
        "decoder_conf": {"attention_heads": 2, "linear_units": 64, "num_blocks": 1,
                         "dropout_rate": 0.0},
        "train_dtype": "bfloat16",
    })
    assert (exp / "valid.loss.best.msgpack").exists()


def test_report_cer_in_validation(tmp_path):
    import json

    root, exp = _train(tmp_path, {
        "model_conf": {"ctc_weight": 0.5},
        "decoder_conf": {"attention_heads": 2, "linear_units": 64, "num_blocks": 1,
                         "dropout_rate": 0.0},
        "report_cer": True,
    })
    rep = json.loads((exp / "reporter.json").read_text())
    valid = rep["stats"]["2"]["valid"]
    assert "cer_ctc" in valid and 0.0 <= valid["cer_ctc"] <= 300.0


def test_decode_long(tmp_path):
    root, exp = _train(tmp_path, {
        "model_conf": {"ctc_weight": 0.5},
        "decoder_conf": {"attention_heads": 2, "linear_units": 64, "num_blocks": 1,
                         "dropout_rate": 0.0},
    })
    from llm_guided_asr_tpu.bin.asr_inference import Speech2Text
    from llm_guided_asr_tpu.data.fileio import SoundScpReader

    s2t = Speech2Text(exp / "config.yaml", exp / "valid.loss.best.msgpack",
                      ctc_weight=1.0, beam_size=1, speech_pad_multiple=4000)
    reader = SoundScpReader(root / "valid" / "wav.scp")
    wavs = [reader[u][1] for u in list(reader.keys())[:2]]
    long_wav = np.concatenate(wavs * 2)
    out = s2t.decode_long(long_wav, window_s=1.0, hop_s=1.0, separator="")
    assert isinstance(out, str)


@pytest.mark.parametrize("dec", ["rnn", "s4", "lightconv", "dynamicconv"])
def test_alt_decoder_hybrid_model_and_beam(dec):
    """--decoder rnn/s4 (espnet RNNDecoder / S4Decoder): train + beam decode."""
    import jax
    import jax.numpy as jnp
    import optax

    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.tasks.asr import build_model

    model = build_model({
        "token_list": ["<blank>", "<unk>", "a", "b", "<sos/eos>"],
        "token_type": "char",
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
        "normalize": "utterance_mvn",
        "decoder": dec,
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "use_cnn_module": False},
        "decoder_conf": {"linear_units": 24, "num_blocks": 1},
        "model_conf": {"ctc_weight": 0.5},
    })
    rng = np.random.default_rng(0)
    speech = jnp.asarray(0.3 * rng.standard_normal((2, 3000)), jnp.float32)
    lens = jnp.asarray([3000, 2500])
    text = jnp.asarray([[2, 3, 2], [3, 2, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, lens, text, tlens, deterministic=True,
    )
    loss, stats, w = model.apply(variables, speech, lens, text, tlens,
                                 deterministic=True)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: model.apply({**variables, "params": p}, speech, lens,
                                       text, tlens, deterministic=True)[0])(
        variables["params"]
    )
    assert float(optax.global_norm(g)) > 0

    enc, enc_lens = model.apply(variables, speech[:1], lens[:1], method=model.encode)
    bs = BatchBeamSearch(
        model, variables, vocab_size=model.cfg.vocab_size,
        sos=model.cfg.sos_id, eos=model.cfg.eos_id, beam_size=2, ctc_weight=0.3,
    )
    hyps = bs(enc, enc_lens, maxlenratio=-5.0)
    assert hyps and all(np.isfinite(h.score) for h in hyps)


def test_s4d_kernel_matches_recurrence_and_causal():
    """The FFT-conv S4D path must equal the explicit linear recurrence
    x[t] = Abar x[t-1] + Bbar u[t], y = 2Re(C x) + D u — and be causal."""
    import jax
    import jax.numpy as jnp

    from llm_guided_asr_tpu.models.s4_decoder import S4DLayer, S4DecoderConfig

    cfg = S4DecoderConfig(vocab_size=10, d_model=8, d_state=8)
    layer = S4DLayer(cfg)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((2, 12, 8)), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), u)["params"]
    y = layer.apply({"params": params}, u)

    # recurrence reference (pre-gelu/out_proj): reproduce conv output
    p = params
    dt = np.exp(np.asarray(p["log_dt"]))[:, None]
    a = -np.exp(np.asarray(p["log_a_re"])) + 1j * np.asarray(p["a_im"])
    abar = np.exp(dt * a)
    bbar = (abar - 1.0) / a
    c = np.asarray(p["c"][..., 0]) + 1j * np.asarray(p["c"][..., 1])
    d = np.asarray(p["d"])
    un = np.asarray(u)
    conv = np.zeros((2, 12, 8), np.float32)
    for b in range(2):
        x = np.zeros_like(a)  # [H, N]
        for t in range(12):
            x = abar * x + bbar * un[b, t][:, None]
            conv[b, t] = 2.0 * np.real(np.sum(c * x, axis=-1)) + d * un[b, t]
    # push through the same gelu+proj
    from scipy.special import erf

    gelu = 0.5 * conv * (1.0 + erf(conv / np.sqrt(2.0)))
    w = np.asarray(p["out_proj"]["kernel"])
    bias = np.asarray(p["out_proj"]["bias"])
    want = gelu @ w + bias
    np.testing.assert_allclose(np.asarray(y), want, atol=5e-4, rtol=1e-3)

    # causality: perturbing u[t>=6] must not change y[:6]
    u2 = u.at[:, 6:].add(3.0)
    y2 = layer.apply({"params": params}, u2)
    np.testing.assert_allclose(np.asarray(y[:, :6]), np.asarray(y2[:, :6]), atol=1e-5)
    assert not np.allclose(np.asarray(y[:, 6:]), np.asarray(y2[:, 6:]))


def test_s4_nplr_kernel_matches_materialized_dplr():
    import jax
    import jax.numpy as jnp
    """The frequency-domain NPLR kernel (s4_nplr_kernel: Cauchy + Woodbury +
    iFFT, state_spaces/s4.py:797) must equal the kernel of the explicitly
    materialized bilinear-discretized DPLR system

        Abar = (2/dt I - A)^{-1} (2/dt I + A),  A = diag(Lambda) - P P^H
        Bbar = 2 (2/dt I - A)^{-1} B
        K_l  = Re( C Abar^l Bbar ),   C = conj(Ct) (I - Abar^L)^{-1}

    (the learned C-tilde absorbs (I - Abar^L), s4.py:630 _setup_C; the conj
    comes from the kernel's aterm = C.conj())."""
    import numpy as np

    from llm_guided_asr_tpu.models.s4_decoder import hippo_legs_dplr, s4_nplr_kernel

    N, L, H = 8, 24, 3
    Lambda, P, B = hippo_legs_dplr(N)
    rng = np.random.default_rng(0)
    Ct = (rng.standard_normal((H, N)) + 1j * rng.standard_normal((H, N))).astype(
        np.complex64
    )
    dt = np.asarray([0.05, 0.1, 0.02], np.float32)

    K = np.asarray(s4_nplr_kernel(
        jnp.asarray(Lambda), jnp.asarray(P), jnp.asarray(B), jnp.asarray(Ct),
        jnp.asarray(dt), L,
    ))

    A = np.diag(Lambda) - np.outer(P, P.conj())
    I = np.eye(N)
    for h in range(H):
        A0 = (2.0 / dt[h]) * I + A
        A1 = np.linalg.inv((2.0 / dt[h]) * I - A)
        Ab = A1 @ A0
        Bb = 2.0 * (A1 @ B)
        AbL = np.linalg.matrix_power(Ab, L)
        C = Ct[h].conj() @ np.linalg.inv(I - AbL)
        K_direct = []
        for l in range(L):
            K_direct.append((C @ np.linalg.matrix_power(Ab, l) @ Bb).real)
        np.testing.assert_allclose(K[h], np.asarray(K_direct), rtol=2e-3, atol=2e-4)


def test_s4_nplr_decoder_trains():
    """kernel='nplr' S4 decoder: forward + a few steps reduce the CE loss."""
    import jax
    import jax.numpy as jnp
    import optax

    from llm_guided_asr_tpu.models.s4_decoder import S4Decoder, S4DecoderConfig

    cfg = S4DecoderConfig(vocab_size=11, d_model=16, d_state=8, n_layers=1,
                          attention_heads=2, linear_units=24, kernel="nplr")
    dec = S4Decoder(cfg)
    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.standard_normal((2, 7, 16)), jnp.float32)
    enc_lens = jnp.asarray([7, 5])
    ys = jnp.asarray([[1, 2, 3, 4], [5, 6, 7, -1]], jnp.int32)
    ys_lens = jnp.asarray([4, 3])
    tgt = jnp.asarray([[2, 3, 4, 5], [6, 7, 8, -1]], jnp.int32)
    variables = dec.init(jax.random.PRNGKey(0), enc, enc_lens, ys, ys_lens)
    tx = optax.adam(5e-3)
    params, opt = variables["params"], None
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            logits = dec.apply({"params": p}, enc, enc_lens, ys, ys_lens)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            keep = tgt >= 0
            nll = -jnp.take_along_axis(logp, jnp.maximum(tgt, 0)[..., None], -1)[..., 0]
            return jnp.sum(jnp.where(keep, nll, 0.0)) / jnp.sum(keep)
        l, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    losses = []
    for _ in range(25):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert np.isfinite(losses[-1]) and losses[-1] < losses[0] * 0.7, losses[::6]
