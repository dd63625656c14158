"""TSD / NSC / multi-blank transducer searches + multi-blank loss
(VERDICT r2 item 6).

Golden fixtures in tests/parity/golden_transducer.npz come from the
reference BeamSearchTransducer (espnet2/asr/transducer/
beam_search_transducer.py) on a tiny random transducer head
(tests/parity/make_golden_transducer.py); tests ingest the exact torch
weights and assert this package's searches reproduce the reference's
hypotheses and scores.  The multi-blank loss is verified against a
brute-force lattice DP.
"""

import json
import math
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLD = Path(__file__).resolve().parent / "parity"


@pytest.fixture(scope="module")
def gold():
    npz = np.load(GOLD / "golden_transducer.npz")
    meta = json.loads((GOLD / "golden_transducer.json").read_text())
    sd = {k[3:]: npz[k] for k in npz.files if k.startswith("sd_")}
    return npz, meta, sd


@pytest.fixture(scope="module")
def built(gold):
    from llm_guided_asr_tpu.models.espnet_ingest import transducer_params
    from llm_guided_asr_tpu.models.transducer import (
        TransducerDecoderConfig,
        TransducerModel,
        TransducerModelConfig,
    )

    npz, meta, sd = gold
    cfg = TransducerModelConfig(
        vocab_size=meta["vocab"], frontend=None, normalize="none",
        decoder=TransducerDecoderConfig(
            decoder_type="rnn", embed_size=meta["hidden"],
            hidden_size=meta["hidden"], num_layers=1, dropout_rate=0.0,
        ),
        joint_size=meta["joint"],
    )
    model = TransducerModel(cfg)
    dec_sd = {k[len("dec."):]: v for k, v in sd.items() if k.startswith("dec.")}
    joint_sd = {k[len("joint."):]: v for k, v in sd.items() if k.startswith("joint.")}
    params = transducer_params(dec_sd, joint_sd, num_layers=1)
    return model, {"params": params}


def test_ingested_joint_matches_reference(built, gold):
    """Decoder+joint numerics: lattice logits agree with the torch modules."""
    import sys
    import torch

    sys.path.insert(0, "/root/reference")
    from espnet2.asr.decoder.transducer_decoder import TransducerDecoder
    from espnet2.asr_transducer.joint_network import JointNetwork

    npz, meta, sd = gold
    model, variables = built
    dec = TransducerDecoder(
        vocab_size=meta["vocab"], rnn_type="lstm", num_layers=1,
        hidden_size=meta["hidden"], dropout=0.0, dropout_embed=0.0,
    )
    joint = JointNetwork(
        output_size=meta["vocab"], encoder_size=meta["enc_dim"],
        decoder_size=meta["hidden"], joint_space_size=meta["joint"],
        joint_activation_type="tanh",
    )
    dec.load_state_dict({k[len("dec."):]: torch.from_numpy(v)
                         for k, v in sd.items() if k.startswith("dec.")})
    joint.load_state_dict({k[len("joint."):]: torch.from_numpy(v)
                           for k, v in sd.items() if k.startswith("joint.")})
    dec.eval(), joint.eval()

    labels = np.array([[3, 5, 2]], np.int64)
    with torch.no_grad():
        # reference embeds [blank] + labels (leading blank context)
        full = torch.from_numpy(np.concatenate([[0], labels[0]])[None])
        emb = dec.embed(full)
        out_ref, _ = dec.decoder[0](emb)
        j_ref = joint(
            torch.from_numpy(npz["enc_out"][:4])[:, None, :],
            out_ref[0][None, :, :],
        )
    out = model.apply(
        {"params": variables["params"]}, jnp.asarray(labels),
        method=model.decode_labels,
    )
    np.testing.assert_allclose(np.asarray(out)[0], out_ref[0].numpy(),
                               rtol=1e-5, atol=1e-5)
    j = model.apply(
        {"params": variables["params"]},
        jnp.asarray(npz["enc_out"][:4])[:, None, :],
        jnp.asarray(out[0])[None, :, :], method=model.joint_step,
    )
    np.testing.assert_allclose(np.asarray(j), j_ref.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", ["tsd", "tsd3"])
def test_tsd_matches_reference(built, gold, name):
    from llm_guided_asr_tpu.search.transducer_extra import transducer_tsd_decode

    npz, meta, _ = gold
    model, variables = built
    conf = meta["configs"][name]
    hyps = transducer_tsd_decode(
        model, variables, jnp.asarray(npz["enc_out"])[None],
        jnp.asarray([meta["t"]]), beam_size=meta["beam"],
        max_sym_exp=conf["max_sym_exp"], nbest=meta["beam"],
    )
    want = meta["results"][name][0]
    assert hyps[0].yseq == want["yseq"], (hyps[0], want)
    np.testing.assert_allclose(hyps[0].score, want["score"], rtol=1e-4, atol=1e-4)


def test_nsc_matches_reference(built, gold):
    from llm_guided_asr_tpu.search.transducer_extra import transducer_nsc_decode

    npz, meta, _ = gold
    model, variables = built
    conf = meta["configs"]["nsc"]
    hyps = transducer_nsc_decode(
        model, variables, jnp.asarray(npz["enc_out"])[None],
        jnp.asarray([meta["t"]]), beam_size=meta["beam"],
        nstep=conf["nstep"], prefix_alpha=conf["prefix_alpha"],
        nbest=meta["beam"],
    )
    want = meta["results"]["nsc"][0]
    assert hyps[0].yseq == want["yseq"], (hyps[0], want)
    np.testing.assert_allclose(hyps[0].score, want["score"], rtol=1e-4, atol=1e-4)


class _StubCfg:
    blank_id = 0


class _StubModel:
    """Deterministic model stub: frame t's behavior is scripted.

    vocab = [blank, 1, 2, 3, bigblank4(dur 2)].  Script per frame:
      f0: emit 1 then blank | f1: big blank (skip f2) | f2: emit 2 (MUST be
      skipped) | f3: emit 3 then blank.
    """

    cfg = _StubCfg()

    def apply(self, variables, *args, method=None):
        return method(*args)

    def decode_labels(self, tokens):
        b, u = tokens.shape
        # g[u] = number of labels consumed so far (the decode position)
        return jnp.broadcast_to(
            jnp.arange(u + 1, dtype=jnp.float32)[None, :, None], (b, u + 1, 1)
        )

    def joint_step(self, h, g):
        # h [K, 1] holds the frame index; g [K, 1] the per-frame... no — g is
        # the TOTAL label count; script via both
        t = h[:, 0]
        n = g[:, 0]
        big = 1e3
        logits = jnp.full((h.shape[0], 5), -big)
        # n is the TOTAL label count; thresholds are scripted per path:
        # big-blank run reaches f3 with n=1; the no-big run reaches f2 with
        # n=5 (f1 babbled '4' to the frame cap) and may emit one '2'
        want_blank = (
            ((t == 0) & (n >= 1))  # after emitting '1'
            | ((t == 2) & (n >= 6))
            | ((t == 3) & (n >= 2))
        )
        tok = jnp.where(
            t == 0, 1, jnp.where(t == 2, 2, jnp.where(t == 3, 3, 0))
        )
        is_bigblank = t == 1
        choose = jnp.where(
            is_bigblank, 4, jnp.where(want_blank, 0, tok)
        ).astype(jnp.int32)
        return logits.at[jnp.arange(h.shape[0]), choose].set(0.0)


def test_multiblank_greedy_skips_frames():
    """Reference MBG semantics (:926): a big blank ends the frame AND skips
    its duration; frames inside the skip window emit nothing."""
    from llm_guided_asr_tpu.search.transducer_extra import (
        transducer_multiblank_greedy,
    )

    model = _StubModel()
    enc = jnp.arange(4, dtype=jnp.float32)[None, :, None]  # enc[0, t, 0] = t
    enc_lens = jnp.asarray([4])
    hyps = transducer_multiblank_greedy(
        model, {}, enc, enc_lens, big_blank_ids=(4,), big_blank_durations=(2,)
    )
    # f0 emits 1; f1 big-blank skips f2 (which would emit 2); f3 emits 3
    assert hyps[0].yseq == [1, 3], hyps
    # without the big blank registered, token 4 is treated as a label: f1
    # babbles 4s to the frame cap and f2's 2 appears
    hyps2 = transducer_multiblank_greedy(model, {}, enc, enc_lens, (), ())
    assert 2 in hyps2[0].yseq and 4 in hyps2[0].yseq


def test_multiblank_loss_vs_bruteforce():
    """rnnt_loss_multi_blank == exhaustive lattice DP with big blanks+sigma;
    and degenerates to rnnt_loss when no big blanks and sigma=0."""
    from llm_guided_asr_tpu.ops.rnnt import rnnt_loss, rnnt_loss_multi_blank

    rng = np.random.default_rng(0)
    B, T, U, V = 2, 5, 3, 7
    logits = jnp.asarray(rng.standard_normal((B, T, U + 1, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, 5, (B, U)))
    tl = jnp.asarray([5, 4])
    ul = jnp.asarray([3, 2])

    a = float(rnnt_loss(logits, labels, tl, ul, 0))
    b = float(rnnt_loss_multi_blank(logits, labels, tl, ul, 0))
    np.testing.assert_allclose(a, b, rtol=1e-6)

    # sigma only: every path has exactly T+U transitions
    sig = 0.3
    c = float(rnnt_loss_multi_blank(logits, labels, tl, ul, 0, sigma=sig))
    want = a + sig * float(jnp.mean((tl + ul).astype(jnp.float32)))
    np.testing.assert_allclose(c, want, rtol=1e-5)

    def brute(lg, lab, T, U, blank, bigs, sigma):
        logp = np.asarray(jax.nn.log_softmax(lg, -1), np.float64)

        def ladd(x, y):
            if x is None:
                return y
            m = max(x, y)
            return m + math.log(math.exp(x - m) + math.exp(y - m))

        A = {(0, 0): 0.0}
        for t in range(T):
            for u in range(U + 1):
                if (t, u) not in A:
                    continue
                base = A[(t, u)]
                if u < U:
                    A[(t, u + 1)] = ladd(A.get((t, u + 1)),
                                         base + logp[t, u, lab[u]] - sigma)
                if t + 1 < T:
                    A[(t + 1, u)] = ladd(A.get((t + 1, u)),
                                         base + logp[t, u, blank] - sigma)
                for bid, dur in bigs:
                    if t + dur < T:
                        A[(t + dur, u)] = ladd(A.get((t + dur, u)),
                                               base + logp[t, u, bid] - sigma)
        ll = None
        ll = ladd(ll, A[(T - 1, U)] + logp[T - 1, U, blank] - sigma)
        for bid, dur in bigs:
            if T - dur >= 0 and (T - dur, U) in A:
                ll = ladd(ll, A[(T - dur, U)] + logp[T - dur, U, bid] - sigma)
        return ll

    bigs = [(6, 2), (5, 3)]
    lls = [
        brute(np.asarray(logits[i], np.float64), np.asarray(labels[i]),
              int(tl[i]), int(ul[i]), 0, bigs, 0.1)
        for i in range(B)
    ]
    got = float(rnnt_loss_multi_blank(
        logits, labels, tl, ul, 0, (6, 5), (2, 3), 0.1
    ))
    np.testing.assert_allclose(got, -np.mean(lls), rtol=1e-5)


def test_multiblank_model_trains(tmp_path):
    """A transducer model configured with big blanks trains (finite loss,
    gradient step) through the task builder."""
    import optax

    from llm_guided_asr_tpu.tasks.asr import build_model

    tokens = tmp_path / "tokens.txt"
    tokens.write_text("\n".join(
        ["<blank>"] + [chr(97 + i) for i in range(9)] + ["<bb2>", "<bb4>"]
    ) + "\n")
    config = {
        "model": "transducer",
        "token_type": "char",
        "token_list": str(tokens),
        "input_size": 8,
        "frontend": "none",
        "normalize": "utterance_mvn",
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": 16, "attention_heads": 2, "linear_units": 32,
            "num_blocks": 1, "macaron_style": False, "use_cnn_module": False,
        },
        "decoder_conf": {"decoder_type": "stateless", "embed_size": 16,
                         "hidden_size": 16},
        "model_conf": {
            "joint_size": 16,
            "transducer_multi_blank_durations": [2, 4],
            "transducer_multi_blank_sigma": 0.05,
        },
    }
    model = build_model(config)
    assert model.cfg.multi_blank_durations == (2, 4)
    # default ids: top of the vocab
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 20, 8)), jnp.float32)
    flens = jnp.asarray([20, 16])
    text = jnp.asarray([[1, 2, 3], [4, 5, -1]])
    tlens = jnp.asarray([3, 2])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats, flens, text, tlens, deterministic=True,
    )

    def loss_fn(p):
        loss, _, _ = model.apply({**variables, "params": p}, feats, flens,
                                 text, tlens, deterministic=True)
        return loss

    l0, g = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(l0))
    p2 = optax.apply_updates(
        variables["params"],
        optax.adam(1e-2).update(g, optax.adam(1e-2).init(variables["params"]))[0],
    )
    l1 = float(loss_fn(p2))
    assert np.isfinite(l1) and l1 < float(l0)
