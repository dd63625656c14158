"""Trained-checkpoint WER parity vs the reference (VERDICT r2 item 2b).

tests/parity/golden_trained.npz holds a checkpoint TRAINED (to overfit) by
the reference stack on the deterministic tone corpus, plus the reference's
own beam-10 ctc0.3 decodes and corpus CER
(tests/parity/make_golden_trained.py).  This test regenerates the identical
corpus, ingests the trained torch weights, decodes every utterance with this
package's search, and asserts: identical hypothesis token sequences,
matching beam scores, and an identical error rate — the driver's
"WER delta <= 0.1 vs reference" target shown as delta = 0 on the shared
corpus, from a real trained checkpoint rather than random weights.
"""

import pytest

pytestmark = pytest.mark.slow

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

GOLD = Path(__file__).resolve().parent / "parity"


@pytest.fixture(scope="module")
def gold():
    npz = np.load(GOLD / "golden_trained.npz")
    meta = json.loads((GOLD / "golden_trained.json").read_text())
    sd = {k[3:]: npz[k] for k in npz.files if k.startswith("sd_")}
    return meta, sd


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from test_e2e_tiny import make_corpus

    from llm_guided_asr_tpu.data.fileio import read_2columns_text, read_audio

    root = tmp_path_factory.mktemp("tone_corpus_parity")
    make_corpus(root, n_train=24, n_valid=6, seed=0)
    data = {}
    for split in ("train", "valid"):
        wavs = read_2columns_text(root / split / "wav.scp")
        texts = read_2columns_text(root / split / "text")
        for uid, p in wavs.items():
            _, wav = read_audio(p)
            data[uid] = (np.asarray(wav, np.float32), texts[uid])
    return data


@pytest.fixture(scope="module")
def built(gold):
    from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
    from llm_guided_asr_tpu.models.conformer import ConformerConfig
    from llm_guided_asr_tpu.models.espnet_ingest import (
        conformer_encoder_params,
        ctc_head_params,
        transformer_decoder_params,
    )
    from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig

    meta, sd = gold
    cfg = ASRModelConfig(
        vocab_size=meta["vocab"],
        frontend=FrontendConfig(
            n_fft=meta["n_fft"], hop_length=meta["hop"], n_mels=meta["n_mels"]
        ),
        normalize="utterance_mvn",
        encoder=ConformerConfig(
            output_size=meta["odim"], attention_heads=meta["heads"],
            linear_units=meta["units"], num_blocks=meta["blocks"],
            dropout_rate=0.0, positional_dropout_rate=0.0,
            attention_dropout_rate=0.0, macaron_style=True,
            use_cnn_module=True, cnn_module_kernel=meta["kernel"],
            pad_safe_conv=False,
        ),
        decoder=TransformerDecoderConfig(
            attention_heads=meta["heads"], linear_units=meta["units"],
            num_blocks=meta["dec_blocks"], dropout_rate=0.0,
            positional_dropout_rate=0.0,
        ),
        ctc_weight=meta["ctc_weight_decode"],
    )
    model = ASRModel(cfg)
    enc_sd = {k[len("enc."):]: v for k, v in sd.items() if k.startswith("enc.")}
    dec_sd = {k[len("dec."):]: v for k, v in sd.items() if k.startswith("dec.")}
    ctc_sd = {k[len("ctc."):]: v for k, v in sd.items() if k.startswith("ctc.")}
    enc_params, enc_bs = conformer_encoder_params(
        enc_sd, num_blocks=meta["blocks"], input_size=meta["n_mels"],
        odim=meta["odim"], macaron=True, use_cnn=True,
    )
    params = {
        "encoder": enc_params,
        "decoder": transformer_decoder_params(dec_sd, meta["dec_blocks"]),
        "ctc_head": ctc_head_params(ctc_sd, "ctc_lo"),
    }
    return model, {"params": params, "batch_stats": {"encoder": enc_bs}}


def test_trained_decode_and_wer_parity(built, gold, corpus):
    import jax.numpy as jnp

    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.utils.metrics import error_rate

    meta, _ = gold
    model, variables = built
    char2id = None  # token ids compared directly; texts only for the CER
    bs = BatchBeamSearch(
        model, variables, vocab_size=meta["vocab"], sos=meta["sos"],
        eos=meta["eos"], beam_size=meta["beam"],
        ctc_weight=meta["ctc_weight_decode"],
    )
    from test_e2e_tiny import TOKEN_LIST

    char2id = {ch: i for i, ch in enumerate(TOKEN_LIST)}
    mismatches = []
    refs_l, hyps_l = [], []
    for uid in sorted(corpus):
        wav, txt = corpus[uid]
        speech = jnp.asarray(wav)[None]
        lens = jnp.asarray([len(wav)])
        enc, enc_lens = model.apply(variables, speech, lens, method=model.encode)
        hyps = bs(enc, enc_lens, maxlenratio=0.0, nbest=1)
        inner = [t for t in hyps[0].yseq if t not in (meta["sos"], meta["eos"])]
        want = meta["hyps"][uid]
        if inner != want:
            mismatches.append((uid, inner, want))
        else:
            np.testing.assert_allclose(
                float(hyps[0].score), meta["scores"][uid], rtol=0, atol=5e-3,
                err_msg=f"score mismatch on {uid}",
            )
        refs_l.append([char2id[c] for c in txt])
        hyps_l.append(inner)
    assert not mismatches, f"hyp mismatches: {mismatches[:3]} (+{len(mismatches)} total)"

    cer = error_rate(refs_l, hyps_l)["err"]
    # same decodes + same scorer => identical error rate: WER delta == 0
    np.testing.assert_allclose(cer, meta["cer"], atol=1e-9)


@pytest.fixture(scope="module")
def gold_lm():
    """Reference-trained TransformerLM + LM-fusion decodes
    (tests/parity/make_golden_trained_lm.py)."""
    npz_path = GOLD / "golden_trained_lm.npz"
    if not npz_path.exists():
        pytest.skip("golden_trained_lm fixtures not generated")
    npz = np.load(npz_path)
    meta = json.loads((GOLD / "golden_trained_lm.json").read_text())
    sd = {k[3:]: npz[k] for k in npz.files if k.startswith("lm_")}
    return meta, sd


def test_trained_decode_lm_fusion_parity(built, gold, gold_lm, corpus):
    """Second operating point: shallow LM fusion (lm_weight 0.3) with a
    reference-trained TransformerLM — identical hypotheses + scores + CER."""
    import jax.numpy as jnp

    from llm_guided_asr_tpu.models.espnet_ingest import transformer_lm_params
    from llm_guided_asr_tpu.models.lm import (
        TransformerLM,
        TransformerLMConfig,
        make_lm_score_fn,
    )
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.utils.metrics import error_rate

    meta, _ = gold
    meta_lm, lm_sd = gold_lm
    model, variables = built

    lm_cfg = TransformerLMConfig(
        vocab_size=meta["vocab"], pos_enc="sinusoidal",
        embed_unit=meta_lm["embed_unit"], att_unit=meta_lm["att_unit"],
        head=meta_lm["head"], unit=meta_lm["unit"], layer=meta_lm["layer"],
        dropout_rate=0.0,
    )
    lm = TransformerLM(lm_cfg)
    lm_vars = {"params": transformer_lm_params(lm_sd, meta_lm["layer"])}
    bs = BatchBeamSearch(
        model, variables, vocab_size=meta["vocab"], sos=meta["sos"],
        eos=meta["eos"], beam_size=meta["beam"],
        ctc_weight=meta["ctc_weight_decode"],
        lm_score_fn=make_lm_score_fn(lm, lm_vars),
        lm_weight=meta_lm["lm_weight"],
    )
    from test_e2e_tiny import TOKEN_LIST

    char2id = {ch: i for i, ch in enumerate(TOKEN_LIST)}
    mismatches = []
    refs_l, hyps_l = [], []
    for uid in sorted(corpus):
        wav, txt = corpus[uid]
        speech = jnp.asarray(wav)[None]
        lens = jnp.asarray([len(wav)])
        enc, enc_lens = model.apply(variables, speech, lens, method=model.encode)
        hyps = bs(enc, enc_lens, maxlenratio=0.0, nbest=1)
        inner = [t for t in hyps[0].yseq if t not in (meta["sos"], meta["eos"])]
        want = meta_lm["hyps"][uid]
        if inner != want:
            mismatches.append((uid, inner, want))
        else:
            np.testing.assert_allclose(
                float(hyps[0].score), meta_lm["scores"][uid], rtol=0, atol=5e-3,
                err_msg=f"score mismatch on {uid}",
            )
        refs_l.append([char2id[c] for c in txt])
        hyps_l.append(inner)
    assert not mismatches, f"hyp mismatches: {mismatches[:3]} (+{len(mismatches)} total)"
    cer = error_rate(refs_l, hyps_l)["err"]
    np.testing.assert_allclose(cer, meta_lm["cer"], atol=1e-9)


def test_trained_streaming_matches_offline(built, gold, corpus):
    """Third operating point: the resumable streaming search (stream_start /
    stream_step over encoder chunks) must produce the offline golden
    hypotheses on the trained checkpoint — streamed search delta = 0."""
    import jax
    import jax.numpy as jnp

    meta, _ = gold
    model, variables = built
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch

    bs = BatchBeamSearch(
        model, variables, vocab_size=meta["vocab"], sos=meta["sos"],
        eos=meta["eos"], beam_size=meta["beam"],
        ctc_weight=meta["ctc_weight_decode"],
    )
    ctc_fn = jax.jit(
        lambda e: jax.nn.log_softmax(
            model.apply(variables, e, method=model.ctc_logits).astype(
                jnp.float32
            ),
            axis=-1,
        )
    )

    mismatches = []
    for uid in sorted(corpus)[:8]:  # 8 utterances keep the CPU cost bounded
        wav, _ = corpus[uid]
        speech = jnp.asarray(wav)[None]
        lens = jnp.asarray([len(wav)])
        enc, enc_lens = model.apply(variables, speech, lens, method=model.encode)
        t = int(enc_lens[0])
        ctc_logp = ctc_fn(enc)[0]  # [T, V]
        # feed the search in 3 chunks; buffers are full-capacity with
        # invalid rows zeroed (the streaming CLI's convention)
        cuts = [max(t // 3, 1), max(2 * t // 3, 2), t]
        carry, prev = None, 0
        for ci, cut in enumerate(cuts):
            enc_buf = jnp.where(
                (jnp.arange(enc.shape[1]) < cut)[None, :, None], enc, 0.0
            )
            ctc_buf = jnp.where(
                (jnp.arange(ctc_logp.shape[0]) < cut)[:, None], ctc_logp, 0.0
            )
            new = jnp.asarray(cut, jnp.int32)
            if carry is None:
                carry = bs.stream_start(ctc_buf, enc_buf, new, enc.shape[1])
                prev = cut
                continue
            final = ci == len(cuts) - 1
            if final:
                maxlen = cut
            else:
                # conservative budget: only count CTC-greedy tokens over the
                # TRUSTED region (frames whose right context has arrived — the
                # streaming CLI's lookahead guard); advancing tokens on
                # partial audio is a latency/accuracy tradeoff that can
                # legitimately diverge from offline beam paths
                am = np.asarray(ctc_logp[:prev].argmax(-1))
                col = (
                    am[np.concatenate([[True], am[1:] != am[:-1]])]
                    if prev else np.zeros(0)
                )
                maxlen = min(int((col != bs.blank_id).sum()), cut)
            carry = bs.stream_step(
                enc_buf, jnp.asarray(prev, jnp.int32), new,
                jnp.asarray(maxlen, jnp.int32), jnp.asarray(0, jnp.int32),
                carry, ctc_buf,
            )
            prev = cut
        hyp = bs.stream_hyps(carry, nbest=1)[0]
        inner = [i for i in hyp.yseq if i not in (meta["sos"], meta["eos"])]
        if inner != meta["hyps"][uid]:
            mismatches.append((uid, inner, meta["hyps"][uid]))
    assert not mismatches, f"streaming mismatches: {mismatches}"
