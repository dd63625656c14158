"""TRAINED LLM-guided checkpoint parity vs the reference (VERDICT r4 #8).

tests/parity/golden_trained_guided.npz holds a checkpoint trained by the
REFERENCE LLM-guided stack (frozen tiny HF llama guidance, phase-2 style
freeze of decoder.llm) on the deterministic tone corpus, plus the
reference's own cached-guided beam-10 ctc0.3 decodes and corpus CER
(tests/parity/make_golden_trained_guided.py).  This test regenerates the
corpus, ingests the trained torch weights + the frozen LLM, decodes every
utterance through this package's CachedGuidedScorer beam search, and asserts
identical hypotheses, matching scores, and identical error rate — closing
the last gap between golden fixtures and "a trained guided model decodes
identically" (reference path: espnet2/asr/llm_guided_asr_model.py:47 +
transformer_decoder.py:1134-1235).
"""

import pytest

pytestmark = pytest.mark.slow

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

GOLD = Path(__file__).resolve().parent / "parity"
LLM_DIR = GOLD / "tiny_llm_bpe"


@pytest.fixture(scope="module")
def gold():
    npz_path = GOLD / "golden_trained_guided.npz"
    if not npz_path.exists():
        pytest.skip("golden_trained_guided fixtures not generated")
    npz = np.load(npz_path)
    meta = json.loads((GOLD / "golden_trained_guided.json").read_text())
    sd = {k[3:]: npz[k] for k in npz.files if k.startswith("sd_")}
    return meta, sd


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from test_e2e_tiny import make_corpus

    from llm_guided_asr_tpu.data.fileio import read_2columns_text, read_audio

    root = tmp_path_factory.mktemp("tone_corpus_guided_parity")
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
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM, AutoTokenizer

    from llm_guided_asr_tpu.models.conformer import ConformerConfig
    from llm_guided_asr_tpu.models.espnet_ingest import (
        conformer_encoder_params,
        ctc_head_params,
        llm_guided_decoder_params,
    )
    from llm_guided_asr_tpu.models.llm.llama import (
        LlamaConfig,
        convert_hf_state_dict,
    )
    from llm_guided_asr_tpu.models.llm.prompt import split_template
    from llm_guided_asr_tpu.models.llm_guided import (
        LLMGuidedASRConfig,
        LLMGuidedASRModel,
    )
    from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig

    meta, sd = gold
    hf_cfg = AutoConfig.from_pretrained(LLM_DIR)
    llm_cfg = LlamaConfig.from_hf_config(hf_cfg)
    tokenizer = AutoTokenizer.from_pretrained(LLM_DIR)
    template = split_template(
        tokenizer, meta["template"],
        bos_token_id=hf_cfg.bos_token_id, eos_token_id=hf_cfg.eos_token_id,
        pad_token="<unk>",
    )
    cfg = LLMGuidedASRConfig(
        vocab_size=meta["vocab"], llm=llm_cfg, prompt=template,
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
    model = LLMGuidedASRModel(cfg)
    enc_sd = {k[len("enc."):]: v for k, v in sd.items() if k.startswith("enc.")}
    dec_sd = {k[len("dec."):]: v for k, v in sd.items() if k.startswith("dec.")}
    ctc_sd = {k[len("ctc."):]: v for k, v in sd.items() if k.startswith("ctc.")}
    enc_params, enc_bs = conformer_encoder_params(
        enc_sd, num_blocks=meta["blocks"], input_size=meta["n_mels"],
        odim=meta["odim"], macaron=True, use_cnn=True,
    )
    hf_model = AutoModelForCausalLM.from_pretrained(
        LLM_DIR, torch_dtype=torch.float32
    )
    llm_params = convert_hf_state_dict(hf_model.state_dict(), llm_cfg)
    del hf_model
    params = {
        "encoder": enc_params,
        "ctc_head": ctc_head_params(ctc_sd, "ctc_lo"),
        "llm": llm_params,
        **llm_guided_decoder_params(dec_sd, meta["dec_blocks"]),
    }
    variables = {"params": params, "batch_stats": {"encoder": enc_bs}}
    return model, variables


def test_trained_guided_decode_and_wer_parity(built, gold, corpus):
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.search.scorers import CachedGuidedScorer
    from llm_guided_asr_tpu.utils.metrics import error_rate

    meta, _ = gold
    model, variables = built
    tokenizer = AutoTokenizer.from_pretrained(LLM_DIR)
    bs = BatchBeamSearch(
        model, variables, vocab_size=meta["vocab"], sos=meta["sos"],
        eos=meta["eos"], beam_size=meta["beam"],
        ctc_weight=meta["ctc_weight_decode"],
        att_scorer=CachedGuidedScorer(model, variables),
    )
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
        refs_l.append(tokenizer.convert_tokens_to_ids(list(txt)))
        hyps_l.append(inner)
    assert not mismatches, (
        f"hyp mismatches: {mismatches[:3]} (+{len(mismatches)} total)"
    )
    cer = error_rate(refs_l, hyps_l)["err"]
    np.testing.assert_allclose(cer, meta["cer"], atol=1e-9)
