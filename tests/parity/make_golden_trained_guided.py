"""Train the REFERENCE LLM-guided stack on the tone corpus; export trained
checkpoint + cached-guided-path decodes as golden fixtures (VERDICT r4 #8).

Run manually (requires /root/reference + torch CPU):
    python tests/parity/make_golden_trained_guided.py

Closes the last gap between "golden fixtures from a random-init guided model"
(make_golden_llm.py) and "a TRAINED guided model decodes identically":

1. Deterministic tone corpus (tests/test_e2e_tiny.py synth, seed 0).
2. Reference LLMGuidedASRModel (espnet2/asr/llm_guided_asr_model.py:47):
   DefaultFrontend -> UtteranceMVN -> ConformerEncoder -> CTC ->
   LLMGuidedTransformerDecoder guided by the frozen tiny HF llama
   (tests/parity/tiny_llm_bpe, template '((HYP))' marker), trained with torch
   Adam until it overfits — the frozen LLM excluded from the optimizer
   exactly like freeze_param: [decoder.llm.lm]
   (egs2/esun/work/conf/tuning/train_asr+llama3_conformer.yaml:65-69).
3. Every utterance decoded through the reference BatchBeamSearch with the
   CACHED guided scorer (use_cache=True -> batch_score_cached,
   transformer_decoder.py:1134-1235 + llama.py:269-356 shared-prefix KV) at
   the fork's decode_bs10_ctc0.3 operating point.
4. Trained state_dict (minus the frozen LLM), per-utterance hypotheses +
   scores, corpus CER saved; tests/test_wer_parity_trained_guided.py ingests
   and must reproduce identical hypotheses and error rate.
"""

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent
REF = "/root/reference"
OUT = Path(__file__).resolve().parent
LLM_DIR = OUT / "tiny_llm_bpe"

TEMPLATE = 'fix "((HYP))" then reply: '
N_FFT, HOP, N_MELS = 256, 128, 23
ODIM, HEADS, UNITS, BLOCKS, DEC_BLOCKS, KERNEL = 32, 2, 64, 2, 2, 7
CTC_WEIGHT_TRAIN, LSM = 0.5, 0.1
CTC_WEIGHT_DECODE, BEAM = 0.3, 10
STEPS, LR = 300, 3e-3


def main():
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tests"))
    sys.path.insert(0, REF)
    # transformers must import BEFORE the librosa stub lands: its
    # _is_package_available probes librosa.__spec__, which the stub lacks
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer
    from transformers.cache_utils import DynamicCache

    from tools.ref_compat import install_reference_shims

    install_reference_shims()

    from test_e2e_tiny import make_corpus

    from llm_guided_asr_tpu.data.fileio import read_2columns_text, read_audio
    from llm_guided_asr_tpu.utils.metrics import error_rate

    import espnet2.asr.llm.llama as ref_llama_mod

    class _FromLocalModel:
        @staticmethod
        def from_pretrained(name, **kw):
            kw.pop("cache_dir", None)
            return AutoModelForCausalLM.from_pretrained(str(LLM_DIR), **kw)

    class _FromLocalTok:
        @staticmethod
        def from_pretrained(name, **kw):
            kw.pop("cache_dir", None)
            return AutoTokenizer.from_pretrained(str(LLM_DIR), **kw)

    ref_llama_mod.AutoModelForCausalLM = _FromLocalModel
    ref_llama_mod.AutoTokenizer = _FromLocalTok

    class LegacyCacheAdapter(torch.nn.Module):
        """Installed transformers rejects legacy list past_key_values; adapt
        around the frozen LM without touching reference code."""

        def __init__(self, lm):
            super().__init__()
            self.lm_inner = lm
            self.config = lm.config

        def forward(self, **kw):
            pkv = kw.get("past_key_values")
            if isinstance(pkv, (list, tuple)):
                kw["past_key_values"] = DynamicCache.from_legacy_cache(
                    tuple(tuple(t) for t in pkv)
                )
            out = self.lm_inner(**kw)
            if getattr(out, "past_key_values", None) is not None and hasattr(
                out.past_key_values, "to_legacy_cache"
            ):
                out.past_key_values = out.past_key_values.to_legacy_cache()
            return out

    llama = ref_llama_mod.Llama(
        "meta-llama/Llama-3.2-1B", template_prompt=TEMPLATE,
        dtype="float32", pad_token="<unk>",
    )
    llama.lm = LegacyCacheAdapter(llama.lm)
    tokenizer = AutoTokenizer.from_pretrained(str(LLM_DIR))
    vocab = llama.lm.config.vocab_size

    from espnet2.asr.ctc import CTC
    from espnet2.asr.decoder.transformer_decoder import LLMGuidedTransformerDecoder
    from espnet2.asr.encoder.conformer_encoder import ConformerEncoder
    from espnet2.asr.frontend.default import DefaultFrontend
    from espnet2.asr.llm_guided_asr_model import LLMGuidedASRModel
    from espnet2.layers.utterance_mvn import UtteranceMVN
    from espnet.nets.batch_beam_search import BatchBeamSearch
    from espnet.nets.beam_search import BeamSearch
    from espnet.nets.scorers.ctc import CTCPrefixScorer
    from espnet.nets.scorers.length_bonus import LengthBonus

    def text_ids(txt):
        ids = tokenizer.convert_tokens_to_ids(list(txt))
        assert all(i is not None and i >= 0 for i in ids), txt
        return ids

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        make_corpus(root, n_train=24, n_valid=6, seed=0)
        data = {}
        for split in ("train", "valid"):
            wavs = read_2columns_text(root / split / "wav.scp")
            texts = read_2columns_text(root / split / "text")
            for uid, p in wavs.items():
                _, wav = read_audio(p)
                data[uid] = (np.asarray(wav, np.float32), texts[uid])

    torch.manual_seed(0)
    frontend = DefaultFrontend(
        fs=16000, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS, frontend_conf=None
    )
    mvn = UtteranceMVN()
    enc = ConformerEncoder(
        input_size=N_MELS, output_size=ODIM, attention_heads=HEADS,
        linear_units=UNITS, num_blocks=BLOCKS, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="conv2d", macaron_style=True, rel_pos_type="latest",
        pos_enc_layer_type="rel_pos", selfattention_layer_type="rel_selfattn",
        activation_type="swish", use_cnn_module=True, cnn_module_kernel=KERNEL,
    )
    dec = LLMGuidedTransformerDecoder(
        vocab_size=vocab, encoder_output_size=ODIM, attention_heads=HEADS,
        linear_units=UNITS, num_blocks=DEC_BLOCKS, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0,
    )
    ctc = CTC(odim=vocab, encoder_output_size=ODIM, dropout_rate=0.0)
    model = LLMGuidedASRModel(
        vocab_size=vocab, token_list=[f"t{i}" for i in range(vocab)],
        frontend=frontend, specaug=None, normalize=mvn, preencoder=None,
        encoder=enc, postencoder=None, decoder=dec, ctc=ctc, llm=llama,
        ctc_weight=CTC_WEIGHT_TRAIN, lsm_weight=LSM,
        report_cer=False, report_wer=False,
    )
    sos, eos = int(model.sos), int(model.eos)

    train_uids = sorted(u for u in data if u.startswith("train"))
    max_n = max(len(data[u][0]) for u in train_uids)
    max_l = max(len(text_ids(data[u][1])) for u in train_uids)
    B = len(train_uids)
    speech = torch.zeros((B, max_n))
    slens = torch.zeros((B,), dtype=torch.long)
    text = torch.full((B, max_l), -1, dtype=torch.long)
    tlens = torch.zeros((B,), dtype=torch.long)
    for i, u in enumerate(train_uids):
        wav, txt = data[u]
        speech[i, : len(wav)] = torch.from_numpy(wav)
        slens[i] = len(wav)
        ids = text_ids(txt)
        text[i, : len(ids)] = torch.tensor(ids)
        tlens[i] = len(ids)

    # frozen-LLM optimizer exclusion (freeze_param decoder.llm analog)
    trainable = [p for n, p in model.named_parameters()
                 if not n.startswith("decoder.llm.")]
    for n, p in model.named_parameters():
        if n.startswith("decoder.llm."):
            p.requires_grad_(False)
    opt = torch.optim.Adam(trainable, lr=LR)
    model.train()
    for step in range(STEPS):
        opt.zero_grad()
        loss, stats, _ = model(speech, slens, text.clone(), tlens)
        loss.backward()
        opt.step()
        if (step + 1) % 50 == 0:
            print(f"step {step + 1}: loss {float(loss):.4f} "
                  f"acc {float(stats['acc']):.3f}")
    model.eval()

    dec.use_cache = True  # cached guided scorer (batch_score_cached)
    bs = BeamSearch(
        beam_size=BEAM, vocab_size=vocab, sos=sos, eos=eos,
        scorers={
            "decoder": dec,
            "ctc": CTCPrefixScorer(ctc=ctc, eos=eos),
            "length_bonus": LengthBonus(vocab),
        },
        weights={"decoder": 1.0 - CTC_WEIGHT_DECODE, "ctc": CTC_WEIGHT_DECODE,
                 "length_bonus": 0.0},
        pre_beam_score_key="full",
    )
    bs.__class__ = BatchBeamSearch
    bs.eval()

    hyps, scores, refs_l, hyps_l = {}, {}, [], []
    first_pass = {}
    with torch.no_grad():
        for uid in sorted(data):
            wav, txt = data[uid]
            sp = torch.from_numpy(wav)[None]
            ln = torch.tensor([len(wav)])
            feats, flens = frontend(sp, ln)
            feats, flens = mvn(feats, flens)
            e_out, e_lens, _ = enc(feats, flens)
            # reference first-pass prompt hyp (transformer_decoder.py:
            # 1144-1158): ctc argmax -> unique_consecutive -> drop blanks
            lpz = ctc.argmax(e_out[:, : int(e_lens[0])]).data
            y_hat = torch.unique_consecutive(lpz[0])
            first_pass[uid] = [int(t) for t in y_hat[y_hat != 0].tolist()]
            nbest = bs(x=e_out[0, : int(e_lens[0])], maxlenratio=0.0,
                       minlenratio=0.0)
            yseq = [int(t) for t in nbest[0].yseq.tolist()]
            inner = [t for t in yseq if t not in (sos, eos)]
            hyps[uid] = inner
            scores[uid] = float(nbest[0].score)
            refs_l.append(text_ids(txt))
            hyps_l.append(inner)
            print(uid, txt, "->", inner)
    cer = error_rate(refs_l, hyps_l)["err"]
    print(f"reference guided corpus CER: {cer:.4f}")

    arrays = {}
    for name, mod in [("enc", enc), ("ctc", ctc)]:
        for k, v in mod.state_dict().items():
            arrays[f"sd_{name}.{k}"] = v.numpy()
    for k, v in dec.state_dict().items():
        if k.startswith("llm.") or k.startswith("ctc."):
            continue  # frozen LLM lives in tiny_llm_bpe/; ctc shared
        arrays[f"sd_dec.{k}"] = v.numpy()
    np.savez_compressed(OUT / "golden_trained_guided.npz", **arrays)
    meta = {
        "vocab": vocab, "n_fft": N_FFT, "hop": HOP, "n_mels": N_MELS,
        "odim": ODIM, "heads": HEADS, "units": UNITS, "blocks": BLOCKS,
        "dec_blocks": DEC_BLOCKS, "kernel": KERNEL,
        "sos": sos, "eos": eos, "template": TEMPLATE,
        "ctc_weight_decode": CTC_WEIGHT_DECODE, "beam": BEAM,
        "corpus": {"n_train": 24, "n_valid": 6, "seed": 0},
        "hyps": hyps, "scores": scores, "first_pass": first_pass, "cer": cer,
        "espnet_version": open(f"{REF}/espnet/version.txt").read().strip(),
    }
    (OUT / "golden_trained_guided.json").write_text(json.dumps(meta, indent=1))
    print("wrote", OUT / "golden_trained_guided.npz")


if __name__ == "__main__":
    main()
