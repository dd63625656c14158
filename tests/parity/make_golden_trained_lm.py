"""LM-fusion golden fixtures from the REFERENCE stack (VERDICT r3 item 8).

Extends the trained-checkpoint parity harness to a second operating point:
shallow LM fusion.  Loads the checkpoint exported by
make_golden_trained.py (the ASR model is NOT retrained), trains a tiny
reference TransformerLM (espnet2/lm/transformer_lm.py) on the tone-corpus
transcripts, decodes every utterance with the reference BatchBeamSearch at
{beam, ctc 0.3, lm 0.3}, and saves the LM state_dict + hypotheses/scores.
tests/test_wer_parity_reference.py::test_trained_decode_lm_fusion_parity
ingests the LM (espnet_ingest.transformer_lm_params) and must reproduce the
SAME hypotheses and scores.

Run manually (requires /root/reference + torch CPU):
    python tests/parity/make_golden_trained_lm.py
"""

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent
REF = "/root/reference"
OUT = Path(__file__).resolve().parent

# LM dims: tiny but real (embed != att exercises the input_proj mapping)
EMBED_UNIT, ATT_UNIT, HEAD, UNIT, LAYER = 16, 32, 2, 64, 2
LM_STEPS, LM_LR = 400, 3e-3
LM_WEIGHT = 0.3


def main():
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tests"))
    sys.path.insert(0, REF)
    from tools.ref_compat import install_reference_shims

    install_reference_shims()
    import torch

    from test_e2e_tiny import TOKEN_LIST, make_corpus

    from llm_guided_asr_tpu.data.fileio import read_2columns_text, read_audio

    from espnet2.asr.ctc import CTC
    from espnet2.asr.decoder.transformer_decoder import TransformerDecoder
    from espnet2.asr.encoder.conformer_encoder import ConformerEncoder
    from espnet2.asr.frontend.default import DefaultFrontend
    from espnet2.layers.utterance_mvn import UtteranceMVN
    from espnet2.lm.transformer_lm import TransformerLM
    from espnet.nets.batch_beam_search import BatchBeamSearch
    from espnet.nets.beam_search import BeamSearch
    from espnet.nets.scorers.ctc import CTCPrefixScorer
    from espnet.nets.scorers.length_bonus import LengthBonus

    meta = json.loads((OUT / "golden_trained.json").read_text())
    npz = np.load(OUT / "golden_trained.npz")
    sd = {k[3:]: torch.from_numpy(npz[k]) for k in npz.files if k.startswith("sd_")}

    vocab = meta["vocab"]
    sos = eos = vocab - 1
    char2id = {ch: i for i, ch in enumerate(TOKEN_LIST)}

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

    # ---- rebuild the trained ASR model from the existing fixture --------
    torch.manual_seed(0)
    frontend = DefaultFrontend(
        fs=16000, n_fft=meta["n_fft"], hop_length=meta["hop"],
        n_mels=meta["n_mels"], frontend_conf=None,
    )
    mvn = UtteranceMVN()
    enc = ConformerEncoder(
        input_size=meta["n_mels"], output_size=meta["odim"],
        attention_heads=meta["heads"], linear_units=meta["units"],
        num_blocks=meta["blocks"], dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="conv2d", macaron_style=True, rel_pos_type="latest",
        pos_enc_layer_type="rel_pos", selfattention_layer_type="rel_selfattn",
        activation_type="swish", use_cnn_module=True,
        cnn_module_kernel=meta["kernel"],
    )
    dec = TransformerDecoder(
        vocab_size=vocab, encoder_output_size=meta["odim"],
        attention_heads=meta["heads"], linear_units=meta["units"],
        num_blocks=meta["dec_blocks"], dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0,
    )
    ctc = CTC(odim=vocab, encoder_output_size=meta["odim"], dropout_rate=0.0)
    enc.load_state_dict({k[4:]: v for k, v in sd.items() if k.startswith("enc.")})
    dec.load_state_dict({k[4:]: v for k, v in sd.items() if k.startswith("dec.")})
    ctc.load_state_dict({k[4:]: v for k, v in sd.items() if k.startswith("ctc.")})
    enc.eval(), dec.eval(), ctc.eval()

    # ---- train the reference TransformerLM on the transcripts -----------
    torch.manual_seed(1)
    lm = TransformerLM(
        vocab_size=vocab, pos_enc="sinusoidal", embed_unit=EMBED_UNIT,
        att_unit=ATT_UNIT, head=HEAD, unit=UNIT, layer=LAYER,
        dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0,
    )
    train_uids = sorted(u for u in data if u.startswith("train"))
    seqs = [[sos] + [char2id[c] for c in data[u][1]] + [eos] for u in train_uids]
    max_l = max(len(s) for s in seqs)
    toks = torch.zeros((len(seqs), max_l), dtype=torch.long)
    for i, s in enumerate(seqs):
        toks[i, : len(s)] = torch.tensor(s)
    x, y = toks[:, :-1], toks[:, 1:]
    # position 0 is <sos> (= vocab-1), never pad — the reference scorer masks
    # on `input != 0`, so training must see the same convention
    tgt_mask = torch.zeros_like(y, dtype=torch.bool)
    for i, s in enumerate(seqs):
        tgt_mask[i, : len(s) - 1] = True
    opt = torch.optim.Adam(lm.parameters(), lr=LM_LR)
    lm.train()
    for step in range(LM_STEPS):
        opt.zero_grad()
        logits, _ = lm(x, None)
        loss = torch.nn.functional.cross_entropy(
            logits[tgt_mask], y[tgt_mask]
        )
        loss.backward()
        opt.step()
        if (step + 1) % 100 == 0:
            print(f"lm step {step + 1}: loss {float(loss):.4f}")
    lm.eval()

    # ---- decode with shallow fusion -------------------------------------
    bs = BeamSearch(
        beam_size=meta["beam"], vocab_size=vocab, sos=sos, eos=eos,
        scorers={
            "decoder": dec,
            "ctc": CTCPrefixScorer(ctc=ctc, eos=eos),
            "lm": lm,
            "length_bonus": LengthBonus(vocab),
        },
        weights={
            "decoder": 1.0 - meta["ctc_weight_decode"],
            "ctc": meta["ctc_weight_decode"],
            "lm": LM_WEIGHT,
            "length_bonus": 0.0,
        },
        pre_beam_score_key="full",
    )
    bs.__class__ = BatchBeamSearch
    bs.eval()

    hyps, scores = {}, {}
    refs_l, hyps_l = [], []
    with torch.no_grad():
        for uid in sorted(data):
            wav, txt = data[uid]
            sp = torch.from_numpy(wav)[None]
            ln = torch.tensor([len(wav)])
            feats, flens = frontend(sp, ln)
            feats, flens = mvn(feats, flens)
            e_out, e_lens, _ = enc(feats, flens)
            nbest = bs(x=e_out[0, : int(e_lens[0])], maxlenratio=0.0,
                       minlenratio=0.0)
            yseq = [int(t) for t in nbest[0].yseq.tolist()]
            inner = [t for t in yseq if t not in (sos, eos)]
            hyps[uid] = inner
            scores[uid] = float(nbest[0].score)
            refs_l.append([char2id[c] for c in txt])
            hyps_l.append(inner)

    from llm_guided_asr_tpu.utils.metrics import error_rate

    cer = error_rate(refs_l, hyps_l)["err"]
    print(f"reference corpus CER with LM fusion: {cer:.4f}")

    arrays = {f"lm_{k}": v.numpy() for k, v in lm.state_dict().items()}
    np.savez_compressed(OUT / "golden_trained_lm.npz", **arrays)
    meta_lm = {
        "embed_unit": EMBED_UNIT, "att_unit": ATT_UNIT, "head": HEAD,
        "unit": UNIT, "layer": LAYER, "lm_weight": LM_WEIGHT,
        "hyps": hyps, "scores": scores, "cer": cer,
    }
    (OUT / "golden_trained_lm.json").write_text(json.dumps(meta_lm, indent=1))
    print("wrote", OUT / "golden_trained_lm.npz")


if __name__ == "__main__":
    main()
