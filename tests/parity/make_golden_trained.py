"""Train the REFERENCE stack on the shared tone corpus; export the trained
checkpoint + its decodes as golden fixtures (VERDICT r2 item 2b).

Run manually (requires /root/reference + torch CPU):
    python tests/parity/make_golden_trained.py

What it does:
1. Generates the deterministic tone corpus (tests/test_e2e_tiny.py synth,
   seed 0 — the test regenerates identical wavs).
2. Builds the reference training stack — DefaultFrontend, UtteranceMVN,
   ConformerEncoder, TransformerDecoder, CTC inside ESPnetASRModel
   (espnet2/asr/espnet_model.py:37) — and trains it with torch Adam until it
   overfits (a few hundred full-batch steps; the reference recipe's data
   pipeline itself needs soundfile/kaldiio, absent from this image, so the
   wavs are loaded with this package's reader — the MODEL/loss/decode path is
   all reference code).
3. Decodes every train+valid utterance with the reference BatchBeamSearch at
   the fork's decode_bs10_ctc0.3 operating point and computes corpus CER.
4. Saves the trained state_dict, per-utterance hypotheses/scores, and the
   reference CER.  tests/test_wer_parity_reference.py ingests the checkpoint
   and must reproduce the SAME hypotheses and the SAME error rate (driver
   target: WER delta <= 0.1; this shows delta = 0 on the shared corpus).
"""

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent.parent
REF = "/root/reference"
OUT = Path(__file__).resolve().parent

N_FFT, HOP, N_MELS = 256, 128, 23
ODIM, HEADS, UNITS, BLOCKS, DEC_BLOCKS, KERNEL = 32, 2, 64, 2, 2, 7
CTC_WEIGHT_TRAIN, LSM = 0.5, 0.1
CTC_WEIGHT_DECODE, BEAM = 0.3, 5  # beam <= vocab(6): espnet batch_beam topk needs k <= V
STEPS, LR = 300, 3e-3


def main():
    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REPO / "tests"))
    sys.path.insert(0, REF)
    from tools.ref_compat import install_reference_shims

    install_reference_shims()
    import torch

    from test_e2e_tiny import TOKEN_LIST, make_corpus

    from llm_guided_asr_tpu.data.fileio import read_2columns_text, read_audio
    from llm_guided_asr_tpu.utils.metrics import error_rate

    from espnet2.asr.ctc import CTC
    from espnet2.asr.decoder.transformer_decoder import TransformerDecoder
    from espnet2.asr.encoder.conformer_encoder import ConformerEncoder
    from espnet2.asr.espnet_model import ESPnetASRModel
    from espnet2.asr.frontend.default import DefaultFrontend
    from espnet2.layers.utterance_mvn import UtteranceMVN
    from espnet.nets.batch_beam_search import BatchBeamSearch
    from espnet.nets.beam_search import BeamSearch
    from espnet.nets.scorers.ctc import CTCPrefixScorer
    from espnet.nets.scorers.length_bonus import LengthBonus

    vocab = len(TOKEN_LIST)
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
    dec = TransformerDecoder(
        vocab_size=vocab, encoder_output_size=ODIM, attention_heads=HEADS,
        linear_units=UNITS, num_blocks=DEC_BLOCKS, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0,
    )
    ctc = CTC(odim=vocab, encoder_output_size=ODIM, dropout_rate=0.0)
    model = ESPnetASRModel(
        vocab_size=vocab, token_list=list(TOKEN_LIST), frontend=frontend,
        specaug=None, normalize=mvn, preencoder=None, encoder=enc,
        postencoder=None, decoder=dec, ctc=ctc, joint_network=None,
        ctc_weight=CTC_WEIGHT_TRAIN, lsm_weight=LSM,
        report_cer=False, report_wer=False,
    )

    # full-batch training tensors (pad speech with zeros, text with -1)
    train_uids = sorted(u for u in data if u.startswith("train"))
    max_n = max(len(data[u][0]) for u in train_uids)
    max_l = max(len(data[u][1]) for u in train_uids)
    B = len(train_uids)
    speech = torch.zeros((B, max_n))
    slens = torch.zeros((B,), dtype=torch.long)
    text = torch.full((B, max_l), -1, dtype=torch.long)
    tlens = torch.zeros((B,), dtype=torch.long)
    for i, u in enumerate(train_uids):
        wav, txt = data[u]
        speech[i, : len(wav)] = torch.from_numpy(wav)
        slens[i] = len(wav)
        ids = [char2id[c] for c in txt]
        text[i, : len(ids)] = torch.tensor(ids)
        tlens[i] = len(ids)

    opt = torch.optim.Adam(model.parameters(), lr=LR)
    model.train()
    for step in range(STEPS):
        opt.zero_grad()
        loss, stats, _ = model(speech, slens, text.clone(), tlens)
        loss.backward()
        opt.step()
        if (step + 1) % 50 == 0:
            print(f"step {step + 1}: loss {float(loss):.4f}")
    model.eval()

    # decode everything at decode_bs10_ctc0.3
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
    with torch.no_grad():
        for uid in sorted(data):
            wav, txt = data[uid]
            sp = torch.from_numpy(wav)[None]
            ln = torch.tensor([len(wav)])
            feats, flens = frontend(sp, ln)
            feats, flens = mvn(feats, flens)
            e_out, e_lens, _ = enc(feats, flens)
            nbest = bs(x=e_out[0, : int(e_lens[0])], maxlenratio=0.0, minlenratio=0.0)
            yseq = [int(t) for t in nbest[0].yseq.tolist()]
            inner = [t for t in yseq if t not in (sos, eos)]
            hyps[uid] = inner
            scores[uid] = float(nbest[0].score)
            refs_l.append([char2id[c] for c in txt])
            hyps_l.append(inner)
    cer = error_rate(refs_l, hyps_l)["err"]
    print(f"reference corpus CER: {cer:.4f}")

    arrays = {}
    for name, mod in [("enc", enc), ("dec", dec), ("ctc", ctc)]:
        for k, v in mod.state_dict().items():
            arrays[f"sd_{name}.{k}"] = v.numpy()
    np.savez_compressed(OUT / "golden_trained.npz", **arrays)
    meta = {
        "vocab": vocab, "n_fft": N_FFT, "hop": HOP, "n_mels": N_MELS,
        "odim": ODIM, "heads": HEADS, "units": UNITS, "blocks": BLOCKS,
        "dec_blocks": DEC_BLOCKS, "kernel": KERNEL,
        "sos": sos, "eos": eos,
        "ctc_weight_decode": CTC_WEIGHT_DECODE, "beam": BEAM,
        "corpus": {"n_train": 24, "n_valid": 6, "seed": 0},
        "hyps": hyps, "scores": scores, "cer": cer,
        "espnet_version": open(f"{REF}/espnet/version.txt").read().strip(),
    }
    (OUT / "golden_trained.json").write_text(json.dumps(meta, indent=1))
    print("wrote", OUT / "golden_trained.npz")


if __name__ == "__main__":
    main()
