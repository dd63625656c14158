"""Generate golden parity fixtures from the reference implementation.

Run manually (requires /root/reference + torch CPU):
    python tests/parity/make_golden.py

Builds a tiny random-weight reference stack — ConformerEncoder
(espnet2/asr/encoder/conformer_encoder.py:52), TransformerDecoder
(espnet2/asr/decoder/transformer_decoder.py), CTC (espnet2/asr/ctc.py) — runs
fixed random features through encode / ctc log_softmax / teacher-forced
decode / beam-10 joint CTC/att search (espnet/nets/beam_search.py:34 with the
fork's decode_bs10_ctc0.3 weights), and saves every weight, input, and output
to golden_conformer.npz. tests/test_parity_reference.py re-runs the same
computation in this package and asserts agreement (VERDICT r1 item 3;
reference test pattern: test/espnet2/bin/test_asr_inference.py:27-75).
"""

import json
import sys
from pathlib import Path

import numpy as np

REF = "/root/reference"
OUT = Path(__file__).resolve().parent

VOCAB = 12
INPUT_SIZE = 23
ODIM = 32
HEADS = 2
UNITS = 48
BLOCKS = 2
DEC_BLOCKS = 2
KERNEL = 7
SOS = EOS = VOCAB - 1
CTC_WEIGHT = 0.3
BEAM = 10


def main():
    sys.path.insert(0, REF)
    import torch

    from espnet2.asr.ctc import CTC
    from espnet2.asr.decoder.transformer_decoder import TransformerDecoder
    from espnet2.asr.encoder.conformer_encoder import ConformerEncoder
    from espnet.nets.beam_search import BeamSearch
    from espnet.nets.scorers.ctc import CTCPrefixScorer
    from espnet.nets.scorers.length_bonus import LengthBonus

    torch.manual_seed(0)
    enc = ConformerEncoder(
        input_size=INPUT_SIZE, output_size=ODIM, attention_heads=HEADS,
        linear_units=UNITS, num_blocks=BLOCKS, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="conv2d", normalize_before=True, macaron_style=True,
        rel_pos_type="latest", pos_enc_layer_type="rel_pos",
        selfattention_layer_type="rel_selfattn", activation_type="swish",
        use_cnn_module=True, cnn_module_kernel=KERNEL,
    )
    dec = TransformerDecoder(
        vocab_size=VOCAB, encoder_output_size=ODIM, attention_heads=HEADS,
        linear_units=UNITS, num_blocks=DEC_BLOCKS, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0,
    )
    ctc = CTC(odim=VOCAB, encoder_output_size=ODIM, dropout_rate=0.0)
    enc.eval(), dec.eval(), ctc.eval()

    rng = np.random.default_rng(0)
    B, T = 2, 58
    feats = rng.standard_normal((B, T, INPUT_SIZE)).astype(np.float32)
    feats_lens = np.array([T, 41], np.int64)
    ys_in = np.array([[SOS, 3, 5, 2, 7], [SOS, 4, 4, 6, 0]], np.int64)
    ys_in_lens = np.array([5, 3], np.int64)

    with torch.no_grad():
        enc_out, enc_lens, _ = enc(torch.from_numpy(feats), torch.from_numpy(feats_lens))
        ctc_logp = ctc.log_softmax(enc_out)
        dec_out, _ = dec(
            enc_out, enc_lens, torch.from_numpy(ys_in), torch.from_numpy(ys_in_lens)
        )
        dec_logp = torch.log_softmax(dec_out, dim=-1)

        # beam-10 joint CTC/att on utterance 0 (decode_bs10_ctc0.3 weights)
        bs = BeamSearch(
            beam_size=BEAM, vocab_size=VOCAB, sos=SOS, eos=EOS,
            scorers={
                "decoder": dec,
                "ctc": CTCPrefixScorer(ctc=ctc, eos=EOS),
                "length_bonus": LengthBonus(VOCAB),
            },
            weights={
                "decoder": 1.0 - CTC_WEIGHT, "ctc": CTC_WEIGHT, "length_bonus": 0.0,
            },
            pre_beam_score_key="full",
        )
        # the fork's real decode path auto-promotes to BatchBeamSearch when
        # every scorer is batchable (asr_inference.py:365-385) — match it.
        # (Pure BeamSearch differs in a corner: tokens outside the pre-beam
        # window keep their decoder-only score with NO CTC term, letting
        # blank win on inflated scores at beam 1; BatchBeamSearch kills
        # non-windowed tokens at logzero but always CTC-scores eos,
        # ctc_prefix_score.py:180-181.)
        from espnet.nets.batch_beam_search import BatchBeamSearch
        bs.__class__ = BatchBeamSearch
        bs.eval()
        x0 = enc_out[0, : int(enc_lens[0])]
        nbest = bs(x=x0, maxlenratio=0.0, minlenratio=0.0)

        # second operating point: beam-1 (decode_bs1_ctc0.3, the latency
        # config) on the same utterance
        bs1 = BeamSearch(
            beam_size=1, vocab_size=VOCAB, sos=SOS, eos=EOS,
            scorers={
                "decoder": dec,
                "ctc": CTCPrefixScorer(ctc=ctc, eos=EOS),
                "length_bonus": LengthBonus(VOCAB),
            },
            weights={
                "decoder": 1.0 - CTC_WEIGHT, "ctc": CTC_WEIGHT, "length_bonus": 0.0,
            },
            pre_beam_score_key="full",
        )
        bs1.__class__ = BatchBeamSearch
        bs1.eval()
        nbest_b1 = bs1(x=x0, maxlenratio=0.0, minlenratio=0.0)

        # third fixture: a 3x longer utterance (different shape regime —
        # deeper CTC DP, longer beam loop)
        T_LONG = 170
        feats_long = rng.standard_normal((1, T_LONG, INPUT_SIZE)).astype(np.float32)
        feats_long_lens = np.array([T_LONG], np.int64)
        enc_long, enc_long_lens, _ = enc(
            torch.from_numpy(feats_long), torch.from_numpy(feats_long_lens)
        )
        ctc_logp_long = ctc.log_softmax(enc_long)
        x_long = enc_long[0, : int(enc_long_lens[0])]
        nbest_long = bs(x=x_long, maxlenratio=0.0, minlenratio=0.0)

    hyp_tokens = [h.yseq.tolist() for h in nbest[:5]]
    hyp_scores = [float(h.score) for h in nbest[:5]]
    hyp_tokens_b1 = [h.yseq.tolist() for h in nbest_b1[:1]]
    hyp_scores_b1 = [float(h.score) for h in nbest_b1[:1]]
    hyp_tokens_long = [h.yseq.tolist() for h in nbest_long[:5]]
    hyp_scores_long = [float(h.score) for h in nbest_long[:5]]

    arrays = {
        "feats": feats, "feats_lens": feats_lens,
        "ys_in": ys_in, "ys_in_lens": ys_in_lens,
        "enc_out": enc_out.numpy(), "enc_lens": enc_lens.numpy(),
        "ctc_logp": ctc_logp.numpy(), "dec_logp": dec_logp.numpy(),
        "feats_long": feats_long, "feats_long_lens": feats_long_lens,
        "enc_out_long": enc_long.numpy(), "enc_long_lens": enc_long_lens.numpy(),
        "ctc_logp_long": ctc_logp_long.numpy(),
    }
    for name, mod in [("enc", enc), ("dec", dec), ("ctc", ctc)]:
        for k, v in mod.state_dict().items():
            arrays[f"sd_{name}.{k}"] = v.numpy()
    np.savez_compressed(OUT / "golden_conformer.npz", **arrays)
    meta = {
        "vocab": VOCAB, "input_size": INPUT_SIZE, "odim": ODIM, "heads": HEADS,
        "units": UNITS, "blocks": BLOCKS, "dec_blocks": DEC_BLOCKS,
        "kernel": KERNEL, "sos": SOS, "eos": EOS, "ctc_weight": CTC_WEIGHT,
        "beam": BEAM, "hyp_tokens": hyp_tokens, "hyp_scores": hyp_scores,
        "hyp_tokens_beam1": hyp_tokens_b1, "hyp_scores_beam1": hyp_scores_b1,
        "hyp_tokens_long": hyp_tokens_long, "hyp_scores_long": hyp_scores_long,
        "espnet_version": open(f"{REF}/espnet/version.txt").read().strip(),
    }
    (OUT / "golden_conformer.json").write_text(json.dumps(meta, indent=1))
    print("wrote", OUT / "golden_conformer.npz")
    print("nbest[0]:", hyp_tokens[0], hyp_scores[0])


if __name__ == "__main__":
    main()
