"""Golden fixtures from the reference transducer beam searches (TSD / NSC /
default / mAES) — VERDICT r2 item 6.

Run manually (requires /root/reference + torch CPU):
    python tests/parity/make_golden_transducer.py

Builds a tiny random-weight reference transducer head — TransducerDecoder
(espnet2/asr/decoder/transducer_decoder.py:27, 1-layer LSTM) +
JointNetwork (espnet2/asr_transducer/joint_network.py) — feeds a fixed
random encoder output through BeamSearchTransducer
(espnet2/asr/transducer/beam_search_transducer.py) for each search type,
and saves weights, inputs, and n-best hypotheses/scores.
tests/test_transducer_extra.py ingests the exact weights and asserts this
package's searches reproduce the reference results.
"""

import json
import sys
from pathlib import Path

import numpy as np

REF = "/root/reference"
OUT = Path(__file__).resolve().parent

VOCAB, HID, ENC_D, JOINT = 11, 12, 16, 14
T = 8
BEAM = 4


def main():
    sys.path.insert(0, REF)
    import torch

    from espnet2.asr.decoder.transducer_decoder import TransducerDecoder
    from espnet2.asr.transducer.beam_search_transducer import BeamSearchTransducer
    from espnet2.asr_transducer.joint_network import JointNetwork

    torch.manual_seed(0)
    dec = TransducerDecoder(
        vocab_size=VOCAB, rnn_type="lstm", num_layers=1, hidden_size=HID,
        dropout=0.0, dropout_embed=0.0,
    )
    joint = JointNetwork(
        output_size=VOCAB, encoder_size=ENC_D, decoder_size=HID,
        joint_space_size=JOINT, joint_activation_type="tanh",
    )
    dec.eval(), joint.eval()

    rng = np.random.default_rng(0)
    enc_out = torch.from_numpy(
        (rng.standard_normal((T, ENC_D)) * 1.5).astype(np.float32)
    )

    results = {}
    configs = {
        "tsd": dict(search_type="tsd", max_sym_exp=2),
        "tsd3": dict(search_type="tsd", max_sym_exp=3),
        "nsc": dict(search_type="nsc", nstep=2, prefix_alpha=2),
        "default": dict(search_type="default"),
        "maes": dict(search_type="maes", nstep=2),
    }
    with torch.no_grad():
        for name, kw in configs.items():
            bs = BeamSearchTransducer(
                decoder=dec, joint_network=joint, beam_size=BEAM,
                lm=None, lm_weight=0.0, score_norm=True, nbest=BEAM, **kw,
            )
            nbest = bs(enc_out)
            results[name] = [
                # yseq[0] is the leading blank context token
                {"yseq": [int(t) for t in h.yseq[1:]], "score": float(h.score)}
                for h in nbest
            ]
            print(name, results[name][0])

    arrays = {"enc_out": enc_out.numpy()}
    for mod_name, mod in [("dec", dec), ("joint", joint)]:
        for k, v in mod.state_dict().items():
            arrays[f"sd_{mod_name}.{k}"] = v.numpy()
    np.savez_compressed(OUT / "golden_transducer.npz", **arrays)
    meta = {
        "vocab": VOCAB, "hidden": HID, "enc_dim": ENC_D, "joint": JOINT,
        "beam": BEAM, "t": T,
        "results": results,
        "configs": {k: {kk: vv for kk, vv in v.items()} for k, v in configs.items()},
        "espnet_version": open(f"{REF}/espnet/version.txt").read().strip(),
    }
    (OUT / "golden_transducer.json").write_text(json.dumps(meta, indent=1))
    print("wrote", OUT / "golden_transducer.npz")


if __name__ == "__main__":
    main()
