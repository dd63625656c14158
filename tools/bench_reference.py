#!/usr/bin/env python3
"""Measure the REFERENCE implementation's inference throughput (torch CPU).

Produces reference_rtfx.json at the repo root; bench.py reads it to emit an
honest vs_baseline = ours/reference for each matching metric (VERDICT r2
item 2a).  The reference publishes no RTFx numbers of its own (BASELINE.md),
so the denominator is measured here: the reference's actual decode compute
path — DefaultFrontend -> UtteranceMVN -> ConformerEncoder -> BatchBeamSearch
(decoder + CTCPrefixScorer + LengthBonus), exactly what Speech2Text runs per
utterance (espnet2/bin/asr_inference.py:491-674) — with the SAME model
dimensions, audio lengths, and forced decode length bench.py uses.

Run manually on this box:  python tools/bench_reference.py
(The reference targets GPUs; none is available here, so the measurement is
CPU torch and recorded as such in the JSON.)
"""

import json
import platform
import sys
import time
from pathlib import Path

import numpy as np

REF = "/root/reference"
OUT = Path(__file__).resolve().parent.parent / "reference_rtfx.json"

FLAGSHIP_SECONDS = 10.0
SR = 16000
VOCAB = 5000
MAXLEN = 24  # bench.py forces 24 decode steps via maxlenratio=-24
N_UTTS = 2


def main():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    sys.path.insert(0, REF)
    from tools.ref_compat import install_reference_shims

    install_reference_shims()
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))
    from espnet2.asr.ctc import CTC
    from espnet2.asr.decoder.transformer_decoder import TransformerDecoder
    from espnet2.asr.encoder.conformer_encoder import ConformerEncoder
    from espnet2.asr.frontend.default import DefaultFrontend
    from espnet2.layers.utterance_mvn import UtteranceMVN
    from espnet.nets.batch_beam_search import BatchBeamSearch
    from espnet.nets.beam_search import BeamSearch
    from espnet.nets.scorers.ctc import CTCPrefixScorer
    from espnet.nets.scorers.length_bonus import LengthBonus

    torch.manual_seed(0)
    # frontend_conf=None skips the WPE/beamformer sub-frontend (instantiated
    # by default but never applied in forward; its deps are absent here)
    frontend = DefaultFrontend(fs=SR, frontend_conf=None)
    mvn = UtteranceMVN()
    enc = ConformerEncoder(
        input_size=80, output_size=256, attention_heads=4, linear_units=1024,
        num_blocks=12, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer="conv2d",
        macaron_style=True, rel_pos_type="latest", pos_enc_layer_type="rel_pos",
        selfattention_layer_type="rel_selfattn", activation_type="swish",
        use_cnn_module=True, cnn_module_kernel=31,
    )
    dec = TransformerDecoder(
        vocab_size=VOCAB, encoder_output_size=256, attention_heads=4,
        linear_units=2048, num_blocks=6, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0,
    )
    ctc = CTC(odim=VOCAB, encoder_output_size=256, dropout_rate=0.0)
    for m in (frontend, mvn, enc, dec, ctc):
        m.eval()

    rng = np.random.default_rng(0)
    samples = int(FLAGSHIP_SECONDS * SR)
    speech = torch.from_numpy(
        (rng.standard_normal((N_UTTS, samples)) * 0.1).astype(np.float32)
    )
    lens = torch.full((N_UTTS,), samples, dtype=torch.long)

    def encode(sp, ln):
        feats, flens = frontend(sp, ln)
        feats, flens = mvn(feats, flens)
        out, olens, _ = enc(feats, flens)
        return out, olens

    results = {}
    with torch.no_grad():
        # warm up allocator / threading
        encode(speech[:1], lens[:1])

        # ---- greedy: frontend + encoder + CTC argmax (batched) ----
        t0 = time.perf_counter()
        enc_out, enc_lens = encode(speech, lens)
        _ = ctc.argmax(enc_out)
        dt = time.perf_counter() - t0
        results["greedy_rtfx"] = N_UTTS * FLAGSHIP_SECONDS / dt

        def run_beam(beam_size):
            bs = BeamSearch(
                beam_size=beam_size, vocab_size=VOCAB, sos=VOCAB - 1,
                eos=VOCAB - 1,
                scorers={
                    "decoder": dec,
                    "ctc": CTCPrefixScorer(ctc=ctc, eos=VOCAB - 1),
                    "length_bonus": LengthBonus(VOCAB),
                },
                weights={"decoder": 0.7, "ctc": 0.3, "length_bonus": 0.0},
                pre_beam_score_key="full",
            )
            bs.__class__ = BatchBeamSearch  # asr_inference.py:365-385
            bs.eval()
            t0 = time.perf_counter()
            for b in range(N_UTTS):
                x = enc_out[b, : int(enc_lens[b])]
                bs(x=x, maxlenratio=-float(MAXLEN), minlenratio=0.0)
            dt = time.perf_counter() - t0
            return N_UTTS * FLAGSHIP_SECONDS / dt, dt / N_UTTS * 1e3

        # ---- beam 1 / beam 10 at decode_bs{1,10}_ctc0.3 ----
        results["beam1_rtfx"], results["beam1_latency_ms"] = run_beam(1)
        results["beam10_rtfx"], results["beam10_latency_ms"] = run_beam(10)

    meta = {
        "implementation": "reference espnet fork (torch CPU)",
        "note": (
            "reference targets GPUs; none available on this box, so the "
            "denominator is the reference's own compute path on host CPU"
        ),
        "torch": __import__("torch").__version__,
        "cpu": platform.processor() or platform.machine(),
        "n_utts": N_UTTS,
        "utt_seconds": FLAGSHIP_SECONDS,
        "forced_decode_len": MAXLEN,
        "model": "conformer12x256x1024-k31 / dec6x2048 / vocab5000",
    }
    out = {"meta": meta, **{k: round(v, 3) for k, v in results.items()}}
    OUT.write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
