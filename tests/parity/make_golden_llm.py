"""Generate LLM-guided golden parity fixtures from the reference torch path.

Run manually (requires /root/reference + torch CPU):
    python tests/parity/make_golden_llm.py

This closes the headline parity loop (VERDICT r2 item 1): a tiny HF Llama on
disk (tests/parity/tiny_llm_bpe/) is driven through the *reference's*
LLMGuidedASRModel forward (espnet2/asr/llm_guided_asr_model.py:136-218), its
LLMGuidedTransformerDecoder teacher-forced forward
(espnet2/asr/decoder/transformer_decoder.py:1014-1065), the cached beam-step
scorer batch_score_cached (:1134-1235 + llama.py:269-356 shared-prefix KV),
and a full beam-10 ctc0.3 BatchBeamSearch decode.  Every weight, input and
output is saved; tests/test_parity_llm_guided.py re-runs the same computation
in this package and asserts agreement.

Fixture notes:
- The tokenizer is BPE with merges ["((", "))", "HY"] so that "((HYP))"
  tokenizes to exactly 4 tokens — the reference hardcodes a 4-token marker
  span for llama3 (llama.py:61) — while keeping id 0 = '!' and id 1 = '"'
  (llama3's blank analog and response delimiter, llama.py:74-80).
- The installed transformers no longer accepts legacy list-of-(k,v)
  past_key_values; LegacyCacheAdapter converts to/from DynamicCache around
  the frozen LM without touching reference code (pure environment shim).
- The reference's *uncached* inference path (forward_inference,
  llama.py:234-267) has a latent mask bug: prepare_prompt_for_inference
  computes lm_in_lengths from prefix_ids.size(0) AFTER .repeat(K, 1) made it
  2-D (llama.py:206-230), so the attention mask truncates the prompt.  The
  cached path passes no mask and is numerically correct (and matches the
  training forward); goldens therefore come from the cached path, which is
  also the fork's real decode operating mode (SURVEY §3.3).
"""

import json
import sys
from pathlib import Path

import numpy as np

REF = "/root/reference"
OUT = Path(__file__).resolve().parent
LLM_DIR = OUT / "tiny_llm_bpe"

TEMPLATE = 'fix "((HYP))" then reply: '
INPUT_SIZE, ODIM, HEADS, UNITS, BLOCKS, DEC_BLOCKS, KERNEL = 23, 32, 2, 48, 2, 2, 7
CTC_WEIGHT, LSM_WEIGHT, BEAM = 0.3, 0.1, 10


def build_tiny_llm_dir():
    import torch
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    LLM_DIR.mkdir(parents=True, exist_ok=True)
    singles = list("!\"#()->:,. ") + list("abcdefghijklmnopqrstuvwxyz") + list(
        "HYPBIASFRT"
    )
    vocab = {}
    for ch in singles:
        if ch not in vocab:
            vocab[ch] = len(vocab)
    for m in ("((", "))", "HY"):
        vocab[m] = len(vocab)
    for tok in ("<unk>", "<s>", "</s>", "<pad>"):
        vocab[tok] = len(vocab)
    merges = [("(", "("), (")", ")"), ("H", "Y")]
    tok = Tokenizer(BPE(vocab, merges, unk_token="<unk>"))
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>", bos_token="<s>", eos_token="</s>", pad_token="<pad>",
    )
    fast.save_pretrained(LLM_DIR)
    cfg = LlamaConfig(
        vocab_size=len(vocab), hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, bos_token_id=vocab["<s>"],
        eos_token_id=vocab["</s>"], pad_token_id=vocab["<pad>"],
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).save_pretrained(LLM_DIR)
    return len(vocab)


def main():
    sys.path.insert(0, REF)
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer
    from transformers.cache_utils import DynamicCache

    vocab_size = build_tiny_llm_dir()

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
    llm_sd = {k: v.numpy().copy() for k, v in llama.lm.state_dict().items()}
    llama.lm = LegacyCacheAdapter(llama.lm)

    from espnet2.asr.ctc import CTC
    from espnet2.asr.decoder.transformer_decoder import LLMGuidedTransformerDecoder
    from espnet2.asr.encoder.conformer_encoder import ConformerEncoder
    from espnet2.asr.llm_guided_asr_model import LLMGuidedASRModel
    from espnet.nets.batch_beam_search import BatchBeamSearch
    from espnet.nets.beam_search import BeamSearch
    from espnet.nets.scorers.ctc import CTCPrefixScorer
    from espnet.nets.scorers.length_bonus import LengthBonus

    torch.manual_seed(1)
    enc = ConformerEncoder(
        input_size=INPUT_SIZE, output_size=ODIM, attention_heads=HEADS,
        linear_units=UNITS, num_blocks=BLOCKS, dropout_rate=0.0,
        positional_dropout_rate=0.0, attention_dropout_rate=0.0,
        input_layer="conv2d", normalize_before=True, macaron_style=True,
        rel_pos_type="latest", pos_enc_layer_type="rel_pos",
        selfattention_layer_type="rel_selfattn", activation_type="swish",
        use_cnn_module=True, cnn_module_kernel=KERNEL,
    )
    dec = LLMGuidedTransformerDecoder(
        vocab_size=vocab_size, encoder_output_size=ODIM, attention_heads=HEADS,
        linear_units=UNITS, num_blocks=DEC_BLOCKS, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0,
    )
    ctc = CTC(odim=vocab_size, encoder_output_size=ODIM, dropout_rate=0.0)
    model = LLMGuidedASRModel(
        vocab_size=vocab_size, token_list=[f"t{i}" for i in range(vocab_size)],
        frontend=None, specaug=None, normalize=None, preencoder=None,
        encoder=enc, postencoder=None, decoder=dec, ctc=ctc, llm=llama,
        ctc_weight=CTC_WEIGHT, lsm_weight=LSM_WEIGHT,
        report_cer=False, report_wer=False,
    )
    model.eval()

    rng = np.random.default_rng(0)
    B, T = 2, 58
    feats = rng.standard_normal((B, T, INPUT_SIZE)).astype(np.float32)
    feats_lens = np.array([T, 41], np.int64)
    # llm-vocab targets (lowercase-letter id range), padded with -1
    text = np.full((B, 6), -1, np.int64)
    text[0, :6] = [12, 15, 20, 11, 30, 14]
    text[1, :4] = [13, 18, 25, 33]
    text_lens = np.array([6, 4], np.int64)

    with torch.no_grad():
        loss, stats, _ = model(
            torch.from_numpy(feats), torch.from_numpy(feats_lens),
            torch.from_numpy(text.copy()), torch.from_numpy(text_lens),
        )
        # loss-parity anchor on EQUAL-length utterances: with ragged lengths
        # the reference's training first-pass hyp collapses encoder *pad*
        # frames (transformer_decoder.py:1021-1039) whose values are
        # implementation-specific garbage (fully-masked attention rows), so
        # the ragged-batch loss is not cross-implementation reproducible.
        feats_lens_eq = np.array([T, T], np.int64)
        loss_eq, stats_eq, _ = model(
            torch.from_numpy(feats), torch.from_numpy(feats_lens_eq),
            torch.from_numpy(text.copy()), torch.from_numpy(text_lens),
        )

        enc_out, enc_lens = model.encode(
            torch.from_numpy(feats), torch.from_numpy(feats_lens)
        )
        from espnet.nets.pytorch_backend.transformer.add_sos_eos import add_sos_eos

        ys_in, ys_out = add_sos_eos(
            torch.from_numpy(text.copy()), model.sos, model.eos, -1,
            pad_input_with_eos=False,
        )
        dec_out, _ = dec(enc_out, enc_lens, ys_in, torch.from_numpy(text_lens) + 1)
        dec_logp = torch.log_softmax(dec_out, -1)

        # cached stepwise scoring on utterance 0 (batch_score_cached):
        # step 0 = single root hyp (BeamSearch starts from one hypothesis),
        # steps 1.. = 2 forced beams sharing the root state
        L0 = int(enc_lens[0])
        x0 = enc_out[0, :L0]
        sos = model.sos
        dec.use_cache = True
        forced = [[4, 7], [12, 15], [9, 2]]
        step_logps = []
        ys = torch.tensor([[sos]])
        logp, states = dec.batch_score(ys, [None], x0.unsqueeze(0))
        step_logps.append(logp.numpy().copy())
        prev = [states[0], states[0]]
        ys2 = torch.tensor([[sos, forced[0][0]], [sos, forced[0][1]]])
        for step in range(1, 3):
            xs = x0.unsqueeze(0).expand(2, *x0.shape)
            logp, states = dec.batch_score(ys2, prev, xs)
            step_logps.append(logp.numpy().copy())
            nxt = torch.tensor([[forced[step][0]], [forced[step][1]]])
            ys2 = torch.cat([ys2, nxt], 1)
            prev = states

        # full beam-10 ctc0.3 decode through the reference BatchBeamSearch
        bs = BeamSearch(
            beam_size=BEAM, vocab_size=vocab_size, sos=sos, eos=model.eos,
            scorers={
                "decoder": dec,
                "ctc": CTCPrefixScorer(ctc=ctc, eos=model.eos),
                "length_bonus": LengthBonus(vocab_size),
            },
            weights={
                "decoder": 1.0 - CTC_WEIGHT, "ctc": CTC_WEIGHT,
                "length_bonus": 0.0,
            },
            pre_beam_score_key="full",
        )
        bs.__class__ = BatchBeamSearch
        bs.eval()
        nbest = bs(x=x0, maxlenratio=0.0, minlenratio=0.0)

    arrays = {
        "feats": feats, "feats_lens": feats_lens,
        "text": text, "text_lens": text_lens,
        "enc_out": enc_out.numpy(), "enc_lens": enc_lens.numpy(),
        "dec_logp": dec_logp.numpy(),
        "forced_tokens": np.asarray(forced, np.int64),
    }
    for i, lp in enumerate(step_logps):
        arrays[f"step_logp_{i}"] = lp
    for name, mod in [("enc", enc), ("ctc", ctc)]:
        for k, v in mod.state_dict().items():
            arrays[f"sd_{name}.{k}"] = v.numpy()
    for k, v in dec.state_dict().items():
        if k.startswith("llm.") or k.startswith("ctc."):
            continue  # frozen LLM lives in tiny_llm_bpe/; ctc shared with model.ctc
        arrays[f"sd_dec.{k}"] = v.numpy()
    np.savez_compressed(OUT / "golden_llm_guided.npz", **arrays)

    meta = {
        "vocab": vocab_size, "input_size": INPUT_SIZE, "odim": ODIM,
        "heads": HEADS, "units": UNITS, "blocks": BLOCKS,
        "dec_blocks": DEC_BLOCKS, "kernel": KERNEL,
        "ctc_weight": CTC_WEIGHT, "lsm_weight": LSM_WEIGHT, "beam": BEAM,
        "template": TEMPLATE,
        "template_prefix_ids": list(llama.template_prefix_ids),
        "template_suffix_ids": list(llama.template_suffix_ids),
        "sos": int(model.sos), "eos": int(model.eos),
        "pad_id": int(llama.pad_token_id),
        "loss": float(loss), "loss_ctc": float(stats["loss_ctc"]),
        "loss_att": float(stats["loss_att"]), "acc": float(stats["acc"]),
        "loss_eq": float(loss_eq), "loss_ctc_eq": float(stats_eq["loss_ctc"]),
        "loss_att_eq": float(stats_eq["loss_att"]), "acc_eq": float(stats_eq["acc"]),
        "n_steps": len(step_logps),
        "hyp_tokens": [h.yseq.tolist() for h in nbest[:5]],
        "hyp_scores": [float(h.score) for h in nbest[:5]],
        "espnet_version": open(f"{REF}/espnet/version.txt").read().strip(),
    }
    (OUT / "golden_llm_guided.json").write_text(json.dumps(meta, indent=1))
    assert len(llm_sd) > 0
    print("wrote", OUT / "golden_llm_guided.npz")
    print("loss:", meta["loss"], "nbest[0]:", meta["hyp_tokens"][0], meta["hyp_scores"][0])


if __name__ == "__main__":
    main()
