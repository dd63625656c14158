#!/usr/bin/env python3
"""Speech2Text inference API + CLI.

Rebuild of espnet2/bin/asr_inference.py (Speech2Text:89, inference():710):
rebuilds the model from the config.yaml artifact + checkpoint, encodes each
utterance, decodes (greedy CTC or on-device vectorized beam search), and
writes Kaldi-style output files via DatadirWriter (text/token/score).

TPU-first: encode + search are jitted; audio is padded to bucket multiples so
repeated calls hit the compile cache.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.data.dataset import round_up
from llm_guided_asr_tpu.data.fileio import DatadirWriter, SoundScpReader
from llm_guided_asr_tpu.search.greedy import ctc_greedy_decode
from llm_guided_asr_tpu.tasks.asr import ASRTask
from llm_guided_asr_tpu.text.tokenizers import TokenIDConverter, build_tokenizer
from llm_guided_asr_tpu.utils.config import normalize_triples, read_token_list

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class Hypothesis:
    """Mirror of espnet/nets/beam_search.py:15 Hypothesis."""

    yseq: List[int]
    score: float
    scores: Dict[str, float] = dataclasses.field(default_factory=dict)


class Speech2Text:
    """callable: speech waveform -> list of (text, tokens, token_ids, Hypothesis)."""

    def __init__(
        self,
        asr_train_config: Union[str, Path],
        asr_model_file: Optional[Union[str, Path]] = None,
        token_type: Optional[str] = None,
        bpemodel: Optional[str] = None,
        lm_train_config: Optional[Union[str, Path]] = None,
        lm_file: Optional[Union[str, Path]] = None,
        lm_weight: float = 1.0,
        ctc_weight: float = 0.5,
        beam_size: int = 10,
        penalty: float = 0.0,
        maxlenratio: float = 0.0,
        minlenratio: float = 0.0,
        nbest: int = 1,
        speech_pad_multiple: int = 1600,
        use_cached_decoder: bool = False,
        # default (time-sync mAES) | alsd | tsd | nsc | mbg (multi-blank greedy)
        # (reference beam_search_transducer.py search_type dispatch :154-180)
        transducer_search: str = "default",
        dtype=jnp.float32,
    ):
        self.transducer_search = transducer_search
        model, variables, config = ASRTask.build_model_from_file(
            asr_train_config, asr_model_file, dtype=dtype
        )
        self.model = model
        self.variables = variables
        self.config = config
        self.ctc_weight = ctc_weight
        self.beam_size = beam_size
        self.penalty = penalty
        self.maxlenratio = maxlenratio
        self.minlenratio = minlenratio
        self.nbest = nbest
        self.speech_pad_multiple = speech_pad_multiple

        from llm_guided_asr_tpu.tasks.asr import build_text_converter

        tc_config = dict(config)
        if token_type:
            tc_config["token_type"] = token_type
        if bpemodel:
            tc_config["bpemodel"] = bpemodel
        self.tokenizer, self.converter = build_text_converter(tc_config)

        self._encode = jax.jit(
            lambda speech, lengths: model.apply(
                variables, speech, lengths, method=model.encode
            )
        )
        self.is_transducer = hasattr(model, "joint_full")
        if not self.is_transducer:
            self._ctc_logp = jax.jit(
                lambda enc: model.apply(variables, enc, method=model.ctc_log_softmax)
            )
        # shallow fusion LM (asr_inference.py:184-196)
        lm_score_fn = None
        if lm_train_config is not None:
            from llm_guided_asr_tpu.models.lm import make_lm_score_fn
            from llm_guided_asr_tpu.tasks.lm import LMTask

            lm_wrap, lm_vars, _ = LMTask.build_model_from_file(lm_train_config, lm_file)
            lm_score_fn = make_lm_score_fn(lm_wrap.lm, {"params": lm_vars["params"]["lm"]})
        self.lm_weight = lm_weight if lm_score_fn is not None else 0.0

        from llm_guided_asr_tpu.models.maskctc import MaskCTCModel

        self.is_maskctc = isinstance(model, MaskCTCModel)

        self._beam = None
        if self.is_transducer or self.is_maskctc:
            pass  # dedicated non-autoregressive decode paths below
        elif self.beam_size > 1 or self.ctc_weight < 1.0:
            from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch

            att_scorer = None
            if hasattr(model, "decode_prefix"):
                # LLM-guided: shared-prefix KV-cached scoring (use_cache
                # analog, transformer_decoder.py:1012)
                from llm_guided_asr_tpu.search.scorers import CachedGuidedScorer

                att_scorer = CachedGuidedScorer(model, variables)
            else:
                from llm_guided_asr_tpu.models.asr_model import ASRModel as _ASRModel

                if (
                    use_cached_decoder
                    and isinstance(model, _ASRModel)
                    and model.cfg.ctc_weight < 1.0
                ):
                    # standard decoder per-beam KV cache (forward_one_step
                    # analog).  Opt-in: measured on TPU at typical ASR output
                    # lengths the stateless recompute is FASTER (83x vs 75x
                    # RT at L<=64) — the MXU eats the small recompute while
                    # the cache pays scatter + carry overhead.  Worth it only
                    # for long outputs.
                    from llm_guided_asr_tpu.search.cached_decoder import (
                        CachedDecoderScorer,
                    )

                    att_scorer = CachedDecoderScorer(
                        model, variables,
                        model.cfg.decoder.attention_heads,
                        model.cfg.decoder.num_blocks,
                    )
            self._beam = BatchBeamSearch(
                model,
                variables,
                vocab_size=model.cfg.vocab_size,
                sos=model.cfg.sos_id,
                eos=model.cfg.eos_id,
                beam_size=max(self.beam_size, 1),
                ctc_weight=self.ctc_weight,
                penalty=self.penalty,
                lm_score_fn=lm_score_fn,
                lm_weight=self.lm_weight,
                att_scorer=att_scorer,
            )

    def make_bias_ctx(self, words: Optional[List[str]], pad_multiple: int = 64):
        """Per-utterance contextual biasing (asr_inference_new.py plumbing):
        tokenize the word list with the LLM tokenizer into a fixed-bucket
        (ids, lengths) pair — passed as a *traced* scorer context so switching
        bias between utterances never bakes into the jit cache."""
        from llm_guided_asr_tpu.search.scorers import CachedGuidedScorer

        scorer = getattr(self._beam, "att_scorer", None) if self._beam else None
        if not isinstance(scorer, CachedGuidedScorer) or not words:
            return None
        ids = self.tokenizer.tokenizer(", ".join(words)).input_ids
        # drop a leading bos if the tokenizer adds one
        bos = getattr(self.tokenizer.tokenizer, "bos_token_id", None)
        if bos is not None and ids and ids[0] == bos:
            ids = ids[1:]
        from llm_guided_asr_tpu.data.dataset import round_up

        w = round_up(max(len(ids), 1), pad_multiple)
        arr = np.zeros((1, w), np.int32)
        arr[0, : len(ids)] = ids[:w]
        return (jnp.asarray(arr), jnp.asarray([min(len(ids), w)], jnp.int32))

    def __call__(
        self, speech: np.ndarray, biasing_words: Optional[List[str]] = None
    ) -> List[Tuple[str, List[str], List[int], Hypothesis]]:
        """Decode one utterance (asr_inference.py Speech2Text.__call__:491)."""
        bias_ctx = self.make_bias_ctx(biasing_words)
        speech = np.asarray(speech, np.float32)
        n = speech.shape[0]
        padded = np.zeros((round_up(max(n, 1), self.speech_pad_multiple),), np.float32)
        padded[:n] = speech
        enc, enc_lens = self._encode(jnp.asarray(padded[None]), jnp.asarray([n]))

        if self.is_transducer:
            if self.transducer_search == "mbg":
                from llm_guided_asr_tpu.search.transducer_extra import (
                    transducer_multiblank_greedy,
                )

                tcfg = self.model.cfg
                ids = tcfg.multi_blank_ids or tuple(
                    tcfg.vocab_size - 1 - i
                    for i in range(len(tcfg.multi_blank_durations))
                )
                hyps = transducer_multiblank_greedy(
                    self.model, self.variables, enc, enc_lens,
                    big_blank_ids=ids,
                    big_blank_durations=tuple(tcfg.multi_blank_durations),
                )
                nb = [Hypothesis(yseq=h.yseq, score=h.score) for h in hyps]
            elif self.beam_size > 1:
                if self.transducer_search in ("tsd", "nsc"):
                    from llm_guided_asr_tpu.search.transducer_extra import (
                        transducer_nsc_decode,
                        transducer_tsd_decode,
                    )

                    search = (
                        transducer_tsd_decode
                        if self.transducer_search == "tsd"
                        else transducer_nsc_decode
                    )
                else:
                    from llm_guided_asr_tpu.search.transducer_beam import (
                        transducer_alsd_decode,
                        transducer_beam_decode,
                    )

                    search = (
                        transducer_alsd_decode
                        if self.transducer_search == "alsd"
                        else transducer_beam_decode
                    )
                hyps = search(
                    self.model, self.variables, enc, enc_lens,
                    beam_size=self.beam_size, nbest=self.nbest,
                )
                nb = [Hypothesis(yseq=h.yseq, score=h.score) for h in hyps]
            else:
                from llm_guided_asr_tpu.models.transducer import (
                    transducer_greedy_decode,
                )

                tokens, ntok = jax.device_get(transducer_greedy_decode(
                    self.model, self.variables, enc, enc_lens
                ))  # one transfer, not one per field (remote-device RTT)
                ids = [int(t) for t in tokens[0, : int(ntok[0])]]
                nb = [Hypothesis(yseq=ids, score=0.0)]
        elif self.is_maskctc:
            from llm_guided_asr_tpu.models.maskctc import maskctc_decode

            tokens, ntok = jax.device_get(
                maskctc_decode(self.model, self.variables, enc, enc_lens)
            )
            ids = [int(t) for t in tokens[0, : int(ntok[0])]]
            nb = [Hypothesis(yseq=ids, score=0.0)]
        elif self._beam is not None:
            nb = self._beam(enc, enc_lens, maxlenratio=self.maxlenratio,
                            minlenratio=self.minlenratio, nbest=self.nbest,
                            scorer_ctx=bias_ctx)
        else:
            logp = self._ctc_logp(enc)
            tokens, ntok = jax.device_get(
                ctc_greedy_decode(logp, enc_lens, blank_id=self.model.cfg.blank_id)
            )
            ids = [int(t) for t in tokens[0, : int(ntok[0])]]
            nb = [Hypothesis(yseq=ids, score=0.0)]

        results = []
        for hyp in nb[: self.nbest]:
            ids = [i for i in hyp.yseq if i not in (self.model.cfg.sos_id, self.model.cfg.eos_id)]
            tokens = self.converter.ids2tokens(ids)
            text = self.tokenizer.tokens2text(tokens)
            results.append((text, tokens, ids, hyp))
        return results

    @classmethod
    def from_packed(cls, archive: Union[str, Path], workdir: Optional[str] = None,
                    **kwargs) -> "Speech2Text":
        """Build from a bin/pack.py archive (from_pretrained analog)."""
        import tempfile

        from llm_guided_asr_tpu.bin.pack import unpack

        workdir = workdir or tempfile.mkdtemp(prefix="s2t_packed_")
        files = unpack(archive, workdir)
        return cls(files["asr_train_config"], files.get("asr_model_file"), **kwargs)

    def batch_call(
        self, speeches: List[np.ndarray]
    ) -> List[List[Tuple[str, List[str], List[int], Hypothesis]]]:
        """Decode several utterances in ONE on-device batched beam search."""
        if self._beam is None or self.is_transducer or self.is_maskctc:
            return [self(s) for s in speeches]
        n = max(len(s) for s in speeches)
        n = round_up(max(n, 1), self.speech_pad_multiple)
        batch = np.zeros((len(speeches), n), np.float32)
        lens = np.zeros((len(speeches),), np.int32)
        for i, s in enumerate(speeches):
            batch[i, : len(s)] = np.asarray(s, np.float32)
            lens[i] = len(s)
        enc, enc_lens = self._encode(jnp.asarray(batch), jnp.asarray(lens))
        per_utt = self._beam.batch_decode(
            enc, enc_lens, maxlenratio=self.maxlenratio,
            minlenratio=self.minlenratio, nbest=self.nbest,
        )
        out = []
        for hyps in per_utt:
            results = []
            for hyp in hyps[: self.nbest]:
                ids = [i for i in hyp.yseq
                       if i not in (self.model.cfg.sos_id, self.model.cfg.eos_id)]
                tokens = self.converter.ids2tokens(ids)
                results.append((self.tokenizer.tokens2text(tokens), tokens, ids, hyp))
            out.append(results)
        return out

    def decode_long(
        self,
        speech: np.ndarray,
        window_s: float = 30.0,
        hop_s: Optional[float] = None,
        min_window_s: float = 0.32,
        fs: int = 16000,
        separator: str = " ",
    ) -> str:
        """Long-form decoding of unsegmented audio (s2t_inference.py:551
        decode_long analog): slide a fixed window, decode each chunk, skip
        sub-threshold tails, stitch the hypotheses."""
        hop = int((hop_s or window_s) * fs)
        win = int(window_s * fs)
        pieces = []
        n = len(speech)
        for start in range(0, max(n, 1), hop):
            chunk = speech[start : start + win]
            if len(chunk) < int(min_window_s * fs):
                break  # skip-short-chunk threshold (s2t_inference.py:559)
            text = self(chunk)[0][0]
            if text:
                pieces.append(text)
        return separator.join(pieces)


def inference(
    output_dir: str,
    data_path_and_name_and_type: Sequence[Tuple[str, str, str]],
    asr_train_config: str,
    asr_model_file: Optional[str] = None,
    biasing_words_file: Optional[str] = None,
    batch_size: int = 1,
    **kwargs,
):
    """Batch decode a wav.scp into <output_dir>/1best_recog/{text,token,score}
    (asr_inference.py inference():710; biasing_words_file gives the
    per-utterance word tables of asr_inference_new.py:844-855)."""
    s2t = Speech2Text(asr_train_config, asr_model_file, **kwargs)
    bias_table = {}
    if biasing_words_file:
        from llm_guided_asr_tpu.data.fileio import read_2columns_text

        bias_table = {
            k: v.split() for k, v in read_2columns_text(biasing_words_file).items()
        }
    wav_path = None
    for path, name, typ in data_path_and_name_and_type:
        if name == "speech":
            wav_path = path
    if wav_path is None:
        raise ValueError("need a ('<wav.scp>', 'speech', 'sound') triple")
    reader = SoundScpReader(wav_path)

    def write_result(writer, uid, results):
        text, tokens, ids, hyp = results[0]
        writer["text"][uid] = text
        writer["token"][uid] = " ".join(tokens)
        writer["score"][uid] = str(float(hyp.score))
        # per-scorer breakdown (reference writes one scp per scorer via the
        # DatadirWriter hierarchy; nbest post_process merge_scores)
        for name, val in (hyp.scores or {}).items():
            writer[f"score_{name}"][uid] = str(val)

    import time as _time

    total_audio_s, total_decode_s = 0.0, 0.0

    with DatadirWriter(Path(output_dir) / "1best_recog") as writer:
        if batch_size > 1 and not bias_table:
            # batched multi-utterance decode: sort by length so each batch
            # shares padded shapes (NOTES.md credits batching for the big
            # RTFx numbers; the reference decodes one-by-one)
            uids = sorted(reader.keys())
            wavs = {u: reader[u][1] for u in uids}
            uids.sort(key=lambda u: len(wavs[u]))
            for i in range(0, len(uids), batch_size):
                chunk = uids[i : i + batch_size]
                t0 = _time.perf_counter()
                per_utt = s2t.batch_call([wavs[u] for u in chunk])
                total_decode_s += _time.perf_counter() - t0
                total_audio_s += sum(len(wavs[u]) for u in chunk) / 16000.0
                for uid, results in zip(chunk, per_utt):
                    write_result(writer, uid, results)
        else:
            for uid in reader.keys():
                rate, wav = reader[uid]
                t0 = _time.perf_counter()
                results = s2t(wav, biasing_words=bias_table.get(uid))
                total_decode_s += _time.perf_counter() - t0
                total_audio_s += len(wav) / float(rate)
                write_result(writer, uid, results)
    # decode RTF report (utils/calculate_rtf.py analog; first-call compile
    # time is included — warm numbers come from bench.py)
    if total_decode_s > 0:
        rtf = total_decode_s / max(total_audio_s, 1e-9)
        (Path(output_dir) / "rtf").write_text(
            f"decode_s {total_decode_s:.3f}\naudio_s {total_audio_s:.3f}\n"
            f"RTF {rtf:.4f}\nRTFx {1.0 / max(rtf, 1e-9):.2f}\n"
        )
        logger.info(f"decode RTF={rtf:.4f} (RTFx={1.0 / max(rtf, 1e-9):.1f})")
    logger.info(f"decoded {len(reader)} utterances -> {output_dir}")


def main(cmd=None):
    import sys

    from llm_guided_asr_tpu.utils.config import build_config

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "decode",
        "data_path_and_name_and_type": [],
        "asr_train_config": None,
        "asr_model_file": None,
        "lm_train_config": None,
        "lm_file": None,
        "lm_weight": 1.0,
        "ctc_weight": 0.5,
        "beam_size": 10,
        "penalty": 0.0,
        "maxlenratio": 0.0,
        "minlenratio": 0.0,
        "nbest": 1,
        "batch_size": 1,
        "biasing_words_file": None,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    from llm_guided_asr_tpu.utils.devices import resolve_device

    resolve_device(config.get("device"))
    inference(
        config["output_dir"],
        normalize_triples(config["data_path_and_name_and_type"]),
        config["asr_train_config"],
        config.get("asr_model_file"),
        biasing_words_file=config.get("biasing_words_file"),
        batch_size=int(config.get("batch_size", 1)),
        lm_train_config=config.get("lm_train_config"),
        lm_file=config.get("lm_file"),
        lm_weight=float(config.get("lm_weight", 1.0)),
        ctc_weight=float(config.get("ctc_weight", 0.5)),
        beam_size=int(config.get("beam_size", 10)),
        penalty=float(config.get("penalty", 0.0)),
        maxlenratio=float(config.get("maxlenratio", 0.0)),
        minlenratio=float(config.get("minlenratio", 0.0)),
        nbest=int(config.get("nbest", 1)),
        transducer_search=config.get("transducer_search", "default"),
    )


if __name__ == "__main__":
    main()
