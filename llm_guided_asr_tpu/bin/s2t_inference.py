#!/usr/bin/env python3
"""OWSM-style S2T inference CLI (espnet2/bin/s2t_inference.py analog):
decode a wav.scp through the multitask S2T model, optionally seeding the
beam with a previous-context prompt (text_prev conditioning,
s2t_inference.py) and long-form chunked decoding (decode_long:551)."""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class Speech2TextS2T:
    def __init__(
        self,
        train_config,
        model_file=None,
        beam_size: int = 5,
        maxlenratio: float = -48.0,
        text_prev: str = "",
        speech_pad_multiple: int = 1600,
    ):
        from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
        from llm_guided_asr_tpu.tasks.asr import build_text_converter
        from llm_guided_asr_tpu.tasks.generic import GenericTask

        self.model, self.variables, self.config = GenericTask.build_model_from_file(
            train_config, model_file
        )
        self.tokenizer, self.converter = build_text_converter(self.config)
        self.maxlenratio = maxlenratio
        self.speech_pad_multiple = speech_pad_multiple
        cfg = self.model.cfg
        self.sos, self.eos = cfg.sos_id, cfg.eos_id
        self.prompt_ids = []
        if text_prev:
            self.prompt_ids = self.converter.tokens2ids(
                self.tokenizer.text2tokens(text_prev)
            )
        self.beam = BatchBeamSearch(
            self.model, self.variables, vocab_size=cfg.vocab_size,
            sos=self.sos, eos=self.eos, beam_size=beam_size,
            ctc_weight=0.3,
        )

    def __call__(self, speech: np.ndarray):
        from llm_guided_asr_tpu.data.dataset import round_up

        n = len(speech)
        padded = np.zeros((round_up(max(n, 1), self.speech_pad_multiple),),
                          np.float32)
        padded[:n] = speech
        enc, enc_lens = self.model.apply(
            self.variables, jnp.asarray(padded[None]), jnp.asarray([n]),
            method=self.model.encode,
        )
        if self.prompt_ids:
            hyps = self._decode_with_prompt(enc, enc_lens)
            # strip the seeded primer POSITIONALLY (id-set filtering would
            # also delete legitimate occurrences of prompt words in the new
            # transcript)
            yseq = hyps[0].yseq[1 + len(self.prompt_ids):]
        else:
            hyps = self.beam(enc, enc_lens, maxlenratio=self.maxlenratio)
            yseq = hyps[0].yseq
        ids = [i for i in yseq if i not in (self.sos, self.eos)]
        toks = self.converter.ids2tokens(ids)
        return self.tokenizer.tokens2text(toks), toks, ids, hyps[0]

    def _decode_with_prompt(self, enc, enc_lens):
        """Seed the beam with [sos, text_prev...] (hyp_primer analog)."""
        bs = self.beam
        primer = [self.sos] + list(self.prompt_ids)
        lmax = bs._lmax(int(enc.shape[1]), self.maxlenratio) + len(primer)
        ctc_logp = self.model.apply(
            self.variables, enc, method=self.model.ctc_log_softmax
        )[0]
        carry = bs.stream_start(ctc_logp, enc, enc_lens[0], lmax)
        state, att_state = carry
        k = state.alive_tokens.shape[0]
        p = jnp.asarray(primer, jnp.int32)
        tokens = state.alive_tokens.at[:, : len(primer)].set(
            jnp.broadcast_to(p, (k, len(primer)))
        )
        state = state._replace(
            alive_tokens=tokens,
            alive_len=jnp.full((k,), len(primer), jnp.int32),
        )
        maxlen = (int(-self.maxlenratio) if self.maxlenratio < 0
                  else int(enc_lens[0]))
        carry = bs.stream_step(
            enc, enc_lens[0], enc_lens[0], jnp.asarray(maxlen, jnp.int32),
            jnp.asarray(0, jnp.int32), (state, att_state), ctc_logp,
        )
        return bs.stream_hyps(carry, nbest=1)

    def decode_long(self, speech: np.ndarray, window_s: float = 30.0,
                    fs: int = 16000, separator: str = " ") -> str:
        """Sliding-window long-form decoding (s2t_inference.py decode_long)."""
        win = int(window_s * fs)
        pieces = []
        for start in range(0, max(len(speech), 1), win):
            chunk = speech[start : start + win]
            if len(chunk) < int(0.32 * fs):  # skip-short threshold (:559)
                continue
            pieces.append(self(chunk)[0])
        return separator.join(p for p in pieces if p)


class Speech2Language:
    """Language identification (espnet2/bin/s2t_inference_language.py:24):
    one teacher-forced decoder step on [sos], softmax restricted to the
    contiguous language-symbol id range, return the n-best (lang, prob)."""

    def __init__(
        self,
        train_config,
        model_file=None,
        first_lang_sym: str = "<abk>",
        last_lang_sym: str = "<zul>",
        nbest: int = 1,
        speech_pad_multiple: int = 1600,
    ):
        from llm_guided_asr_tpu.tasks.generic import GenericTask
        from llm_guided_asr_tpu.utils.config import read_token_list

        self.model, self.variables, self.config = GenericTask.build_model_from_file(
            train_config, model_file
        )
        self.token_list = read_token_list(self.config["token_list"])
        self.first_lang_id = self.token_list.index(first_lang_sym)
        self.last_lang_id = self.token_list.index(last_lang_sym)
        self.nbest = nbest
        self.speech_pad_multiple = speech_pad_multiple

    def __call__(self, speech: np.ndarray):
        import jax

        from llm_guided_asr_tpu.data.dataset import round_up

        n = len(speech)
        padded = np.zeros(
            (round_up(max(n, 1), self.speech_pad_multiple),), np.float32
        )
        padded[:n] = speech
        enc, enc_lens = self.model.apply(
            self.variables, jnp.asarray(padded[None]), jnp.asarray([n]),
            method=self.model.encode,
        )
        sos = self.model.cfg.sos_id
        logits = self.model.apply(
            self.variables, enc, enc_lens,
            jnp.asarray([[sos]], jnp.int32), jnp.asarray([1]),
            method=self.model.decoder_logits,
        )  # [1, 1, V]
        span = logits[0, 0, self.first_lang_id : self.last_lang_id + 1]
        prob = jax.nn.softmax(span.astype(jnp.float32))
        k = min(self.nbest, int(prob.shape[0]))
        idx = np.argsort(-np.asarray(prob))[:k]
        return [
            (self.token_list[self.first_lang_id + int(i)], float(prob[int(i)]))
            for i in idx
        ]


def inference_language(
    output_dir: str,
    wav_scp: str,
    train_config: str,
    model_file: Optional[str] = None,
    first_lang_sym: str = "<abk>",
    last_lang_sym: str = "<zul>",
    nbest: int = 1,
):
    from llm_guided_asr_tpu.data.fileio import DatadirWriter, SoundScpReader

    s2l = Speech2Language(train_config, model_file,
                          first_lang_sym=first_lang_sym,
                          last_lang_sym=last_lang_sym, nbest=nbest)
    reader = SoundScpReader(wav_scp)
    with DatadirWriter(output_dir) as writer:
        for uid in reader.keys():
            rate, wav = reader[uid]
            results = s2l(np.asarray(wav, np.float32))
            for rank, (lang, prob) in enumerate(results, 1):
                writer[f"{rank}best_recog/text"][uid] = lang
                writer[f"{rank}best_recog/score"][uid] = str(prob)
    logger.info(f"identified language for {len(reader)} utterances -> {output_dir}")


def inference(
    output_dir: str,
    wav_scp: str,
    train_config: str,
    model_file: Optional[str] = None,
    beam_size: int = 5,
    text_prev: str = "",
):
    from llm_guided_asr_tpu.data.fileio import DatadirWriter, SoundScpReader

    s2t = Speech2TextS2T(train_config, model_file, beam_size=beam_size,
                         text_prev=text_prev)
    reader = SoundScpReader(wav_scp)
    with DatadirWriter(output_dir) as writer:
        w = writer["1best_recog"]
        for uid in reader.keys():
            rate, wav = reader[uid]
            text, toks, ids, hyp = s2t(np.asarray(wav, np.float32))
            w["text"][uid] = text
            w["token"][uid] = " ".join(toks)
            w["score"][uid] = str(float(hyp.score))
    logger.info(f"decoded {len(reader)} utterances -> {output_dir}")


def main(cmd=None):
    from llm_guided_asr_tpu.utils.config import build_config
    from llm_guided_asr_tpu.utils.devices import resolve_device

    config = build_config(cmd if cmd is not None else sys.argv[1:], {
        "output_dir": "s2t_decoded",
        "wav_scp": None,
        "train_config": None,
        "model_file": None,
        "beam_size": 5,
        "text_prev": "",
        "mode": "text",  # text | language (s2t_inference_language.py analog)
        "first_lang_sym": "<abk>",
        "last_lang_sym": "<zul>",
        "nbest": 1,
        "device": None,
    })
    logging.basicConfig(level=logging.INFO)
    resolve_device(config.get("device"))
    if config.get("mode") == "language":
        inference_language(
            config["output_dir"], config["wav_scp"], config["train_config"],
            config.get("model_file"),
            first_lang_sym=config.get("first_lang_sym", "<abk>"),
            last_lang_sym=config.get("last_lang_sym", "<zul>"),
            nbest=int(config.get("nbest", 1)),
        )
        return
    inference(config["output_dir"], config["wav_scp"], config["train_config"],
              config.get("model_file"),
              beam_size=int(config.get("beam_size", 5)),
              text_prev=config.get("text_prev", ""))


if __name__ == "__main__":
    main()
