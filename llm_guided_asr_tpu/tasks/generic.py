"""Generic task runner for the remaining domains: enh, spk, tts, hubert, s2t.

The reference gives every domain its own AbsTask subclass (espnet2/tasks/);
here one registry supplies (model builder, init-variable builder, batch-arg
mapping) per task and the shared Trainer does the rest.  Each task trains
from the same YAML/CLI surface as ASRTask:

  python -m llm_guided_asr_tpu.bin.train --task enh --config conf.yaml ...
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.train.checkpoint import load_pytree, merge_loaded
from llm_guided_asr_tpu.train.optim import build_optimizer
from llm_guided_asr_tpu.train.trainer import Trainer, TrainerOptions
from llm_guided_asr_tpu.utils.config import build_config, dump_yaml, read_token_list

logger = logging.getLogger(__name__)

GENERIC_DEFAULTS: Dict[str, Any] = {
    "task": None,
    "token_type": "char",
    "token_list": None,
    "bpemodel": None,
    "model_conf": {},
    "encoder": "conformer",
    "encoder_conf": {},
    "decoder_conf": {},
    "frontend_conf": {},
    "normalize": "utterance_mvn",
    "normalize_conf": {},
    "optim": "adam",
    "optim_conf": {"lr": 0.001},
    "scheduler": "warmuplr",
    "scheduler_conf": {"warmup_steps": 25000},
    "grad_clip": 5.0,
    "max_epoch": 40,
    "accum_grad": 1,
    "patience": None,
    "keep_nbest_models": 10,
    "best_model_criterion": [["valid", "loss", "min"]],
    "seed": 0,
    "log_interval": 100,
    "resume": False,
    "batch_type": "sorted",
    "batch_size": 16,
    "batch_bins": 1000000,
    "num_iters_per_epoch": None,
    "sort_in_batch": "descending",
    "train_data_path_and_name_and_type": [],
    "valid_data_path_and_name_and_type": [],
    "speech_pad_multiple": 1600,
    # spk only: 'uid1 uid2 label' trial file over VALID uids -> per-epoch
    # EER/minDCF valid stats (spk_trainer.py trial validation analog)
    "spk_trials": None,
    "text_pad_multiple": 8,
    "output_dir": "exp/run",
    "dry_run": False,
    "device": None,
}


# ---------------------------------------------------------------------------
# per-task builders
# ---------------------------------------------------------------------------

def _merge_pretrained(model, variables):
    """Overlay pretrained weights a builder stashed on the model (e.g. the
    whisper fine-tune path, _build_whisper) onto freshly-initialized
    variables.  Without this merge the stash was write-only and a
    'fine-tune' silently trained from random init."""
    pre = getattr(model, "_pretrained_variables", None)
    if not pre:
        return variables
    out = dict(variables)
    for coll, tree in pre.items():
        out[coll] = {**out.get(coll, {}), **tree}
    return out


def _build_enh(config):
    from llm_guided_asr_tpu.models.enh import EnhConfig, ESPnetEnhancementModel

    cfg = EnhConfig.from_dict(config.get("model_conf", {}) or {})
    model = ESPnetEnhancementModel(cfg)
    names = ["speech_mix", "speech_mix_lengths"] + [
        f"speech_ref{i + 1}" for i in range(cfg.num_spk)
    ]
    dummy = (jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]))
    dummy = dummy + tuple(jnp.zeros((2, 4000), jnp.float32) for _ in range(cfg.num_spk))
    return model, tuple(names), dummy


def _build_spk(config):
    from llm_guided_asr_tpu.models.spk import SpeakerModel, SpkConfig

    mc = dict(config.get("model_conf", {}) or {})
    # registry choices (encoder/pooling/projector/loss + their hyperparams)
    # ride through SpkConfig.from_dict; frontend comes from frontend_conf
    mc.setdefault("frontend", config.get("frontend_conf", {}) or {})
    cfg = SpkConfig.from_dict(mc)
    model = SpeakerModel(cfg)
    names = ("speech", "speech_lengths", "spk_labels", "spk_labels_lengths")
    dummy = (
        jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
        jnp.zeros((2, 1), jnp.int32), jnp.asarray([1, 1]),
    )
    return model, names, dummy


def _make_spk_trial_eval(model, valid_ds, trials_path, pad_multiple=4000):
    """Per-epoch verification EER/minDCF over trial pairs.

    The reference spk_trainer validates with trials, not a loss
    (spk_trainer.py:87-215: cosine scores over utterance pairs ->
    tuneThresholdfromScore EER + NIST minDCF).  Enabled via the
    ``spk_trials`` config key: a file of 'uid1 uid2 label' lines whose uids
    index the VALID dataset's speech source.
    """
    import numpy as np

    from llm_guided_asr_tpu.data.dataset import round_up
    from llm_guided_asr_tpu.utils.det import verification_report

    label_map = {"1": 1, "0": 0, "target": 1, "nontarget": 0}
    trials = []
    with open(trials_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 3 or parts[2].lower() not in label_map:
                raise ValueError(
                    f"spk_trials line needs 'uid1 uid2 label(0/1/target/"
                    f"nontarget)': {line!r}"
                )
            trials.append((parts[0], parts[1], label_map[parts[2].lower()]))
    uids = sorted({u for t in trials for u in t[:2]})

    embed_fn = jax.jit(
        lambda v, s, l: model.apply(v, s, l, method=model.extract_embedding)
    )

    def eval_fn(params, extra):
        variables = {"params": params, **extra}
        embs = {}
        for uid in uids:
            wav = np.asarray(valid_ds[uid]["speech"], np.float32).reshape(-1)
            n = len(wav)
            padded = np.zeros((round_up(max(n, 1), pad_multiple),), np.float32)
            padded[:n] = wav
            emb = np.asarray(
                embed_fn(variables, jnp.asarray(padded[None]), jnp.asarray([n]))
            )[0]
            embs[uid] = emb / (np.linalg.norm(emb) + 1e-9)
        scores = [float(np.dot(embs[u1], embs[u2])) for u1, u2, _ in trials]
        labels = [t[2] for t in trials]
        rep = verification_report(scores, labels)
        return {"eer": rep["eer"], "mindcf": rep["mindcf"],
                "n_trials": rep["n_trials"]}

    return eval_fn


def _build_tts(config):
    """--tts ClassChoices analog (espnet2/tasks/tts.py tts_choices):
    fastspeech2 (default) | fastspeech | tacotron2 | transformer.

    fastspeech (FastSpeech1, espnet2/tts/fastspeech/fastspeech.py) is
    FastSpeech2 with the pitch/energy variance adaptors disabled — the
    adapter drops those streams.  transformer is the AR Transformer-TTS
    with stop token + guided attention (e2e_tts_transformer.py).

    Raw-waveform ``speech`` is converted to log-mel in the batch adapter
    (the reference's in-model feats_extract, tts/espnet_model.py)."""
    from llm_guided_asr_tpu.models.tts import FastSpeech2, FastSpeech2Config
    from llm_guided_asr_tpu.ops.frontend import default_frontend

    mc = dict(config.get("model_conf", {}) or {})
    fc = dict(config.get("frontend_conf", {}) or {})
    n_mels = int(mc.get("n_mels", 80))

    def feats_extract(batch):
        if batch["speech"].ndim == 2:  # raw waveform -> log-mel
            mel, mel_lens = default_frontend(
                batch["speech"], batch["speech_lengths"],
                n_fft=int(fc.get("n_fft", 512)),
                hop_length=int(fc.get("hop_length", 128)),
                n_mels=n_mels,
            )
            batch = {**batch, "speech": mel,
                     "speech_lengths": jnp.clip(mel_lens, 0, mel.shape[1])}
        return batch

    vocab = len(read_token_list(config["token_list"])) if config.get("token_list") else int(
        mc.get("vocab_size", 100)
    )
    if config.get("tts") == "tacotron2":
        from llm_guided_asr_tpu.models.tacotron2 import Tacotron2, Tacotron2Config

        t2 = Tacotron2Config(
            vocab_size=vocab,
            n_mels=int(mc.get("n_mels", 80)),
            embed_dim=int(mc.get("adim", 128)),
            elstm_units=int(mc.get("elstm_units", 64)),
            dlstm_units=int(mc.get("dlstm_units", 256)),
            att_dim=int(mc.get("att_dim", 64)),
        )
        model = Tacotron2(t2)

        def t2_adapter(batch):
            batch = feats_extract(batch)
            return (
                batch["text"], batch["text_lengths"],
                batch["speech"], batch["speech_lengths"],
            )

        t2_dummy = (
            jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
            jnp.zeros((2, 12, t2.n_mels), jnp.float32), jnp.asarray([12, 9]),
        )
        return model, t2_adapter, t2_dummy
    if config.get("tts") == "transformer":
        from llm_guided_asr_tpu.models.tts import TransformerTTS, TransformerTTSConfig

        known = {f.name for f in dataclasses.fields(TransformerTTSConfig)}
        tcfg = TransformerTTSConfig(
            vocab_size=vocab,
            **{k: v for k, v in mc.items() if k in known and k != "vocab_size"},
        )
        model = TransformerTTS(tcfg)

        def tt_adapter(batch):
            batch = feats_extract(batch)
            return (
                batch["text"], batch["text_lengths"],
                batch["speech"], batch["speech_lengths"],
            )

        tt_dummy = (
            jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
            jnp.zeros((2, 12, tcfg.n_mels), jnp.float32), jnp.asarray([12, 9]),
        )
        return model, tt_adapter, tt_dummy
    fastspeech1 = config.get("tts") == "fastspeech"
    cfg = FastSpeech2Config(
        vocab_size=vocab,
        n_mels=int(mc.get("n_mels", 80)),
        adim=int(mc.get("adim", 128)),
        heads=int(mc.get("heads", 2)),
        eunits=int(mc.get("eunits", 256)),
        elayers=int(mc.get("elayers", 2)),
        dlayers=int(mc.get("dlayers", 2)),
    )
    model = FastSpeech2(cfg)

    def adapter(batch):
        batch = feats_extract(batch)
        return (
            batch["text"], batch["text_lengths"],
            batch["speech"], batch["speech_lengths"],
            batch["durations"], batch.get("durations_lengths"),
            None if fastspeech1 else batch.get("pitch"),
            None if fastspeech1 else batch.get("energy"),
        )

    dummy = (
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
        jnp.zeros((2, 12, cfg.n_mels), jnp.float32), jnp.asarray([12, 9]),
        jnp.full((2, 4), 3, jnp.int32), jnp.asarray([4, 3]),
        jnp.zeros((2, 4), jnp.float32), jnp.zeros((2, 4), jnp.float32),
    )
    return model, adapter, dummy


def _build_hubert(config):
    from llm_guided_asr_tpu.models.hubert import HubertConfig, HubertModel

    mc = dict(config.get("model_conf", {}) or {})
    known = {"n_clusters", "adim", "heads", "units", "layers", "conv_channels",
             "mask_prob", "mask_span", "head", "final_dim", "logit_temp",
             "pred_masked_weight", "pred_nomask_weight", "loss_weights"}
    cfg = HubertConfig(**{k: v for k, v in mc.items() if k in known})
    model = HubertModel(cfg)
    names = ("speech", "speech_lengths", "units", "units_lengths")
    dummy = (
        jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
        jnp.zeros((2, 20), jnp.int32), jnp.asarray([20, 20]),
    )
    return model, names, dummy


def _build_s2t(config):
    from llm_guided_asr_tpu.models.s2t import S2TModel
    from llm_guided_asr_tpu.tasks.asr import build_model_config

    model = S2TModel(build_model_config(config))

    def batch_args(batch):
        """text_prev / text_ctc are optional streams (the reference model
        treats them as None-able, s2t/espnet_model.py forward kwargs):
        absent -> empty prompt / text-as-CTC-target fallbacks."""
        b = batch["speech"].shape[0]
        if "text_prev" in batch:
            prev, plens = batch["text_prev"], batch["text_prev_lengths"]
        else:
            prev = jnp.zeros((b, 0), jnp.int32)
            plens = jnp.zeros((b,), jnp.int32)
        ctc = batch.get("text_ctc", batch["text"])
        clens = batch.get("text_ctc_lengths", batch["text_lengths"])
        return (
            batch["speech"], batch["speech_lengths"],
            batch["text"], batch["text_lengths"],
            prev, plens, ctc, clens,
        )

    dummy = (
        jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
        jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
        jnp.ones((2, 2), jnp.int32), jnp.asarray([2, 0]),
        jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
    )
    return model, batch_args, dummy


def _build_diar(config):
    from llm_guided_asr_tpu.models.diar import DiarConfig, DiarizationModel
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig

    mc = dict(config.get("model_conf", {}) or {})
    cfg = DiarConfig(
        num_spk=int(mc.get("num_spk", 2)),
        frontend=FrontendConfig.from_dict(config.get("frontend_conf", {}) or {}),
        adim=int(mc.get("adim", 128)),
        heads=int(mc.get("heads", 2)),
        units=int(mc.get("units", 256)),
        layers=int(mc.get("layers", 2)),
        use_attractor=bool(mc.get("use_attractor", False)),
        attractor_unit=int(mc.get("attractor_unit", 128)),
        attractor_weight=float(mc.get("attractor_weight", 1.0)),
        diar_weight=float(mc.get("diar_weight", 1.0)),
    )
    model = DiarizationModel(cfg)
    names = ("speech", "speech_lengths", "spk_labels")
    dummy = (
        jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
        jnp.zeros((2, 28, cfg.num_spk), jnp.int32),
    )
    return model, names, dummy


def _build_mt(config):
    from llm_guided_asr_tpu.models.mt import MTConfig, MTModel
    from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig

    mc = dict(config.get("model_conf", {}) or {})
    vocab = len(read_token_list(config["token_list"]))
    # separate source vocabulary (espnet2/mt multi-vocab path: the
    # MutliTokenizerCommonPreprocessor tokenizes src_text with its own
    # token list; src_vocab_size drives a distinct src embedding + src_sos)
    src_vocab = (
        len(read_token_list(config["src_token_list"]))
        if config.get("src_token_list") else None
    )
    cfg = MTConfig(
        vocab_size=vocab,
        src_vocab_size=src_vocab,
        patch_size=int(mc.get("patch_size", 1)),
        share_decoder_input_output_embed=bool(
            mc.get("share_decoder_input_output_embed", False)
        ),
        share_encoder_decoder_input_embed=bool(
            mc.get("share_encoder_decoder_input_embed", False)
        ),
        adim=int(mc.get("adim", 256)),
        heads=int(mc.get("heads", 4)),
        units=int(mc.get("units", 1024)),
        elayers=int(mc.get("elayers", 6)),
        decoder=TransformerDecoderConfig.from_dict(config.get("decoder_conf", {}) or {}),
        lsm_weight=float(mc.get("lsm_weight", 0.1)),
        encoder=config.get("encoder", "transformer"),
        hf_model_name_or_path=(config.get("encoder_conf", {}) or {}).get(
            "model_name_or_path", ""
        ),
        lang_token_id=int(
            (config.get("encoder_conf", {}) or {}).get("lang_token_id", -1)
        ),
    )
    model = MTModel(cfg)
    names = ("text", "text_lengths", "src_text", "src_text_lengths")
    dummy = (
        jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
    )
    return model, names, dummy


def _build_whisper(config):
    """Whisper fine-tune task (reference: whisper encoder/decoder choices of
    ASRTask, espnet2/asr/{encoder/whisper_encoder.py,decoder/
    whisper_decoder.py} inside ESPnetASRModel, attention CE only).
    model_conf.model_name_or_path loads a pretrained HF checkpoint to
    fine-tune; without it a scratch whisper-shaped model trains (CI path)."""
    from llm_guided_asr_tpu.models.ssl_encoders import WhisperEncConfig
    from llm_guided_asr_tpu.models.whisper import (
        WhisperASR,
        WhisperConfig,
        load_whisper_asr,
    )

    mc = dict(config.get("model_conf", {}) or {})
    name = mc.get("model_name_or_path", "")
    if name:
        model, variables, _hf = load_whisper_asr(name)
        model = dataclasses.replace(
            model,
            cfg=dataclasses.replace(
                model.cfg,
                sot_id=int(mc.get("sot_id", model.cfg.sot_id)),
                eot_id=int(mc.get("eot_id", model.cfg.eot_id)),
            ),
        )
        # stash for main()/build_model_from_file to merge over model.init
        # output (flax Modules are frozen dataclasses — plain attribute
        # assignment raises outside setup)
        object.__setattr__(model, "_pretrained_variables", variables)
    else:
        enc = WhisperEncConfig(
            d_model=int(mc.get("d_model", 64)),
            encoder_layers=int(mc.get("encoder_layers", 2)),
            encoder_attention_heads=int(mc.get("attention_heads", 2)),
            encoder_ffn_dim=int(mc.get("ffn_dim", 128)),
            num_mel_bins=int(mc.get("num_mel_bins", 80)),
            max_source_positions=int(mc.get("max_source_positions", 1500)),
        )
        model = WhisperASR(WhisperConfig(
            vocab_size=int(mc.get("vocab_size", 64)),
            d_model=enc.d_model,
            decoder_layers=int(mc.get("decoder_layers", 2)),
            decoder_attention_heads=int(mc.get("attention_heads", 2)),
            decoder_ffn_dim=int(mc.get("ffn_dim", 128)),
            max_target_positions=int(mc.get("max_target_positions", 448)),
            encoder=enc,
            sot_id=int(mc.get("sot_id", int(mc.get("vocab_size", 64)) - 2)),
            eot_id=int(mc.get("eot_id", int(mc.get("vocab_size", 64)) - 1)),
        ))
    names = ("speech", "speech_lengths", "text", "text_lengths")
    dummy = (
        jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 3200]),
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
    )
    return model, names, dummy


def _build_pit_asr(config):
    """pit_asr task (espnet2/asr/pit_espnet_model.py): multi-speaker ASR with
    permutation-invariant training; references come in as text, text_spk2,
    ... streams (pit_espnet_model.py:222-231)."""
    from llm_guided_asr_tpu.models.pit_asr import PITASRConfig, PITASRModel
    from llm_guided_asr_tpu.tasks.asr import build_model_config

    mc = dict(config.get("model_conf", {}) or {})
    num_ref = int(mc.get("num_ref", 2))
    cfg = PITASRConfig(asr=build_model_config(config), num_ref=num_ref)
    model = PITASRModel(cfg)
    names = ["speech", "speech_lengths", "text", "text_lengths"]
    for s in range(2, num_ref + 1):
        names += [f"text_spk{s}", f"text_spk{s}_lengths"]
    dummy = [
        jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
        jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
    ]
    for _ in range(2, num_ref + 1):
        dummy += [jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2])]
    return model, tuple(names), tuple(dummy)


def _build_discrete_asr(config):
    """discrete_asr task (espnet2/asr/discrete_asr_espnet_model.py): discrete
    SSL/codec units in, text out, MT-style encoder + CTC/attention hybrid."""
    from llm_guided_asr_tpu.models.discrete_asr import (
        DiscreteASRConfig,
        DiscreteASRModel,
    )
    from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig

    mc = dict(config.get("model_conf", {}) or {})
    vocab = len(read_token_list(config["token_list"]))
    cfg = DiscreteASRConfig(
        vocab_size=vocab,
        src_vocab_size=int(mc.get("src_vocab_size", 512)),
        adim=int(mc.get("adim", 256)),
        heads=int(mc.get("heads", 4)),
        units=int(mc.get("units", 1024)),
        elayers=int(mc.get("elayers", 6)),
        patch_size=int(mc.get("patch_size", 1)),
        decoder=TransformerDecoderConfig.from_dict(config.get("decoder_conf", {}) or {}),
        ctc_weight=float(mc.get("ctc_weight", 0.3)),
        lsm_weight=float(mc.get("lsm_weight", 0.1)),
    )
    model = DiscreteASRModel(cfg)
    names = ("speech", "speech_lengths", "text", "text_lengths")
    dummy = (
        jnp.ones((2, 8), jnp.int32), jnp.asarray([8, 6]),
        jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
    )
    return model, names, dummy


def _build_slu(config):
    """SLU (espnet2/slu/): intent head + optional transcript conditioning
    (postdecoder transcript encoder + deliberation cross-attention) via a
    'transcript' text_int stream and model_conf.use_transcript."""
    from llm_guided_asr_tpu.models.slu import SLUConfig, SLUModel
    from llm_guided_asr_tpu.tasks.asr import build_model_config

    mc = dict(config.get("model_conf", {}) or {})
    extra = {f.name for f in dataclasses.fields(SLUConfig)} - {"asr"}
    cfg = SLUConfig(
        asr=build_model_config(config),
        **{k: v for k, v in mc.items() if k in extra},
    )
    model = SLUModel(cfg)
    if cfg.use_transcript:
        def adapter(batch):
            return (
                batch["speech"], batch["speech_lengths"],
                batch["text"], batch["text_lengths"],
                batch.get("intent"), batch.get("intent_lengths"),
                batch.get("transcript"), batch.get("transcript_lengths"),
            )

        dummy = (
            jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
            jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
            jnp.zeros((2, 1), jnp.int32), jnp.asarray([1, 1]),
            jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
        )
        return model, adapter, dummy
    names = ("speech", "speech_lengths", "text", "text_lengths", "intent")
    dummy = (
        jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
        jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
        jnp.zeros((2, 1), jnp.int32),
    )
    return model, names, dummy


def _build_asvspoof(config):
    from llm_guided_asr_tpu.models.slu import ASVSpoofConfig, ASVSpoofModel
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig

    mc = dict(config.get("model_conf", {}) or {})
    cfg = ASVSpoofConfig(
        frontend=FrontendConfig.from_dict(config.get("frontend_conf", {}) or {}),
        adim=int(mc.get("adim", 64)),
        layers=int(mc.get("layers", 2)),
    )
    model = ASVSpoofModel(cfg)
    names = ("speech", "speech_lengths", "label", "label_lengths")
    dummy = (
        jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
        jnp.zeros((2, 1), jnp.int32), jnp.asarray([1, 1]),
    )
    return model, names, dummy


def _build_s2st(config):
    from llm_guided_asr_tpu.models.s2st import S2STConfig, S2STModel
    from llm_guided_asr_tpu.tasks.asr import build_model_config

    mc = dict(config.get("model_conf", {}) or {})
    if str(mc.get("s2st_type", "discrete_unit")) == "translatotron":
        # spectrogram path (espnet_model.py:224 translatotron branch)
        from llm_guided_asr_tpu.models.s2st import (
            TranslatotronConfig,
            TranslatotronModel,
        )

        tcfg = TranslatotronConfig(
            base=build_model_config(config),
            n_mels=int(mc.get("n_mels", 80)),
            st_weight=float(mc.get("st_weight", 0.3)),
            asr_weight=float(mc.get("asr_weight", 0.3)),
            synthesis_weight=float(mc.get("synthesis_weight", 1.0)),
        )
        model = TranslatotronModel(tcfg)
        names = (
            "src_speech", "src_speech_lengths", "tgt_speech",
            "tgt_speech_lengths", "text", "text_lengths",
        )
        dummy = (
            jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
            jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 3200]),
            jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
        )
        return model, names, dummy
    if str(mc.get("s2st_type", "")) == "translatotron2":
        # NAT duration-upsampled synthesizer (synthesizer/translatotron2.py)
        from llm_guided_asr_tpu.models.s2st import (
            Translatotron2Config,
            Translatotron2Model,
        )

        t2cfg = Translatotron2Config(
            base=build_model_config(config),
            n_mels=int(mc.get("n_mels", 80)),
            st_weight=float(mc.get("st_weight", 0.3)),
            duration_weight=float(mc.get("duration_weight", 1.0)),
        )
        model = Translatotron2Model(t2cfg)
        names = (
            "src_speech", "src_speech_lengths", "tgt_speech",
            "tgt_speech_lengths", "text", "text_lengths",
        )
        dummy = (
            jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
            jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 3200]),
            jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
        )
        return model, names, dummy
    if str(mc.get("s2st_type", "")) == "unity":
        # two-pass text->unit synthesizer (synthesizer/unity_synthesizer.py)
        from llm_guided_asr_tpu.models.s2st import UnitYConfig, UnitYModel

        ucfg = UnitYConfig(
            base=build_model_config(config),
            unit_vocab_size=int(mc.get("unit_vocab_size", 200)),
            st_weight=float(mc.get("st_weight", 0.3)),
        )
        model = UnitYModel(ucfg)
        names = (
            "speech", "speech_lengths", "tgt_units", "tgt_units_lengths",
            "text", "text_lengths",
        )
        dummy = (
            jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
            jnp.ones((2, 5), jnp.int32), jnp.asarray([5, 3]),
            jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
        )
        return model, names, dummy
    cfg = S2STConfig(
        base=build_model_config(config),
        unit_vocab_size=int(mc.get("unit_vocab_size", 200)),
        st_weight=float(mc.get("st_weight", 0.3)),
    )
    model = S2STModel(cfg)
    names = (
        "speech", "speech_lengths", "tgt_units", "tgt_units_lengths",
        "text", "text_lengths",
    )
    dummy = (
        jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
        jnp.ones((2, 5), jnp.int32), jnp.asarray([5, 3]),
        jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
    )
    return model, names, dummy


def _build_svs(config):
    """SVS task (espnet2/tasks/svs.py): model_conf.model_type picks the
    family — xiaoice (FastSpeech + F0/VUV/syllable heads), naive_rnn
    (BiLSTM enc/dec + postnet), or singing_tacotron (duration-informed GDCA
    attention decoder, espnet2/svs/singing_tacotron/); optional frame-level
    'pitch' stream enables the XiaoiceSing2 pitch/VUV criteria."""
    from llm_guided_asr_tpu.models.svs import NaiveRNNSVS, SVSConfig, SVSModel
    from llm_guided_asr_tpu.models.tts import FastSpeech2Config

    mc = dict(config.get("model_conf", {}) or {})
    vocab = len(read_token_list(config["token_list"])) if config.get("token_list") else int(
        mc.get("vocab_size", 100)
    )
    if str(mc.get("model_type", "")).lower() == "singing_tacotron":
        from llm_guided_asr_tpu.models.singing_tacotron import (
            SingingTacotron,
            SingingTacotronConfig,
        )

        st_fields = {
            f.name for f in dataclasses.fields(SingingTacotronConfig)
        } - {"vocab_size"}
        st_cfg = SingingTacotronConfig(
            vocab_size=vocab,
            **{k: v for k, v in mc.items() if k in st_fields},
        )
        model = SingingTacotron(st_cfg)

        def st_adapter(batch):
            return (
                batch["text"], batch["text_lengths"],
                batch["speech"], batch["speech_lengths"],
                batch["durations"], batch.get("durations_lengths"),
                batch.get("midi"), batch.get("midi_lengths"),
                batch.get("pitch"), batch.get("pitch_lengths"),
            )

        dummy = (
            jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
            jnp.zeros((2, 12, st_cfg.n_mels), jnp.float32), jnp.asarray([12, 9]),
            jnp.full((2, 4), 3, jnp.int32), jnp.asarray([4, 3]),
            jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
        )
        return model, st_adapter, dummy
    tts_cfg = FastSpeech2Config(
        vocab_size=vocab,
        n_mels=int(mc.get("n_mels", 80)),
        adim=int(mc.get("adim", 128)),
        heads=int(mc.get("heads", 2)),
        eunits=int(mc.get("eunits", 256)),
        elayers=int(mc.get("elayers", 2)),
        dlayers=int(mc.get("dlayers", 2)),
    )
    extra = {f.name for f in dataclasses.fields(SVSConfig)} - {"tts"}
    cfg = SVSConfig(
        tts=tts_cfg, **{k: v for k, v in mc.items() if k in extra}
    )
    model_cls = {"xiaoice": SVSModel, "naive_rnn": NaiveRNNSVS}[cfg.model_type]
    model = model_cls(cfg)

    def adapter(batch):
        return (
            batch["text"], batch["text_lengths"],
            batch["speech"], batch["speech_lengths"],
            batch["durations"], batch.get("durations_lengths"),
            batch.get("midi"), batch.get("midi_lengths"),
            batch.get("pitch"), batch.get("pitch_lengths"),
        )

    dummy = (
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
        jnp.zeros((2, 12, tts_cfg.n_mels), jnp.float32), jnp.asarray([12, 9]),
        jnp.full((2, 4), 3, jnp.int32), jnp.asarray([4, 3]),
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
    )
    return model, adapter, dummy


def _build_codec(config):
    mc = dict(config.get("model_conf", {}) or {})
    codec_type = str(mc.pop("codec_type", "soundstream")).lower()
    if codec_type in ("encodec", "dac", "funcodec"):
        # codec zoo families (espnet2/gan_codec/{encodec,dac,funcodec})
        model, _ = _zoo_codec_from_conf(codec_type, mc)
    else:
        from llm_guided_asr_tpu.models.codec import CodecConfig, CodecModel

        cfg = CodecConfig(**{
            k: v for k, v in mc.items()
            if k in CodecConfig.__dataclass_fields__
        })
        model = CodecModel(cfg)
    names = ("speech", "speech_lengths")
    dummy = (jnp.zeros((2, 2048), jnp.float32), jnp.asarray([2048, 1024]))
    return model, names, dummy


def _zoo_codec_from_conf(codec_type, mc):
    """model_conf dict -> (generator, discriminator) for the codec zoo."""
    import dataclasses as _dc

    from llm_guided_asr_tpu.models.codec_zoo import (
        SEANetConfig,
        ZooCodecConfig,
        build_zoo_codec,
    )

    sd = dict(mc.get("seanet", {}) or {})
    if "ratios" in sd:
        sd["ratios"] = tuple(sd["ratios"])
    seanet = SEANetConfig(**{
        k: v for k, v in sd.items() if k in SEANetConfig.__dataclass_fields__
    })
    kw = {
        k: v for k, v in mc.items()
        if k in ZooCodecConfig.__dataclass_fields__ and k not in ("seanet", "codec_type")
    }
    if "mel_range" in kw:
        kw["mel_range"] = tuple(kw["mel_range"])
    cfg = ZooCodecConfig(codec_type=codec_type, seanet=seanet, **kw)
    return build_zoo_codec(cfg)


def _build_speechlm(config):
    from llm_guided_asr_tpu.models.lm import TransformerLMConfig
    from llm_guided_asr_tpu.models.speechlm import SpeechLMConfig, SpeechLMModel

    mc = dict(config.get("model_conf", {}) or {})
    corelm = str(mc.get("corelm", "") or "").lower()
    if corelm:
        # multi-stream codec LM family (espnet2/speechlm/core_lm):
        # corelm: multiscale | valle | delay, nq code streams per frame
        from llm_guided_asr_tpu.models.speechlm_multistream import (
            CORE_LMS,
            MultiStreamLMConfig,
            MultiStreamLMModel,
        )

        if corelm not in CORE_LMS:
            raise ValueError(
                f"unknown corelm {corelm!r}; known: {sorted(CORE_LMS)}"
            )
        cfg = MultiStreamLMConfig.from_dict(mc)
        model = MultiStreamLMModel(cfg, corelm=corelm)
        names = ("dec_seq", "dec_seq_lengths")
        tn = 6 * cfg.nq
        dummy = (jnp.ones((2, tn), jnp.int32), jnp.asarray([tn, tn - cfg.nq]))
        return model, names, dummy
    unit_vocab = int(mc.get("unit_vocab_size", 256))
    lm_cfg = TransformerLMConfig(
        vocab_size=unit_vocab + 1,
        embed_unit=int(mc.get("embed_unit", 128)),
        att_unit=int(mc.get("att_unit", 256)),
        head=int(mc.get("head", 2)),
        unit=int(mc.get("unit", 512)),
        layer=int(mc.get("layer", 2)),
        dropout_rate=float(mc.get("dropout_rate", 0.1)),
    )
    model = SpeechLMModel(SpeechLMConfig(unit_vocab_size=unit_vocab, lm=lm_cfg))
    names = ("units", "units_lengths")
    dummy = (jnp.ones((2, 10), jnp.int32), jnp.asarray([10, 7]))
    return model, names, dummy


def _build_tts2(config):
    """tts2_type: transformer (AR unit decoder) | fastspeech2 (non-AR,
    fastspeech2_discrete.py — needs a durations stream; pitch/energy
    streams optional)."""
    mc = dict(config.get("model_conf", {}) or {})
    vocab = len(read_token_list(config["token_list"])) if config.get("token_list") else int(
        mc.get("vocab_size", 100)
    )
    tts2_type = mc.pop("tts2_type", "transformer")
    if tts2_type == "fastspeech2":
        from llm_guided_asr_tpu.models.tts2 import (
            FastSpeech2Discrete,
            FastSpeech2DiscreteConfig,
        )

        known = {f for f in FastSpeech2DiscreteConfig.__dataclass_fields__} - {
            "vocab_size"}
        cfg = FastSpeech2DiscreteConfig(
            vocab_size=vocab, **{k: v for k, v in mc.items() if k in known}
        )
        model = FastSpeech2Discrete(cfg)

        def batch_args(batch):
            return (
                batch["text"], batch["text_lengths"],
                batch["units"], batch["units_lengths"],
                batch["durations"], batch.get("durations_lengths"),
                batch.get("pitch"), batch.get("energy"),
            )

        dummy = (
            jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
            jnp.ones((2, 8), jnp.int32), jnp.asarray([8, 5]),
            jnp.full((2, 4), 2, jnp.int32), jnp.asarray([4, 3]),
            jnp.zeros((2, 4), jnp.float32), jnp.zeros((2, 4), jnp.float32),
        )
        return model, batch_args, dummy

    from llm_guided_asr_tpu.models.tts2 import TTS2Config, TTS2Model

    known = {f for f in TTS2Config.__dataclass_fields__} - {"vocab_size"}
    cfg = TTS2Config(vocab_size=vocab, **{k: v for k, v in mc.items() if k in known})
    model = TTS2Model(cfg)
    names = ("text", "text_lengths", "units", "units_lengths")
    dummy = (
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
        jnp.ones((2, 8), jnp.int32), jnp.asarray([8, 5]),
    )
    return model, names, dummy


TASK_BUILDERS: Dict[str, Callable] = {
    "enh": _build_enh,
    "spk": _build_spk,
    "tts": _build_tts,
    "hubert": _build_hubert,
    "s2t": _build_s2t,
    "diar": _build_diar,
    "mt": _build_mt,
    "whisper": _build_whisper,
    "pit_asr": _build_pit_asr,
    "discrete_asr": _build_discrete_asr,
    "slu": _build_slu,
    "asvspoof": _build_asvspoof,
    "s2st": _build_s2st,
    "svs": _build_svs,
    "codec": _build_codec,
    "speechlm": _build_speechlm,
    "tts2": _build_tts2,
}


def _build_enh_tse(config):
    """enh_tse task (espnet2/tasks/enh_tse.py): target-speaker extraction."""
    from llm_guided_asr_tpu.models.enh import EnhConfig, ESPnetTSEModel

    cfg = EnhConfig.from_dict(
        {**(config.get("model_conf") or {}), "num_spk": 1}
    )
    model = ESPnetTSEModel(cfg)

    def adapter(batch):
        return (
            batch["speech_mix"], batch["speech_mix_lengths"],
            batch["enroll"], batch["enroll_lengths"],
            batch["speech_ref1"],
        )

    dummy = (
        jnp.zeros((2, 2000), jnp.float32), jnp.asarray([2000, 1500]),
        jnp.zeros((2, 1200), jnp.float32), jnp.asarray([1200, 900]),
        jnp.zeros((2, 2000), jnp.float32),
    )
    return model, adapter, dummy


def _build_enh_s2t(config):
    """enh_s2t task (espnet2/tasks/enh_s2t.py): joint enhancement + ASR."""
    from llm_guided_asr_tpu.models.enh import EnhConfig, ESPnetEnhS2TModel
    from llm_guided_asr_tpu.tasks.asr import build_model as build_asr_model

    mc = dict(config.get("model_conf", {}) or {})
    enh_cfg = EnhConfig.from_dict({**(mc.get("enh_conf") or {}), "num_spk": 1})
    asr = build_asr_model({**config, "model_conf": mc.get("asr_conf") or {}})
    model = ESPnetEnhS2TModel(
        enh_cfg, asr, enh_weight=float(mc.get("enh_weight", 0.1))
    )

    def adapter(batch):
        return (
            batch["speech_mix"], batch["speech_mix_lengths"],
            batch["text"], batch["text_lengths"],
            batch.get("speech_ref1"),
        )

    dummy = (
        jnp.zeros((2, 2000), jnp.float32), jnp.asarray([2000, 1500]),
        jnp.asarray([[1, 2, -1], [1, -1, -1]], jnp.int32), jnp.asarray([2, 1]),
        jnp.zeros((2, 2000), jnp.float32),
    )
    return model, adapter, dummy


TASK_BUILDERS["enh_tse"] = _build_enh_tse
TASK_BUILDERS["enh_s2t"] = _build_enh_s2t

# GAN-trained tasks (uasr adversarial phone mapping; gan_tts/gan_codec train
# their discriminators likewise): routed through the two-optimizer loop in
# train/gan_trainer.py instead of the standard Trainer.
GAN_TASK_BUILDERS: Dict[str, Callable] = {}


def _build_uasr(config):
    """UASR (wav2vec-U style GAN ASR, espnet2/uasr/): ConvGenerator maps
    features to phone logits (masked BN + residual + strided conv), an
    optional join segmenter collapses argmax runs, a causal ConvDiscriminator
    separates generated distributions from one-hot unpaired text; criteria
    follow uasr/loss/ (BCE + gradient penalty + smoothness + diversity).
    Returns the gan_trainer contract."""
    from llm_guided_asr_tpu.models import uasr as U
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig, default_frontend

    mc = dict(config.get("model_conf", {}) or {})
    n_phones = (
        len(read_token_list(config["token_list"]))
        if config.get("token_list")
        else int(mc.get("n_phones", 40))
    )
    fcfg = FrontendConfig.from_dict(config.get("frontend_conf", {}) or {})
    known = {f.name for f in dataclasses.fields(U.UASRConfig)}
    cfg = U.UASRConfig(
        n_phones=n_phones, feat_dim=fcfg.n_mels,
        **{k: v for k, v in mc.items() if k in known and k not in ("n_phones", "feat_dim")},
    )
    gen = U.ConvGenerator(cfg)
    disc = U.ConvDiscriminator(cfg)

    def feats_of(batch):
        f = fcfg
        return default_frontend(
            batch["speech"], batch["speech_lengths"], fs=f.fs, n_fft=f.n_fft,
            hop_length=f.hop_length, n_mels=f.n_mels,
        )

    def generate(g_params, batch, rng, deterministic=False):
        feats, flens = feats_of(batch)
        if cfg.segmenter == "random" and not deterministic:
            feats, flens = U.random_pre_segment(
                jax.random.fold_in(rng, 1), feats, flens,
                cfg.segmenter_subsample_rate,
            )
        # training BN uses batch statistics; running stats are not carried
        # through the two-optimizer loop (deviation documented in models/uasr)
        (logits, inter_x, lens), _ = gen.apply(
            {"params": g_params}, feats, flens,
            deterministic=deterministic, mutable=["batch_stats"],
            rngs={} if deterministic else {"dropout": jax.random.fold_in(rng, 2)},
        )
        if cfg.segmenter == "join":
            logits, lens = U.join_logit_segment(
                logits, lens, mean_pool_join=cfg.segmenter_mean_pool_join
                or deterministic,
                remove_zeros=cfg.segmenter_remove_zeros,
                rng=None if deterministic else jax.random.fold_in(rng, 3),
            )
        return logits, inter_x, lens

    def sample(logits, rng, step=None):
        if cfg.use_gumbel:
            temp = U.gumbel_temperature(
                step if step is not None else jnp.asarray(0),
                cfg.max_temperature, cfg.min_temperature, cfg.decay_temperature,
            )
            return U.sample_generator_output(
                jax.random.fold_in(rng, 4), logits, temp, cfg.use_hard_gumbel
            )
        return jax.nn.softmax(logits, -1)

    def d_apply(d_params, x, lens):
        return disc.apply({"params": d_params}, x, lens)

    def g_loss_fn(g_params, d_params, batch, rng):
        logits, inter_x, lens = generate(g_params, batch, rng)
        fake = sample(logits, rng)
        d_fake = d_apply(d_params, fake, lens)
        bsz = logits.shape[0]
        adv, _ = U.discriminator_loss(
            d_fake, None, False, cfg.smoothing, cfg.smoothing_one_sided
        )
        smooth = U.smoothness_penalty(logits, lens, bsz)
        div = U.phoneme_diversity_loss(logits, lens, bsz)
        loss = (cfg.discriminator_loss_weight * adv
                + cfg.smoothness_weight * smooth
                + cfg.diversity_weight * div)
        return loss, {"loss": loss, "adv": adv, "smooth": smooth, "diversity": div}

    def d_loss_fn(d_params, g_params, batch, rng):
        logits, _, lens = generate(g_params, batch, rng)
        fake = jax.lax.stop_gradient(sample(logits, rng))
        real = U.one_hot_real_sample(batch["text"], cfg.n_phones)
        d_fake = d_apply(d_params, fake, lens)
        d_real = d_apply(d_params, real, batch["text_lengths"])
        l_fake, l_real = U.discriminator_loss(
            d_fake, d_real, True, cfg.smoothing, cfg.smoothing_one_sided
        )
        loss = cfg.discriminator_loss_weight * (l_fake + l_real)
        stats = {"loss": loss, "d_fake": l_fake, "d_real": l_real}
        if cfg.gradient_penalty_weight > 0:
            gp = U.gradient_penalty(
                d_apply, d_params, fake, real, jax.random.fold_in(rng, 5)
            )
            loss = loss + cfg.gradient_penalty_weight * gp
            stats = {**stats, "loss": loss, "gp": gp}
        return loss, stats

    g_dummy = (jnp.zeros((2, 16, cfg.feat_dim), jnp.float32), jnp.asarray([16, 12]))
    d_dummy = (jnp.zeros((2, 16, cfg.n_phones), jnp.float32), jnp.asarray([16, 12]))
    return gen, disc, g_loss_fn, d_loss_fn, g_dummy, d_dummy


GAN_TASK_BUILDERS["uasr"] = _build_uasr


def _build_gan_tts(config):
    """gan_tts task (espnet2/tasks/gan_tts.py): VITS generator + HiFiGAN
    multi-scale/period discriminator through the two-optimizer loop."""
    import optax

    from llm_guided_asr_tpu.models.hifigan import HiFiGANConfig, HiFiGANDiscriminator
    from llm_guided_asr_tpu.models.vits import (
        VITSConfig,
        VITSGenerator,
        make_vits_loss_fns,
    )
    from llm_guided_asr_tpu.ops.frontend import stft, stft_out_lengths

    mc = dict(config.get("model_conf", {}) or {})
    vocab = (
        len(read_token_list(config["token_list"]))
        if config.get("token_list")
        else int(mc.get("vocab_size", 100))
    )
    n_fft = int(mc.get("n_fft", 256))
    hop = int(mc.get("hop_length", 128))
    cfg = VITSConfig(
        vocab_size=vocab,
        spec_channels=n_fft // 2 + 1,
        hidden=int(mc.get("hidden", 64)),
        text_layers=int(mc.get("text_layers", 2)),
        text_heads=int(mc.get("text_heads", 2)),
        text_ffn=int(mc.get("text_ffn", 128)),
        posterior_layers=int(mc.get("posterior_layers", 3)),
        flow_layers=int(mc.get("flow_layers", 2)),
        segment_frames=int(mc.get("segment_frames", 16)),
        n_fft=n_fft,
        hop_length=hop,
        n_mels=int(mc.get("n_mels", 40)),
    )
    gen = VITSGenerator(cfg)
    disc = HiFiGANDiscriminator(cfg.hifigan)
    g_raw, d_raw = make_vits_loss_fns(gen, disc, cfg)

    def with_spec(batch):
        spec = jnp.abs(stft(batch["speech"], n_fft=n_fft, hop_length=hop))
        spec_lens = stft_out_lengths(batch["speech_lengths"], n_fft, hop)
        return {**batch, "spec": spec,
                "spec_lengths": jnp.clip(spec_lens, 0, spec.shape[1])}

    g_loss_fn = lambda gp, dp, b, r: g_raw(gp, dp, with_spec(b), r)
    d_loss_fn = lambda dp, gp, b, r: d_raw(dp, gp, with_spec(b), r)
    n0 = cfg.segment_frames * 2 * hop
    g_dummy = (
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
        jnp.zeros((2, cfg.segment_frames * 2, cfg.spec_channels), jnp.float32),
        jnp.asarray([cfg.segment_frames * 2] * 2),
        jax.random.PRNGKey(0),
    )
    d_dummy = (jnp.zeros((2, cfg.segment_frames * hop), jnp.float32),)
    return gen, disc, g_loss_fn, d_loss_fn, g_dummy, d_dummy


GAN_TASK_BUILDERS["gan_tts"] = _build_gan_tts


def _build_gan_svs(config):
    """gan_svs task (espnet2/tasks/gan_svs.py, VISinger): midi-conditioned
    VITS generator + HiFiGAN discriminator."""
    import optax

    from llm_guided_asr_tpu.models.hifigan import HiFiGANDiscriminator
    from llm_guided_asr_tpu.models.vits import (
        VITSConfig,
        VITSGenerator,
        make_vits_loss_fns,
    )
    from llm_guided_asr_tpu.ops.frontend import stft, stft_out_lengths

    mc = dict(config.get("model_conf", {}) or {})
    vocab = (
        len(read_token_list(config["token_list"]))
        if config.get("token_list")
        else int(mc.get("vocab_size", 100))
    )
    n_fft = int(mc.get("n_fft", 256))
    hop = int(mc.get("hop_length", 128))
    cfg = VITSConfig(
        vocab_size=vocab,
        spec_channels=n_fft // 2 + 1,
        hidden=int(mc.get("hidden", 64)),
        text_layers=int(mc.get("text_layers", 2)),
        text_heads=int(mc.get("text_heads", 2)),
        text_ffn=int(mc.get("text_ffn", 128)),
        posterior_layers=int(mc.get("posterior_layers", 3)),
        flow_layers=int(mc.get("flow_layers", 2)),
        segment_frames=int(mc.get("segment_frames", 16)),
        n_fft=n_fft,
        hop_length=hop,
        n_mels=int(mc.get("n_mels", 40)),
        n_midi=int(mc.get("n_midi", 129)),
    )
    gen = VITSGenerator(cfg)
    disc = HiFiGANDiscriminator(cfg.hifigan)
    g_raw, d_raw = make_vits_loss_fns(gen, disc, cfg)

    def with_spec(batch):
        spec = jnp.abs(stft(batch["speech"], n_fft=n_fft, hop_length=hop))
        spec_lens = stft_out_lengths(batch["speech_lengths"], n_fft, hop)
        return {**batch, "spec": spec,
                "spec_lengths": jnp.clip(spec_lens, 0, spec.shape[1]),
                "midi": jnp.maximum(batch["midi"], 0)}

    g_loss_fn = lambda gp, dp, b, r: g_raw(gp, dp, with_spec(b), r)
    d_loss_fn = lambda dp, gp, b, r: d_raw(dp, gp, with_spec(b), r)
    g_dummy = (
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
        jnp.zeros((2, cfg.segment_frames * 2, cfg.spec_channels), jnp.float32),
        jnp.asarray([cfg.segment_frames * 2] * 2),
        jax.random.PRNGKey(0),
        jnp.ones((2, 4), jnp.int32),
    )
    d_dummy = (jnp.zeros((2, cfg.segment_frames * hop), jnp.float32),)
    return gen, disc, g_loss_fn, d_loss_fn, g_dummy, d_dummy


GAN_TASK_BUILDERS["gan_svs"] = _build_gan_svs


def _build_jets(config):
    """jets task (espnet2/gan_tts/jets/): FastSpeech2+HiFiGAN joint E2E TTS
    with learned alignments, adversarial training."""
    from llm_guided_asr_tpu.models.hifigan import HiFiGANDiscriminator
    from llm_guided_asr_tpu.models.jets import (
        JETSConfig,
        JETSGenerator,
        make_jets_loss_fns,
    )
    from llm_guided_asr_tpu.ops.frontend import default_frontend

    mc = dict(config.get("model_conf", {}) or {})
    vocab = (
        len(read_token_list(config["token_list"]))
        if config.get("token_list")
        else int(mc.get("vocab_size", 100))
    )
    n_fft = int(mc.get("n_fft", 256))
    hop = int(mc.get("hop_length", 128))
    cfg = JETSConfig(
        vocab_size=vocab,
        n_mels=int(mc.get("n_mels", 40)),
        adim=int(mc.get("adim", 128)),
        heads=int(mc.get("heads", 2)),
        eunits=int(mc.get("eunits", 256)),
        elayers=int(mc.get("elayers", 2)),
        dlayers=int(mc.get("dlayers", 2)),
        segment_frames=int(mc.get("segment_frames", 16)),
        n_fft=n_fft,
        hop_length=hop,
    )
    gen = JETSGenerator(cfg)
    disc = HiFiGANDiscriminator(cfg.hifigan)
    g_raw, d_raw = make_jets_loss_fns(gen, disc, cfg)

    def with_mel(batch):
        mel, mel_lens = default_frontend(
            batch["speech"], batch["speech_lengths"], fs=cfg.fs, n_fft=n_fft,
            hop_length=hop, n_mels=cfg.n_mels,
        )
        return {**batch, "mel": mel,
                "mel_lengths": jnp.clip(mel_lens, 0, mel.shape[1])}

    g_loss_fn = lambda gp, dp, b, r: g_raw(gp, dp, with_mel(b), r)
    d_loss_fn = lambda dp, gp, b, r: d_raw(dp, gp, with_mel(b), r)
    g_dummy = (
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
        jnp.zeros((2, cfg.segment_frames * 2, cfg.n_mels), jnp.float32),
        jnp.asarray([cfg.segment_frames * 2] * 2),
        jax.random.PRNGKey(0),
    )
    d_dummy = (jnp.zeros((2, cfg.segment_frames * hop), jnp.float32),)
    return gen, disc, g_loss_fn, d_loss_fn, g_dummy, d_dummy


GAN_TASK_BUILDERS["jets"] = _build_jets


def _build_vocoder(config):
    """Standalone neural-vocoder training (gan_tts/{hifigan,melgan,
    parallel_wavegan} recipes): log-mel of a random speech segment ->
    waveform, adversarial.  model_conf.generator: hifigan | melgan;
    model_conf.discriminator: hifigan | pwg."""
    from llm_guided_asr_tpu.models.hifigan import (
        HiFiGANConfig,
        HiFiGANDiscriminator,
        HiFiGANGenerator,
        MelGANGenerator,
        ParallelWaveGANDiscriminator,
        make_vocoder_gan_loss_fns,
    )
    from llm_guided_asr_tpu.ops.frontend import default_frontend

    mc = dict(config.get("model_conf", {}) or {})
    n_fft = int(mc.get("n_fft", 256))
    hop = int(mc.get("hop_length", 128))
    n_mels = int(mc.get("n_mels", 40))
    seg = int(mc.get("segment_frames", 16))
    # factor hop into upsample rates (hop=128 -> (8,8,2) default works; other
    # hops use the provided rates)
    rates = tuple(mc.get("upsample_rates", (8, 8, 2)))
    hcfg = HiFiGANConfig(
        n_mels=n_mels, channels=int(mc.get("channels", 64)),
        upsample_rates=rates,
        upsample_kernels=tuple(mc.get("upsample_kernels",
                                      tuple(2 * r for r in rates))),
    )
    gtype = mc.get("generator", "hifigan")
    gen = (MelGANGenerator(hcfg) if gtype == "melgan"
           else HiFiGANGenerator(hcfg))
    dtype_ = mc.get("discriminator", "hifigan")
    disc = (ParallelWaveGANDiscriminator() if dtype_ == "pwg"
            else HiFiGANDiscriminator(hcfg))
    g_raw, d_raw = make_vocoder_gan_loss_fns(
        gen, disc, n_fft=n_fft, hop_length=hop, n_mels=n_mels,
        segment_frames=seg,
    )

    def with_mel(batch):
        mel, mel_lens = default_frontend(
            batch["speech"], batch["speech_lengths"], n_fft=n_fft,
            hop_length=hop, n_mels=n_mels,
        )
        return {**batch, "mel": mel,
                "mel_lengths": jnp.clip(mel_lens, 0, mel.shape[1])}

    g_loss_fn = lambda gp, dp, b, r: g_raw(gp, dp, with_mel(b), r)
    d_loss_fn = lambda dp, gp, b, r: d_raw(dp, gp, with_mel(b), r)
    g_dummy = (jnp.zeros((2, seg, n_mels), jnp.float32),)
    d_dummy = (jnp.zeros((2, seg * hop), jnp.float32),)
    return gen, disc, g_loss_fn, d_loss_fn, g_dummy, d_dummy


GAN_TASK_BUILDERS["vocoder"] = _build_vocoder


def _build_gan_codec(config):
    """gan_codec task (espnet2/tasks/gan_codec.py): codec generator +
    family-matched discriminator, adversarial reconstruction.  codec_type
    selects the architecture: soundstream (default, HiFiGAN disc) | encodec
    (MS-STFT disc) | dac (MSMPMB disc) | funcodec (complex-STFT disc)."""
    mc = dict(config.get("model_conf", {}) or {})
    codec_type = str(mc.pop("codec_type", "soundstream")).lower()
    if codec_type in ("encodec", "dac", "funcodec"):
        from llm_guided_asr_tpu.models.codec_zoo import (
            make_zoo_codec_gan_loss_fns,
        )

        gen, disc = _zoo_codec_from_conf(codec_type, mc)
        g_loss_fn, d_loss_fn = make_zoo_codec_gan_loss_fns(
            gen, disc,
            lambda_fm=float(mc.get("lambda_fm", 2.0)),
            lambda_mel=float(mc.get("lambda_mel", 45.0)),
            lambda_l1=float(mc.get("lambda_l1", 1.0)),
            mel_range=tuple(mc.get("mel_range", (6, 11))),
        )
        n0 = 4 * gen.cfg.seanet.frame_stride if codec_type != "funcodec" \
            else 8 * gen.cfg.hop_length
        g_dummy = (jnp.zeros((2, n0), jnp.float32),)
        return gen, disc, g_loss_fn, d_loss_fn, g_dummy, g_dummy

    from llm_guided_asr_tpu.models.codec import (
        CodecConfig,
        CodecModel,
        make_codec_gan_loss_fns,
    )
    from llm_guided_asr_tpu.models.hifigan import HiFiGANConfig, HiFiGANDiscriminator

    cfg = CodecConfig(
        channels=int(mc.get("channels", 64)),
        latent_dim=int(mc.get("latent_dim", 64)),
        strides=tuple(mc.get("strides", (4, 4, 8))),
        n_quantizers=int(mc.get("n_quantizers", 4)),
        codebook_size=int(mc.get("codebook_size", 256)),
        commitment_weight=float(mc.get("commitment_weight", 0.25)),
    )
    gen = CodecModel(cfg)
    disc = HiFiGANDiscriminator(HiFiGANConfig())
    g_loss_fn, d_loss_fn = make_codec_gan_loss_fns(
        gen, disc,
        lambda_fm=float(mc.get("lambda_fm", 2.0)),
        lambda_mel=float(mc.get("lambda_mel", 45.0)),
        lambda_l1=float(mc.get("lambda_l1", 1.0)),
    )
    n0 = 4 * int(jnp.prod(jnp.asarray(cfg.strides)))
    g_dummy = (jnp.zeros((2, n0), jnp.float32),)
    d_dummy = (jnp.zeros((2, n0), jnp.float32),)
    return gen, disc, g_loss_fn, d_loss_fn, g_dummy, d_dummy


GAN_TASK_BUILDERS["gan_codec"] = _build_gan_codec


class GenericTask:
    defaults = GENERIC_DEFAULTS

    @classmethod
    def get_default_config(cls):
        import copy

        return copy.deepcopy(cls.defaults)

    @classmethod
    def build(cls, config: Dict[str, Any]):
        task = config.get("task")
        if task not in TASK_BUILDERS:
            raise ValueError(f"unknown task {task!r}; known: {sorted(TASK_BUILDERS)}")
        return TASK_BUILDERS[task](config)

    @classmethod
    def main(cls, cmd: Sequence[str]):
        from llm_guided_asr_tpu.tasks.asr import build_dataset, build_iter_factory
        from llm_guided_asr_tpu.utils.devices import resolve_device

        config = build_config(cmd, cls.get_default_config())
        resolve_device(config.get("device"))
        if config.get("task") in GAN_TASK_BUILDERS:
            return cls._gan_main(config)
        output_dir = Path(config["output_dir"])
        output_dir.mkdir(parents=True, exist_ok=True)
        logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
        # build (and thus validate) BEFORE dumping the config artifact, so a
        # bad invocation can never clobber a valid exp dir's config.yaml
        model, batch_args, dummy = cls.build(config)
        dump_yaml(config, output_dir / "config.yaml")
        if config.get("dry_run"):
            return None
        rngs = {
            "params": jax.random.PRNGKey(int(config.get("seed", 0))),
            "dropout": jax.random.PRNGKey(1),
            "mask": jax.random.PRNGKey(2),
        }
        variables = dict(model.init(rngs, *dummy, deterministic=True))
        variables = _merge_pretrained(model, variables)
        if (
            config.get("task") == "mt"
            and config.get("encoder") == "hugging_face"
            and not config.get("_skip_llm_weights")
        ):
            # pretrained token-encoder weights (hugging_face_transformers_
            # encoder.py AutoModel.from_pretrained analog)
            from llm_guided_asr_tpu.models.hf_encoder import load_hf_encoder_params

            _, pre = load_hf_encoder_params(
                (config.get("encoder_conf", {}) or {})["model_name_or_path"]
            )
            variables["params"] = {
                **variables["params"],
                "hf_encoder": {**variables["params"]["hf_encoder"], **pre},
            }

        tx = build_optimizer(
            config.get("optim", "adam"), config.get("optim_conf"),
            config.get("scheduler"), config.get("scheduler_conf"),
            grad_clip=config.get("grad_clip", 5.0),
        )
        train_ds = build_dataset(config, config["train_data_path_and_name_and_type"])
        valid_ds = build_dataset(config, config["valid_data_path_and_name_and_type"])
        train_iter = build_iter_factory(config, train_ds, shuffle=True)
        valid_iter = build_iter_factory(config, valid_ds, shuffle=False)

        epoch_eval_fn = None
        if config.get("task") == "spk" and config.get("spk_trials"):
            epoch_eval_fn = _make_spk_trial_eval(
                model, valid_ds, config["spk_trials"],
                pad_multiple=int(config.get("speech_pad_multiple", 1600)),
            )
        options = TrainerOptions(
            max_epoch=int(config.get("max_epoch", 40)),
            accum_grad=int(config.get("accum_grad", 1)),
            log_interval=int(config.get("log_interval", 100)),
            patience=config.get("patience"),
            keep_nbest_models=int(config.get("keep_nbest_models", 10)),
            best_model_criterion=[tuple(c) for c in config.get("best_model_criterion")],
            resume=bool(config.get("resume", False)),
            seed=int(config.get("seed", 0)),
            batch_args=batch_args,
            epoch_eval_fn=epoch_eval_fn,
        )
        return Trainer.run(model, variables, tx, train_iter, valid_iter, output_dir, options)

    @classmethod
    def _gan_main(cls, config: Dict[str, Any]):
        """Two-optimizer adversarial training (gan_trainer.py contract);
        used by uasr (and the gan_tts/gan_codec discriminator phases)."""
        from llm_guided_asr_tpu.tasks.asr import build_dataset, build_iter_factory
        from llm_guided_asr_tpu.train.checkpoint import save_pytree
        from llm_guided_asr_tpu.train.gan_trainer import make_gan_steps
        from llm_guided_asr_tpu.train.reporter import Reporter

        output_dir = Path(config["output_dir"])
        output_dir.mkdir(parents=True, exist_ok=True)
        logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
        gen, disc, g_loss_fn, d_loss_fn, g_dummy, d_dummy = GAN_TASK_BUILDERS[
            config["task"]
        ](config)
        dump_yaml(config, output_dir / "config.yaml")
        if config.get("dry_run"):
            return None
        seed = int(config.get("seed", 0))
        g_params = gen.init(jax.random.PRNGKey(seed), *g_dummy)["params"]
        d_params = disc.init(jax.random.PRNGKey(seed + 1), *d_dummy)["params"]
        oc = dict(config.get("optim_conf", {}) or {})
        import optax

        g_tx = optax.adam(float(oc.get("g_lr", oc.get("lr", 2e-4))))
        d_tx = optax.adam(float(oc.get("d_lr", oc.get("lr", 2e-4))))
        g_opt, d_opt = g_tx.init(g_params), d_tx.init(d_params)
        g_step, d_step = make_gan_steps(g_loss_fn, d_loss_fn, g_tx, d_tx)

        train_ds = build_dataset(config, config["train_data_path_and_name_and_type"])
        train_iter = build_iter_factory(config, train_ds, shuffle=True)
        reporter = Reporter()
        rng = jax.random.PRNGKey(seed)
        for epoch in range(1, int(config.get("max_epoch", 40)) + 1):
            reporter.set_epoch(epoch)
            sub = reporter.start_phase("train")
            for it, batch in enumerate(train_iter(epoch)):
                batch = {k: v for k, v in batch.items() if not k.startswith("_")}
                it_rng = jax.random.fold_in(jax.random.fold_in(rng, epoch), it)
                d_params, d_opt, d_loss, d_stats = d_step(
                    g_params, d_params, d_opt, batch, it_rng
                )
                g_params, g_opt, g_loss, g_stats = g_step(
                    g_params, d_params, g_opt, batch, it_rng
                )
                sub.register(
                    {**{f"g_{k}": float(v) for k, v in g_stats.items()},
                     **{f"d_{k}": float(v) for k, v in d_stats.items()}}
                )
                sub.log_interval(int(config.get("log_interval", 100)))
            reporter.finish_phase(sub)
            reporter.log_epoch()
            save_pytree(output_dir / "checkpoint.msgpack",
                        {"generator": g_params, "discriminator": d_params})
        reporter.dump(output_dir / "reporter.json")
        return {"generator": g_params, "discriminator": d_params}

    @classmethod
    def build_model_from_file(cls, config_file, model_file=None):
        from llm_guided_asr_tpu.utils.config import load_yaml

        config = {**cls.get_default_config(), **load_yaml(config_file)}
        model, batch_args, dummy = cls.build(config)
        rngs = {
            "params": jax.random.PRNGKey(int(config.get("seed", 0))),
            "dropout": jax.random.PRNGKey(1),
            "mask": jax.random.PRNGKey(2),
        }
        variables = dict(model.init(rngs, *dummy, deterministic=True))
        variables = _merge_pretrained(model, variables)
        if model_file is not None:
            variables = merge_loaded(variables, load_pytree(model_file))
        return model, variables, config
