"""Generic task runner for the remaining domains: enh, spk, tts, hubert, s2t.

The reference gives every domain its own AbsTask subclass (espnet2/tasks/);
here one registry supplies (model builder, init-variable builder, batch-arg
mapping) per task and the shared Trainer does the rest.  Each task trains
from the same YAML/CLI surface as ASRTask:

  python -m llm_guided_asr_tpu.bin.train --task enh --config conf.yaml ...
"""

from __future__ import annotations

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
    "text_pad_multiple": 8,
    "output_dir": "exp/run",
    "dry_run": False,
    "device": None,
}


# ---------------------------------------------------------------------------
# per-task builders
# ---------------------------------------------------------------------------

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
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig

    mc = dict(config.get("model_conf", {}) or {})
    cfg = SpkConfig(
        n_speakers=int(mc.get("n_speakers", 100)),
        frontend=FrontendConfig.from_dict(config.get("frontend_conf", {}) or {}),
        hidden=int(mc.get("hidden", 256)),
        layers=int(mc.get("layers", 3)),
        embed_dim=int(mc.get("embed_dim", 192)),
        aam_margin=float(mc.get("aam_margin", 0.2)),
        aam_scale=float(mc.get("aam_scale", 30.0)),
    )
    model = SpeakerModel(cfg)
    names = ("speech", "speech_lengths", "spk_labels", "spk_labels_lengths")
    dummy = (
        jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
        jnp.zeros((2, 1), jnp.int32), jnp.asarray([1, 1]),
    )
    return model, names, dummy


def _build_tts(config):
    from llm_guided_asr_tpu.models.tts import FastSpeech2, FastSpeech2Config

    mc = dict(config.get("model_conf", {}) or {})
    vocab = len(read_token_list(config["token_list"])) if config.get("token_list") else int(
        mc.get("vocab_size", 100)
    )
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
        return (
            batch["text"], batch["text_lengths"],
            batch["speech"], batch["speech_lengths"],
            batch["durations"], batch.get("durations_lengths"),
            batch.get("pitch"), batch.get("energy"),
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
             "mask_prob", "mask_span"}
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
    names = (
        "speech", "speech_lengths", "text", "text_lengths",
        "text_prev", "text_prev_lengths", "text_ctc", "text_ctc_lengths",
    )
    dummy = (
        jnp.zeros((2, 4000), jnp.float32), jnp.asarray([4000, 4000]),
        jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
        jnp.ones((2, 2), jnp.int32), jnp.asarray([2, 0]),
        jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
    )
    return model, names, dummy


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
    cfg = MTConfig(
        vocab_size=vocab,
        adim=int(mc.get("adim", 256)),
        heads=int(mc.get("heads", 4)),
        units=int(mc.get("units", 1024)),
        elayers=int(mc.get("elayers", 6)),
        decoder=TransformerDecoderConfig.from_dict(config.get("decoder_conf", {}) or {}),
        lsm_weight=float(mc.get("lsm_weight", 0.1)),
    )
    model = MTModel(cfg)
    names = ("text", "text_lengths", "src_text", "src_text_lengths")
    dummy = (
        jnp.ones((2, 3), jnp.int32), jnp.asarray([3, 2]),
        jnp.ones((2, 4), jnp.int32), jnp.asarray([4, 3]),
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
}


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

        tx = build_optimizer(
            config.get("optim", "adam"), config.get("optim_conf"),
            config.get("scheduler"), config.get("scheduler_conf"),
            grad_clip=config.get("grad_clip", 5.0),
        )
        train_ds = build_dataset(config, config["train_data_path_and_name_and_type"])
        valid_ds = build_dataset(config, config["valid_data_path_and_name_and_type"])
        train_iter = build_iter_factory(config, train_ds, shuffle=True)
        valid_iter = build_iter_factory(config, valid_ds, shuffle=False)

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
        )
        return Trainer.run(model, variables, tx, train_iter, valid_iter, output_dir, options)

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
        if model_file is not None:
            variables = merge_loaded(variables, load_pytree(model_file))
        return model, variables, config
