"""ST task: LLM-guided speech translation (espnet2/tasks/st.py analog).

Wires LLMGuidedSTModel (llm_guided_st_model.py:41 rebuild) into the shared
trainer with (speech, text=target, src_text=source-transcript) batches.
The source side reuses the LLM tokenizer by default (the fork's recipes use
token_type hugging_face for both sides).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from llm_guided_asr_tpu.models.llm_guided import _resolve_llm_spec, load_llm_params
from llm_guided_asr_tpu.models.llm_guided_st import LLMGuidedSTConfig, LLMGuidedSTModel
from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.ops.frontend import FrontendConfig
from llm_guided_asr_tpu.ops.specaug import SpecAugConfig
from llm_guided_asr_tpu.train.checkpoint import load_pytree, merge_loaded
from llm_guided_asr_tpu.train.optim import build_optimizer, path_prefix_mask
from llm_guided_asr_tpu.train.trainer import Trainer, TrainerOptions
from llm_guided_asr_tpu.utils.config import build_config, dump_yaml, read_token_list

logger = logging.getLogger(__name__)

ST_DEFAULTS: Dict[str, Any] = {
    "token_type": "hugging_face",
    "src_token_type": None,  # defaults to token_type
    "token_list": None,
    "src_token_list": None,
    "bpemodel": None,
    "model": "llm_guided_st",
    "model_conf": {},
    "llm": "llama",
    "llm_conf": {},
    "frontend": "default",
    "frontend_conf": {},
    "specaug": None,
    "specaug_conf": {},
    "normalize": "global_mvn",
    "normalize_conf": {},
    "encoder": "conformer",
    "encoder_conf": {},
    "decoder": "llm_guided_transformer_decoder",
    "decoder_conf": {},
    "extra_asr_decoder_conf": None,
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
    "init_param": [],
    "freeze_param": [],
    "batch_type": "numel",
    "batch_size": 20,
    "batch_bins": 1000000,
    "fold_length": 80000,
    "num_iters_per_epoch": None,
    "sort_in_batch": "descending",
    "train_data_path_and_name_and_type": [],
    "valid_data_path_and_name_and_type": [],
    "speech_pad_multiple": 1600,
    "text_pad_multiple": 8,
    "output_dir": "exp/st",
    "collect_stats": False,
    "dry_run": False,
    "device": None,
}


def build_st_model(config: Dict[str, Any], dtype=jnp.float32) -> LLMGuidedSTModel:
    llm_conf = dict(config.get("llm_conf", {}) or {})
    spec = _resolve_llm_spec(llm_conf)
    model_conf = dict(config.get("model_conf", {}) or {})

    frontend = None
    if config.get("frontend", "default") not in (None, "none"):
        frontend = FrontendConfig.from_dict(config.get("frontend_conf", {}) or {})
    spec_aug = None
    if config.get("specaug") == "specaug":
        spec_aug = SpecAugConfig.from_dict(config.get("specaug_conf", {}) or {})

    src_vocab = spec["llm_config"].vocab_size
    if config.get("src_token_list"):
        src_vocab = len(read_token_list(config["src_token_list"]))

    extra = None
    if config.get("extra_asr_decoder_conf"):
        extra = TransformerDecoderConfig.from_dict(config["extra_asr_decoder_conf"])

    cfg = LLMGuidedSTConfig(
        vocab_size=spec["llm_config"].vocab_size,
        src_vocab_size=src_vocab,
        llm=spec["llm_config"],
        prompt=spec["template"],
        frontend=frontend,
        specaug=spec_aug,
        normalize=config.get("normalize") or "none",
        encoder_type=config.get("encoder", "conformer"),
        encoder=ConformerConfig.from_dict(config.get("encoder_conf", {}) or {}),
        decoder=TransformerDecoderConfig.from_dict(config.get("decoder_conf", {}) or {}),
        extra_asr_decoder=extra,
        asr_weight=float(model_conf.get("asr_weight", 0.3)),
        mtlalpha=float(model_conf.get("mtlalpha", 0.5)),
        lsm_weight=float(model_conf.get("lsm_weight", 0.0)),
        length_normalized_loss=bool(model_conf.get("length_normalized_loss", False)),
    )
    llm_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.bfloat16}[
        llm_conf.get("dtype", "float32")
    ]
    return LLMGuidedSTModel(cfg, dtype=dtype, llm_dtype=llm_dtype)


def init_st_variables(model: LLMGuidedSTModel, config: Dict[str, Any], seed: int = 0) -> Dict:
    f = model.cfg.frontend
    s = max((f.n_fft if f else 512) * 4, 2048)
    dummy = (
        jnp.zeros((2, s), jnp.float32), jnp.asarray([s, s], jnp.int32),
        jnp.asarray([[1, 2, -1], [1, -1, -1]], jnp.int32), jnp.asarray([2, 1], jnp.int32),
        jnp.asarray([[1, 2, -1], [1, -1, -1]], jnp.int32), jnp.asarray([2, 1], jnp.int32),
    )
    variables = dict(
        model.init(
            {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)},
            *dummy, deterministic=True,
        )
    )
    stats_file = (config.get("normalize_conf") or {}).get("stats_file")
    if model.cfg.normalize == "global_mvn" and stats_file:
        from llm_guided_asr_tpu.tasks.asr import load_mvn_stats

        variables["mvn"] = load_mvn_stats(stats_file)
    if not config.get("_skip_llm_weights"):
        variables["params"] = {**variables["params"], "llm": load_llm_params(config)}
    return variables


class STTask:
    defaults = ST_DEFAULTS

    @classmethod
    def get_default_config(cls):
        import copy

        return copy.deepcopy(cls.defaults)

    @classmethod
    def main(cls, cmd: Sequence[str]):
        from llm_guided_asr_tpu.tasks.asr import (
            build_dataset,
            build_iter_factory,
            translate_param_path,
        )
        from llm_guided_asr_tpu.utils.devices import resolve_device

        config = build_config(cmd, cls.get_default_config())
        resolve_device(config.get("device"))
        output_dir = Path(config["output_dir"])
        output_dir.mkdir(parents=True, exist_ok=True)
        logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
        # build (and thus validate) BEFORE dumping the config artifact
        model = build_st_model(config)
        dump_yaml(config, output_dir / "config.yaml")
        if config.get("dry_run"):
            return None

        variables = init_st_variables(model, config, int(config.get("seed", 0)))

        freeze = [translate_param_path(f) for f in (config.get("freeze_param") or [])]
        if "llm" not in freeze:
            freeze.append("llm")
        freeze_mask = path_prefix_mask(variables["params"], freeze)
        tx = build_optimizer(
            config.get("optim", "adam"), config.get("optim_conf"),
            config.get("scheduler"), config.get("scheduler_conf"),
            grad_clip=config.get("grad_clip", 5.0), freeze_mask=freeze_mask,
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
            exclude_prefixes=("params/llm",),
            batch_args=(
                "speech", "speech_lengths", "text", "text_lengths",
                "src_text", "src_text_lengths",
            ),
        )
        return Trainer.run(model, variables, tx, train_iter, valid_iter, output_dir, options)

    @classmethod
    def build_model_from_file(
        cls, config_file, model_file=None, dtype=jnp.float32
    ) -> Tuple[LLMGuidedSTModel, Dict, Dict[str, Any]]:
        from llm_guided_asr_tpu.utils.config import load_yaml

        config = {**cls.get_default_config(), **load_yaml(config_file)}
        model = build_st_model(config, dtype=dtype)
        variables = init_st_variables(model, config, int(config.get("seed", 0)))
        if model_file is not None:
            variables = merge_loaded(variables, load_pytree(model_file))
        return model, variables, config
