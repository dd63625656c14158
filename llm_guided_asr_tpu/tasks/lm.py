"""LM task: train a Transformer/RNN LM for shallow fusion + perplexity.

Rebuild of espnet2/tasks/lm.py (LMTask) on the shared ASR-task machinery.
The decode-time hookup (lm as a full scorer weighted by --lm_weight) lives in
bin/asr_inference.py (asr_inference.py:184-196 analog).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.models.lm import (
    ESPnetLanguageModel,
    SequentialRNNLM,
    SequentialRNNLMConfig,
    TransformerLM,
    TransformerLMConfig,
)
from llm_guided_asr_tpu.train.checkpoint import load_pytree, merge_loaded
from llm_guided_asr_tpu.train.optim import build_optimizer
from llm_guided_asr_tpu.train.trainer import Trainer, TrainerOptions
from llm_guided_asr_tpu.utils.config import build_config, dump_yaml, read_token_list

logger = logging.getLogger(__name__)

LM_DEFAULTS: Dict[str, Any] = {
    "token_type": "char",
    "token_list": None,
    "bpemodel": None,
    "lm": "transformer",  # transformer | seq_rnn
    "lm_conf": {},
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
    "batch_size": 64,
    "batch_bins": 1000000,
    "num_iters_per_epoch": None,
    "sort_in_batch": "descending",
    "train_data_path_and_name_and_type": [],
    "valid_data_path_and_name_and_type": [],
    "text_pad_multiple": 8,
    "output_dir": "exp/lm",
    "collect_stats": False,
    "dry_run": False,
    "device": None,
}


def build_lm(config: Dict[str, Any], dtype=jnp.float32) -> ESPnetLanguageModel:
    vocab_size = len(read_token_list(config["token_list"]))
    lm_type = config.get("lm", "transformer")
    conf = dict(config.get("lm_conf", {}) or {})
    if lm_type == "transformer":
        lm = TransformerLM(TransformerLMConfig.from_dict(conf, vocab_size), dtype=dtype)
    elif lm_type in ("seq_rnn", "sequential_rnn"):
        lm = SequentialRNNLM(SequentialRNNLMConfig.from_dict(conf, vocab_size), dtype=dtype)
    else:
        raise ValueError(f"unknown lm type {lm_type!r}")
    return ESPnetLanguageModel(lm=lm, vocab_size=vocab_size)


def init_lm_variables(model: ESPnetLanguageModel, seed: int = 0) -> Dict:
    text = jnp.asarray([[1, 2, 3], [1, -1, -1]], jnp.int32)
    lens = jnp.asarray([3, 1], jnp.int32)
    return model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)},
        text, lens, deterministic=True,
    )


class LMTask:
    defaults = LM_DEFAULTS

    @classmethod
    def get_default_config(cls):
        import copy

        return copy.deepcopy(cls.defaults)

    @classmethod
    def main(cls, cmd: Sequence[str]):
        from llm_guided_asr_tpu.tasks.asr import (
            build_dataset,
            build_iter_factory,
        )
        from llm_guided_asr_tpu.utils.devices import resolve_device

        config = build_config(cmd, cls.get_default_config())
        resolve_device(config.get("device"))
        output_dir = Path(config["output_dir"])
        output_dir.mkdir(parents=True, exist_ok=True)
        logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
        dump_yaml(config, output_dir / "config.yaml")
        if config.get("dry_run"):
            return None

        model = build_lm(config)
        variables = init_lm_variables(model, int(config.get("seed", 0)))
        tx = build_optimizer(
            config.get("optim", "adam"), config.get("optim_conf"),
            config.get("scheduler"), config.get("scheduler_conf"),
            grad_clip=config.get("grad_clip", 5.0),
        )
        # LM data has no speech: pad only text
        config = {**config, "speech_pad_multiple": 1}
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
            batch_args=("text", "text_lengths"),
        )
        return Trainer.run(model, variables, tx, train_iter, valid_iter, output_dir, options)

    @classmethod
    def build_model_from_file(
        cls,
        config_file: Union[str, Path],
        model_file: Optional[Union[str, Path]] = None,
        dtype=jnp.float32,
    ) -> Tuple[ESPnetLanguageModel, Dict, Dict[str, Any]]:
        from llm_guided_asr_tpu.utils.config import load_yaml

        config = {**cls.get_default_config(), **load_yaml(config_file)}
        model = build_lm(config, dtype=dtype)
        variables = init_lm_variables(model, int(config.get("seed", 0)))
        if model_file is not None:
            variables = merge_loaded(dict(variables), load_pytree(model_file))
        return model, variables, config


def calc_perplexity(
    config_file: Union[str, Path],
    model_file: Union[str, Path],
    data_path_and_name_and_type: Sequence[Tuple[str, str, str]],
    batch_size: int = 32,
) -> float:
    """Corpus perplexity (espnet2/bin/lm_calc_perplexity.py analog)."""
    from llm_guided_asr_tpu.tasks.asr import build_dataset

    model, variables, config = LMTask.build_model_from_file(config_file, model_file)
    ds = build_dataset(
        {**config, "token_list": config["token_list"]}, data_path_and_name_and_type
    )

    @jax.jit
    def nll_fn(text, lens):
        return model.apply(variables, text, lens, method=model.nll)

    total_nll, total_tok = 0.0, 0
    keys = list(ds.keys)
    for i in range(0, len(keys), batch_size):
        chunk = keys[i : i + batch_size]
        arrays = [np.asarray(ds[k]["text"]) for k in chunk]
        maxlen = max(a.shape[0] for a in arrays)
        text = np.full((len(chunk), maxlen), -1, np.int32)
        for j, a in enumerate(arrays):
            text[j, : a.shape[0]] = a
        lens = np.asarray([a.shape[0] for a in arrays], np.int32)
        nll, counts = nll_fn(jnp.asarray(text), jnp.asarray(lens))
        total_nll += float(jnp.sum(nll))
        total_tok += int(jnp.sum(counts))
    return float(np.exp(total_nll / max(total_tok, 1)))
