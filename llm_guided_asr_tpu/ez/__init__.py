"""High-level Python API: train/infer without recipe scp files.

Rebuild of espnetez/ (task.py, trainer.py, dataset.py — "ESPnet without
recipes", SURVEY.md L10): bring your own in-memory dataset (dict of
uid -> {"speech": array, "text": str}) and a config dict; the Trainer wires
tokenization, batching, and the shared training runtime.

    import llm_guided_asr_tpu.ez as ez
    trainer = ez.Trainer(task="asr", config=cfg, train_dataset=d1,
                         valid_dataset=d2, output_dir="exp/run")
    trainer.collect_stats()   # optional, for global_mvn
    trainer.train()
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Callable, Dict, Mapping, Optional, Sequence, Union

import numpy as np

logger = logging.getLogger(__name__)


class ESPnetEZDataset:
    """In-memory dataset adapter (espnetez/dataset.py analog).

    data: mapping uid -> {"speech": np.ndarray | wav path, "text": str, ...}
    """

    def __init__(self, data: Mapping[str, Dict[str, Any]], preprocess=None):
        self.data = dict(data)
        self.keys = sorted(self.data)
        self.preprocess = preprocess

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, uid: str) -> Dict[str, Any]:
        item = dict(self.data[uid])
        if isinstance(item.get("speech"), (str, Path)):
            from llm_guided_asr_tpu.data.fileio import read_audio

            _, item["speech"] = read_audio(str(item["speech"]))
        if self.preprocess is not None:
            item = self.preprocess(uid, item)
        return item


class Trainer:
    """espnetez/trainer.py analog over the shared task machinery."""

    def __init__(
        self,
        task: str,
        config: Dict[str, Any],
        train_dataset: Union[ESPnetEZDataset, Mapping],
        valid_dataset: Union[ESPnetEZDataset, Mapping],
        output_dir: Union[str, Path],
    ):
        from llm_guided_asr_tpu.tasks.generic import TASK_BUILDERS

        if task not in ("asr", "lm", "st") and task not in TASK_BUILDERS:
            raise ValueError(
                f"unsupported task {task!r} (asr, lm, st, or one of "
                f"{sorted(TASK_BUILDERS)})"
            )
        self.task = task
        self.output_dir = Path(output_dir)
        if task in TASK_BUILDERS and task not in ("asr", "lm", "st"):
            from llm_guided_asr_tpu.tasks.generic import GenericTask

            self.config = {**GenericTask.get_default_config(), **config,
                           "task": task}
        elif task == "lm":
            from llm_guided_asr_tpu.tasks.lm import LMTask

            self.config = {**LMTask.get_default_config(), **config}
        elif task == "st":
            from llm_guided_asr_tpu.tasks.st import STTask

            self.config = {**STTask.get_default_config(), **config}
        else:
            from llm_guided_asr_tpu.tasks.asr import ASRTask

            self.config = {**ASRTask.get_default_config(), **config}
        self.config["output_dir"] = str(self.output_dir)

        from llm_guided_asr_tpu.tasks.asr import build_preprocess_fn

        has_text = (self.config.get("token_list")
                    or self.config.get("token_type") == "hugging_face")
        pre = build_preprocess_fn(self.config) if has_text else None
        self.train_dataset = self._wrap(train_dataset, pre)
        self.valid_dataset = self._wrap(valid_dataset, pre)

    @staticmethod
    def _wrap(ds, pre) -> ESPnetEZDataset:
        if isinstance(ds, ESPnetEZDataset):
            ds.preprocess = pre
            return ds
        return ESPnetEZDataset(ds, pre)

    def _iter_factory(self, dataset, shuffle: bool):
        from llm_guided_asr_tpu.data.dataset import CommonCollateFn
        from llm_guided_asr_tpu.data.iterator import SequenceIterFactory
        from llm_guided_asr_tpu.data.samplers import build_batch_sampler

        cfg = self.config
        lengths = {}
        for k in dataset.keys:
            item = dataset[k]
            first = item.get("speech", item.get("text"))
            if first is None:  # generic tasks: first array-valued stream
                first = next(v for v in item.values()
                             if hasattr(np.asarray(v), "shape")
                             and np.asarray(v).ndim >= 1)
            lengths[k] = int(np.asarray(first).shape[0])
        batches = build_batch_sampler(
            cfg.get("batch_type", "sorted"),
            dataset.keys,
            lengths=lengths,
            batch_size=int(cfg.get("batch_size", 8)),
            batch_bins=int(cfg.get("batch_bins", 1000000)),
        )
        collate = CommonCollateFn(
            pad_multiples={
                "speech": int(cfg.get("speech_pad_multiple", 1600)),
                "text": int(cfg.get("text_pad_multiple", 8)),
            }
        )
        return SequenceIterFactory(
            dataset, batches, collate, shuffle=shuffle, seed=int(cfg.get("seed", 0))
        )

    def collect_stats(self) -> Path:
        """Compute feats_stats.npz from the train dataset; wires it into config."""
        import jax
        import jax.numpy as jnp

        from llm_guided_asr_tpu.tasks.asr import build_model, init_model_variables

        cfg = {**self.config, "_skip_llm_weights": True}
        model = build_model(cfg)
        variables = init_model_variables(model, cfg)

        @jax.jit
        def feats_fn(speech, lens):
            return model.apply(variables, speech, lens, method=model.collect_feats)

        count, s, sq = 0, None, None
        for uid in self.train_dataset.keys:
            speech = np.asarray(self.train_dataset[uid]["speech"], np.float32)
            out = feats_fn(jnp.asarray(speech[None]), jnp.asarray([len(speech)]))
            feats = np.asarray(out["feats"])[0, : int(out["feats_lengths"][0])]
            count += feats.shape[0]
            s = feats.sum(0) if s is None else s + feats.sum(0)
            sq = (feats**2).sum(0) if sq is None else sq + (feats**2).sum(0)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        stats = self.output_dir / "feats_stats.npz"
        np.savez(stats, count=count, sum=s, sum_square=sq)
        self.config.setdefault("normalize_conf", {})["stats_file"] = str(stats)
        return stats

    def train(self):
        from llm_guided_asr_tpu.tasks.asr import (
            apply_init_param,
            build_model,
            init_model_variables,
            translate_param_path,
        )
        from llm_guided_asr_tpu.train.optim import build_optimizer, path_prefix_mask
        from llm_guided_asr_tpu.train.trainer import Trainer as CoreTrainer
        from llm_guided_asr_tpu.train.trainer import TrainerOptions
        from llm_guided_asr_tpu.utils.config import dump_yaml

        cfg = self.config
        self.output_dir.mkdir(parents=True, exist_ok=True)
        dump_yaml({k: v for k, v in cfg.items() if not k.startswith("_")},
                  self.output_dir / "config.yaml")

        if self.task not in ("asr", "lm", "st"):
            # generic-domain task (espnetez covers every task the same way)
            import jax

            from llm_guided_asr_tpu.tasks.generic import GenericTask

            model, batch_args, dummy = GenericTask.build(cfg)
            rngs = {
                "params": jax.random.PRNGKey(int(cfg.get("seed", 0))),
                "dropout": jax.random.PRNGKey(1),
                "mask": jax.random.PRNGKey(2),
            }
            variables = dict(model.init(rngs, *dummy, deterministic=True))
        elif self.task == "lm":
            from llm_guided_asr_tpu.tasks.lm import build_lm, init_lm_variables

            model = build_lm(cfg)
            variables = init_lm_variables(model, int(cfg.get("seed", 0)))
            batch_args = ("text", "text_lengths")
        else:
            model = build_model(cfg)
            variables = init_model_variables(model, cfg, int(cfg.get("seed", 0)))
            if cfg.get("init_param"):
                variables = apply_init_param(variables, cfg["init_param"])
            batch_args = ("speech", "speech_lengths", "text", "text_lengths")

        freeze = [translate_param_path(f) for f in (cfg.get("freeze_param") or [])]
        if cfg.get("model") == "llm_guided_asr" and "llm" not in freeze:
            freeze.append("llm")
        mask = path_prefix_mask(variables["params"], freeze) if freeze else None
        tx = build_optimizer(
            cfg.get("optim", "adam"), cfg.get("optim_conf"),
            cfg.get("scheduler"), cfg.get("scheduler_conf"),
            grad_clip=cfg.get("grad_clip", 5.0), freeze_mask=mask,
        )
        exclude = ("params/llm",) if cfg.get("model") == "llm_guided_asr" else ()
        options = TrainerOptions(
            max_epoch=int(cfg.get("max_epoch", 10)),
            accum_grad=int(cfg.get("accum_grad", 1)),
            log_interval=int(cfg.get("log_interval", 100)),
            patience=cfg.get("patience"),
            keep_nbest_models=int(cfg.get("keep_nbest_models", 3)),
            best_model_criterion=[tuple(c) for c in cfg.get("best_model_criterion")],
            resume=bool(cfg.get("resume", False)),
            seed=int(cfg.get("seed", 0)),
            exclude_prefixes=exclude,
            batch_args=batch_args,
        )
        return CoreTrainer.run(
            model, variables, tx,
            self._iter_factory(self.train_dataset, True),
            self._iter_factory(self.valid_dataset, False),
            self.output_dir, options,
        )
