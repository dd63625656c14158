"""ASR task: config -> model/data/trainer wiring, collect-stats, main().

Rebuild of espnet2/tasks/asr.py (ASRTask) + the shared machinery it inherits
from espnet2/tasks/abs_task.py (main:1190, main_worker:1278, collect-stats
:1404-1458, build_model_from_file:2272) in a functional style.

The resolved config dict is the single source of truth; it is dumped to
``<output_dir>/config.yaml`` and is sufficient to rebuild the model for
inference (the reference's config.yaml contract, SURVEY.md §5.6).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.data.dataset import (
    CommonCollateFn,
    CommonPreprocessor,
    ESPnetDataset,
)
from llm_guided_asr_tpu.data.iterator import SequenceIterFactory
from llm_guided_asr_tpu.data.samplers import build_batch_sampler
from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.ops.frontend import FrontendConfig
from llm_guided_asr_tpu.ops.specaug import SpecAugConfig
from llm_guided_asr_tpu.text.tokenizers import TokenIDConverter, build_tokenizer
from llm_guided_asr_tpu.train.checkpoint import load_partial, load_pytree, merge_loaded, save_pytree
from llm_guided_asr_tpu.train.optim import (
    PLATEAU_SCHEDULERS,
    build_optimizer,
    path_prefix_mask,
)
from llm_guided_asr_tpu.train.trainer import Trainer, TrainerOptions
from llm_guided_asr_tpu.utils.config import (
    build_config,
    dump_yaml,
    read_token_list,
)

logger = logging.getLogger(__name__)

ASR_DEFAULTS: Dict[str, Any] = {
    "token_type": "char",
    "token_list": None,
    "bpemodel": None,
    "input_size": None,  # None => raw audio via frontend
    "frontend": "default",  # default | none
    "frontend_conf": {},
    "specaug": None,  # specaug | None
    "specaug_conf": {},
    "preencoder": None,  # sinc | None (preencoder/sinc.py)
    "preencoder_conf": {},
    "postencoder": None,  # length_adaptor | None
    "postencoder_conf": {},
    "normalize": "global_mvn",  # global_mvn | utterance_mvn | none
    "normalize_conf": {},  # {stats_file: ...}
    "model": "espnet",  # espnet | llm_guided_asr
    "model_conf": {},
    "encoder": "conformer",
    "encoder_conf": {},
    "decoder": "transformer",
    "decoder_conf": {},
    "llm": None,
    "llm_conf": {},
    # training
    "optim": "adam",
    "optim_conf": {"lr": 0.001},
    "scheduler": "warmuplr",
    "scheduler_conf": {"warmup_steps": 25000},
    "grad_clip": 5.0,
    "grad_noise": False,
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
    # data
    "batch_type": "numel",
    "batch_size": 20,
    "batch_bins": 1000000,
    "fold_length": 80000,
    "num_iters_per_epoch": None,
    "sort_in_batch": "descending",
    "train_data_path_and_name_and_type": [],
    "valid_data_path_and_name_and_type": [],
    "train_shape_file": [],
    "valid_shape_file": [],
    "speech_pad_multiple": 1600,  # 0.1 s @ 16 kHz: bounds XLA recompiles
    "text_pad_multiple": 8,
    "collect_stats": False,
    "output_dir": "exp/asr",
    "dry_run": False,
    "device": None,  # None=default backend; 'cpu' forces host CPU
    "train_dtype": None,  # float32 | bfloat16 (use_amp analog)
    "use_amp": False,
    "use_tensorboard": False,
    "use_wandb": False,
    "wandb_project": None,
    "wandb_name": None,
    "report_cer": False,
    # mixed-vocab CTC (reference ctc_vocab_path, transformer_decoder.py:1002):
    # separate CTC token list + tokenizer for the 'ctc_text' data stream
    "ctc_conf": {},  # {ctc_type: builtin|builtin2|brctc, brctc_risk_factor}
    "ctc_token_list": None,
    "ctc_token_type": "char",
    "ctc_bpemodel": None,
    # parallelism (DDP analog, espnet2/train/trainer.py:262-293):
    # data_parallel: None=off, 0=all devices, N=N-way batch sharding
    "data_parallel": None,
    "sharded_optim": False,  # ZeRO-1 moment sharding (--sharded_ddp analog)
    "model_parallel": 1,
    # multi-host: coordinator "host:port" + process indices
    # (espnet2/train/distributed_utils.py:87-111 analog)
    "dist_coordinator": None,
    "dist_num_processes": None,
    "dist_process_id": None,
}


# ---------------------------------------------------------------------------
# model building
# ---------------------------------------------------------------------------

def build_model_config(config: Dict[str, Any]) -> ASRModelConfig:
    if config.get("token_list") is None and config.get("token_type") == "hugging_face":
        # HF-tokenizer vocab (token_type hugging_face, run.sh:36-37): the
        # token list IS the tokenizer's vocab
        from transformers import AutoTokenizer

        vocab_size = len(AutoTokenizer.from_pretrained(_hf_model_name(config)))
    else:
        vocab_size = len(read_token_list(config["token_list"]))

    frontend = None
    ssl_frontend = None
    if config.get("frontend") == "ssl":
        # frozen-SSL feature frontend (espnet2/asr/frontend/s3prl.py analog)
        from transformers import AutoConfig

        from llm_guided_asr_tpu.models.ssl_encoders import W2VConfig

        fc = dict(config.get("frontend_conf", {}) or {})
        name = fc.get("model_name_or_path")
        if not name:
            raise ValueError("frontend=ssl needs frontend_conf.model_name_or_path")
        kind = fc.get("kind", "wav2vec2")
        ssl_frontend = (kind, W2VConfig.from_hf_config(AutoConfig.from_pretrained(name)))
    elif config.get("frontend", "default") not in (None, "none") and config.get("input_size") is None:
        frontend = FrontendConfig.from_dict(config.get("frontend_conf", {}) or {})

    specaug = None
    if config.get("specaug") == "specaug":
        specaug = SpecAugConfig.from_dict(config.get("specaug_conf", {}) or {})

    preencoder = None
    if config.get("preencoder"):
        # sinc preencoder over sliding-window raw frames
        # (espnet2/asr/preencoder/sinc.py + frontend/windowing.py)
        if config["preencoder"] != "sinc":
            raise ValueError(
                f"unknown preencoder {config['preencoder']!r}; known: sinc"
            )
        from llm_guided_asr_tpu.models.preencoder import SincPreencoderConfig

        preencoder = (
            "sinc",
            SincPreencoderConfig.from_dict(config.get("preencoder_conf", {}) or {}),
        )
    postencoder = None
    if config.get("postencoder") == "length_adaptor":
        from llm_guided_asr_tpu.models.preencoder import LengthAdaptorConfig

        postencoder = (
            "length_adaptor",
            LengthAdaptorConfig.from_dict(config.get("postencoder_conf", {}) or {}),
        )
    elif config.get("postencoder") in ("hugging_face_transformers",
                                       "hugging_face"):
        # pretrained transformers body as the postencoder (reference
        # tasks/asr.py postencoder_choices 'hugging_face_transformers')
        from transformers import AutoConfig

        from llm_guided_asr_tpu.models.hf_encoder import (
            BertBodyConfig,
            HFPostEncoderConfig,
        )

        pconf = dict(config.get("postencoder_conf", {}) or {})
        name = pconf.get("model_name_or_path")
        if not name:
            raise ValueError(
                "postencoder hugging_face_transformers needs "
                "postencoder_conf.model_name_or_path"
            )
        body = BertBodyConfig.from_hf_config(AutoConfig.from_pretrained(name))
        postencoder = (
            "hugging_face_transformers",
            HFPostEncoderConfig(
                body=body,
                length_adaptor_n_layers=int(
                    pconf.get("length_adaptor_n_layers", 0)
                ),
                lang_token_id=int(pconf.get("lang_token_id", -1)),
                model_name_or_path=name,
            ),
        )
    elif config.get("postencoder"):
        raise ValueError(
            f"unknown postencoder {config['postencoder']!r}; "
            "known: length_adaptor, hugging_face_transformers"
        )

    enc_conf = dict(config.get("encoder_conf", {}) or {})
    encoder_type = config.get("encoder", "conformer")
    known_encoders = (
        "conformer", "transformer", "e_branchformer", "branchformer",
        "contextual_block_conformer", "whisper_style", "longformer",
        "multiconvformer", "rnn", "vgg_rnn", "avhubert", "s4",
        "wav2vec2_hf", "hubert_hf", "whisper_hf",
    )
    if encoder_type not in known_encoders:
        raise ValueError(f"unknown encoder {encoder_type!r}; known: {known_encoders}")
    encoder = ConformerConfig.from_dict(enc_conf)

    dec_conf = dict(config.get("decoder_conf", {}) or {})
    decoder_type = config.get("decoder", "transformer")
    if decoder_type not in ("transformer", "rnn", "s4", "lightconv",
                            "dynamicconv", "hugging_face"):
        raise ValueError(
            f"unknown decoder {decoder_type!r}; known: transformer, rnn, s4, "
            "lightconv, dynamicconv, hugging_face"
        )
    hf_decoder = None
    if decoder_type == "hugging_face":
        # pretrained causal LM decoder (hugging_face_transformers_decoder.py)
        from transformers import AutoConfig, AutoTokenizer

        from llm_guided_asr_tpu.models.hf_decoder import HFCausalDecoderConfig
        from llm_guided_asr_tpu.models.llm.llama import LlamaConfig

        name = dec_conf.get("model_name_or_path")
        if not name:
            raise ValueError("decoder=hugging_face needs "
                             "decoder_conf.model_name_or_path")
        llm_cfg = LlamaConfig.from_hf_config(AutoConfig.from_pretrained(name))
        tok = AutoTokenizer.from_pretrained(name)
        prefix = dec_conf.get("prefix", "")
        postfix = dec_conf.get("postfix", "")
        hf_decoder = HFCausalDecoderConfig(
            llm=llm_cfg,
            prefix_ids=tuple(tok.encode(prefix)) if prefix else (),
            postfix_ids=tuple(tok.encode(postfix, add_special_tokens=False))
            if postfix else (),
            enc_frames_max=int(dec_conf.get("enc_frames_max", 512)),
        )
    decoder = TransformerDecoderConfig.from_dict(
        {} if decoder_type == "hugging_face" else dec_conf
    )

    model_conf = dict(config.get("model_conf", {}) or {})
    ctc_type = (config.get("ctc_conf") or {}).get("ctc_type", "builtin")
    if ctc_type not in ("builtin", "builtin2", "brctc"):
        raise ValueError(
            f"unknown ctc_type {ctc_type!r}; known: builtin, builtin2, brctc "
            "(gtnctc needs gtn which is not in this environment)"
        )
    return ASRModelConfig(
        vocab_size=vocab_size,
        frontend=frontend,
        specaug=specaug,
        normalize=config.get("normalize") or "none",
        encoder_type=encoder_type,
        encoder=encoder,
        decoder_type=decoder_type,
        decoder=decoder,
        hf_decoder=hf_decoder,
        ssl_frontend=ssl_frontend,
        preencoder=preencoder,
        postencoder=postencoder,
        ctc_weight=float(model_conf.get("ctc_weight", 0.5)),
        ctc_type=ctc_type,
        brctc_risk_factor=float(
            (config.get("ctc_conf") or {}).get("brctc_risk_factor", 0.0)
        ),
        interctc_weight=float(model_conf.get("interctc_weight", 0.0)),
        lsm_weight=float(model_conf.get("lsm_weight", 0.0)),
        length_normalized_loss=bool(model_conf.get("length_normalized_loss", False)),
    )


def resolve_dtype(config: Dict[str, Any], dtype=None):
    """train_dtype config key ('use_amp' analog): bf16 activations on TPU."""
    if dtype is not None:
        return dtype
    name = config.get("train_dtype") or ("bfloat16" if config.get("use_amp") else "float32")
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}[name]


def build_model(config: Dict[str, Any], dtype=None) -> ASRModel:
    dtype = resolve_dtype(config, dtype)
    if config.get("model", "espnet") == "llm_guided_asr":
        from llm_guided_asr_tpu.models.llm_guided import build_llm_guided_model

        return build_llm_guided_model(config, dtype=dtype)
    if config.get("model") == "maskctc":
        from llm_guided_asr_tpu.models.maskctc import MaskCTCModel

        return MaskCTCModel(build_model_config(config), dtype=dtype)
    if config.get("model") == "transducer":
        from llm_guided_asr_tpu.models.transducer import (
            TransducerDecoderConfig,
            TransducerModel,
            TransducerModelConfig,
        )

        base = build_model_config(config)
        model_conf = dict(config.get("model_conf", {}) or {})
        tcfg = TransducerModelConfig(
            vocab_size=base.vocab_size,
            frontend=base.frontend,
            specaug=base.specaug,
            normalize=base.normalize,
            encoder_type=base.encoder_type,
            encoder=base.encoder,
            decoder=TransducerDecoderConfig.from_dict(config.get("decoder_conf", {}) or {}),
            joint_size=int(model_conf.get("joint_size", 256)),
            aux_ctc_weight=float(model_conf.get("aux_ctc_weight", 0.0)),
            multi_blank_durations=tuple(
                model_conf.get("transducer_multi_blank_durations", ()) or ()
            ),
            multi_blank_ids=tuple(model_conf.get("multi_blank_ids", ()) or ()),
            multi_blank_sigma=float(
                model_conf.get("transducer_multi_blank_sigma", 0.05)
            ),
        )
        return TransducerModel(tcfg, dtype=dtype)
    return ASRModel(build_model_config(config), dtype=dtype)


def init_model_variables(
    model: ASRModel, config: Dict[str, Any], seed: int = 0
) -> Dict:
    """Initialize variables with a dummy batch; load MVN stats if configured."""
    cfg = model.cfg
    if cfg.frontend is not None:
        dummy_speech = jnp.zeros((2, max(cfg.frontend.n_fft * 4, 2048)), jnp.float32)
        dummy_lens = jnp.asarray([dummy_speech.shape[1]] * 2, jnp.int32)
    elif (
        config.get("encoder") in ("wav2vec2_hf", "hubert_hf")
        or config.get("frontend") == "ssl"
    ):
        # raw-waveform pretrained encoders / SSL frontend (1-D input)
        dummy_speech = jnp.zeros((2, 12800), jnp.float32)
        dummy_lens = jnp.asarray([12800, 12800], jnp.int32)
    else:
        dim = int(config.get("input_size") or 80)
        dummy_speech = jnp.zeros((2, 16, dim), jnp.float32)
        dummy_lens = jnp.asarray([16, 16], jnp.int32)
    dummy_text = jnp.asarray([[1, 2, -1], [1, -1, -1]], jnp.int32)
    dummy_tlens = jnp.asarray([2, 1], jnp.int32)
    kwargs = {}
    if config.get("model") == "llm_guided_asr" and config.get("ctc_token_list"):
        kwargs = {"ctc_text": dummy_text, "ctc_text_lengths": dummy_tlens}
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(seed + 1)},
        dummy_speech, dummy_lens, dummy_text, dummy_tlens, deterministic=True,
        **kwargs,
    )
    variables = dict(variables)
    stats_file = (config.get("normalize_conf") or {}).get("stats_file")
    if cfg.normalize == "global_mvn" and stats_file:
        variables["mvn"] = load_mvn_stats(stats_file)
    if config.get("model") == "llm_guided_asr" and not config.get("_skip_llm_weights"):
        from llm_guided_asr_tpu.models.llm_guided import load_llm_params

        variables["params"] = {**variables["params"], "llm": load_llm_params(config)}
    if config.get("model") == "llm_guided_asr" and config.get("ctc_token_list"):
        from llm_guided_asr_tpu.models.llm_guided import build_ctc_map_variables

        variables["ctc_map"] = build_ctc_map_variables(config)
    if (
        config.get("decoder") == "hugging_face"
        and not config.get("_skip_llm_weights")
    ):
        # pretrained causal-LM decoder: inject converted HF weights
        import torch
        from transformers import AutoModelForCausalLM

        from llm_guided_asr_tpu.models.llm.llama import convert_hf_state_dict

        name = (config.get("decoder_conf") or {})["model_name_or_path"]
        hf_model = AutoModelForCausalLM.from_pretrained(
            name, torch_dtype=torch.float32
        )
        llm_params = convert_hf_state_dict(
            hf_model.state_dict(), model.cfg.hf_decoder.llm
        )
        del hf_model
        variables["params"] = {
            **variables["params"],
            "decoder": {**variables["params"]["decoder"], "llm": llm_params},
        }
        logger.info(f"loaded pretrained decoder LM weights from {name}")
    if config.get("frontend") == "ssl" and not config.get("_skip_pretrained_encoder"):
        from llm_guided_asr_tpu.models.ssl_encoders import load_pretrained_encoder

        fc = dict(config.get("frontend_conf", {}) or {})
        _, pre = load_pretrained_encoder(fc["model_name_or_path"],
                                         fc.get("kind", "wav2vec2"))
        variables["params"] = {**variables["params"], "ssl_frontend": pre}
        logger.info("loaded frozen SSL frontend weights from "
                    f"{fc['model_name_or_path']}")
    enc_type = config.get("encoder")
    if (
        enc_type in ("wav2vec2_hf", "hubert_hf", "whisper_hf")
        and not config.get("_skip_pretrained_encoder")
    ):
        # inject converted HF weights at params.encoder.ssl (the reference's
        # pretrained download_dir/from_pretrained path for hubert/whisper)
        from llm_guided_asr_tpu.models.ssl_encoders import load_pretrained_encoder

        name = (config.get("encoder_conf") or {}).get("model_name_or_path")
        _, pre = load_pretrained_encoder(name, enc_type[: -len("_hf")])
        enc_params = dict(variables["params"]["encoder"])
        enc_params["ssl"] = pre
        variables["params"] = {**variables["params"], "encoder": enc_params}
        logger.info(f"loaded pretrained {enc_type} encoder weights from {name}")
    if (
        config.get("postencoder") in ("hugging_face_transformers", "hugging_face")
        and not config.get("_skip_llm_weights")
    ):
        from llm_guided_asr_tpu.models.hf_encoder import load_hf_postencoder_params

        _, post_cfg = model.cfg.postencoder
        pre = load_hf_postencoder_params(post_cfg)
        post_params = {**variables["params"]["postencoder"], **pre}
        variables["params"] = {
            **variables["params"], "postencoder": post_params
        }
        logger.info(
            "loaded pretrained postencoder body from "
            f"{post_cfg.model_name_or_path}"
        )
    return variables


# reference freeze_param / init_param names (dot paths) -> our param tree paths
_PARAM_NAME_ALIASES = {
    "encoder": "encoder",
    "ctc": "ctc_head",
    "ctc.ctc_lo": "ctc_head",
    "decoder": "decoder",
    "decoder.llm": "llm",
    "decoder.llm.lm": "llm",
    "llm": "llm",
    "decoder.embed": "embed",
    "embed": "embed",
}


def translate_param_path(name: str) -> str:
    if name in _PARAM_NAME_ALIASES:
        return _PARAM_NAME_ALIASES[name]
    return name.replace(".", "/")


def load_mvn_stats(stats_file: Union[str, Path]) -> Dict[str, jnp.ndarray]:
    """feats_stats.npz {count,sum,sum_square} -> {mean, inv_std} (global_mvn.py:26)."""
    npz = np.load(stats_file)
    count = float(npz["count"])
    mean = npz["sum"] / count
    var = np.maximum(npz["sum_square"] / count - mean**2, 0.0)
    std = np.maximum(np.sqrt(var), 1.0e-20)
    return {
        "mean": jnp.asarray(mean, jnp.float32),
        "inv_std": jnp.asarray(1.0 / std, jnp.float32),
    }


def apply_init_param(variables: Dict, init_param: Sequence[str]) -> Dict:
    """'path:src:dst' surgery entries (load_pretrained_model.py)."""
    params = variables["params"]
    for spec in init_param:
        parts = spec.split(":")
        path = parts[0]
        src = translate_param_path(parts[1]) if len(parts) > 1 and parts[1] else ""
        dst = translate_param_path(parts[2]) if len(parts) > 2 and parts[2] else ""
        params = load_partial(params, path, src, dst)
        logger.info(f"loaded init_param {spec}")
    return {**variables, "params": params}


# ---------------------------------------------------------------------------
# data building
# ---------------------------------------------------------------------------

def _hf_model_name(config: Dict[str, Any]) -> Optional[str]:
    return config.get("bpemodel") or (config.get("llm_conf") or {}).get("model_name_or_path")


def build_text_converter(config: Dict[str, Any]):
    """(tokenizer, id_converter) per token_type; hugging_face shares the LLM
    tokenizer so text ids live in the LLM vocabulary (run.sh:36-37)."""
    token_type = config.get("token_type", "char")
    if token_type == "hugging_face":
        from llm_guided_asr_tpu.text.tokenizers import (
            HuggingFaceTokenIDConverter,
            HuggingFaceTokenizer,
        )

        name = _hf_model_name(config)
        return HuggingFaceTokenizer(name), HuggingFaceTokenIDConverter(name)
    tokenizer = build_tokenizer(token_type, bpemodel=config.get("bpemodel"),
                                g2p=config.get("g2p"))
    converter = TokenIDConverter(read_token_list(config["token_list"]))
    return tokenizer, converter


def build_preprocess_fn(config: Dict[str, Any]) -> CommonPreprocessor:
    tokenizer, converter = build_text_converter(config)
    field_tokenizers = None
    if config.get("ctc_token_list"):
        # mixed-vocab CTC: 'ctc_text' tokenizes in its own vocab
        ctc_tok = build_tokenizer(
            config.get("ctc_token_type", "char"), bpemodel=config.get("ctc_bpemodel")
        )
        ctc_conv = TokenIDConverter(read_token_list(config["ctc_token_list"]))
        field_tokenizers = {"ctc_text": (ctc_tok, ctc_conv)}
    cleaner = None
    if config.get("cleaner"):
        from llm_guided_asr_tpu.text.cleaner import TextCleaner

        cleaner = TextCleaner(config["cleaner"])
    return CommonPreprocessor(tokenizer, converter,
                              field_tokenizers=field_tokenizers,
                              cleaner=cleaner)


def build_dataset(config: Dict[str, Any], triples: Sequence) -> ESPnetDataset:
    has_text = config.get("token_list") or config.get("token_type") == "hugging_face"
    pre = build_preprocess_fn(config) if has_text else None
    from llm_guided_asr_tpu.utils.config import normalize_triples

    return ESPnetDataset(normalize_triples(triples), preprocess=pre)


def _mesh_data_parallel_size(config: Dict[str, Any]) -> int:
    """Data-axis size of the mesh this run will train on (1 = no mesh).

    Mirrors train/trainer.py resolve_mesh without building the mesh, so the
    sampler can emit dp-divisible batches up front."""
    mp = max(int(config.get("model_parallel", 1) or 1), 1)
    dp_conf = config.get("data_parallel")
    if dp_conf is None and mp <= 1:
        return 1
    if dp_conf in (None, 0):
        import jax

        return max(jax.device_count() // mp, 1)
    return int(dp_conf)


def build_iter_factory(
    config: Dict[str, Any],
    dataset: ESPnetDataset,
    shuffle: bool,
    shape_files: Sequence[str] = (),
) -> SequenceIterFactory:
    lengths = None
    if shape_files:
        from llm_guided_asr_tpu.data.fileio import read_shape_file

        lengths = {k: v[0] for k, v in read_shape_file(shape_files[0]).items()}
        lengths = {k: v for k, v in lengths.items() if k in set(dataset.keys)}
    elif config.get("batch_type", "numel") != "unsorted":
        # no shape files: peek lengths from headers (wav/flac/npy/ark) so
        # the whole corpus is not decoded just to build batches
        lengths = {k: dataset.peek_length(k) for k in dataset.keys}
    batches = build_batch_sampler(
        config.get("batch_type", "numel"),
        dataset.keys,
        lengths=lengths,
        batch_size=int(config.get("batch_size", 20)),
        batch_bins=int(config.get("batch_bins", 1000000)),
        fold_length=int(config.get("fold_length", 80000)),
        sort_in_batch=config.get("sort_in_batch", "descending"),
    )
    dp = _mesh_data_parallel_size(config)
    if dp > 1 and shuffle:
        # training batches must split evenly over the mesh 'data' axis so the
        # trainer's repeat-padding safety net never upweights an utterance
        from llm_guided_asr_tpu.data.samplers import round_batches_to_world_size

        batches = round_batches_to_world_size(batches, dp)
    tpad = int(config.get("text_pad_multiple", 8))
    collate = CommonCollateFn(
        pad_multiples={
            "speech": int(config.get("speech_pad_multiple", 1600)),
            "text": tpad,
            # token-aligned side streams must bucket like text so per-token
            # ops (duration/pitch/energy adapters) see congruent shapes
            "durations": tpad, "pitch": tpad, "energy": tpad,
        }
    )
    return SequenceIterFactory(
        dataset,
        batches,
        collate,
        shuffle=shuffle,
        seed=int(config.get("seed", 0)),
        num_iters_per_epoch=config.get("num_iters_per_epoch"),
    )


# ---------------------------------------------------------------------------
# collect stats (main_funcs/collect_stats.py:21)
# ---------------------------------------------------------------------------

def collect_stats(config: Dict[str, Any], output_dir: Path):
    from llm_guided_asr_tpu.data.fileio import write_shape_file

    # collect_feats only touches the frontend; skip loading frozen LLM weights
    config = {**config, "_skip_llm_weights": True}
    model = build_model(config)
    variables = init_model_variables(model, config, int(config.get("seed", 0)))

    @jax.jit
    def feats_fn(speech, speech_lengths):
        return model.apply(
            variables, speech, speech_lengths, method=model.collect_feats
        )

    for split, triples, shape_out in [
        ("train", config["train_data_path_and_name_and_type"], "train"),
        ("valid", config["valid_data_path_and_name_and_type"], "valid"),
    ]:
        if not triples:
            continue
        dataset = build_dataset(config, triples)
        sdir = output_dir / split
        sdir.mkdir(parents=True, exist_ok=True)
        count, s, sq = 0, None, None
        speech_shapes, text_shapes = {}, {}
        for uid in dataset.keys:
            item = dataset[uid]
            speech = np.asarray(item["speech"], np.float32)
            out = feats_fn(jnp.asarray(speech[None]), jnp.asarray([len(speech)]))
            feats = np.asarray(out["feats"])[0, : int(out["feats_lengths"][0])]
            count += feats.shape[0]
            s = feats.sum(0) if s is None else s + feats.sum(0)
            sq = (feats**2).sum(0) if sq is None else sq + (feats**2).sum(0)
            speech_shapes[uid] = speech.shape
            if "text" in item:
                text_shapes[uid] = np.asarray(item["text"]).shape
        np.savez(sdir / "feats_stats.npz", count=count, sum=s, sum_square=sq)
        write_shape_file(sdir / "speech_shape", speech_shapes)
        if text_shapes:
            write_shape_file(sdir / "text_shape", text_shapes)
        logger.info(f"collect_stats[{split}]: {len(speech_shapes)} utts, {count} frames")


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

class ASRTask:
    defaults = ASR_DEFAULTS

    @classmethod
    def get_default_config(cls) -> Dict[str, Any]:
        import copy

        return copy.deepcopy(cls.defaults)

    @classmethod
    def main(cls, cmd: Sequence[str]) -> Optional[Dict]:
        config = build_config(cmd, cls.get_default_config())
        from llm_guided_asr_tpu.utils.devices import resolve_device

        resolve_device(config.get("device"))
        if config.get("dist_coordinator"):
            from llm_guided_asr_tpu.parallel.mesh import DistributedOption

            DistributedOption(
                coordinator=config["dist_coordinator"],
                num_processes=config.get("dist_num_processes"),
                process_id=config.get("dist_process_id"),
            ).init_distributed()
        else:
            # launcher/cluster env auto-resolution (srun / mpirun / torchrun
            # variable contracts; distributed_utils.py:141-330 analog)
            from llm_guided_asr_tpu.parallel.mesh import (
                DistributedOption,
                resolve_distributed_env,
            )

            dist_env = resolve_distributed_env()
            if dist_env is not None:
                DistributedOption(**dist_env).init_distributed()
        if config.get("print_config"):
            import sys

            import yaml as _yaml

            _yaml.safe_dump(
                {k: v for k, v in config.items() if k != "print_config"},
                sys.stdout, allow_unicode=True, sort_keys=False,
            )
            return None
        known = set(cls.defaults) | {"exclude_checkpoint_prefixes", "print_config"}
        for k in config:
            if k not in known:
                logger.warning(f"unknown config key {k!r} (typo?); ignoring")
        output_dir = Path(config["output_dir"])
        output_dir.mkdir(parents=True, exist_ok=True)
        logging.basicConfig(
            level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
        )

        if config.get("collect_stats"):
            collect_stats(config, output_dir)
            return None

        # build (and thus validate) BEFORE dumping the config artifact, so a
        # bad invocation can never clobber a valid exp dir's config.yaml
        model = build_model(config)
        dump_yaml(config, output_dir / "config.yaml")
        if config.get("dry_run"):
            logger.info("dry_run: config written, exiting")
            return None
        variables = init_model_variables(model, config, int(config.get("seed", 0)))
        if config.get("init_param"):
            variables = apply_init_param(variables, config["init_param"])

        freeze = [translate_param_path(f) for f in (config.get("freeze_param") or [])]
        if config.get("model") == "llm_guided_asr" and "llm" not in freeze:
            freeze.append("llm")  # the LLM is always frozen (llm_guided_asr_model.py)
        freeze_mask = path_prefix_mask(variables["params"], freeze) if freeze else None
        tx = build_optimizer(
            config.get("optim", "adam"),
            config.get("optim_conf"),
            config.get("scheduler"),
            config.get("scheduler_conf"),
            grad_clip=config.get("grad_clip", 5.0),
            freeze_mask=freeze_mask,
            grad_noise=bool(config.get("grad_noise", False)),
        )

        train_ds = build_dataset(config, config["train_data_path_and_name_and_type"])
        valid_ds = build_dataset(config, config["valid_data_path_and_name_and_type"])
        train_iter = build_iter_factory(config, train_ds, shuffle=True,
                                        shape_files=config.get("train_shape_file", []))
        valid_iter = build_iter_factory(config, valid_ds, shuffle=False,
                                        shape_files=config.get("valid_shape_file", []))

        exclude = list(config.get("exclude_checkpoint_prefixes", ()) or ())
        if config.get("model") == "llm_guided_asr" and "params/llm" not in exclude:
            # never persist the frozen LLM (trainer.py:408-417)
            exclude.append("params/llm")
        options = TrainerOptions(
            max_epoch=int(config.get("max_epoch", 40)),
            accum_grad=int(config.get("accum_grad", 1)),
            log_interval=int(config.get("log_interval", 100)),
            patience=config.get("patience"),
            keep_nbest_models=int(config.get("keep_nbest_models", 10)),
            best_model_criterion=[tuple(c) for c in config.get("best_model_criterion")],
            resume=bool(config.get("resume", False)),
            seed=int(config.get("seed", 0)),
            exclude_prefixes=tuple(exclude),
            use_tensorboard=bool(config.get("use_tensorboard", False)),
            use_wandb=bool(config.get("use_wandb", False)),
            wandb_project=config.get("wandb_project"),
            wandb_name=config.get("wandb_name"),
            report_ctc_er=bool(config.get("report_cer", False)),
            data_parallel=config.get("data_parallel"),
            model_parallel=int(config.get("model_parallel", 1)),
            sharded_optim=bool(config.get("sharded_optim", False)),
            # chunked-flat optimizer application; per-leaf freeze masks need
            # the per-leaf path (optax.masked sees the params tree)
            flat_optim=bool(config.get("flat_optim", False)) and freeze_mask is None,
            val_scheduler_criterion=tuple(
                config.get("val_scheduler_criterion") or ("valid", "loss")
            ),
            plateau_conf=(
                dict(config.get("scheduler_conf") or {})
                if str(config.get("scheduler") or "").lower() in PLATEAU_SCHEDULERS
                else None
            ),
        )
        from llm_guided_asr_tpu.utils.config import normalize_triples

        data_names = {
            t[1] for t in normalize_triples(config["train_data_path_and_name_and_type"])
        }
        has_bias = "bias_words" in data_names  # contextual biasing (decoder_new)
        has_ctc_text = "ctc_text" in data_names  # mixed-vocab CTC targets
        if has_bias or has_ctc_text:
            base = ("speech", "speech_lengths", "text", "text_lengths")
            bias_keys = ("bias_words", "bias_words_lengths")
            ctc_keys = ("ctc_text", "ctc_text_lengths")
            if has_bias and has_ctc_text:
                options.batch_args = base + bias_keys + ctc_keys
            elif has_bias:
                options.batch_args = base + bias_keys
            else:
                # bias slots are positional in the model signature: fill None
                options.batch_args = lambda b: tuple(
                    [b[k] for k in base] + [None, None] + [b[k] for k in ctc_keys]
                )
        return Trainer.run(model, variables, tx, train_iter, valid_iter, output_dir, options)

    @classmethod
    def build_model_from_file(
        cls,
        config_file: Union[str, Path],
        model_file: Optional[Union[str, Path]] = None,
        dtype=jnp.float32,
    ) -> Tuple[ASRModel, Dict, Dict[str, Any]]:
        """Rebuild (model, variables, config) from the config.yaml artifact
        (abs_task.py:2272)."""
        from llm_guided_asr_tpu.utils.config import load_yaml

        config = {**cls.get_default_config(), **load_yaml(config_file)}
        model = build_model(config, dtype=dtype)
        variables = init_model_variables(model, config, int(config.get("seed", 0)))
        if model_file is not None:
            loaded = load_pytree(model_file)
            variables = merge_loaded(variables, loaded)
        return model, variables, config
