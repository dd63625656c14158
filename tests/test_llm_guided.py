"""LLM-guided ASR model: prompt packing, forward, freezing, train+decode E2E."""

import pytest

pytestmark = pytest.mark.slow

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from llm_guided_asr_tpu.utils.testing import make_tiny_llm_dir

TEMPLATE = 'fix "((HYP))" -> "'


@pytest.fixture(scope="module")
def llm_dir(tmp_path_factory):
    return make_tiny_llm_dir(tmp_path_factory.mktemp("tiny_llm") / "model")


def base_config(llm_dir, **overrides):
    cfg = {
        "model": "llm_guided_asr",
        "llm": "llama",
        "llm_conf": {
            "model_name_or_path": str(llm_dir),
            "template_prompt": TEMPLATE,
            "dtype": "float32",
            "pad_token": "<pad>",
        },
        "token_type": "hugging_face",
        "bpemodel": str(llm_dir),
        "token_list": None,
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "normalize": "utterance_mvn",
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": 32, "attention_heads": 2, "linear_units": 64,
            "num_blocks": 2, "macaron_style": True, "use_cnn_module": True,
            "cnn_module_kernel": 7, "dropout_rate": 0.0,
            "positional_dropout_rate": 0.0,
        },
        "decoder_conf": {
            "attention_heads": 2, "linear_units": 64, "num_blocks": 2,
            "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
        },
        "model_conf": {"ctc_weight": 0.3, "lsm_weight": 0.1},
    }
    cfg.update(overrides)
    return cfg


def test_template_split(llm_dir):
    from transformers import AutoConfig, AutoTokenizer

    from llm_guided_asr_tpu.models.llm.prompt import split_template

    tok = AutoTokenizer.from_pretrained(llm_dir)
    hf_cfg = AutoConfig.from_pretrained(llm_dir)
    t = split_template(tok, TEMPLATE, hf_cfg.bos_token_id, hf_cfg.eos_token_id, "<pad>")
    # prefix = [bos] + 'fix "' ; suffix = '" -> "'
    assert t.prefix_ids[0] == hf_cfg.bos_token_id
    prefix_text = tok.convert_ids_to_tokens(list(t.prefix_ids[1:]))
    assert "".join(prefix_text) == 'fix "'
    assert "".join(tok.convert_ids_to_tokens(list(t.suffix_ids))) == '" -> "'
    # response delimiters are the quote token
    assert t.start_of_response_id == tok.convert_tokens_to_ids('"')


def test_pack_prompt_matches_manual(llm_dir):
    from llm_guided_asr_tpu.models.llm.prompt import PromptTemplate, pack_prompt

    t = PromptTemplate(
        prefix_ids=(9, 8), suffix_ids=(7,), start_of_response_id=5,
        end_of_response_id=5, pad_id=0,
    )
    hyp = jnp.asarray([[11, 12, 0, 0], [13, 0, 0, 0]])
    hyp_lens = jnp.asarray([2, 1])
    resp = jnp.asarray([[5, 21, 22], [5, 23, 0]])
    resp_lens = jnp.asarray([3, 2])
    ids, valid, start = pack_prompt(t, hyp, hyp_lens, resp, resp_lens)
    row0 = list(np.asarray(ids)[0])
    v0 = list(np.asarray(valid)[0])
    # manual: [9, 8, 11, 12, 7, 5, 21, 22] then pads
    assert row0[:8] == [9, 8, 11, 12, 7, 5, 21, 22]
    assert v0[:8] == [True] * 8 and not any(v0[8:])
    row1 = np.asarray(ids)[1]
    v1 = np.asarray(valid)[1]
    got = [int(x) for x, m in zip(row1, v1) if m]
    assert got == [9, 8, 13, 7, 5, 23]
    assert int(start[0]) == 5 and int(start[1]) == 4


def _make_batch(rng, vocab_low, vocab_high, b=2, s=4000, l=4):
    speech = jnp.asarray(rng.standard_normal((b, s)), jnp.float32)
    slens = jnp.asarray([s, s // 2])
    text = jnp.asarray(rng.integers(vocab_low, vocab_high, (b, l)), jnp.int32)
    tlens = jnp.asarray([l, l - 2])
    text = jnp.where(jnp.arange(l)[None] < tlens[:, None], text, -1)
    return speech, slens, text, tlens


@pytest.fixture(scope="module")
def guided_model(llm_dir):
    from llm_guided_asr_tpu.tasks.asr import build_model, init_model_variables

    config = base_config(llm_dir)
    model = build_model(config)
    variables = init_model_variables(model, config, seed=0)
    return model, variables


def test_guided_forward_and_frozen_llm_grads(guided_model):
    model, variables = guided_model
    rng = np.random.default_rng(0)
    batch = _make_batch(rng, 1, 10)
    (loss, stats, w) = model.apply(variables, *batch, deterministic=True)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(stats["loss_ctc"]))
    assert np.isfinite(float(stats["loss_att"]))

    def loss_fn(params):
        l, _, _ = model.apply({**variables, "params": params}, *batch, deterministic=True)
        return l

    grads = jax.grad(loss_fn)(variables["params"])
    llm_norm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["llm"])
    )
    assert llm_norm == 0.0, "LLM grads must be zero (stop_gradient)"
    emb_norm = float(jnp.sum(jnp.abs(grads["embed"]["kernel"])))
    dec_norm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["block_0"])
    )
    assert emb_norm > 0 and dec_norm > 0


def test_llm_weights_injected_from_hf(guided_model, llm_dir):
    """params['llm'] must equal the converted HF checkpoint, not random init."""
    import torch
    from transformers import AutoModelForCausalLM

    model, variables = guided_model
    hf = AutoModelForCausalLM.from_pretrained(llm_dir, torch_dtype=torch.float32)
    ref = hf.model.embed_tokens.weight.detach().numpy()
    got = np.asarray(variables["params"]["llm"]["embed_tokens"]["embedding"])
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_guided_train_and_decode_e2e(llm_dir, tmp_path):
    """2-epoch train via ASRTask.main + beam decode via Speech2Text."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_e2e_tiny import make_corpus

    from llm_guided_asr_tpu.tasks.asr import ASRTask
    from llm_guided_asr_tpu.train.checkpoint import load_pytree

    root = tmp_path / "corpus"
    make_corpus(root, n_train=8, n_valid=2)
    exp = tmp_path / "exp"
    config = base_config(
        llm_dir,
        batch_type="sorted", batch_size=8, max_epoch=2, keep_nbest_models=2,
        log_interval=50, speech_pad_multiple=4000, text_pad_multiple=4,
        train_data_path_and_name_and_type=[
            [str(root / "train" / "wav.scp"), "speech", "sound"],
            [str(root / "train" / "text"), "text", "text"],
        ],
        valid_data_path_and_name_and_type=[
            [str(root / "valid" / "wav.scp"), "speech", "sound"],
            [str(root / "valid" / "text"), "text", "text"],
        ],
        output_dir=str(exp),
        optim="adam", optim_conf={"lr": 0.001},
        scheduler="warmuplr", scheduler_conf={"warmup_steps": 20},
    )
    cfg_file = tmp_path / "train.yaml"
    cfg_file.write_text(yaml.safe_dump(config))
    ASRTask.main(["--config", str(cfg_file)])

    # the frozen LLM must NOT be in the checkpoint (trainer.py:408-417)
    saved = load_pytree(exp / "2epoch.msgpack")
    assert "llm" not in saved["params"]
    assert "encoder" in saved["params"]

    from llm_guided_asr_tpu.bin.asr_inference import Speech2Text

    s2t = Speech2Text(
        exp / "config.yaml", exp / "valid.loss.best.msgpack",
        ctc_weight=0.3, beam_size=3, speech_pad_multiple=4000,
    )
    from llm_guided_asr_tpu.data.fileio import SoundScpReader

    reader = SoundScpReader(root / "valid" / "wav.scp")
    uid = next(iter(reader.keys()))
    _, wav = reader[uid]
    results = s2t(wav)
    text, tokens, ids, hyp = results[0]
    assert isinstance(text, str)
    assert np.isfinite(hyp.score)
