"""LLM-guided ST model: forward, loss composition, train smoke."""

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
    return make_tiny_llm_dir(tmp_path_factory.mktemp("tiny_llm_st") / "model")


def st_config(llm_dir, **over):
    cfg = {
        "model": "llm_guided_st",
        "llm_conf": {
            "model_name_or_path": str(llm_dir), "template_prompt": TEMPLATE,
            "dtype": "float32", "pad_token": "<pad>",
        },
        "token_type": "hugging_face",
        "bpemodel": str(llm_dir),
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "normalize": "utterance_mvn",
        "encoder_conf": {
            "output_size": 32, "attention_heads": 2, "linear_units": 64,
            "num_blocks": 2, "macaron_style": False, "use_cnn_module": False,
            "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
        },
        "decoder_conf": {"attention_heads": 2, "linear_units": 64, "num_blocks": 2,
                         "dropout_rate": 0.0, "positional_dropout_rate": 0.0},
        "extra_asr_decoder_conf": {"attention_heads": 2, "linear_units": 64,
                                   "num_blocks": 1, "dropout_rate": 0.0},
        "model_conf": {"asr_weight": 0.3, "mtlalpha": 0.5, "lsm_weight": 0.1},
    }
    cfg.update(over)
    return cfg


def test_st_forward_loss_composition(llm_dir):
    from llm_guided_asr_tpu.tasks.st import build_st_model, init_st_variables

    config = st_config(llm_dir)
    model = build_st_model(config)
    variables = init_st_variables(model, config)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
    slens = jnp.asarray([4000, 2000])
    text = jnp.asarray([[2, 3, 4, -1], [5, 6, -1, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    src = jnp.asarray([[7, 8, -1], [9, -1, -1]], jnp.int32)
    srclens = jnp.asarray([2, 1])
    loss, stats, w = model.apply(
        variables, speech, slens, text, tlens, src, srclens, deterministic=True
    )
    assert np.isfinite(float(loss))
    for k in ("loss_st_att", "loss_asr_ctc", "loss_asr_att", "loss_asr"):
        assert k in stats and np.isfinite(float(stats[k])), k
    expect = 0.7 * float(stats["loss_st_att"]) + 0.3 * float(stats["loss_asr"])
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)
    expect_asr = 0.5 * float(stats["loss_asr_ctc"]) + 0.5 * float(stats["loss_asr_att"])
    np.testing.assert_allclose(float(stats["loss_asr"]), expect_asr, rtol=1e-5)


def test_st_train_cli(llm_dir, tmp_path):
    """2-epoch ST train through STTask.main with a synthetic paired corpus."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from test_e2e_tiny import make_corpus

    from llm_guided_asr_tpu.tasks.st import STTask

    root = tmp_path / "corpus"
    make_corpus(root, n_train=6, n_valid=2)
    # target text: reverse of the source text (a deterministic 'translation')
    for split in ("train", "valid"):
        src = (root / split / "text").read_text().splitlines()
        with open(root / split / "text.tgt", "w") as f:
            for line in src:
                uid, txt = line.split(maxsplit=1)
                f.write(f"{uid} {txt[::-1]}\n")
    exp = tmp_path / "exp"
    config = st_config(
        llm_dir,
        batch_type="sorted", batch_size=8, max_epoch=2, keep_nbest_models=2,
        log_interval=50, speech_pad_multiple=4000, text_pad_multiple=4,
        train_data_path_and_name_and_type=[
            [str(root / "train" / "wav.scp"), "speech", "sound"],
            [str(root / "train" / "text.tgt"), "text", "text"],
            [str(root / "train" / "text"), "src_text", "text"],
        ],
        valid_data_path_and_name_and_type=[
            [str(root / "valid" / "wav.scp"), "speech", "sound"],
            [str(root / "valid" / "text.tgt"), "text", "text"],
            [str(root / "valid" / "text"), "src_text", "text"],
        ],
        output_dir=str(exp),
        optim="adam", optim_conf={"lr": 0.001},
        scheduler="none", scheduler_conf={},
    )
    cfg_file = tmp_path / "st.yaml"
    cfg_file.write_text(yaml.safe_dump(config))
    STTask.main(["--config", str(cfg_file)])
    assert (exp / "valid.loss.best.msgpack").exists()
    from llm_guided_asr_tpu.train.checkpoint import load_pytree

    saved = load_pytree(exp / "2epoch.msgpack")
    assert "llm" not in saved["params"]
    assert "extra_asr_decoder" in saved["params"]
