"""Mesh-integrated training (VERDICT r1 item 2).

The reference wraps every run in DDP/DataParallel automatically
(espnet2/train/trainer.py:262-293) and shards batches per rank
(abs_task.py:1823). Here: an 8-virtual-device data-parallel training run of
the tiny tone corpus must produce the same loss curve as the 1-device run
(same seeds) — batch sharding + XLA's gradient psum must not change the math.
"""

import pytest

pytestmark = pytest.mark.slow

import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent))

from test_e2e_tiny import TOKEN_LIST, make_corpus  # noqa: E402


def _train(root: Path, exp_dir: Path, data_parallel, **extra_config):
    from llm_guided_asr_tpu.tasks.asr import ASRTask
    from llm_guided_asr_tpu.train.reporter import Reporter

    token_file = root / "tokens.txt"
    config = {
        "token_type": "char",
        "token_list": str(token_file),
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "normalize": "utterance_mvn",
        "encoder": "conformer",
        "encoder_conf": {
            "output_size": 16, "attention_heads": 2, "linear_units": 32,
            "num_blocks": 1, "macaron_style": False, "use_cnn_module": False,
            "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
            "attention_dropout_rate": 0.0,
        },
        "decoder_conf": {
            "attention_heads": 2, "linear_units": 32, "num_blocks": 1,
            "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
        },
        "model_conf": {"ctc_weight": 0.5, "lsm_weight": 0.0},
        "optim": "adam",
        "optim_conf": {"lr": 0.002},
        "batch_type": "sorted",
        "batch_size": 8,
        "max_epoch": 2,
        "keep_nbest_models": 1,
        "log_interval": 2,
        "speech_pad_multiple": 4000,
        "text_pad_multiple": 4,
        "seed": 7,
        "train_data_path_and_name_and_type": [
            [str(root / "train" / "wav.scp"), "speech", "sound"],
            [str(root / "train" / "text"), "text", "text"],
        ],
        "valid_data_path_and_name_and_type": [
            [str(root / "valid" / "wav.scp"), "speech", "sound"],
            [str(root / "valid" / "text"), "text", "text"],
        ],
        "output_dir": str(exp_dir),
        "data_parallel": data_parallel,
        **extra_config,
    }
    cfg = root / f"train_dp{data_parallel}_{exp_dir.name}.yaml"
    cfg.write_text(yaml.safe_dump(config))
    ASRTask.main(["--config", str(cfg)])
    rep = Reporter.load(exp_dir / "reporter.json")
    return {
        ep: {ph: st.get("loss") for ph, st in phases.items()}
        for ep, phases in rep.stats.items()
    }


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("mesh_tone")
    make_corpus(root, n_train=16, n_valid=8, seed=1)
    (root / "tokens.txt").write_text("\n".join(TOKEN_LIST) + "\n")
    return root


def test_dp8_matches_single_device(corpus):
    import jax

    assert len(jax.devices()) >= 8
    single = _train(corpus, corpus / "exp_single", data_parallel=None)
    dp8 = _train(corpus, corpus / "exp_dp8", data_parallel=8)
    assert set(single) == set(dp8)
    for ep in single:
        for ph in ("train", "valid"):
            a, b = single[ep][ph], dp8[ep][ph]
            assert a is not None and b is not None
            # identical batches + replicated params; only the reduction
            # layout differs, so the curves must agree tightly
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_shard_batch_padded_uneven():
    """Non-divisible batch gets repeat-padded up to the data-axis size."""
    import jax

    from llm_guided_asr_tpu.parallel.mesh import make_mesh
    from llm_guided_asr_tpu.train.trainer import shard_batch_padded

    mesh = make_mesh(8, 1)
    batch = {
        "speech": np.ones((5, 100), np.float32),
        "speech_lengths": np.full((5,), 100, np.int32),
    }
    out = shard_batch_padded(batch, mesh)
    assert out["speech"].shape[0] == 8
    assert out["speech_lengths"].shape[0] == 8
    assert out["speech"].sharding.spec[0] == "data"

    # pad larger than the batch itself (2 utts on an 8-way axis)
    small = {
        "speech": np.arange(2 * 4, dtype=np.float32).reshape(2, 4),
        "speech_lengths": np.array([4, 3], np.int32),
    }
    out = shard_batch_padded(small, mesh)
    assert out["speech"].shape[0] == 8
    np.testing.assert_array_equal(
        np.asarray(out["speech_lengths"]), [4, 3, 3, 3, 3, 3, 3, 3]
    )


def test_model_parallel_llm_state_sharding():
    """shard_train_state puts TP specs on the LLM subtree and the optimizer
    moments inherit their params' shardings."""
    import jax
    import jax.numpy as jnp
    import optax

    from llm_guided_asr_tpu.parallel.mesh import make_mesh
    from llm_guided_asr_tpu.train.trainer import init_train_state, shard_train_state

    mesh = make_mesh(4, 2)
    params = {
        "encoder": {"kernel": jnp.ones((8, 8))},
        "llm": {"layers_0": {"mlp": {"gate_proj": {"kernel": jnp.ones((8, 16))}}}},
    }
    tx = optax.adam(1e-3)
    state = init_train_state({"params": params}, tx)
    state = shard_train_state(state, mesh, tx)
    gate = state["params"]["llm"]["layers_0"]["mlp"]["gate_proj"]["kernel"]
    assert gate.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    mu = state["opt_state"][0].mu
    assert (
        mu["llm"]["layers_0"]["mlp"]["gate_proj"]["kernel"].sharding.spec
        == jax.sharding.PartitionSpec(None, "model")
    )
    assert state["params"]["encoder"]["kernel"].sharding.spec == jax.sharding.PartitionSpec()


def test_sharded_optim_matches_replicated(corpus):
    """ZeRO-1 moment sharding (sharded_optim, fairscale OSS analog): the
    loss curve is identical to replicated-optimizer dp training, and the
    adam moments really are partitioned along 'data'."""
    import jax

    assert len(jax.devices()) >= 8
    dp8 = _train(corpus, corpus / "exp_dp8_ref", data_parallel=8)
    z1 = _train(corpus, corpus / "exp_dp8_zero1", data_parallel=8,
                sharded_optim=True)
    for ep in dp8:
        for ph in ("train", "valid"):
            np.testing.assert_allclose(dp8[ep][ph], z1[ep][ph],
                                       rtol=2e-3, atol=2e-4)

    # sharding is real: place a tiny state and check the moment layout
    import jax.numpy as jnp
    import optax

    from llm_guided_asr_tpu.parallel.mesh import make_mesh
    from llm_guided_asr_tpu.train.trainer import (
        init_train_state,
        shard_train_state,
    )

    mesh = make_mesh(8, 1)
    tx = optax.adam(1e-3)
    params = {"w": jnp.zeros((16, 4)), "b": jnp.zeros((3,))}
    state = init_train_state({"params": params}, tx)
    sharded = shard_train_state(state, mesh, tx, sharded_optim=True)
    mu = sharded["opt_state"][0].mu
    specs = {k: tuple(v.sharding.spec) for k, v in mu.items()}
    assert specs["w"] == ("data",)  # 16 % 8 == 0 -> partitioned
    assert specs["b"] == ()  # 3 not divisible -> replicated
