"""True incremental streaming: encoder-state carry + resumable beam search.

VERDICT round-1 item #7: streaming must carry encoder state across chunks
(no re-encode) and extend the CTC prefix DP incrementally
(ctc_prefix_score.py:222-270 extend_prob/extend_state analog), with the
streaming output equal to the offline decode on the tiny corpus.
"""

import pytest

pytestmark = pytest.mark.slow

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).parent))
from test_e2e_tiny import TOKEN_LIST, make_corpus


@pytest.fixture(scope="module")
def exp(tmp_path_factory):
    """Train a tiny contextual-block model on the tone corpus."""
    from llm_guided_asr_tpu.tasks.asr import ASRTask

    root = tmp_path_factory.mktemp("stream_corpus")
    make_corpus(root, n_train=24, n_valid=4)
    token_file = root / "tokens.txt"
    token_file.write_text("\n".join(TOKEN_LIST) + "\n")
    exp_dir = root / "exp"
    config = {
        "token_type": "char",
        "token_list": str(token_file),
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 23},
        "normalize": "global_mvn",
        "encoder": "contextual_block_conformer",
        "encoder_conf": {
            "output_size": 32, "attention_heads": 2, "linear_units": 64,
            "num_blocks": 2, "macaron_style": True, "use_cnn_module": True,
            "cnn_module_kernel": 7, "dropout_rate": 0.0,
            "positional_dropout_rate": 0.0, "attention_dropout_rate": 0.0,
            "block_size": 8,
        },
        "decoder_conf": {
            "attention_heads": 2, "linear_units": 64, "num_blocks": 1,
            "dropout_rate": 0.0, "positional_dropout_rate": 0.0,
        },
        "model_conf": {"ctc_weight": 0.5, "lsm_weight": 0.1},
        "optim": "adam",
        "optim_conf": {"lr": 0.003},
        "scheduler": "warmuplr",
        "scheduler_conf": {"warmup_steps": 60},
        "batch_type": "sorted",
        "batch_size": 8,
        "max_epoch": 30,
        "keep_nbest_models": 2,
        "best_model_criterion": [["valid", "loss", "min"]],
        "speech_pad_multiple": 4000,
        "train_data_path_and_name_and_type": [
            [str(root / "train" / "wav.scp"), "speech", "sound"],
            [str(root / "train" / "text"), "text", "text"],
        ],
        "valid_data_path_and_name_and_type": [
            [str(root / "valid" / "wav.scp"), "speech", "sound"],
            [str(root / "valid" / "text"), "text", "text"],
        ],
        "output_dir": str(exp_dir),
    }
    cfg_file = root / "train.yaml"
    cfg_file.write_text(yaml.safe_dump(config))
    stats_dir = root / "stats"
    ASRTask.main([
        "--config", str(cfg_file), "--collect_stats", "true",
        "--output_dir", str(stats_dir),
    ])
    ASRTask.main([
        "--config", str(cfg_file),
        "--normalize_conf", f"stats_file={stats_dir / 'train' / 'feats_stats.npz'}",
    ])
    return {"root": root, "exp": exp_dir}


def test_streaming_encoder_matches_offline_encode(exp):
    """Chunked encode (frontend framing carry + encoder ctx carry) must be
    bit-level equal to the model's offline encode path."""
    from llm_guided_asr_tpu.bin.asr_inference import Speech2Text
    from llm_guided_asr_tpu.bin.asr_inference_streaming import Speech2TextStreaming
    from llm_guided_asr_tpu.data.fileio import SoundScpReader

    st = Speech2TextStreaming(
        exp["exp"] / "config.yaml", exp["exp"] / "valid.loss.best.msgpack",
        chunk_samples=4000, ctc_weight=0.5, beam_size=3, speech_pad_multiple=4000,
    )
    assert st.incremental, "contextual-block + global_mvn must enable incremental mode"
    reader = SoundScpReader(exp["root"] / "valid" / "wav.scp")
    uid = next(iter(reader.keys()))
    _, wav = reader[uid]

    # offline reference: model.encode on bucket-padded speech (as Speech2Text does)
    n = len(wav)
    from llm_guided_asr_tpu.data.dataset import round_up

    padded = np.zeros((round_up(n, 4000),), np.float32)
    padded[:n] = wav
    enc_ref, enc_lens = st.s2t._encode(jnp.asarray(padded[None]), jnp.asarray([n]))
    t_ref = int(enc_lens[0])

    # streaming: feed chunks, inspect the carried encoder buffer
    st.reset()
    for start in range(0, n, 4000):
        chunk = wav[start : start + 4000]
        st._buffer = np.concatenate([st._buffer, np.asarray(chunk, np.float32)])
        st._advance(is_final=start + 4000 >= n)
    assert st._sub_done == t_ref, (st._sub_done, t_ref)
    np.testing.assert_allclose(
        st._enc[:t_ref], np.asarray(enc_ref[0, :t_ref]), atol=2e-5, rtol=1e-4
    )
    st.reset()


def test_streaming_final_equals_offline_decode(exp):
    from llm_guided_asr_tpu.bin.asr_inference import Speech2Text
    from llm_guided_asr_tpu.bin.asr_inference_streaming import Speech2TextStreaming
    from llm_guided_asr_tpu.data.fileio import SoundScpReader

    kwargs = dict(ctc_weight=0.5, beam_size=3, speech_pad_multiple=4000)
    offline = Speech2Text(
        exp["exp"] / "config.yaml", exp["exp"] / "valid.loss.best.msgpack", **kwargs
    )
    st = Speech2TextStreaming(
        exp["exp"] / "config.yaml", exp["exp"] / "valid.loss.best.msgpack",
        chunk_samples=4000, **kwargs,
    )
    reader = SoundScpReader(exp["root"] / "valid" / "wav.scp")
    n_match = 0
    for uid in reader.keys():
        _, wav = reader[uid]
        want_hyp = offline(wav)[0]
        partials = st.decode_utterance(wav)
        got_hyp = partials[-1][0]
        # partial results must be prefixy/monotone-ish: every chunk returns
        # something without error
        assert all(isinstance(p[0][0], str) for p in partials)
        if got_hyp[0] == want_hyp[0]:
            n_match += 1
            # scores CANNOT be bit-equal: the streaming carry keeps only the
            # blank DP row of alive hyps (extend_state semantics,
            # ctc_prefix_score.py:244-270), an inherent approximation (the
            # exact r_nb needs the parent prefix's rows).  Measured gap on
            # this corpus ~0.17; bound it so gross shifts (e.g. re-running
            # the prefix DP over already-scored frames) still fail.  The
            # exact extend-base regression lives in
            # test_ctc_prefix.py::test_extend_from_zero_frames_equals_fresh_init.
            assert abs(float(got_hyp[3].score) - float(want_hyp[3].score)) < 0.5, (
                f"streaming score shift on {uid}: "
                f"{float(got_hyp[3].score)} vs {float(want_hyp[3].score)}"
            )
    assert n_match == len(reader), f"streaming/offline mismatch on {len(reader) - n_match} utts"
