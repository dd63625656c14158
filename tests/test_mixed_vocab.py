"""Mixed-vocab CTC (the reference's ctc_vocab_path, VERDICT r1 item 5).

CTC runs over its own (BPE-style) vocabulary; greedy first-pass hyps are
expanded to LLM token ids ON DEVICE via a precomputed CTC-token -> LLM-ids
table — the on-chip analog of the reference's host-side detokenize/retokenize
(transformer_decoder.py:1002-1010,1029-1034; tasks/asr.py:625-632). Training
consumes a separate 'ctc_text' stream tokenized in the CTC vocab.
"""

import pytest

pytestmark = pytest.mark.slow

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

sys.path.insert(0, str(Path(__file__).resolve().parent))

from test_llm_guided import TEMPLATE, base_config  # noqa: E402

from llm_guided_asr_tpu.utils.testing import make_tiny_llm_dir  # noqa: E402

# multi-char CTC tokens so expansion is nontrivial in the char-level tiny LLM
CTC_TOKENS = ["<blank>", "<unk>", "ab", "c", "a", "b", "<sos/eos>"]


@pytest.fixture(scope="module")
def llm_dir(tmp_path_factory):
    return make_tiny_llm_dir(tmp_path_factory.mktemp("tiny_llm_mv") / "model")


def test_expand_token_ids_manual():
    from llm_guided_asr_tpu.models.llm.prompt import expand_token_ids

    # token 1 -> [10, 11]; token 2 -> [12]; token 3 -> [] (special)
    map_ids = jnp.asarray([[0, 0], [10, 11], [12, 0], [0, 0]])
    map_lens = jnp.asarray([0, 2, 1, 0])
    hyp = jnp.asarray([[1, 2, 1, 0], [3, 2, 0, 0]])
    hyp_lens = jnp.asarray([3, 2])
    ids, lens = expand_token_ids(map_ids, map_lens, hyp, hyp_lens, pad_id=99)
    np.testing.assert_array_equal(np.asarray(lens), [5, 1])
    row0 = np.asarray(ids)[0]
    np.testing.assert_array_equal(row0[:5], [10, 11, 12, 10, 11])
    assert all(x == 99 for x in row0[5:])
    row1 = np.asarray(ids)[1]
    np.testing.assert_array_equal(row1[:1], [12])
    # hyp positions beyond hyp_lens must not leak
    assert all(x == 99 for x in row1[1:])


def test_build_ctc_to_llm_map(llm_dir):
    from transformers import AutoTokenizer

    from llm_guided_asr_tpu.models.llm.prompt import build_ctc_to_llm_map

    tok = AutoTokenizer.from_pretrained(llm_dir)
    ids, lens = build_ctc_to_llm_map(CTC_TOKENS, tok, max_expand=4)
    assert lens[0] == 0 and lens[1] == 0 and lens[-1] == 0  # specials
    assert lens[2] == 2  # "ab" -> two char ids
    a_id = tok.convert_tokens_to_ids("a")
    b_id = tok.convert_tokens_to_ids("b")
    np.testing.assert_array_equal(ids[2, :2], [a_id, b_id])
    assert lens[3] == 1 and ids[3, 0] == tok.convert_tokens_to_ids("c")


def _mixed_config(llm_dir, ctc_file, **overrides):
    cfg = base_config(llm_dir, **overrides)
    cfg["ctc_token_list"] = str(ctc_file)
    cfg["ctc_token_type"] = "char"
    return cfg


def test_mixed_vocab_train_and_decode_e2e(llm_dir, tmp_path):
    """Train via ASRTask.main with ctc_vocab != llm_vocab, then beam decode."""
    from test_e2e_tiny import make_corpus

    from llm_guided_asr_tpu.tasks.asr import ASRTask
    from llm_guided_asr_tpu.train.checkpoint import load_pytree

    root = tmp_path / "corpus"
    make_corpus(root, n_train=8, n_valid=2)
    # ctc_text stream: same transcripts, tokenized later in the CTC char vocab
    for split in ("train", "valid"):
        src = (root / split / "text").read_text()
        (root / split / "ctc_text").write_text(src)
    ctc_file = tmp_path / "ctc_tokens.txt"
    ctc_file.write_text("\n".join(CTC_TOKENS) + "\n")

    exp = tmp_path / "exp"
    config = _mixed_config(
        llm_dir, ctc_file,
        batch_type="sorted", batch_size=8, max_epoch=1, keep_nbest_models=1,
        log_interval=50, speech_pad_multiple=4000, text_pad_multiple=4,
        train_data_path_and_name_and_type=[
            [str(root / "train" / "wav.scp"), "speech", "sound"],
            [str(root / "train" / "text"), "text", "text"],
            [str(root / "train" / "ctc_text"), "ctc_text", "text"],
        ],
        valid_data_path_and_name_and_type=[
            [str(root / "valid" / "wav.scp"), "speech", "sound"],
            [str(root / "valid" / "text"), "text", "text"],
            [str(root / "valid" / "ctc_text"), "ctc_text", "text"],
        ],
        output_dir=str(exp),
        optim="adam", optim_conf={"lr": 0.001},
    )
    cfg_file = tmp_path / "train.yaml"
    cfg_file.write_text(yaml.safe_dump(config))
    ASRTask.main(["--config", str(cfg_file)])

    saved = load_pytree(exp / "1epoch.msgpack")
    assert "llm" not in saved["params"]
    # the CTC head has the CTC vocab width, not the LLM's
    assert saved["params"]["ctc_head"]["kernel"].shape[-1] == len(CTC_TOKENS)
    # the guided decoder output layer stays in the LLM vocab
    assert (
        saved["params"]["output_layer"]["kernel"].shape[-1]
        > len(CTC_TOKENS)
    )

    from llm_guided_asr_tpu.bin.asr_inference import Speech2Text
    from llm_guided_asr_tpu.data.fileio import SoundScpReader

    s2t = Speech2Text(
        exp / "config.yaml", exp / "valid.loss.best.msgpack",
        ctc_weight=0.3, beam_size=3, speech_pad_multiple=4000,
    )
    reader = SoundScpReader(root / "valid" / "wav.scp")
    uid = next(iter(reader.keys()))
    _, wav = reader[uid]
    text, tokens, ids, hyp = s2t(wav)[0]
    assert isinstance(text, str)
    assert np.isfinite(hyp.score)


def test_valid_step_receives_ctc_text(llm_dir, tmp_path):
    """Model forward without ctc_text must fail loudly in mixed mode."""
    from llm_guided_asr_tpu.tasks.asr import build_model, init_model_variables

    ctc_file = tmp_path / "ctc_tokens.txt"
    ctc_file.write_text("\n".join(CTC_TOKENS) + "\n")
    config = _mixed_config(llm_dir, ctc_file)
    model = build_model(config)
    variables = init_model_variables(model, config, seed=0)
    assert "ctc_map" in variables
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
    slens = jnp.asarray([4000, 2000])
    text = jnp.asarray([[5, 6, 7, -1], [5, -1, -1, -1]], jnp.int32)
    tlens = jnp.asarray([3, 1])
    with pytest.raises(ValueError, match="ctc_text"):
        model.apply(variables, speech, slens, text, tlens, deterministic=True)
    ctc_text = jnp.asarray([[2, 3, -1, -1], [4, -1, -1, -1]], jnp.int32)
    ctc_tlens = jnp.asarray([2, 1])
    loss, stats, w = model.apply(
        variables, speech, slens, text, tlens,
        ctc_text=ctc_text, ctc_text_lengths=ctc_tlens, deterministic=True,
    )
    assert np.isfinite(float(loss))
