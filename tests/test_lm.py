"""LM stack: training, perplexity, shallow fusion in beam search."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

TOKENS = ["<blank>", "<unk>", "a", "b", "c", "<sos/eos>"]


def make_text_corpus(root: Path, n=40, seed=0):
    """Highly predictable language: sentences are (abc)+ repetitions."""
    rng = np.random.default_rng(seed)
    for split, n_s in [("train", n), ("valid", max(4, n // 8))]:
        d = root / split
        d.mkdir(parents=True, exist_ok=True)
        with open(d / "text", "w") as f:
            for i in range(n_s):
                reps = int(rng.integers(1, 4))
                f.write(f"{split}_{i:03d} {'abc' * reps}\n")


@pytest.fixture(scope="module")
def lm_exp(tmp_path_factory):
    from llm_guided_asr_tpu.tasks.lm import LMTask

    root = tmp_path_factory.mktemp("lm_corpus")
    make_text_corpus(root)
    (root / "tokens.txt").write_text("\n".join(TOKENS) + "\n")
    exp = root / "exp"
    config = {
        "token_type": "char",
        "token_list": str(root / "tokens.txt"),
        "lm": "transformer",
        "lm_conf": {"embed_unit": 16, "att_unit": 16, "head": 2, "unit": 32,
                    "layer": 2, "dropout_rate": 0.0},
        "optim": "adam",
        "optim_conf": {"lr": 0.01},
        "scheduler": "none",
        "batch_type": "sorted",
        "batch_size": 16,
        "max_epoch": 10,
        "keep_nbest_models": 2,
        "log_interval": 50,
        "text_pad_multiple": 4,
        "train_data_path_and_name_and_type": [
            [str(root / "train" / "text"), "text", "text"]
        ],
        "valid_data_path_and_name_and_type": [
            [str(root / "valid" / "text"), "text", "text"]
        ],
        "output_dir": str(exp),
    }
    (root / "lm.yaml").write_text(yaml.safe_dump(config))
    LMTask.main(["--config", str(root / "lm.yaml")])
    return {"root": root, "exp": exp}


def test_lm_trains_and_perplexity_low(lm_exp):
    from llm_guided_asr_tpu.tasks.lm import calc_perplexity

    ppl = calc_perplexity(
        lm_exp["exp"] / "config.yaml",
        lm_exp["exp"] / "valid.loss.best.msgpack",
        [[str(lm_exp["root"] / "valid" / "text"), "text", "text"]],
    )
    # the (abc)+ language is near-deterministic: ppl must be way below vocab=6
    assert ppl < 2.0, f"perplexity too high: {ppl}"


def test_lm_score_fn_prefers_language(lm_exp):
    from llm_guided_asr_tpu.models.lm import make_lm_score_fn
    from llm_guided_asr_tpu.tasks.lm import LMTask

    model, variables, _ = LMTask.build_model_from_file(
        lm_exp["exp"] / "config.yaml", lm_exp["exp"] / "valid.loss.best.msgpack"
    )
    score = make_lm_score_fn(model.lm, {"params": variables["params"]["lm"]})
    # after sos(5) a(2) b(3) the language demands c(4)
    tokens = jnp.asarray([[5, 2, 3, 0]])
    lens = jnp.asarray([3])
    logp = np.asarray(score(tokens, lens))[0]
    assert int(np.argmax(logp)) == 4


def test_shallow_fusion_changes_beam_scores(lm_exp, tmp_path):
    """Plug the trained LM into BatchBeamSearch on a random ASR model."""
    from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
    from llm_guided_asr_tpu.models.conformer import ConformerConfig
    from llm_guided_asr_tpu.models.lm import make_lm_score_fn
    from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.tasks.lm import LMTask

    cfg = ASRModelConfig(
        vocab_size=6,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=20),
        normalize="utterance_mvn",
        encoder=ConformerConfig(output_size=16, attention_heads=2, linear_units=24,
                                num_blocks=1, use_cnn_module=False),
        decoder=TransformerDecoderConfig(attention_heads=2, linear_units=24, num_blocks=1),
        ctc_weight=0.3,
    )
    model = ASRModel(cfg)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((1, 1600)), jnp.float32)
    slens = jnp.asarray([1600])
    text = jnp.asarray([[2, 3, -1]], jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, jnp.asarray([2]), deterministic=True,
    )
    enc, enc_lens = model.apply(variables, speech, slens, method=model.encode)

    lm_model, lm_vars, _ = LMTask.build_model_from_file(
        lm_exp["exp"] / "config.yaml", lm_exp["exp"] / "valid.loss.best.msgpack"
    )
    lm_fn = make_lm_score_fn(lm_model.lm, {"params": lm_vars["params"]["lm"]})

    common = dict(vocab_size=6, sos=5, eos=5, beam_size=3, ctc_weight=0.3)
    no_lm = BatchBeamSearch(model, variables, **common)(enc, enc_lens, nbest=1)
    with_lm = BatchBeamSearch(
        model, variables, lm_score_fn=lm_fn, lm_weight=0.5, **common
    )(enc, enc_lens, nbest=1)
    assert np.isfinite(no_lm[0].score) and np.isfinite(with_lm[0].score)
    assert no_lm[0].score != with_lm[0].score


def test_lm_nbest_rescoring_reorders():
    """lm_rescore_nbest (fst/lm_rescore.py analog): an LM trained on 'abab'
    patterns promotes the pattern-consistent hypothesis."""
    import optax

    from llm_guided_asr_tpu.models.lm import (
        ESPnetLanguageModel,
        TransformerLM,
        TransformerLMConfig,
        lm_rescore_nbest,
    )
    from llm_guided_asr_tpu.search.beam_search import Hypothesis

    V = 6  # 0 pad, 1-4 tokens, 5 sos/eos
    lm = ESPnetLanguageModel(
        TransformerLM(TransformerLMConfig(vocab_size=V, att_unit=32, head=2,
                                          unit=64, layer=1, dropout_rate=0.0)),
        vocab_size=V,
    )
    rng = np.random.default_rng(0)
    # corpus: alternating 1 2 1 2 ...
    seqs = [[1, 2] * k for k in (2, 3, 2, 3, 2)]
    maxlen = max(len(s) for s in seqs)
    text = np.full((len(seqs), maxlen), -1, np.int64)
    for i, s in enumerate(seqs):
        text[i, : len(s)] = s
    lens = np.array([len(s) for s in seqs])
    variables = lm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(text), jnp.asarray(lens), deterministic=True,
    )
    tx = optax.adam(5e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, _), g = jax.value_and_grad(
            lambda p: lm.apply({"params": p}, jnp.asarray(text), jnp.asarray(lens),
                               deterministic=True)[:2],
            has_aux=True,
        )(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for _ in range(150):
        params, opt, _ = step(params, opt)

    hyps = [
        Hypothesis(yseq=[5, 1, 3, 1, 3, 5], score=-1.0, scores={}),  # off-pattern, better beam score
        Hypothesis(yseq=[5, 1, 2, 1, 2, 5], score=-1.5, scores={}),  # on-pattern
    ]
    out = lm_rescore_nbest(hyps, lm, {"params": params}, weight=2.0, sos=5, eos=5)
    assert out[0].yseq == [5, 1, 2, 1, 2, 5], [h.scores for h in out]
    assert "lm_rescore" in out[0].scores


def test_lm_inference_continues_pattern(lm_exp, tmp_path):
    """lm_inference CLI: the overfit 'abcabc...' LM continues the pattern."""
    from llm_guided_asr_tpu.bin.lm_inference import inference

    exp = lm_exp["exp"]
    model_file = next(exp.glob("*.best.msgpack"), None) or (exp / "latest.msgpack")
    (tmp_path / "prompts").write_text("p0 abcab\n")
    inference(str(tmp_path / "gen"), str(tmp_path / "prompts"),
              str(exp / "config.yaml"), str(model_file), n_new=4)
    line = (tmp_path / "gen" / "text").read_text().strip()
    uid, cont = line.split(maxsplit=1)
    assert uid == "p0"
    # next characters of 'abcab' under the abc-loop language start with 'c'
    assert cont.startswith("c"), cont
