"""MT reference-parity depth (VERDICT r4 weak #5 / next #10).

Reference: espnet2/mt/espnet_model.py — separate src/tgt vocabularies
(src_token_list + MutliTokenizerCommonPreprocessor), src_sos/src_eos
delimiter wrapping (:240-243), shared decoder input/output embedding
(:71-79), shared encoder/decoder input embedding (:82-91); BLEU scoring.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llm_guided_asr_tpu.models.mt import MTConfig, MTModel
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig

DEC = TransformerDecoderConfig(attention_heads=2, linear_units=32, num_blocks=1)


def _batch(tgt_vocab=20, src_vocab=30):
    g = np.random.default_rng(0)
    text = jnp.asarray(g.integers(1, tgt_vocab - 1, (2, 4)), jnp.int32)
    tl = jnp.asarray([4, 3])
    src = jnp.asarray(g.integers(1, src_vocab - 1, (2, 5)), jnp.int32)
    sl = jnp.asarray([5, 4])
    return text, tl, src, sl


def test_separate_vocabs_train():
    cfg = MTConfig(vocab_size=20, src_vocab_size=30, adim=16, heads=2,
                   units=32, elayers=1, decoder=DEC)
    model = MTModel(cfg)
    text, tl, src, sl = _batch()
    variables = model.init(jax.random.PRNGKey(0), text, tl, src, sl)
    # src embedding table must have the SRC vocab rows
    assert variables["params"]["src_embed"]["embedding"].shape[0] == 30
    assert variables["params"]["decoder"]["embed"]["embedding"].shape[0] == 20
    loss, stats, _ = model.apply(variables, text, tl, src, sl)
    assert np.isfinite(float(loss))

    params = variables["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        loss, g = jax.value_and_grad(
            lambda q: model.apply({"params": q}, text, tl, src, sl)[0]
        )(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    first = None
    for _ in range(10):
        params, opt, loss = step(params, opt)
        first = float(loss) if first is None else first
    assert float(loss) < first


def test_src_sos_prepended():
    """encode() must wrap the source with src_sos (espnet_model.py:240)."""
    cfg = MTConfig(vocab_size=20, src_vocab_size=30, adim=16, heads=2,
                   units=32, elayers=1, decoder=DEC, patch_size=2)
    model = MTModel(cfg)
    text, tl, src, sl = _batch()
    variables = model.init(jax.random.PRNGKey(0), text, tl, src, sl)
    enc, enc_lens = model.apply(variables, src, sl, method=model.encode)
    assert enc.shape[1] == src.shape[1] + 2  # patch_size sos columns
    np.testing.assert_array_equal(np.asarray(enc_lens), np.asarray(sl) + 2)


def test_tied_decoder_output():
    cfg = MTConfig(vocab_size=20, adim=16, heads=2, units=32, elayers=1,
                   decoder=DEC, share_decoder_input_output_embed=True)
    model = MTModel(cfg)
    text, tl, src, sl = _batch(src_vocab=20)
    variables = model.init(jax.random.PRNGKey(0), text, tl, src, sl)
    # no separate output_layer kernel when tied
    assert "output_layer" not in variables["params"]["decoder"]
    loss, _, _ = model.apply(variables, text, tl, src, sl)
    assert np.isfinite(float(loss))


def test_shared_encoder_decoder_embedding():
    cfg = MTConfig(vocab_size=20, adim=16, heads=2, units=32, elayers=1,
                   decoder=DEC, share_encoder_decoder_input_embed=True)
    model = MTModel(cfg)
    text, tl, src, sl = _batch(src_vocab=20)
    variables = model.init(jax.random.PRNGKey(0), text, tl, src, sl)
    # one shared table: decoder has no own embed params
    assert "embed" not in variables["params"].get("decoder", {})
    loss, _, _ = model.apply(variables, text, tl, src, sl)
    assert np.isfinite(float(loss))


def test_builder_src_token_list(tmp_path):
    from llm_guided_asr_tpu.tasks.generic import TASK_BUILDERS

    tgt = tmp_path / "tgt.txt"
    tgt.write_text("\n".join(str(i) for i in range(20)) + "\n")
    srcf = tmp_path / "src.txt"
    srcf.write_text("\n".join(str(i) for i in range(30)) + "\n")
    model, names, dummy = TASK_BUILDERS["mt"]({
        "token_list": str(tgt), "src_token_list": str(srcf),
        "model_conf": {"adim": 16, "heads": 2, "units": 32, "elayers": 1},
        "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                         "num_blocks": 1},
    })
    assert model.cfg.src_vocab_size == 30 and model.cfg.vocab_size == 20
    variables = model.init(jax.random.PRNGKey(0), *dummy)
    loss, _, _ = model.apply(variables, *dummy)
    assert np.isfinite(float(loss))


def test_score_cli_bleu(tmp_path):
    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("u1 the cat sat on the mat\nu2 hello world again\n")
    hyp.write_text("u1 the cat sat on the mat\nu2 hello world again\n")
    from llm_guided_asr_tpu.bin.score import score

    r = score(str(ref), str(hyp), token_type="bleu")
    assert r["metric"] == "BLEU"
    assert abs(r["bleu"] - 100.0) < 1e-6
    hyp.write_text("u1 the cat sat on a mat\nu2 hello there again\n")
    r2 = score(str(ref), str(hyp), token_type="bleu")
    assert 0.0 < r2["bleu"] < 100.0


def test_corpus_bleu_exp_smoothing():
    """Zero 4-gram matches must NOT zero the whole score: sacrebleu's
    default exp smoothing gives 1/(2^k * total) for zero-match orders."""
    from llm_guided_asr_tpu.utils.metrics import corpus_bleu

    refs = [list("abcdef")]
    hyps = [list("abcxyz")]  # 1/2-gram matches exist, no 3/4-gram match
    score = corpus_bleu(refs, hyps)
    assert 0.0 < score < 100.0
    # perfect match is still 100
    assert abs(corpus_bleu(refs, [list("abcdef")]) - 100.0) < 1e-6
    # and a worse hypothesis scores lower
    worse = corpus_bleu(refs, [list("axcxez")])
    assert worse < score
