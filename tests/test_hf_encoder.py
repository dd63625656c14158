"""HF transformers encoder/postencoder (models/hf_encoder.py): torch parity.

Mirrors the ingest-and-verify strategy of tests/test_hf_decoder.py for
- espnet2/asr/postencoder/hugging_face_transformers_postencoder.py
- espnet2/asr/encoder/hugging_face_transformers_encoder.py
using a tiny random BertModel / RobertaModel built offline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def bert_dir(tmp_path_factory):
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=64, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=40, type_vocab_size=2, pad_token_id=0,
    )
    model = BertModel(cfg)
    model.eval()
    d = tmp_path_factory.mktemp("tiny_bert")
    model.save_pretrained(d)
    return d


def _extend(mask):
    import torch

    m = torch.tensor(mask, dtype=torch.float32)[:, None, None, :]
    return (1.0 - m) * -10000.0


def test_bert_body_parity(bert_dir):
    """Ingested BertBody == torch model.encoder over hidden states."""
    import torch
    from transformers import AutoConfig, AutoModel

    from llm_guided_asr_tpu.models.hf_encoder import (
        BertBody,
        BertBodyConfig,
        convert_hf_bert_weights,
    )

    hf = AutoModel.from_pretrained(bert_dir, torch_dtype=torch.float32)
    cfg = BertBodyConfig.from_hf_config(AutoConfig.from_pretrained(bert_dir))
    params = convert_hf_bert_weights(hf.state_dict(), cfg,
                                     include_embeddings=False)
    rng = np.random.default_rng(0)
    b, t = 2, 7
    x = rng.standard_normal((b, t, 16)).astype(np.float32)
    lens = np.asarray([7, 5])
    valid = np.arange(t)[None, :] < lens[:, None]
    ours = BertBody(cfg).apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(valid))
    with torch.no_grad():
        theirs = hf.encoder(
            torch.tensor(x), attention_mask=_extend(valid.astype(np.float32))
        ).last_hidden_state.numpy()
    for bi in range(b):
        np.testing.assert_allclose(
            np.asarray(ours)[bi, : lens[bi]], theirs[bi, : lens[bi]],
            rtol=2e-4, atol=2e-4,
        )


def test_hf_encoder_token_parity(bert_dir):
    """HFTransformersEncoder(input_ids) == torch BertModel last_hidden_state
    on valid positions, including the lang-token prepend."""
    import torch
    from transformers import AutoConfig, AutoModel

    from llm_guided_asr_tpu.models.hf_encoder import (
        BertBodyConfig,
        HFTransformersEncoder,
        convert_hf_bert_weights,
    )

    hf = AutoModel.from_pretrained(bert_dir, torch_dtype=torch.float32)
    cfg = BertBodyConfig.from_hf_config(AutoConfig.from_pretrained(bert_dir))
    params = convert_hf_bert_weights(hf.state_dict(), cfg)
    ids = np.asarray([[5, 9, 11, 3], [7, 2, 0, 0]], np.int64)
    lens = np.asarray([4, 2])
    enc = HFTransformersEncoder(cfg, lang_token_id=8)
    ours, olens = enc.apply({"params": params}, jnp.asarray(ids),
                            jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(olens), lens + 1)
    ids_t = np.concatenate([np.full((2, 1), 8, np.int64), ids], axis=1)
    valid = np.arange(5)[None, :] < (lens + 1)[:, None]
    with torch.no_grad():
        theirs = hf(
            input_ids=torch.tensor(ids_t),
            attention_mask=torch.tensor(valid.astype(np.float32)),
        ).last_hidden_state.numpy()
    for bi in range(2):
        np.testing.assert_allclose(
            np.asarray(ours)[bi, : lens[bi] + 1], theirs[bi, : lens[bi] + 1],
            rtol=2e-4, atol=2e-4,
        )


def test_roberta_position_offset(tmp_path):
    """RoBERTa's position ids start at pad_token_id + 1; parity confirms the
    offset handling."""
    import torch
    from transformers import AutoConfig, RobertaConfig, RobertaModel

    from llm_guided_asr_tpu.models.hf_encoder import (
        BertBodyConfig,
        HFTransformersEncoder,
        convert_hf_bert_weights,
    )

    torch.manual_seed(1)
    rcfg = RobertaConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=40, pad_token_id=1, type_vocab_size=1,
    )
    hf = RobertaModel(rcfg)
    hf.eval()
    hf.save_pretrained(tmp_path / "roberta")
    cfg = BertBodyConfig.from_hf_config(
        AutoConfig.from_pretrained(tmp_path / "roberta")
    )
    params = convert_hf_bert_weights(hf.state_dict(), cfg)
    ids = np.asarray([[5, 9, 11]], np.int64)
    lens = np.asarray([3])
    ours, _ = HFTransformersEncoder(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(lens)
    )
    with torch.no_grad():
        theirs = hf(input_ids=torch.tensor(ids)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=3e-4, atol=3e-4)


def test_postencoder_parity_and_adaptor(bert_dir):
    """Length adaptor halves time; the pretrained body over linear_in
    projections matches torch."""
    import torch
    from transformers import AutoConfig, AutoModel

    from llm_guided_asr_tpu.models.hf_encoder import (
        BertBodyConfig,
        HFPostEncoderConfig,
        HFTransformersPostEncoder,
        load_hf_postencoder_params,
    )

    body = BertBodyConfig.from_hf_config(AutoConfig.from_pretrained(bert_dir))
    cfg = HFPostEncoderConfig(
        body=body, input_size=12, length_adaptor_n_layers=0,
        model_name_or_path=str(bert_dir),
    )
    post = HFTransformersPostEncoder(cfg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 12)).astype(np.float32)
    lens = np.asarray([6, 4])
    variables = post.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(lens))
    pre = load_hf_postencoder_params(cfg)
    params = {**variables["params"], **pre}
    ours, olens = post.apply({"params": params}, jnp.asarray(x),
                             jnp.asarray(lens))
    np.testing.assert_array_equal(np.asarray(olens), lens)

    hf = AutoModel.from_pretrained(bert_dir, torch_dtype=torch.float32)
    w = np.asarray(params["linear_in"]["kernel"])
    b_ = np.asarray(params["linear_in"]["bias"])
    proj = x @ w + b_
    valid = (np.arange(6)[None, :] < lens[:, None]).astype(np.float32)
    with torch.no_grad():
        theirs = hf.encoder(
            torch.tensor(proj), attention_mask=_extend(valid)
        ).last_hidden_state.numpy()
    for bi in range(2):
        np.testing.assert_allclose(
            np.asarray(ours)[bi, : lens[bi]], theirs[bi, : lens[bi]],
            rtol=2e-4, atol=2e-4,
        )

    # adaptor: 1 layer halves frames and lengths
    cfg2 = HFPostEncoderConfig(
        body=body, input_size=12, length_adaptor_n_layers=1,
        model_name_or_path=str(bert_dir),
    )
    post2 = HFTransformersPostEncoder(cfg2)
    v2 = post2.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lens))
    y2, l2 = post2.apply(v2, jnp.asarray(x), jnp.asarray(lens))
    assert y2.shape[1] == 3
    np.testing.assert_array_equal(np.asarray(l2), [3, 2])


def test_postencoder_in_asr_task(bert_dir):
    """postencoder: hugging_face_transformers through the ASR task path:
    pretrained body injected, loss finite, encoder output width = BERT
    hidden."""
    from llm_guided_asr_tpu.tasks.asr import build_model, init_model_variables

    config = {
        "token_list": ["<blank>", "<unk>", "a", "b", "<sos/eos>"],
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
        "normalize": "utterance_mvn",
        "encoder_conf": {
            "output_size": 16, "attention_heads": 2, "linear_units": 32,
            "num_blocks": 1, "use_cnn_module": False, "dropout_rate": 0.0,
        },
        "postencoder": "hugging_face_transformers",
        "postencoder_conf": {"model_name_or_path": str(bert_dir)},
        "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                         "num_blocks": 1},
        "model_conf": {"ctc_weight": 0.3},
    }
    model = build_model(config)
    variables = init_model_variables(model, config)

    import torch
    from transformers import AutoModel

    hf = AutoModel.from_pretrained(bert_dir, torch_dtype=torch.float32)
    want = hf.state_dict()["encoder.layer.0.attention.self.query.weight"].numpy().T
    got = np.asarray(
        variables["params"]["postencoder"]["body"]["layers_0"]["query"]["kernel"]
    )
    np.testing.assert_allclose(got, want, atol=1e-6)

    speech = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4000)), jnp.float32
    )
    lens = jnp.asarray([4000, 3200])
    text = jnp.asarray([[2, 3], [3, -1]], jnp.int32)
    tlens = jnp.asarray([2, 1])
    loss, stats, _ = model.apply(
        variables, speech, lens, text, tlens, deterministic=True
    )
    assert np.isfinite(float(loss))
    enc, enc_lens = model.apply(variables, speech, lens, method=model.encode)
    assert enc.shape[-1] == 16  # tiny BERT hidden


def test_mt_hugging_face_encoder_trains(bert_dir):
    """task=mt with encoder: hugging_face builds, ingests, and trains."""
    import optax

    from llm_guided_asr_tpu.tasks.generic import TASK_BUILDERS

    config = {
        "task": "mt",
        "token_list": ["<blank>", "<unk>", "x", "y", "<sos/eos>"],
        "encoder": "hugging_face",
        "encoder_conf": {"model_name_or_path": str(bert_dir)},
        "model_conf": {"adim": 16, "heads": 2, "units": 32, "elayers": 1},
        "decoder_conf": {"attention_heads": 2, "linear_units": 32,
                         "num_blocks": 1},
    }
    model, names, dummy = TASK_BUILDERS["mt"](config)
    assert names == ("text", "text_lengths", "src_text", "src_text_lengths")
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, *dummy, deterministic=True)

    from llm_guided_asr_tpu.models.hf_encoder import load_hf_encoder_params

    _, pre = load_hf_encoder_params(str(bert_dir))
    params = {
        **variables["params"],
        "hf_encoder": {**variables["params"]["hf_encoder"], **pre},
    }
    text = jnp.asarray([[2, 3], [3, -1]], jnp.int32)
    tlens = jnp.asarray([2, 1])
    src = jnp.asarray([[5, 9, 11], [7, -1, -1]], jnp.int32)
    slens = jnp.asarray([3, 1])

    def lf(p):
        loss, stats, _ = model.apply(
            {"params": p}, text, tlens, src, slens, deterministic=True
        )
        return loss

    loss, g = jax.value_and_grad(lf)(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
