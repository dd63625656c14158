"""Pretrained causal-LM ASR decoder (hugging_face_transformers_decoder.py
causal_lm path analog): torch logits parity + hybrid model training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def llm_dir(tmp_path_factory):
    from llm_guided_asr_tpu.utils.testing import make_tiny_llm_dir

    return make_tiny_llm_dir(tmp_path_factory.mktemp("llm"))


def test_hf_decoder_matches_torch(llm_dir):
    """Packed [prefix, enc, postfix, ys] logits == torch inputs_embeds run."""
    import torch
    from transformers import AutoConfig, AutoModelForCausalLM

    from llm_guided_asr_tpu.models.hf_decoder import (
        HFCausalDecoder,
        HFCausalDecoderConfig,
    )
    from llm_guided_asr_tpu.models.llm.llama import (
        LlamaConfig,
        convert_hf_state_dict,
    )

    hf_cfg = AutoConfig.from_pretrained(llm_dir)
    cfg = LlamaConfig.from_hf_config(hf_cfg)
    dcfg = HFCausalDecoderConfig(llm=cfg, prefix_ids=(1, 5), postfix_ids=(6,),
                                 enc_frames_max=4)
    dec = HFCausalDecoder(dcfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    b, t_enc, d_enc, l = 2, 4, 8, 3
    memory = jnp.asarray(rng.standard_normal((b, t_enc, d_enc)), jnp.float32)
    memory_lengths = jnp.asarray([4, 4])  # full-width: no mid-row pads
    ys = jnp.asarray([[2, 3, 4], [3, 4, 2]], jnp.int32)
    ys_lens = jnp.asarray([3, 3])
    variables = dec.init({"params": jax.random.PRNGKey(0)}, memory,
                         memory_lengths, ys, ys_lens)
    hf_model = AutoModelForCausalLM.from_pretrained(llm_dir,
                                                    torch_dtype=torch.float32)
    llm_params = convert_hf_state_dict(hf_model.state_dict(), cfg)
    params = {**variables["params"], "llm": llm_params}
    ours = np.asarray(dec.apply({"params": params}, memory, memory_lengths,
                                ys, ys_lens))

    # torch reference: same packing through inputs_embeds
    w_in = np.asarray(params["linear_in"]["kernel"])
    b_in = np.asarray(params["linear_in"]["bias"])
    enc_proj = np.asarray(memory) @ w_in + b_in  # [b, t_enc, H]
    emb = hf_model.get_input_embeddings()
    with torch.no_grad():
        pre = emb(torch.tensor([[1, 5]] * b))
        post = emb(torch.tensor([[6]] * b))
        yse = emb(torch.tensor(np.asarray(ys)))
        packed = torch.cat([pre, torch.tensor(enc_proj, dtype=torch.float32),
                            post, yse], dim=1)
        out = hf_model(inputs_embeds=packed).logits.numpy()
    theirs = out[:, 2 + t_enc + 1 :]
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_hf_decoder_hybrid_model_trains(llm_dir, tmp_path):
    """decoder=hugging_face in the ASR task: build, inject weights, train."""
    import optax

    from llm_guided_asr_tpu.tasks.asr import (
        build_model,
        init_model_variables,
    )

    config = {
        "token_list": None,
        "token_type": "hugging_face",
        "bpemodel": str(llm_dir),
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
        "normalize": "utterance_mvn",
        "decoder": "hugging_face",
        "decoder_conf": {"model_name_or_path": str(llm_dir),
                         "enc_frames_max": 16},
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "use_cnn_module": False, "input_layer": "linear"},
        "model_conf": {"ctc_weight": 0.3},
    }
    model = build_model(config)
    variables = init_model_variables(model, config)
    assert "llm" in variables["params"]["decoder"]

    rng = np.random.default_rng(1)
    speech = jnp.asarray(rng.standard_normal((2, 2048)) * 0.1, jnp.float32)
    slens = jnp.asarray([2048, 1600])
    text = jnp.asarray([[2, 3, 4], [3, 4, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2])
    loss, stats, _ = model.apply(variables, speech, slens, text, tlens,
                                 deterministic=True)
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda p: model.apply({"params": p}, speech, slens, text, tlens,
                              deterministic=True)[0]
    )(variables["params"])
    assert float(optax.global_norm(g["encoder"])) > 0


def test_hf_decoder_beam_decode(llm_dir):
    """decoder=hugging_face plugs into the on-device beam search."""
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.tasks.asr import build_model, init_model_variables

    config = {
        "token_type": "hugging_face",
        "token_list": None,
        "bpemodel": str(llm_dir),
        "frontend_conf": {"n_fft": 256, "hop_length": 128, "n_mels": 20},
        "normalize": "utterance_mvn",
        "decoder": "hugging_face",
        "decoder_conf": {"model_name_or_path": str(llm_dir),
                         "enc_frames_max": 16},
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "use_cnn_module": False, "input_layer": "linear"},
        "model_conf": {"ctc_weight": 0.3},
    }
    model = build_model(config)
    variables = init_model_variables(model, config)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((1, 2048)) * 0.1, jnp.float32)
    enc, enc_lens = model.apply(variables, speech, jnp.asarray([2048]),
                                method=model.encode)
    bs = BatchBeamSearch(
        model, variables, vocab_size=model.cfg.vocab_size,
        sos=model.cfg.sos_id, eos=model.cfg.eos_id, beam_size=3,
        ctc_weight=0.3,
    )
    hyps = bs(enc, enc_lens, maxlenratio=-6.0)
    assert hyps and len(hyps[0].yseq) >= 2
    assert all(0 <= i < model.cfg.vocab_size for i in hyps[0].yseq)
