"""Pretrained encoder import parity: flax ports vs HF torch (eval mode).

Tiny randomly-initialized HF configs (no downloads) cover the weight-layout
conversion and the forward math for wav2vec2 (group-norm/post-norm base AND
layer-norm/pre-norm large variants), HuBERT, and the Whisper encoder.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from llm_guided_asr_tpu.models.ssl_encoders import (
    W2VConfig,
    Wav2Vec2Encoder,
    WhisperEncConfig,
    WhisperEncoder,
    convert_hf_wav2vec2_state_dict,
    convert_hf_whisper_encoder_state_dict,
)

TINY_W2V = dict(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=48,
    conv_dim=[16, 16],
    conv_kernel=[10, 3],
    conv_stride=[5, 2],
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


def _run_parity(hf_model, hf_cfg, audio_len=2000):
    hf_model.eval()
    cfg = W2VConfig.from_hf_config(hf_cfg)
    params = convert_hf_wav2vec2_state_dict(hf_model.state_dict(), cfg)
    enc = Wav2Vec2Encoder(cfg)
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, audio_len)).astype(np.float32)
    lens = np.array([audio_len, audio_len * 2 // 3], np.int64)
    with torch.no_grad():
        t = int(cfg.out_lengths(jnp.asarray(lens))[0])
        mask = torch.zeros(2, audio_len, dtype=torch.long)
        mask[0, :] = 1
        mask[1, : lens[1]] = 1
        want = hf_model(
            torch.from_numpy(wav), attention_mask=mask
        ).last_hidden_state.numpy()
    got, got_lens = enc.apply({"params": params}, jnp.asarray(wav), jnp.asarray(lens))
    got = np.asarray(got)
    t1 = int(got_lens[1])
    np.testing.assert_allclose(got[0], want[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :t1], want[1, :t1], atol=2e-4, rtol=1e-3)


def test_wav2vec2_base_parity():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    hf_cfg = Wav2Vec2Config(**TINY_W2V, feat_extract_norm="group",
                            do_stable_layer_norm=False, conv_bias=False)
    _run_parity(Wav2Vec2Model(hf_cfg), hf_cfg)


def test_wav2vec2_large_style_parity():
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    hf_cfg = Wav2Vec2Config(**TINY_W2V, feat_extract_norm="layer",
                            do_stable_layer_norm=True, conv_bias=True)
    _run_parity(Wav2Vec2Model(hf_cfg), hf_cfg)


def test_hubert_parity():
    from transformers import HubertConfig, HubertModel

    hf_cfg = HubertConfig(**TINY_W2V, feat_extract_norm="group",
                          do_stable_layer_norm=False, conv_bias=False)
    _run_parity(HubertModel(hf_cfg), hf_cfg)


def test_whisper_encoder_parity():
    from transformers import WhisperConfig, WhisperModel

    hf_cfg = WhisperConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=48, num_mel_bins=12, max_source_positions=64,
        decoder_layers=1, decoder_attention_heads=2, decoder_ffn_dim=48,
    )
    model = WhisperModel(hf_cfg).encoder
    model.eval()
    cfg = WhisperEncConfig.from_hf_config(hf_cfg)
    params = convert_hf_whisper_encoder_state_dict(model.state_dict(), cfg)
    enc = WhisperEncoder(cfg)
    rng = np.random.default_rng(1)
    T = 2 * hf_cfg.max_source_positions  # whisper fixes T = 2 * positions
    feats = rng.standard_normal((2, T, hf_cfg.num_mel_bins)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(feats).transpose(1, 2)).last_hidden_state.numpy()
    lens = np.array([T, T], np.int64)
    got, got_lens = enc.apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(lens)
    )
    assert int(got_lens[0]) == want.shape[1]
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_asr_task_with_pretrained_hubert_encoder(tmp_path):
    """encoder: hubert_hf end-to-end: build from config, pretrained weights
    injected at params.encoder.ssl, one train step runs, greedy decode works."""
    from transformers import HubertConfig, HubertModel

    import jax
    import optax

    from llm_guided_asr_tpu.tasks.asr import (
        build_model,
        init_model_variables,
    )

    hf_dir = tmp_path / "tiny_hubert"
    hf_cfg = HubertConfig(**TINY_W2V, feat_extract_norm="group",
                          do_stable_layer_norm=False, conv_bias=False)
    HubertModel(hf_cfg).save_pretrained(hf_dir)

    config = {
        "token_type": "char",
        "token_list": ["<blank>", "<unk>", "a", "b", "<sos/eos>"],
        "frontend": "none",
        "normalize": "none",
        "encoder": "hubert_hf",
        "encoder_conf": {"model_name_or_path": str(hf_dir), "output_size": 32},
        "decoder_conf": {"attention_heads": 2, "linear_units": 32, "num_blocks": 1,
                         "dropout_rate": 0.0},
        "model_conf": {"ctc_weight": 0.5},
    }
    model = build_model(config)
    variables = init_model_variables(model, config, seed=0)

    # pretrained weights actually landed (not random init)
    want = HubertModel.from_pretrained(hf_dir).state_dict()
    got = variables["params"]["encoder"]["ssl"]["feature_projection_projection"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got), want["feature_projection.projection.weight"].numpy().T, atol=1e-6
    )

    speech = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4000)), jnp.float32)
    slens = jnp.asarray([4000, 3000], jnp.int32)
    text = jnp.asarray([[2, 3, 2], [3, 2, -1]], jnp.int32)
    tlens = jnp.asarray([3, 2], jnp.int32)

    def loss_fn(params):
        loss, stats, w = model.apply(
            {**variables, "params": params}, speech, slens, text, tlens,
            deterministic=True,
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = optax.global_norm(grads)
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0


def test_whisper_full_model_parity_and_decode():
    """Full Whisper (encoder+decoder) import: logits match HF; greedy decode
    over our beam-search-compatible decoder_logits reproduces HF greedy."""
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperForConditionalGeneration

    import jax
    import jax.numpy as jnp

    from llm_guided_asr_tpu.models.whisper import (
        WhisperASR,
        WhisperConfig,
        convert_hf_whisper_state_dict,
    )

    hf_cfg = HFWhisperConfig(
        vocab_size=97, d_model=32, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=48, decoder_layers=2, decoder_attention_heads=2,
        decoder_ffn_dim=48, num_mel_bins=12, max_source_positions=32,
        max_target_positions=24, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=1, suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    hf = WhisperForConditionalGeneration(hf_cfg)
    hf.eval()
    cfg = WhisperConfig.from_hf_config(hf_cfg)
    params = convert_hf_whisper_state_dict(hf.model.state_dict(), cfg)
    ours = WhisperASR(cfg)

    rng = np.random.default_rng(0)
    T = 2 * hf_cfg.max_source_positions
    feats = rng.standard_normal((1, T, hf_cfg.num_mel_bins)).astype(np.float32)
    ys = np.array([[5, 9, 11, 3]], np.int64)
    with torch.no_grad():
        want = hf(
            input_features=torch.from_numpy(feats).transpose(1, 2),
            decoder_input_ids=torch.from_numpy(ys),
        ).logits.numpy()

    enc, enc_lens = ours.apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray([T]),
        method=ours.encode,
    )
    got = ours.apply(
        {"params": params}, enc, enc_lens, jnp.asarray(ys, jnp.int32),
        jnp.asarray([4], jnp.int32), method=ours.decoder_logits,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=1e-3)

    # greedy continuation parity over 5 steps
    ids = [1]  # decoder start token
    hf_ids = torch.tensor([ids])
    for _ in range(5):
        with torch.no_grad():
            nxt = hf(
                input_features=torch.from_numpy(feats).transpose(1, 2),
                decoder_input_ids=hf_ids,
            ).logits[0, -1].argmax().item()
        hf_ids = torch.cat([hf_ids, torch.tensor([[nxt]])], dim=1)
    ours_ids = list(ids)
    for _ in range(5):
        logits = ours.apply(
            {"params": params}, enc, enc_lens,
            jnp.asarray([ours_ids], jnp.int32),
            jnp.asarray([len(ours_ids)], jnp.int32),
            method=ours.decoder_logits, only_last=True,
        )
        ours_ids.append(int(jnp.argmax(logits[0])))
    assert ours_ids == hf_ids[0].tolist()


def test_whisper_inference_prompt_seeded_beam():
    """WhisperSpeech2Text: prompt-seeded CTC-less beam decode over a tiny
    random Whisper; output is token ids past the prompt, ending cleanly."""
    from transformers import WhisperConfig as HFWhisperConfig
    from transformers import WhisperModel

    import jax

    from llm_guided_asr_tpu.bin.whisper_inference import WhisperSpeech2Text
    from llm_guided_asr_tpu.models.whisper import (
        WhisperASR,
        WhisperConfig,
        convert_hf_whisper_state_dict,
    )

    hf_cfg = HFWhisperConfig(
        vocab_size=50, d_model=32, encoder_layers=1, encoder_attention_heads=2,
        encoder_ffn_dim=48, decoder_layers=1, decoder_attention_heads=2,
        decoder_ffn_dim=48, num_mel_bins=80, max_source_positions=1500,
        max_target_positions=64, pad_token_id=0, bos_token_id=1,
        eos_token_id=2, decoder_start_token_id=1, suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    hf = WhisperModel(hf_cfg)
    cfg = WhisperConfig.from_hf_config(hf_cfg)
    params = convert_hf_whisper_state_dict(hf.state_dict(), cfg)
    model = WhisperASR(cfg)
    s2t = WhisperSpeech2Text(
        beam_size=3, maxlenratio=-8.0,
        _preloaded=(model, {"params": params}, None, [1, 3], 2),
    )
    wav = np.sin(np.linspace(0, 100, 16000, dtype=np.float32)) * 0.3
    ids = s2t(wav)
    assert isinstance(ids, list)
    assert all(0 <= i < 50 for i in ids)
    assert 1 not in ids and 3 not in ids and 2 not in ids  # prompt/eot stripped
    assert len(ids) <= 8


def test_ssl_frontend_feeds_main_encoder(tmp_path):
    """frontend: ssl (s3prl.py S3prlFrontend analog): frozen wav2vec2
    features feed a trainable conformer; SSL grads are zero (frozen)."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    import jax
    import optax

    from llm_guided_asr_tpu.tasks.asr import build_model, init_model_variables

    hf_dir = tmp_path / "tiny_w2v"
    hf_cfg = Wav2Vec2Config(**TINY_W2V, feat_extract_norm="group",
                            do_stable_layer_norm=False, conv_bias=False)
    Wav2Vec2Model(hf_cfg).save_pretrained(hf_dir)

    config = {
        "token_type": "char",
        "token_list": ["<blank>", "<unk>", "a", "b", "<sos/eos>"],
        "frontend": "ssl",
        "frontend_conf": {"model_name_or_path": str(hf_dir), "kind": "wav2vec2"},
        "normalize": "utterance_mvn",
        "encoder_conf": {"output_size": 16, "attention_heads": 2,
                         "linear_units": 24, "num_blocks": 1,
                         "use_cnn_module": False, "input_layer": "linear"},
        "decoder_conf": {"attention_heads": 2, "linear_units": 24,
                         "num_blocks": 1},
        "model_conf": {"ctc_weight": 0.5},
    }
    model = build_model(config)
    variables = init_model_variables(model, config, seed=0)
    assert "ssl_frontend" in variables["params"]

    # features come from the SSL trunk: hidden_size-dim, subsampled ~320x
    speech = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 6400)), jnp.float32
    )
    slens = jnp.asarray([6400, 4800], jnp.int32)
    feats = model.apply(variables, speech, slens,
                        method=model.collect_feats)
    assert feats["feats"].shape[-1] == hf_cfg.hidden_size

    text = jnp.asarray([[2, 3], [3, -1]], jnp.int32)
    tlens = jnp.asarray([2, 1], jnp.int32)
    loss, grads = jax.value_and_grad(
        lambda p: model.apply({**variables, "params": p}, speech, slens, text,
                              tlens, deterministic=True)[0]
    )(variables["params"])
    assert np.isfinite(float(loss))
    # frozen: no gradient reaches the SSL trunk; the recognizer trains
    assert float(optax.global_norm(grads["ssl_frontend"])) == 0.0
    assert float(optax.global_norm(grads["encoder"])) > 0.0
