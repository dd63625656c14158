"""Batched (vmapped) beam search equals per-utterance decoding."""

import jax
import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.models.asr_model import ASRModel, ASRModelConfig
from llm_guided_asr_tpu.models.conformer import ConformerConfig
from llm_guided_asr_tpu.models.transformer_decoder import TransformerDecoderConfig
from llm_guided_asr_tpu.ops.frontend import FrontendConfig
from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch


def test_batch_decode_matches_sequential():
    cfg = ASRModelConfig(
        vocab_size=8,
        frontend=FrontendConfig(n_fft=128, hop_length=64, n_mels=20),
        normalize="utterance_mvn",
        encoder=ConformerConfig(output_size=16, attention_heads=2, linear_units=24,
                                num_blocks=1, use_cnn_module=False),
        decoder=TransformerDecoderConfig(attention_heads=2, linear_units=24, num_blocks=1),
        ctc_weight=0.3,
    )
    model = ASRModel(cfg)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((3, 2048)), jnp.float32)
    slens = jnp.asarray([2048, 1500, 900])
    text = jnp.asarray([[1, 2, -1]] * 3, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, slens, text, jnp.asarray([2, 2, 2]), deterministic=True,
    )
    enc, enc_lens = model.apply(variables, speech, slens, method=model.encode)

    beam = BatchBeamSearch(model, variables, vocab_size=8, sos=7, eos=7,
                           beam_size=3, ctc_weight=0.3)
    seq = [beam(enc[b : b + 1], enc_lens[b : b + 1], nbest=2) for b in range(3)]
    batched = beam.batch_decode(enc, enc_lens, nbest=2)
    for b in range(3):
        assert [h.yseq for h in batched[b]] == [h.yseq for h in seq[b]], f"utt {b}"
        for hb, hs in zip(batched[b], seq[b]):
            np.testing.assert_allclose(hb.score, hs.score, rtol=1e-4, atol=1e-4)
