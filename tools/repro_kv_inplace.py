"""Minimal repro + cost quantification for the in-place KV axon crash.

Commit bf458c5 bisected a hard runtime crash ("TPU worker process crashed")
to the combination {in-place KV writes into the while_loop-carried cache
buffers} x {CTC prefix scorer in the same beam-search while_loop}; either
alone runs fine.  This script is the checked-in repro (VERDICT r3 weak #3):

  python tools/repro_kv_inplace.py concat 0.3   # default path, works
  python tools/repro_kv_inplace.py inplace 0.0  # in-place, no CTC: works
  python tools/repro_kv_inplace.py inplace 0.3  # CRASHES this axon runtime

and, run twice with ctc 0.0, quantifies the concat-vs-inplace step cost so
the perf left on the table by the default is a measured number, not a guess.

Exit codes: 0 = decode completed; the crash case kills the process from
inside the runtime (no Python exception to catch), so drivers should run it
under a subprocess/timeout.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

mode = sys.argv[1] if len(sys.argv) > 1 else "concat"
ctc_weight = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
os.environ["LLMASR_KV_INPLACE"] = "1" if mode == "inplace" else "0"

import jax
import jax.numpy as jnp
import numpy as np

SR = 16000
SECONDS = 10.0


def fence(x):
    jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main():
    from llm_guided_asr_tpu.models.conformer import ConformerConfig
    from llm_guided_asr_tpu.models.llm.llama import LlamaConfig
    from llm_guided_asr_tpu.models.llm.prompt import PromptTemplate
    from llm_guided_asr_tpu.models.llm_guided import (
        LLMGuidedASRConfig,
        LLMGuidedASRModel,
    )
    from llm_guided_asr_tpu.models.transformer_decoder import (
        TransformerDecoderConfig,
    )
    from llm_guided_asr_tpu.ops.frontend import FrontendConfig
    from llm_guided_asr_tpu.search.beam_search import BatchBeamSearch
    from llm_guided_asr_tpu.search.scorers import CachedGuidedScorer

    print(f"mode={mode} ctc_weight={ctc_weight} "
          f"backend={jax.default_backend()}", flush=True)
    llm = LlamaConfig(
        vocab_size=5000, hidden_size=512, intermediate_size=1408,
        num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=4,
        max_position_embeddings=2048,
    )
    prompt = PromptTemplate(
        prefix_ids=tuple(range(2, 50)), suffix_ids=tuple(range(50, 66)),
        start_of_response_id=70, end_of_response_id=70, pad_id=0,
    )
    cfg = LLMGuidedASRConfig(
        vocab_size=5000, llm=llm, prompt=prompt,
        frontend=FrontendConfig(), normalize="utterance_mvn",
        encoder=ConformerConfig(
            output_size=256, attention_heads=4, linear_units=1024,
            num_blocks=12, macaron_style=True, use_cnn_module=True,
            cnn_module_kernel=31,
        ),
        decoder=TransformerDecoderConfig(
            attention_heads=4, linear_units=2048, num_blocks=6
        ),
        ctc_weight=0.3,
    )
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    model = LLMGuidedASRModel(cfg, dtype=dtype)
    samples = int(SECONDS * SR)
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((1, samples)), jnp.float32) * 0.1
    lengths = jnp.full((1,), samples, jnp.int32)
    text = jnp.ones((1, 16), jnp.int32)
    tlens = jnp.full((1,), 16, jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        speech, lengths, text, tlens, deterministic=True,
    )
    enc, enc_lens = jax.jit(
        lambda s, l: model.apply(variables, s, l, method=model.encode)
    )(speech, lengths)
    fence(enc)
    bs = BatchBeamSearch(
        model, variables, vocab_size=5000, sos=70, eos=70,
        beam_size=10, ctc_weight=ctc_weight,
        att_scorer=CachedGuidedScorer(model, variables),
    )
    print("compiling decode...", flush=True)
    # bs() device_gets the result pytree internally, so the call is
    # synchronous — no extra fence needed (the returned Hypothesis lists are
    # host-side python objects)
    bs(enc, enc_lens, maxlenratio=-24.0)
    print("compiled + first decode OK", flush=True)
    iters = 5
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            bs(enc, enc_lens, maxlenratio=-24.0)
        w = (time.perf_counter() - t0) / iters
        best = w if best is None else min(best, w)
    print(f"RESULT mode={mode} ctc={ctc_weight} decode={best * 1e3:.1f} ms "
          f"rtfx={SECONDS / best:.0f}", flush=True)


if __name__ == "__main__":
    main()
