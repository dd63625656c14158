"""llm_guided_asr_tpu: a TPU-native (JAX/XLA/Pallas) ASR framework.

A ground-up rebuild of the capabilities of jerryyang1231/llm-guided-asr
(an ESPnet-202409 fork whose headline contribution is an LLM-guided
CTC/attention recognizer) designed TPU-first:

- compute path: jitted JAX with static shapes, bf16 matmuls on the MXU,
  Pallas kernels for the hot recurrences;
- scale path: ``jax.sharding.Mesh`` + NamedSharding, XLA collectives over ICI;
- search path: fully vectorized on-device beam search (``lax.while_loop``),
  no host round-trips per token.

Reference layer map: /root/reference SURVEY.md §1.
"""

__version__ = "0.1.0"
