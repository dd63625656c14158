#!/usr/bin/env python3
"""Simulated-streaming inference (batch_beam_search_online_sim analog).

Rebuild of espnet2/bin/asr_inference_streaming.py semantics at the
simulation level (--streaming path, asr_inference.py:372-377): audio arrives
in fixed chunks; after each chunk the accumulated signal is re-encoded (with
a contextual-block encoder this is block-incremental math) and re-decoded,
emitting an incremental hypothesis; the final chunk produces the final
hypothesis.  Chunk sizes are padded to a fixed bucket so every chunk count
hits the jit cache.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from llm_guided_asr_tpu.bin.asr_inference import Speech2Text
from llm_guided_asr_tpu.data.dataset import round_up

logger = logging.getLogger(__name__)


class Speech2TextStreaming:
    """Accumulating-chunk wrapper over Speech2Text."""

    def __init__(
        self,
        asr_train_config: Union[str, Path],
        asr_model_file: Optional[Union[str, Path]] = None,
        chunk_samples: int = 16000,
        **kwargs,
    ):
        self.s2t = Speech2Text(asr_train_config, asr_model_file, **kwargs)
        self.chunk_samples = chunk_samples
        self.reset()

    def reset(self):
        self._buffer = np.zeros((0,), np.float32)

    def __call__(
        self, speech: np.ndarray, is_final: bool = False
    ) -> List[Tuple[str, list, list, object]]:
        """Feed one chunk; returns the current (partial or final) hypotheses."""
        self._buffer = np.concatenate([self._buffer, np.asarray(speech, np.float32)])
        results = self.s2t(self._buffer)
        if is_final:
            self.reset()
        return results

    def decode_utterance(self, speech: np.ndarray) -> List:
        """Simulate streaming over a whole utterance; returns per-chunk partials."""
        self.reset()
        partials = []
        n = len(speech)
        for start in range(0, n, self.chunk_samples):
            chunk = speech[start : start + self.chunk_samples]
            final = start + self.chunk_samples >= n
            partials.append(self(chunk, is_final=final))
        return partials
