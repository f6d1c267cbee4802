"""TPU-native (JAX/XLA) rebuild of the Mimi neural audio codec.

The reference delegates the codec to `transformers.MimiModel`
(reference: src/sopro/codec/mimi.py:11-31); here the full decode and encode
paths are implemented as pure JAX functions over parameter pytrees so the
vocoder runs on-device, fused by XLA, and composes with jit/scan/pjit.
"""

from sopro_tpu.codec.adapter import MimiCodec, MimiStreamDecoder
from sopro_tpu.codec.mimi_config import MimiConfig
from sopro_tpu.codec.mimi_jax import (
    mimi_decode,
    mimi_encode,
    rvq_decode,
    rvq_encode,
)

__all__ = [
    "MimiCodec",
    "MimiConfig",
    "MimiStreamDecoder",
    "mimi_decode",
    "mimi_encode",
    "rvq_decode",
    "rvq_encode",
]
