"""`MimiCodec`-shaped adapter over the JAX codec (reference:
src/sopro/codec/mimi.py:18-181), for users who drive the codec directly.

`encode_file` reproduces the reference preprocessing chain (load -> VAD trim
-> resample -> crop to whole frames -> encode); `decode_full` is the batch
vocoder; `MimiStreamDecoder.decode_step` streams chunks with *exact* state
(the reference re-decodes a 2-frame overlap as an approximation)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sopro_tpu import audio as A
from sopro_tpu.codec.mimi_config import MimiConfig
from sopro_tpu.codec.mimi_jax import mimi_decode, mimi_encode
from sopro_tpu.codec.streaming import (
    MimiStreamState,
    init_mimi_stream_state,
    mimi_decode_step,
)


class MimiCodec:
    def __init__(
        self,
        params: Dict[str, Any],
        cfg: Optional[MimiConfig] = None,
        num_quantizers: Optional[int] = None,
    ):
        self.cfg = cfg or MimiConfig()
        self.params = jax.device_put(params)
        self.num_quantizers = int(num_quantizers or self.cfg.num_quantizers)
        self._decode = jax.jit(lambda p, c: mimi_decode(p, self.cfg, c))
        self._encode = jax.jit(
            lambda p, w: mimi_encode(p, self.cfg, w, self.num_quantizers)
        )
        self._step = jax.jit(
            lambda p, c, s: mimi_decode_step(p, self.cfg, c, s)
        )

    @classmethod
    def from_pretrained(cls, repo_id: str, **kwargs) -> "MimiCodec":
        import os

        from sopro_tpu.hub import download_repo, load_mimi_checkpoint

        local = download_repo(repo_id)
        cfg, params = load_mimi_checkpoint(
            os.path.join(local, "model.safetensors"),
            cfg_json=os.path.join(local, "config.json"),
        )
        return cls(params, cfg, **kwargs)

    @property
    def sample_rate(self) -> int:
        return int(self.cfg.sampling_rate)

    @property
    def codebook_size(self) -> int:
        return int(self.cfg.codebook_size)

    def encode_file(
        self, wav_path: str, *, crop_seconds: Optional[float] = None
    ) -> np.ndarray:
        """audio file -> Mimi tokens [T, Q]
        (reference: src/sopro/codec/mimi.py:41-63)."""
        wav, sr = A.load_audio_file(wav_path)
        wav = A.trim_silence_energy(wav, sr)
        wav = A.resample(wav, sr, self.sample_rate)
        hop = self.cfg.hop_length
        if crop_seconds is not None and crop_seconds > 0:
            fps = float(self.cfg.frame_rate)
            win = max(1, int(round(crop_seconds * fps))) * hop
            wav = A.center_crop_audio(wav, win)
        t = (wav.shape[-1] // hop) * hop
        codes = self._encode(self.params, jnp.asarray(wav[:t], jnp.float32)[None])
        return np.asarray(codes[0])

    def decode_full(self, codes_tq: np.ndarray) -> np.ndarray:
        """[T, Q] tokens -> wav [1, T*hop]
        (reference: src/sopro/codec/mimi.py:65-72)."""
        wav = self._decode(
            self.params, jnp.asarray(codes_tq, jnp.int32)[None]
        )
        return np.asarray(wav)


class MimiStreamDecoder:
    """Chunked decode with exact carried state
    (reference: src/sopro/codec/mimi.py:83-181, minus the overlap
    approximation)."""

    def __init__(self, codec: MimiCodec):
        self.codec = codec

    def init_state(self) -> MimiStreamState:
        return init_mimi_stream_state(self.codec.cfg, batch=1)

    def decode_step(
        self, codes_tq: np.ndarray, state: Optional[MimiStreamState] = None
    ) -> Tuple[np.ndarray, MimiStreamState]:
        """[n, Q] new frames -> (wav [1, n*hop], new state)."""
        if state is None:
            state = self.init_state()
        wav, state = self.codec._step(
            self.codec.params, jnp.asarray(codes_tq, jnp.int32)[None], state
        )
        return np.asarray(wav), state
