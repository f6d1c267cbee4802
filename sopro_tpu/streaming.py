"""Streaming synthesis driver: interleaves chunked AR decode, windowed NAR
re-refinement and exact streaming Mimi decode
(reference: src/sopro/streaming.py).

Chunk semantics preserved ("chunk-equivalent streaming"): a chunk boundary
every `chunk_frames` AR tokens, NAR re-refined over a trailing window of
`nar_context_frames` (default = the NAR receptive field, 181), only the new
frames are vocoded, EOS flushes the remainder. Shapes are static: the NAR
window is a fixed `chunk + context` slice of zero-padded conditioning with a
validity mask that reproduces the reference's shorter early windows exactly;
the Mimi stream state makes chunk decodes bit-faithful (better than the
reference's 2-frame overlap re-decode).

The public `stream()` defaults to chunk_frames=6 and `StreamConfig` to 16,
matching the reference's observable defaults (streaming.py:14,141).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from sopro_tpu.models.sopro import PreparedReference


@dataclass
class StreamConfig:
    chunk_frames: int = 16
    nar_context_frames: Optional[int] = None


class SoproTTSStreamer:
    def __init__(self, tts, cfg: Optional[StreamConfig] = None):
        self.tts = tts
        self.cfg = cfg or StreamConfig()
        # filled by stream(): wall-clock time of first emitted chunk
        self.last_ttfa_s: Optional[float] = None

    def stream(
        self,
        text: str,
        *,
        ref_audio_path: Optional[str] = None,
        ref_tokens_tq: Optional[np.ndarray] = None,
        ref: Optional[PreparedReference] = None,
        max_frames: int = 400,
        top_p: float = 0.9,
        temperature: float = 1.05,
        anti_loop: bool = True,
        style_strength: Optional[float] = None,
        ref_seconds: Optional[float] = None,
        chunk_frames: Optional[int] = None,
        nar_context_frames: Optional[int] = None,
        min_gen_frames: Optional[int] = None,
        seed: int = 0,
    ) -> Iterator[np.ndarray]:
        tts = self.tts
        eng = tts.engine
        t_start = time.perf_counter()
        self.last_ttfa_s = None

        if ref is None:
            ref = tts.prepare_reference(
                ref_audio_path=ref_audio_path,
                ref_tokens_tq=ref_tokens_tq,
                ref_seconds=ref_seconds,
            )

        cf = int(chunk_frames if chunk_frames is not None else self.cfg.chunk_frames)
        nar_ctx = (
            nar_context_frames
            if nar_context_frames is not None
            else self.cfg.nar_context_frames
        )
        if nar_ctx is None:
            nar_ctx = int(tts.cfg.rf_nar())
        style = float(
            style_strength if style_strength is not None
            else tts.cfg.style_strength
        )
        min_gen = int(min_gen_frames or tts.cfg.min_gen_frames)
        hop = eng.mimi_cfg.hop_length

        # first chunk: one fused dispatch (conditioning + KV + AR + NAR +
        # vocoder) — the TTFA-critical path
        wav, valid, done, carry, kv, cond_ar, mstate = eng.stream_start_fused(
            tts.encode_text(text), ref,
            max_frames=max_frames, chunk=cf, style_strength=style,
            seed=seed, top_p=top_p, temperature=temperature,
            anti_loop=anti_loop, min_gen=min_gen,
        )
        emitted = int(valid)
        done = bool(done)
        if emitted > 0:
            out = np.asarray(wav[:, : emitted * hop])
            self.last_ttfa_s = time.perf_counter() - t_start
            yield out

        # steady state: one fused dispatch per chunk
        while not done:
            wav, valid, done, carry, mstate = eng.stream_step_fused(
                carry, kv, cond_ar, mstate, emitted,
                chunk=cf, nar_ctx=int(nar_ctx), top_p=top_p,
                temperature=temperature, anti_loop=anti_loop, min_gen=min_gen,
            )
            done = bool(done)
            n_new = int(valid) - emitted
            if n_new > 0:
                out = np.asarray(wav[:, : n_new * hop])
                emitted = int(valid)
                if self.last_ttfa_s is None:
                    self.last_ttfa_s = time.perf_counter() - t_start
                yield out


def stream(
    tts,
    text: str,
    *,
    ref_audio_path: Optional[str] = None,
    ref_tokens_tq: Optional[np.ndarray] = None,
    ref: Optional[PreparedReference] = None,
    chunk_frames: int = 6,
    **kwargs,
) -> Iterator[np.ndarray]:
    """(reference: src/sopro/streaming.py:133-152; library default chunk 6)"""
    streamer = SoproTTSStreamer(tts, StreamConfig(chunk_frames=chunk_frames))
    return streamer.stream(
        text,
        ref_audio_path=ref_audio_path,
        ref_tokens_tq=ref_tokens_tq,
        ref=ref,
        chunk_frames=chunk_frames,
        **kwargs,
    )
