"""User-facing facade: the `SoproTTS` API the reference exposes
(reference: src/sopro/model.py:404-583), backed by the jitted TPU engine.

API contract preserved: `from_pretrained / encode_text / encode_speaker /
encode_reference / prepare_reference / synthesize / stream / save_wav`.
Waveforms are numpy float32 [1, S] at 24 kHz on the host side; everything
between tokenization and the waveform runs on device.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterator, Optional

import numpy as np

from sopro_tpu import audio as A
from sopro_tpu import hub as H
from sopro_tpu.config import RuntimeConfig, SoproTTSConfig
from sopro_tpu.constants import DEFAULT_MIMI_ID, TARGET_SR
from sopro_tpu.engine import Engine
from sopro_tpu.models.sopro import PreparedReference
from sopro_tpu.tokenizer import SimpleCharTokenizer, TextTokenizer


def center_crop_tokens(tokens_tq: np.ndarray, win: int) -> np.ndarray:
    """(reference: src/sopro/sampling.py:8-13)"""
    t = int(tokens_tq.shape[0])
    if t <= win:
        return tokens_tq
    s = (t - win) // 2
    return tokens_tq[s : s + win]


def split_sentences(text: str, max_chars: int = 350) -> list:
    """Split text into sentence-ish chunks of at most ~max_chars, for
    long-form synthesis past the model's 400-frame (~32 s) cap. Breaks at
    sentence enders (. ! ? ; and line breaks), keeping the punctuation with
    its sentence; sentences merge greedily up to max_chars; a single
    over-long sentence falls back to comma/space breaks."""
    import re

    text = text.strip()
    if not text:
        return []
    raw = [
        s.strip()
        for s in re.split(r"(?<=[.!?;])\s+|\n+", text)
        if s.strip()
    ]

    def hard_split(s: str) -> list:
        if len(s) <= max_chars:
            return [s]
        out = []
        while len(s) > max_chars:
            window = s[: max_chars + 1]
            comma = window.rfind(", ")
            cut = comma + 1 if comma > 0 else window.rfind(" ")
            if cut <= 0:
                cut = max_chars
            out.append(s[:cut].strip())
            s = s[cut:].lstrip(", ").strip()
        if s:
            out.append(s)
        return out

    pieces = [p for s in raw for p in hard_split(s)]
    merged = []
    for p in pieces:
        if merged and len(merged[-1]) + 1 + len(p) <= max_chars:
            merged[-1] = merged[-1] + " " + p
        else:
            merged.append(p)
    return merged


class SoproTTS:
    def __init__(
        self,
        engine: Engine,
        cfg: SoproTTSConfig,
        tokenizer,
        runtime: Optional[RuntimeConfig] = None,
    ):
        self.engine = engine
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.rt = runtime or RuntimeConfig()

    # ------------------------------------------------------------------ load

    @classmethod
    def from_pretrained(
        cls,
        repo_id: str,
        *,
        revision: Optional[str] = None,
        cache_dir: Optional[str] = None,
        token: Optional[str] = None,
        mimi_repo_id: str = DEFAULT_MIMI_ID,
        runtime: Optional[RuntimeConfig] = None,
        warmup: bool = False,
    ) -> "SoproTTS":
        """(reference: src/sopro/model.py:419-451). `repo_id` may be a local
        snapshot directory (offline)."""
        local = H.download_repo(
            repo_id, revision=revision, cache_dir=cache_dir, token=token
        )
        model_path = os.path.join(local, "model.safetensors")
        if not os.path.exists(model_path):
            raise FileNotFoundError(f"Expected {model_path} in repo snapshot.")
        cfg, params = H.load_sopro_checkpoint(model_path)
        tokenizer = TextTokenizer(model_name=local)

        mimi_local = H.download_repo(mimi_repo_id, cache_dir=cache_dir, token=token)
        mimi_cfg, mimi_params = H.load_mimi_checkpoint(
            os.path.join(mimi_local, "model.safetensors"),
            cfg_json=os.path.join(mimi_local, "config.json"),
        )
        eng = Engine(params, cfg, mimi_params, mimi_cfg, runtime)
        tts = cls(eng, cfg, tokenizer, runtime)
        if warmup:
            eng.warmup()
        return tts

    @classmethod
    def from_random(
        cls,
        cfg: Optional[SoproTTSConfig] = None,
        *,
        seed: int = 0,
        with_codec: bool = True,
        mimi_cfg=None,
        runtime: Optional[RuntimeConfig] = None,
    ) -> "SoproTTS":
        """Random-weight instance (development / benchmarks in offline
        environments; no reference counterpart)."""
        import jax

        from sopro_tpu.codec.convert import init_mimi_params
        from sopro_tpu.codec.mimi_config import MimiConfig
        from sopro_tpu.models.sopro import init_sopro_model

        cfg = cfg or SoproTTSConfig()
        tokenizer = SimpleCharTokenizer()
        params = init_sopro_model(
            jax.random.PRNGKey(seed), cfg, tokenizer.vocab_size
        )
        if with_codec:
            mimi_cfg = mimi_cfg or MimiConfig()
            mimi_params = init_mimi_params(seed, mimi_cfg)
        else:
            mimi_cfg, mimi_params = None, None
        eng = Engine(params, cfg, mimi_params, mimi_cfg, runtime)
        return cls(eng, cfg, tokenizer, runtime)

    # ------------------------------------------------------------ text / ref

    def encode_text(self, text: str) -> np.ndarray:
        return np.asarray(self.tokenizer.encode(text), np.int32)

    def encode_reference(
        self,
        *,
        ref_audio_path: Optional[str] = None,
        ref_tokens_tq: Optional[np.ndarray] = None,
        ref_seconds: Optional[float] = None,
    ) -> np.ndarray:
        """-> Mimi tokens [T, Q] (reference: src/sopro/model.py:477-514)."""
        if (ref_tokens_tq is None) == (ref_audio_path is None):
            raise RuntimeError(
                "Provide exactly one of ref_audio_path or ref_tokens_tq."
            )
        if ref_seconds is None:
            ref_seconds = 12.0

        if ref_tokens_tq is not None:
            ref = np.asarray(ref_tokens_tq, np.int32)
            if ref_seconds and ref_seconds > 0:
                win = max(1, int(round(ref_seconds * float(self.cfg.mimi_fps))))
                ref = center_crop_tokens(ref, win)
            return ref

        # audio path: load -> VAD trim -> resample -> crop to whole frames ->
        # Mimi encode (reference: src/sopro/codec/mimi.py:41-63)
        wav, sr = A.load_audio_file(ref_audio_path)
        wav = A.trim_silence_energy(wav, sr)
        sr_t = int(self.engine.mimi_cfg.sampling_rate)
        wav = A.resample(wav, sr, sr_t)
        if ref_seconds and ref_seconds > 0:
            fps = float(self.engine.mimi_cfg.frame_rate)
            hop = int(round(sr_t / fps))
            win = max(1, int(round(ref_seconds * fps))) * hop
            wav = A.center_crop_audio(wav, win)
        # crop to whole frames
        hop = self.engine.mimi_cfg.hop_length
        t = (wav.shape[-1] // hop) * hop
        return self.engine.encode_audio(wav[:t])

    def encode_speaker(
        self,
        *,
        ref_audio_path: Optional[str] = None,
        ref_tokens_tq: Optional[np.ndarray] = None,
        ref_seconds: Optional[float] = None,
    ) -> np.ndarray:
        """-> speaker embedding [sv_dim] (reference: src/sopro/model.py:457-475)."""
        toks = self.encode_reference(
            ref_audio_path=ref_audio_path,
            ref_tokens_tq=ref_tokens_tq,
            ref_seconds=ref_seconds,
        )
        return self.engine.token2sv(toks)

    def prepare_reference(
        self,
        *,
        ref_audio_path: Optional[str] = None,
        ref_tokens_tq: Optional[np.ndarray] = None,
        ref_seconds: Optional[float] = None,
    ) -> PreparedReference:
        toks = self.encode_reference(
            ref_audio_path=ref_audio_path,
            ref_tokens_tq=ref_tokens_tq,
            ref_seconds=ref_seconds,
        )
        return self.engine.prepare_reference(toks)

    # ------------------------------------------------------------- synthesis

    def generate_tokens(
        self,
        text: str,
        ref: PreparedReference,
        *,
        max_frames: int = 400,
        top_p: float = 0.9,
        temperature: float = 1.05,
        anti_loop: bool = True,
        style_strength: Optional[float] = None,
        min_gen_frames: Optional[int] = None,
        seed: int = 0,
    ) -> np.ndarray:
        """text + prepared ref -> [T, num_codebooks] token matrix
        (reference: src/sopro/model.py:349-401)."""
        ids = self.encode_text(text)
        prep = self.engine.prepare_conditioning(
            ids, ref, max_frames=max_frames,
            style_strength=float(
                style_strength if style_strength is not None
                else self.cfg.style_strength
            ),
        )
        rvq1, t = self.engine.ar_generate(
            prep, max_frames=max_frames, seed=seed, top_p=top_p,
            temperature=temperature, anti_loop=anti_loop,
            min_gen_frames=min_gen_frames,
        )
        if t <= 0:
            return np.zeros((0, self.cfg.num_codebooks), np.int32)
        return self.engine.nar_refine(prep["cond_ar"], rvq1, t)

    def synthesize(
        self,
        text: str,
        *,
        ref: Optional[PreparedReference] = None,
        ref_audio_path: Optional[str] = None,
        ref_tokens_tq: Optional[np.ndarray] = None,
        max_frames: int = 400,
        top_p: float = 0.9,
        temperature: float = 1.05,
        anti_loop: bool = True,
        style_strength: Optional[float] = None,
        ref_seconds: Optional[float] = None,
        min_gen_frames: Optional[int] = None,
        seed: int = 0,
        pcm16: bool = False,
        fused: Optional[bool] = None,
    ) -> np.ndarray:
        """-> wav [1, S] @ 24 kHz (reference: src/sopro/model.py:531-575);
        float32 by default, int16 with `pcm16=True` (converted on device —
        halves the transfer; used by the server/CLI whose outputs are 16-bit
        regardless).

        `fused=None` (auto) picks between two execution plans:
        * fused single dispatch (conditioning + AR + NAR + vocoder in one jit,
          one readback) — wins for long-form requests, where the fixed
          per-dispatch/readback latency of a remote device dominates;
        * adaptive two-dispatch — NAR + vocoder run on an EOS-sized frame
          bucket, which wins when generation typically stops well before
          `max_frames` (short interactive requests with a high cap).
        Auto uses fused when max_frames >= 256."""
        if ref is None:
            ref = self.prepare_reference(
                ref_audio_path=ref_audio_path,
                ref_tokens_tq=ref_tokens_tq,
                ref_seconds=ref_seconds,
            )
        ids = self.encode_text(text)
        style = float(
            style_strength if style_strength is not None
            else self.cfg.style_strength
        )
        if fused is None:
            fused = int(max_frames) >= 256
        if fused:
            wav, t = self.engine.synthesize_fused(
                ids, ref, max_frames=max_frames, style_strength=style,
                seed=seed, top_p=top_p, temperature=temperature,
                anti_loop=anti_loop,
                min_gen=int(min_gen_frames or self.cfg.min_gen_frames),
                pcm16=pcm16,
            )
            if t <= 0:
                return np.zeros((1, 0), np.int16 if pcm16 else np.float32)
            return wav if not pcm16 else wav.astype(np.int16)
        # adaptive path: AR (tokens stay on device) -> one NAR+vocoder
        # dispatch over an EOS-sized bucket -> single waveform readback
        prep = self.engine.prepare_conditioning(
            ids, ref, max_frames=max_frames,
            style_strength=float(
                style_strength if style_strength is not None
                else self.cfg.style_strength
            ),
        )
        tokens_dev, t = self.engine.ar_generate_device(
            prep, max_frames=max_frames, seed=seed, top_p=top_p,
            temperature=temperature, anti_loop=anti_loop,
            min_gen_frames=min_gen_frames,
        )
        if t <= 0:
            return np.zeros((1, 0), np.int16 if pcm16 else np.float32)
        return self.engine.nar_decode_fused(
            prep["cond_ar"], tokens_dev, t, pcm16=pcm16
        )

    def synthesize_batch(
        self,
        texts,
        *,
        ref: Optional[PreparedReference] = None,
        ref_audio_path: Optional[str] = None,
        ref_tokens_tq: Optional[np.ndarray] = None,
        max_frames: int = 400,
        top_p: float = 0.9,
        temperature: float = 1.05,
        anti_loop: bool = True,
        style_strength: Optional[float] = None,
        ref_seconds: Optional[float] = None,
        min_gen_frames: Optional[int] = None,
        seeds=None,
        pcm16: bool = False,
        pipeline_group: Optional[int] = None,
        mesh=None,
    ):
        """Batched synthesis (BASELINE config 4): N utterances decode as
        padded batches — per-row AR with independent EOS, one batched NAR +
        vocoder pass per group. Returns a list of [1, S_i] waveforms
        (float32, or int16 with `pcm16=True` — converted on device, halving
        the transfer). No reference counterpart (the reference is strictly
        single-utterance).

        Large batches split into `pipeline_group`-row sub-batches whose
        dispatches are all enqueued before any readback: group i's
        device->host waveform transfer overlaps group i+1's compute (the
        transfer is tens of ms on a remote-attached device). `mesh` shards
        each group's rows over a "dp" axis for multi-chip offline synthesis."""
        import jax
        import jax.numpy as jnp

        if ref is None:
            ref = self.prepare_reference(
                ref_audio_path=ref_audio_path,
                ref_tokens_tq=ref_tokens_tq,
                ref_seconds=ref_seconds,
            )
        b = len(texts)
        seeds = list(seeds) if seeds is not None else list(range(b))
        g = int(pipeline_group or self.rt.batch_pipeline_group or b) or b
        if mesh is not None:  # groups must keep the dp axis fully populated
            dp = int(mesh.shape["dp"])
            g = max(dp, (g // dp) * dp)
        style = float(
            style_strength if style_strength is not None
            else self.cfg.style_strength
        )
        min_gen = int(min_gen_frames or self.cfg.min_gen_frames)
        ids_rows = [self.encode_text(t) for t in texts]
        hop = self.engine.mimi_cfg.hop_length

        def tile(x, n):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 1:
                return jnp.broadcast_to(x, (n,) + x.shape[1:])
            return x

        # enqueue every group's single dispatch, then read back in order
        packed = []
        for lo in range(0, b, g):
            hi = min(lo + g, b)
            ref_b = jax.tree.map(lambda x: tile(x, hi - lo), ref)
            packed.append(self.engine.synthesize_batch_dispatch(
                ids_rows[lo:hi], ref_b, max_frames=max_frames,
                style_strength=style, seeds=seeds[lo:hi], top_p=top_p,
                temperature=temperature, anti_loop=anti_loop,
                min_gen=min_gen, pcm16=pcm16, mesh=mesh,
            ))
        outs = []
        for p in packed:
            wav, lengths = self.engine.synthesize_batch_read(p)
            outs.extend(
                wav[i : i + 1, : int(lengths[i]) * hop]
                for i in range(wav.shape[0])
            )
        return outs

    def synthesize_long(
        self,
        text: str,
        *,
        ref: Optional[PreparedReference] = None,
        ref_audio_path: Optional[str] = None,
        ref_tokens_tq: Optional[np.ndarray] = None,
        max_frames: int = 400,
        gap_ms: float = 120.0,
        max_chars: int = 350,
        seed: int = 0,
        pcm16: bool = False,
        **kwargs,
    ) -> np.ndarray:
        """Unbounded-length synthesis: split `text` into sentence chunks,
        synthesize them as ONE padded batch (each chunk gets its own AR
        decode with the shared reference), and stitch with `gap_ms` of
        silence between chunks. The reference model caps generation at
        ~32 s / 400 frames and hallucinates beyond (reference README.md:155,
        src/sopro/config.py:12) — users must chunk manually; here it is a
        first-class API built on the batched decode path, so a 10-sentence
        paragraph costs ~one batch dispatch instead of 10 serial calls.

        Chunks inherit kwargs (top_p/temperature/style_strength/...); chunk
        i uses seed + i. Returns wav [1, S] (int16 with `pcm16=True`)."""
        if ref is None:
            ref = self.prepare_reference(
                ref_audio_path=ref_audio_path,
                ref_tokens_tq=ref_tokens_tq,
                ref_seconds=kwargs.pop("ref_seconds", None),
            )
        else:
            kwargs.pop("ref_seconds", None)
        chunks = split_sentences(text, max_chars=max_chars)
        if not chunks:
            return np.zeros((1, 0), np.int16 if pcm16 else np.float32)
        if len(chunks) == 1:
            return self.synthesize(
                chunks[0], ref=ref, max_frames=max_frames, seed=seed,
                pcm16=pcm16, **kwargs,
            )
        outs = self.synthesize_batch(
            chunks, ref=ref, max_frames=max_frames,
            seeds=[seed + i for i in range(len(chunks))], pcm16=pcm16,
            **kwargs,
        )
        gap = int(round(gap_ms / 1000.0 * TARGET_SR))
        dtype = np.int16 if pcm16 else np.float32
        sil = np.zeros((1, gap), dtype)
        parts = []
        for i, w in enumerate(outs):
            if i:
                parts.append(sil)
            parts.append(np.asarray(w, dtype))
        return np.concatenate(parts, axis=1)

    def stream(self, text: str, **kwargs) -> Iterator[np.ndarray]:
        """Chunked synthesis (reference: src/sopro/model.py:577-580 ->
        streaming.stream with chunk_frames default 6)."""
        from sopro_tpu.streaming import stream as _stream

        return _stream(self, text, **kwargs)

    def save_wav(self, path: str, wav: np.ndarray) -> None:
        A.save_audio(path, wav, sr=TARGET_SR)

    def save_pretrained(self, out_dir: str) -> str:
        """Write a reference-compatible `model.safetensors` (config embedded
        as safetensors metadata) — checkpoints trained with sopro_tpu.train
        load in both this framework and the reference implementation."""
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "model.safetensors")
        H.save_sopro_checkpoint(path, self.engine.params, self.cfg)
        tok = getattr(self.tokenizer, "tok", None)
        if tok is not None and hasattr(tok, "save_pretrained"):
            tok.save_pretrained(out_dir)
        return path
