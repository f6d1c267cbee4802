"""Host-side audio I/O: load/save WAV, polyphase resampling, energy VAD trim.

Numerics re-create the reference utilities (reference: src/sopro/audio.py:
30-155) on numpy, built on stdlib `wave` + scipy (this image ships neither
soundfile nor torchaudio). Waveforms are float32, mono, shape [S].
"""

from __future__ import annotations

import math
import os
import wave as _wave
from typing import Tuple

import numpy as np


def load_audio_file(path: str) -> Tuple[np.ndarray, int]:
    """Read an audio file -> (mono float32 [S], sample_rate).

    WAV via stdlib `wave` (PCM16/24/32 + IEEE float via scipy fallback);
    soundfile is used when importable for other containers
    (reference: src/sopro/audio.py:89-105)."""
    sf_err = None
    try:
        import soundfile as sf  # optional

        data, sr = sf.read(path, dtype="float32", always_2d=True)
        return data.mean(axis=1).astype(np.float32), int(sr)
    except ImportError:
        pass
    except Exception as e:
        # libsndfile raises its own RuntimeError subclass on undecodable
        # input; try the stdlib WAV fallback, else surface a client error
        # (the servers map ValueError to a 400)
        sf_err = e

    if path.lower().endswith(".wav"):
        try:
            return _load_wav_stdlib(path)
        except _wave.Error:
            from scipy.io import wavfile

            sr, data = wavfile.read(path)
            return _to_float_mono(data), int(sr)

    # mp3/ogg through the native runtime (system libmpg123/libvorbisfile,
    # dlopen'd — the reference gets these via its hard soundfile dep)
    from sopro_tpu import native

    decoded = native.decode_file(path)
    if decoded is not None:
        return decoded

    if sf_err is not None:
        raise ValueError(f"Cannot decode {path!r}: {sf_err}")
    raise ValueError(
        f"Cannot read {path!r}: WAV always works; mp3/ogg need the system "
        "libmpg123/libvorbisfile (present on most distros); flac/webm need "
        "the 'audio' extra (soundfile)."
    )


def _load_wav_stdlib(path: str) -> Tuple[np.ndarray, int]:
    with _wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        i32 = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        i32 = np.where(i32 >= 1 << 23, i32 - (1 << 24), i32)
        data = i32.astype(np.float32) / float(1 << 23)
    else:  # pragma: no cover
        raise ValueError(f"unsupported WAV sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch).mean(axis=1)
    return data.astype(np.float32), int(sr)


def _to_float_mono(data: np.ndarray) -> np.ndarray:
    if data.dtype == np.int16:
        out = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        out = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        out = (data.astype(np.float32) - 128.0) / 128.0
    else:
        out = data.astype(np.float32)
    if out.ndim > 1:
        out = out.mean(axis=1)
    return out


def save_audio(path: str, wav: np.ndarray, sr: int = 24000) -> None:
    """Write mono PCM16 WAV (reference: src/sopro/audio.py:120-145 via
    soundfile; PCM16 here). Accepts [S], [C, S] (downmixed) or [1, C, S]."""
    wav = np.asarray(wav)
    if wav.ndim == 3:
        wav = wav[0]
    if wav.ndim == 2:
        if wav.dtype == np.int16:  # device-converted PCM: mono rows only
            wav = wav[0] if wav.shape[0] == 1 else (
                wav.astype(np.float32) / 32768.0
            ).mean(axis=0)
        else:
            wav = wav.mean(axis=0)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    pcm = pcm16(wav)
    with _wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(int(sr))
        f.writeframes(pcm.tobytes())


def pcm16(wav: np.ndarray) -> np.ndarray:
    """float [-1, 1] -> int16 with clipping (native fast path when built).
    int16 input passes through (already-PCM device output)."""
    wav = np.asarray(wav)
    if wav.dtype == np.int16:
        return wav
    from sopro_tpu import native

    return native.f32_to_pcm16(wav)


def resample(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling (reference uses torchaudio's kaiser resampler,
    src/sopro/audio.py:108-117; same kaiser-windowed filter family here,
    native C++ when built, scipy fallback)."""
    if sr_in == sr_out:
        return np.asarray(wav, np.float32)
    from sopro_tpu import native

    g = math.gcd(int(sr_in), int(sr_out))
    return native.resample_poly(np.asarray(wav), sr_out // g, sr_in // g)


def trim_silence_energy(
    wav: np.ndarray,
    sr: int,
    frame_ms: float = 25.0,
    hop_ms: float = 10.0,
    thresh_db_floor: float = -40.0,
    prepad_ms: float = 30.0,
    postpad_ms: float = 30.0,
    min_keep_sec: float = 0.5,
) -> np.ndarray:
    """Energy-based VAD trim (reference: src/sopro/audio.py:30-86): 25 ms
    frames / 10 ms hop, keep frames within 40 dB of the max-energy frame,
    pad 30 ms each side, and keep the original if the voiced span is
    shorter than 0.5 s."""
    wav = np.asarray(wav, np.float32)
    t = wav.shape[-1]
    if t == 0 or t < int(sr * 0.1):
        return wav
    frame_len = max(1, int(sr * frame_ms / 1000.0))
    hop = max(1, int(sr * hop_ms / 1000.0))
    if t < frame_len:
        return wav

    mono = wav if wav.ndim == 1 else wav.mean(axis=0)
    n_frames = 1 + (t - frame_len) // hop
    idx = np.arange(frame_len)[None, :] + hop * np.arange(n_frames)[:, None]
    energy = np.mean(np.square(mono[idx]), axis=1)

    energy_db = 10.0 * np.log10(energy + 1e-10)
    max_db = float(energy_db.max())
    thresh_db = max(max_db + thresh_db_floor, thresh_db_floor)

    voiced = np.nonzero(energy_db > thresh_db)[0]
    if voiced.size == 0:
        return wav

    prepad = int(sr * prepad_ms / 1000.0)
    postpad = int(sr * postpad_ms / 1000.0)
    start = max(0, int(voiced[0]) * hop - prepad)
    end = min(t, int(voiced[-1]) * hop + frame_len + postpad)

    if end <= start or (end - start) < int(min_keep_sec * sr):
        return wav
    return wav[..., start:end]


def center_crop_audio(wav: np.ndarray, win_samples: int) -> np.ndarray:
    """(reference: src/sopro/audio.py:148-155)"""
    if win_samples <= 0:
        return wav
    t = int(wav.shape[-1])
    if t <= win_samples:
        return wav
    s = (t - win_samples) // 2
    return wav[..., s : s + win_samples]
