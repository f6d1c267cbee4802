"""Native C++ audio runtime vs the Python/scipy reference paths."""

import numpy as np
import pytest

from sopro_tpu import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native lib unavailable (no compiler?)")


def test_pcm16_roundtrip(rng):
    wav = (rng.standard_normal(10000) * 0.7).astype(np.float32)
    wav[:3] = [1.5, -1.5, 0.0]  # clipping
    pcm = native.f32_to_pcm16(wav)
    ref = np.round(np.clip(wav, -1, 1) * 32767.0).astype(np.int16)
    np.testing.assert_array_equal(pcm, ref)
    back = native.pcm16_to_f32(pcm)
    np.testing.assert_allclose(back, pcm.astype(np.float32) / 32768.0)


def test_resample_matches_scipy(rng):
    from scipy.signal import resample_poly as sp

    wav = rng.standard_normal(16000).astype(np.float32)
    for up, down in [(3, 2), (2, 3), (160, 147), (147, 160), (1, 1)]:
        ours = native.resample_poly(wav, up, down)
        ref = sp(wav.astype(np.float64), up, down).astype(np.float32)
        assert ours.shape == ref.shape, (up, down, ours.shape, ref.shape)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_trim_bounds_match_python(rng):
    from sopro_tpu import audio as A

    sr = 24000
    sig = np.zeros(3 * sr, np.float32)
    sig[sr : 2 * sr] = (rng.standard_normal(sr) * 0.5).astype(np.float32)
    bounds = native.trim_silence_bounds(sig, sr)
    assert bounds is not None
    s, e = bounds
    ref = A.trim_silence_energy(sig, sr)
    np.testing.assert_array_equal(sig[s:e], ref)

    # silence: keep everything
    quiet = np.zeros(sr, np.float32)
    assert native.trim_silence_bounds(quiet, sr) == (0, sr)


def test_audio_module_uses_native(rng):
    """audio.resample goes through the native path and still matches scipy."""
    from scipy.signal import resample_poly as sp

    from sopro_tpu import audio as A

    wav = rng.standard_normal(16000).astype(np.float32)
    out = A.resample(wav, 16000, 24000)
    ref = sp(wav.astype(np.float64), 3, 2).astype(np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
