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


# ---------------------------------------------------------------------------
# compressed-audio decode (mp3 via libmpg123, ogg via libvorbisfile)
# Fixtures are synthesized in-test through the system ENCODER libraries
# (libmp3lame / libvorbisenc via ctypes) so no binary test assets ride in
# the repo; tests skip cleanly where a codec library is absent.
# ---------------------------------------------------------------------------


def _encode_mp3(samples, sr, path):
    import ctypes

    try:
        l = ctypes.CDLL("libmp3lame.so.0")
    except OSError:
        pytest.skip("libmp3lame not present")
    l.lame_init.restype = ctypes.c_void_p
    gf = ctypes.c_void_p(l.lame_init())
    l.lame_set_in_samplerate(gf, ctypes.c_int(sr))
    l.lame_set_num_channels(gf, 1)
    l.lame_set_mode(gf, 3)  # mono
    assert l.lame_init_params(gf) >= 0
    pcm = np.round(np.clip(samples, -1, 1) * 32767).astype(np.int16)
    out = np.zeros(len(pcm) * 2 + 7200, np.uint8)
    p16 = ctypes.POINTER(ctypes.c_short)
    pu8 = ctypes.POINTER(ctypes.c_ubyte)
    n = l.lame_encode_buffer(
        gf, pcm.ctypes.data_as(p16), pcm.ctypes.data_as(p16), len(pcm),
        out.ctypes.data_as(pu8), len(out),
    )
    assert n > 0
    n2 = l.lame_encode_flush(
        gf, out[n:].ctypes.data_as(pu8), len(out) - n
    )
    l.lame_close(gf)
    with open(path, "wb") as f:
        f.write(out[: n + n2].tobytes())


def _encode_ogg(samples, sr, path):
    """Minimal ogg-vorbis encoder through libvorbisenc/libvorbis/libogg.
    Opaque encoder structs ride in oversized byte buffers; only ogg_packet
    and ogg_page (stable, simple layouts) are declared."""
    import ctypes

    try:
        venc = ctypes.CDLL("libvorbisenc.so.2", mode=ctypes.RTLD_GLOBAL)
        vorb = ctypes.CDLL("libvorbis.so.0", mode=ctypes.RTLD_GLOBAL)
        ogg = ctypes.CDLL("libogg.so.0", mode=ctypes.RTLD_GLOBAL)
    except OSError:
        pytest.skip("vorbis encoder libs not present")

    class OggPacket(ctypes.Structure):
        _fields_ = [
            ("packet", ctypes.POINTER(ctypes.c_ubyte)),
            ("bytes", ctypes.c_long),
            ("b_o_s", ctypes.c_long),
            ("e_o_s", ctypes.c_long),
            ("granulepos", ctypes.c_int64),
            ("packetno", ctypes.c_int64),
        ]

    class OggPage(ctypes.Structure):
        _fields_ = [
            ("header", ctypes.POINTER(ctypes.c_ubyte)),
            ("header_len", ctypes.c_long),
            ("body", ctypes.POINTER(ctypes.c_ubyte)),
            ("body_len", ctypes.c_long),
        ]

    buf = lambda: ctypes.create_string_buffer(16384)
    vi, vc, vd, vb, osb = buf(), buf(), buf(), buf(), buf()
    vorb.vorbis_info_init(vi)
    assert venc.vorbis_encode_init_vbr(
        vi, ctypes.c_long(1), ctypes.c_long(sr), ctypes.c_float(0.4)
    ) == 0
    vorb.vorbis_comment_init(vc)
    assert vorb.vorbis_analysis_init(vd, vi) == 0
    assert vorb.vorbis_block_init(vd, vb) == 0
    assert ogg.ogg_stream_init(osb, 1) == 0

    hdr, hcomm, hcode = OggPacket(), OggPacket(), OggPacket()
    op, og = OggPacket(), OggPage()
    assert vorb.vorbis_analysis_headerout(
        vd, vc, ctypes.byref(hdr), ctypes.byref(hcomm), ctypes.byref(hcode)
    ) == 0
    for h in (hdr, hcomm, hcode):
        ogg.ogg_stream_packetin(osb, ctypes.byref(h))
    out = bytearray()

    def drain(flush):
        fn = ogg.ogg_stream_flush if flush else ogg.ogg_stream_pageout
        while fn(osb, ctypes.byref(og)) != 0:
            out.extend(ctypes.string_at(og.header, og.header_len))
            out.extend(ctypes.string_at(og.body, og.body_len))

    drain(flush=True)

    vorb.vorbis_analysis_buffer.restype = ctypes.POINTER(
        ctypes.POINTER(ctypes.c_float)
    )
    pos = 0
    while True:
        chunk = min(1024, len(samples) - pos)
        if chunk > 0:
            chans = vorb.vorbis_analysis_buffer(vd, 1024)
            for i in range(chunk):
                chans[0][i] = float(samples[pos + i])
            pos += chunk
        vorb.vorbis_analysis_wrote(vd, chunk)  # 0 marks end-of-stream
        while vorb.vorbis_analysis_blockout(vd, vb) == 1:
            vorb.vorbis_analysis(vb, None)
            vorb.vorbis_bitrate_addblock(vb)
            while vorb.vorbis_bitrate_flushpacket(vd, ctypes.byref(op)) == 1:
                ogg.ogg_stream_packetin(osb, ctypes.byref(op))
                drain(flush=False)
        if chunk == 0:
            break
    drain(flush=True)
    ogg.ogg_stream_clear(osb)
    vorb.vorbis_block_clear(vb)
    vorb.vorbis_dsp_clear(vd)
    vorb.vorbis_comment_clear(vc)
    vorb.vorbis_info_clear(vi)
    with open(path, "wb") as f:
        f.write(bytes(out))


def _assert_tone(path, sr, hz):
    from sopro_tpu.audio import load_audio_file

    wav, got_sr = load_audio_file(str(path))
    assert got_sr == sr
    assert wav.dtype == np.float32 and wav.ndim == 1
    f = np.fft.rfft(wav * np.hanning(len(wav)))
    peak_hz = np.argmax(np.abs(f)) * got_sr / len(wav)
    assert abs(peak_hz - hz) < 5, peak_hz
    rms = float(np.sqrt(np.mean(np.square(wav))))
    assert 0.1 < rms < 0.6, rms  # lossy codec keeps the tone's energy


def test_decode_mp3(tmp_path):
    sr = 24000
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "tone.mp3"
    _encode_mp3(sig, sr, p)
    _assert_tone(p, sr, 440)


def test_decode_ogg_vorbis(tmp_path):
    sr = 24000
    t = np.arange(sr) / sr
    sig = (0.5 * np.sin(2 * np.pi * 523 * t)).astype(np.float32)
    p = tmp_path / "tone.ogg"
    _encode_ogg(sig, sr, p)
    if native.decode_file(str(p)) is None:
        pytest.skip("libvorbisfile not present")
    _assert_tone(p, sr, 523)


def test_decode_unknown_container_clear_error(tmp_path):
    from sopro_tpu.audio import load_audio_file

    p = tmp_path / "blob.xyz"
    p.write_bytes(b"\x00\x01\x02\x03 not audio at all")
    with pytest.raises(ValueError, match="Cannot read"):
        load_audio_file(str(p))
