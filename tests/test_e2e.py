"""End-to-end pipeline tests: token-level parity of `generate_tokens` vs the
torch reference under near-greedy sampling, and facade/streaming invariants
with a small random codec (waveform-level codec parity is covered separately
in test_mimi_parity.py; the reference's own end-to-end path needs the
unavailable kyutai/mimi download)."""

import numpy as np
import pytest

from sopro_tpu.codec.mimi_config import MimiConfig
from sopro_tpu.config import RuntimeConfig, SoproTTSConfig
from sopro_tpu.engine import Engine
from sopro_tpu.tts import SoproTTS
from sopro_tpu.tokenizer import SimpleCharTokenizer

from tests import torch_ref as TR
from tests.test_model_parity import CFG, _FakeTok
from tests.test_mimi_streaming import SMALL as MIMI_SMALL


# CI lane: these modules dominate suite wall-clock (compile-heavy); run them
# via `just test-all`; `just test` runs -m "not slow" (<5 min)
pytestmark = pytest.mark.slow

RT = RuntimeConfig(
    text_buckets=(16, 32), ref_buckets=(16, 32), nar_pad_multiple=8
)


class _TinyTok(SimpleCharTokenizer):
    """Byte tokenizer folded into the test model's 50-token vocab."""

    vocab_size = 50

    def encode(self, text):
        ids = [3 + (b % 44) for b in text.encode("utf-8")]
        return [self.bos_id] + ids + [self.eos_id]


@pytest.fixture(scope="module")
def pair():
    """(reference torch model, our facade sharing its exact weights)."""
    TR.import_ref()
    import torch
    from sopro.config import SoproTTSConfig as RefCfg
    from sopro.model import SoproTTSModel

    torch.manual_seed(21)
    rcfg = RefCfg(**CFG)
    ref_model = SoproTTSModel(rcfg, _FakeTok()).eval()

    cfg = SoproTTSConfig(**CFG)
    params = TR.conv_sopro_model(ref_model)
    # codec vocab/quantizers must match the model's codebook layout
    mimi_cfg = MimiConfig(**{
        **MIMI_SMALL,
        "num_quantizers": CFG["num_codebooks"],
        "codebook_size": CFG["codebook_size"],
    })
    from sopro_tpu.codec.convert import init_mimi_params

    eng = Engine(params, cfg, init_mimi_params(5, mimi_cfg), mimi_cfg, RT)
    tts = SoproTTS(eng, cfg, _TinyTok(), RT)
    return ref_model, tts


def _ref_generate(
    ref_model, text_ids, ref_tokens, *, max_frames, temperature, anti_loop=False
):
    import torch

    with torch.no_grad():
        pr = ref_model.prepare_reference(
            torch.from_numpy(ref_tokens), device=torch.device("cpu")
        )
        toks = ref_model.generate_tokens(
            torch.from_numpy(text_ids),
            pr,
            max_frames=max_frames,
            device=torch.device("cpu"),
            top_p=0.9,
            temperature=temperature,
            anti_loop=anti_loop,
            style_strength=1.0,
        )
    return toks.numpy()


def test_generate_tokens_parity_near_greedy(pair, rng):
    """With temperature -> 0 both samplers reduce to argmax (with identical
    repetition-penalty behavior; anti-loop recovery is disabled because its
    recovery path is genuinely stochastic), so the full AR + NAR pipeline
    must produce identical token matrices."""
    ref_model, tts = pair
    text = "hello parity"
    ids = tts.encode_text(text)
    ref_tokens = rng.integers(0, CFG["codebook_size"], size=(14, CFG["num_codebooks"]))

    ref_out = _ref_generate(
        ref_model, ids.astype(np.int64), ref_tokens,
        max_frames=CFG["max_frames"], temperature=1e-4, anti_loop=False,
    )

    pref = tts.engine.prepare_reference(ref_tokens.astype(np.int32))
    ours = tts.generate_tokens(
        text, pref, max_frames=CFG["max_frames"], top_p=0.9,
        temperature=1e-4, anti_loop=False, style_strength=1.0, seed=0,
    )
    assert ours.shape == ref_out.shape, (ours.shape, ref_out.shape)
    np.testing.assert_array_equal(ours, ref_out)


def test_synthesize_smoke_and_determinism(pair, rng):
    _, tts = pair
    ref_tokens = rng.integers(0, CFG["codebook_size"], size=(10, CFG["num_codebooks"]))
    pref = tts.engine.prepare_reference(ref_tokens.astype(np.int32))
    hop = tts.engine.mimi_cfg.hop_length

    wav1 = tts.synthesize("a quick test", ref=pref, max_frames=CFG["max_frames"], seed=3)
    wav2 = tts.synthesize("a quick test", ref=pref, max_frames=CFG["max_frames"], seed=3)
    assert wav1.ndim == 2 and wav1.shape[0] == 1
    assert wav1.shape[1] % hop == 0
    assert np.isfinite(wav1).all()
    np.testing.assert_array_equal(wav1, wav2)

    wav3 = tts.synthesize("a quick test", ref=pref, max_frames=CFG["max_frames"], seed=4)
    assert wav3.shape != wav1.shape or not np.array_equal(wav3, wav1)


def test_synthesize_pcm16_matches_float(pair, rng):
    """Device-side PCM16 output equals host-side quantization of the float
    path (same tokens, same vocoder; only the final cast moves on-device)."""
    _, tts = pair
    ref_tokens = rng.integers(0, CFG["codebook_size"], size=(10, CFG["num_codebooks"]))
    pref = tts.engine.prepare_reference(ref_tokens.astype(np.int32))
    wf = tts.synthesize("pcm check", ref=pref, max_frames=CFG["max_frames"], seed=9)
    wp = tts.synthesize("pcm check", ref=pref, max_frames=CFG["max_frames"],
                        seed=9, pcm16=True)
    assert wp.dtype == np.int16 and wp.shape == wf.shape
    expected = np.round(np.clip(wf, -1, 1) * 32767.0).astype(np.int16)
    np.testing.assert_allclose(wp, expected, atol=1)  # rounding-boundary ulp

    import wave as _w

    tts.save_wav("/tmp/pcm16_out.wav", wp)
    with _w.open("/tmp/pcm16_out.wav") as f:
        assert f.getnframes() == wp.shape[1]


def test_synthesize_fused_matches_adaptive(pair, rng):
    """The single-dispatch fused plan (conditioning + AR + NAR + vocoder in
    one jit) must produce the same waveform as the adaptive two-dispatch
    plan: same RNG path, and the NAR frame mask makes the full-bucket pass
    numerically identical to the EOS-sized-bucket pass."""
    _, tts = pair
    ref_tokens = rng.integers(0, CFG["codebook_size"], size=(10, CFG["num_codebooks"]))
    pref = tts.engine.prepare_reference(ref_tokens.astype(np.int32))

    adaptive = tts.synthesize("fused check", ref=pref,
                              max_frames=CFG["max_frames"], seed=11,
                              fused=False)
    fused = tts.synthesize("fused check", ref=pref,
                           max_frames=CFG["max_frames"], seed=11, fused=True)
    assert fused.shape == adaptive.shape
    np.testing.assert_allclose(fused, adaptive, rtol=1e-5, atol=1e-6)

    fused16 = tts.synthesize("fused check", ref=pref,
                             max_frames=CFG["max_frames"], seed=11,
                             fused=True, pcm16=True)
    assert fused16.dtype == np.int16 and fused16.shape == fused.shape


def test_stream_invariants(pair, rng):
    """Concatenated stream covers exactly the same frame count as the
    non-streaming path for the same seed (the AR token sequence is identical
    by construction), with chunk sizes = chunk_frames * hop."""
    _, tts = pair
    ref_tokens = rng.integers(0, CFG["codebook_size"], size=(12, CFG["num_codebooks"]))
    pref = tts.engine.prepare_reference(ref_tokens.astype(np.int32))
    hop = tts.engine.mimi_cfg.hop_length

    tokens = tts.generate_tokens(
        "stream me", pref, max_frames=CFG["max_frames"], seed=7
    )
    t_total = tokens.shape[0]

    chunks = list(
        tts.stream("stream me", ref=pref, max_frames=CFG["max_frames"],
                   chunk_frames=4, seed=7)
    )
    assert len(chunks) >= 1
    for c in chunks[:-1]:
        assert c.shape == (1, 4 * hop)
    total = sum(c.shape[1] for c in chunks)
    assert total == t_total * hop
    assert all(np.isfinite(c).all() for c in chunks)


def test_stream_single_chunk_sample_exact(pair, rng):
    """Sample-level streaming exactness (VERDICT r2 item 6): with
    chunk_frames >= max_frames the stream is one chunk whose NAR window has
    full context, so the only difference from `synthesize` is the streaming
    Mimi decode path — which is exact. The streamed waveform must equal the
    non-streaming waveform sample-for-sample (multi-chunk streams legitimately
    differ: NAR windows lack right-context at chunk boundaries, reference
    README.md:151)."""
    _, tts = pair
    ref_tokens = rng.integers(0, CFG["codebook_size"], size=(10, CFG["num_codebooks"]))
    pref = tts.engine.prepare_reference(ref_tokens.astype(np.int32))
    mf = CFG["max_frames"]

    want = tts.synthesize("exact stream", ref=pref, max_frames=mf, seed=7)
    chunks = list(
        tts.stream("exact stream", ref=pref, max_frames=mf,
                   chunk_frames=mf + 1, seed=7)
    )
    got = np.concatenate(chunks, axis=1)
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_synthesize_batch(pair, rng):
    """Batched synthesis (config 4): rows decode independently (identical
    (text, seed) rows produce identical audio regardless of co-batch), the
    call is deterministic, and per-row EOS lengths are honored."""
    _, tts = pair
    ref_tokens = rng.integers(0, CFG["codebook_size"], size=(10, CFG["num_codebooks"]))
    pref = tts.engine.prepare_reference(ref_tokens.astype(np.int32))
    hop = tts.engine.mimi_cfg.hop_length

    texts = ["alpha one", "beta two", "alpha one", "gamma three"]
    seeds = [7, 8, 7, 9]
    outs = tts.synthesize_batch(
        texts, ref=pref, max_frames=CFG["max_frames"], seeds=seeds
    )
    assert len(outs) == 4
    for w in outs:
        assert w.shape[0] == 1 and w.shape[1] % hop == 0
        assert np.isfinite(w).all()
    # identical rows -> identical audio (per-row independence)
    np.testing.assert_array_equal(outs[0], outs[2])

    # deterministic across calls
    outs2 = tts.synthesize_batch(
        texts, ref=pref, max_frames=CFG["max_frames"], seeds=seeds
    )
    for a, b in zip(outs, outs2):
        np.testing.assert_array_equal(a, b)


def test_synthesize_batch_dp_sharded(pair, rng):
    """Offline batch synthesis over a device mesh (VERDICT r2 item 8): rows
    sharded over "dp" produce waveforms identical to the unsharded batch
    (dp-only leaves per-row numerics untouched)."""
    from sopro_tpu.parallel import make_mesh

    _, tts = pair
    ref_tokens = rng.integers(0, CFG["codebook_size"], size=(10, CFG["num_codebooks"]))
    pref = tts.engine.prepare_reference(ref_tokens.astype(np.int32))

    texts = ["alpha one", "beta two", "gamma three", "delta four"]
    seeds = [7, 8, 9, 10]
    solo = tts.synthesize_batch(
        texts, ref=pref, max_frames=CFG["max_frames"], seeds=seeds
    )
    mesh = make_mesh(4, dp=4, tp=1)
    sharded = tts.synthesize_batch(
        texts, ref=pref, max_frames=CFG["max_frames"], seeds=seeds, mesh=mesh
    )
    assert len(sharded) == len(solo)
    for a, b in zip(sharded, solo):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_batch_synth_resident_matches_xla(pair, rng):
    """The offline batch path routes AR through the whole-loop VMEM-resident
    kernel when it fits (VERDICT r3 #6 — the XLA per-step while_loop was the
    batch-32 MFU sink). The shared-sampler contract makes the two paths
    token-identical, so batch_synth_graph must return the same lengths and
    waveforms either way (interpret-mode kernel on CPU)."""
    import functools

    import jax
    import jax.numpy as jnp

    from sopro_tpu.config import pick_bucket

    _, tts = pair
    eng = tts.engine
    ref_tokens = rng.integers(
        0, CFG["codebook_size"], size=(10, CFG["num_codebooks"])
    )
    pref = eng.prepare_reference(ref_tokens.astype(np.int32))

    texts = ["alpha one", "beta two", "gamma three", "delta four"]
    rows = [tts.encode_text(t) for t in texts]
    lb = pick_bucket(max(len(r) for r in rows), RT.text_buckets)
    ids = np.zeros((4, lb), np.int32)
    mask = np.zeros((4, lb), bool)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        mask[i, : len(r)] = True
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    ref4 = jax.tree.map(
        lambda x: (jnp.broadcast_to(x, (4,) + x.shape[1:])
                   if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 1
                   else x),
        pref,
    )
    keys = jax.vmap(
        lambda k: jax.random.split(k, 1)[0]
    )(jnp.stack([jax.random.PRNGKey(s) for s in (7, 8, 9, 10)]))

    def run(resident):
        old = eng.use_pallas_resident
        eng.use_pallas_resident = resident
        try:
            fn = jax.jit(functools.partial(
                eng.batch_synth_graph,
                max_frames=CFG["max_frames"], anti_loop=True,
                use_slabs=False, resident=resident,
            ))
            wav, lengths = fn(
                eng.params, eng.mimi_params, None, ids, mask, ref4,
                jnp.float32(1.0), keys, jnp.float32(0.9),
                jnp.float32(1.05), jnp.int32(tts.cfg.min_gen_frames),
            )
            return np.asarray(wav), np.asarray(lengths)
        finally:
            eng.use_pallas_resident = old

    wav_x, len_x = run(False)
    wav_r, len_r = run(True)
    np.testing.assert_array_equal(len_r, len_x)
    np.testing.assert_allclose(wav_r, wav_x, rtol=1e-5, atol=1e-6)


def test_style_strength_sweep(pair, rng):
    """BASELINE config 3: style_strength scales the speaker FiLM modulation.
    The reference zero-inits the FiLM output layer (src/sopro/nn/speaker.py:
    73-74), so fresh weights are style-invariant by design; with a nonzero
    FiLM, conditioning must vary monotonically in strength."""
    import jax
    import jax.numpy as jnp

    from sopro_tpu.models import sopro as M

    _, tts = pair
    params = jax.tree.map(lambda x: x, tts.engine.params)
    params["spk_film"]["mlp2"]["w"] = jnp.asarray(
        rng.standard_normal(params["spk_film"]["mlp2"]["w"].shape) * 0.1,
        jnp.float32,
    )
    cfg = tts.cfg
    ref_tokens = rng.integers(0, CFG["codebook_size"], size=(1, 10, CFG["num_codebooks"]))
    pref = M.prepare_reference(params, cfg, jnp.asarray(ref_tokens, jnp.int32))
    ids = jnp.asarray([[1, 5, 9, 2]], jnp.int32)
    mask = jnp.ones((1, 4), bool)

    conds = {
        s: np.asarray(M.prepare_conditioning(
            params, cfg, ids, mask, pref,
            max_frames=CFG["max_frames"], style_strength=s,
        )["cond_ar"])
        for s in (0.0, 1.0, 2.0)
    }
    d1 = np.abs(conds[1.0] - conds[0.0]).max()
    d2 = np.abs(conds[2.0] - conds[0.0]).max()
    assert d1 > 1e-4 and d2 > d1


def test_encode_reference_from_audio(pair, tmp_path, rng):
    """Audio-file reference path: load -> trim -> resample -> crop -> Mimi
    encode (reference: src/sopro/codec/mimi.py:41-63)."""
    _, tts = pair
    sr = int(tts.engine.mimi_cfg.sampling_rate)
    hop = tts.engine.mimi_cfg.hop_length
    wav = (rng.standard_normal(2 * sr) * 0.3).astype(np.float32)
    p = str(tmp_path / "ref.wav")
    tts.save_wav(p, wav)

    # 0.016 s at this config's 1000 fps = 16 frames
    toks = tts.encode_reference(ref_audio_path=p, ref_seconds=0.016)
    fps = float(tts.engine.mimi_cfg.frame_rate)
    assert toks.shape == (int(round(0.016 * fps)), tts.cfg.num_codebooks)

    sv = tts.encode_speaker(ref_tokens_tq=toks)
    assert sv.shape == (tts.cfg.sv_student_dim,)
    np.testing.assert_allclose(np.linalg.norm(sv), 1.0, rtol=1e-5)


def test_split_sentences():
    from sopro_tpu.tts import split_sentences

    assert split_sentences("") == []
    assert split_sentences("One sentence only.") == ["One sentence only."]
    # short sentences merge up to max_chars
    out = split_sentences("A one. B two! C three? D four.", max_chars=16)
    assert all(len(c) <= 16 for c in out)
    assert " ".join(out).replace("  ", " ").count("one") == 1
    joined = " ".join(out)
    for word in ("one", "two", "three", "four"):
        assert word in joined
    # an over-long run of text without enders falls back to word breaks
    long = "word " * 50
    out = split_sentences(long.strip(), max_chars=40)
    assert len(out) > 1
    assert all(len(c) <= 41 for c in out)
    assert " ".join(out).split() == long.split()


def test_synthesize_long(pair, rng):
    """Long-form synthesis (capability beyond the reference's 400-frame
    cap): sentence chunks decode as one padded batch and stitch with the
    requested silence gap; each chunk's audio equals a solo batch row with
    the same (text, seed)."""
    _, tts = pair
    ref_tokens = rng.integers(
        0, CFG["codebook_size"], size=(10, CFG["num_codebooks"])
    )
    pref = tts.engine.prepare_reference(ref_tokens.astype(np.int32))
    sr = 24000
    gap_ms = 80.0

    text = "Alpha one. Beta two. Gamma three."
    from sopro_tpu.tts import split_sentences

    chunks = split_sentences(text, max_chars=12)
    assert len(chunks) == 3

    wav = tts.synthesize_long(
        text, ref=pref, max_frames=CFG["max_frames"], gap_ms=gap_ms,
        max_chars=12, seed=5,
    )
    solo = tts.synthesize_batch(
        chunks, ref=pref, max_frames=CFG["max_frames"],
        seeds=[5, 6, 7],
    )
    gap = int(round(gap_ms / 1000.0 * sr))
    expect = sum(w.shape[1] for w in solo) + gap * (len(solo) - 1)
    assert wav.shape == (1, expect)
    # chunk 0 occupies the head; chunk 2 the tail; gaps are silent
    np.testing.assert_array_equal(wav[:, : solo[0].shape[1]], solo[0])
    np.testing.assert_array_equal(wav[:, -solo[2].shape[1]:], solo[2])
    assert np.all(wav[0, solo[0].shape[1]: solo[0].shape[1] + gap] == 0)
