"""Real-TPU test lane (`SOPRO_TEST_TPU=1 python -m pytest tests/ -q`, or
`just test-tpu`).

Everything here runs on the actual chip: the Pallas AR-step kernel in real
Mosaic lowering (the CPU lane only covers interpret mode), and a small
end-to-end synthesize. Results are recorded in PARITY.md.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def full_size():
    """Full-size (d_model=384) random model on the real device."""
    import jax

    from sopro_tpu.config import SoproTTSConfig
    from sopro_tpu.models import generator as G
    from sopro_tpu.models import sopro as M
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    cfg = SoproTTSConfig()
    params = M.init_sopro_model(jax.random.PRNGKey(0), cfg, text_vocab_size=256)
    params = jax.device_put(params)
    txt = jax.random.normal(jax.random.PRNGKey(1), (1, 64, cfg.d_model))
    import jax.numpy as jnp

    mask = jnp.ones((1, 64), bool)
    kvs = G.build_text_kv_caches(params["ar"], cfg, txt, mask)
    return cfg, params, txt, mask, kvs


def test_pallas_ar_step_real_mosaic(full_size, rng):
    """Fused AR-step kernel under the REAL Mosaic lowering vs the XLA step
    (the CPU lane runs the kernel in interpret mode only — this is the
    hardware-truth check, VERDICT r2 item 7)."""
    import jax
    import jax.numpy as jnp

    from sopro_tpu.models import generator as G
    from sopro_tpu.ops.pallas_ar import (
        ar_step_pallas,
        pack_conv_state,
        stack_ar_params,
        unpack_conv_state,
    )

    cfg, params, txt, mask, kvs = full_size
    stacked = stack_ar_params(params["ar"], cfg)
    kv_k = jnp.stack([kv["k"] for kv in kvs if kv is not None])
    kv_v = jnp.stack([kv["v"] for kv in kvs if kv is not None])

    xla_state = G.init_ar_conv_state(cfg, 1)
    bufs = pack_conv_state(xla_state)

    for step in range(3):
        x = jnp.asarray(rng.standard_normal((1, cfg.d_model)), jnp.float32)
        ref_logits, xla_state = G.ar_step(params["ar"], cfg, x, xla_state, kvs)
        logits, bufs = ar_step_pallas(
            stacked, cfg, x, bufs, kv_k, kv_v, mask, interpret=False
        )
        # real-chip tolerance: XLA's f32 matmuls and the Mosaic kernel's
        # accumulate in different orders/precisions (measured max abs diff
        # ~6e-3 on ±10-scale logits)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits),
            rtol=5e-2, atol=2e-2, err_msg=f"step {step}",
        )
    # conv state holds GLU activations: TPU f32 matmuls (bf16-decomposed)
    # give ~1e-3-scale noise on O(0.01..1) values; the logits check above is
    # the functional assertion, this one guards gross state-threading bugs
    for a, b in zip(unpack_conv_state(bufs, cfg), xla_state):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-3
        )


def test_resident_kernel_real_mosaic(full_size):
    """Whole-loop/chunk resident AR kernel under the REAL Mosaic lowering:
    the near-greedy prefix must match the XLA while_loop until the first
    genuine logit near-tie (Mosaic and XLA accumulate in different orders,
    so exact ties can legitimately flip), the sampled path must be bitwise
    reproducible per seed, and chunked state-in/state-out must be bitwise
    equal to the whole-loop call (same kernel, same stream)."""
    import jax
    import jax.numpy as jnp

    from sopro_tpu.models import sopro as M
    from tests.test_pallas_resident import make_loop_context

    cfg, params, txt, mask, kvs = full_size
    S = 49
    cond = jax.random.normal(
        jax.random.PRNGKey(2), (1, S, cfg.d_model)
    ) * 0.02
    ctx = make_loop_context(params, cfg, kvs, mask)
    ng = M.ARSettings(
        top_p=jnp.float32(1e-5), temperature=jnp.float32(1e-4),
        recovery_top_p=jnp.float32(1e-5), recovery_temp=jnp.float32(1e-4),
        min_gen_frames=jnp.int32(12),
    )
    c_res = M.ar_generate(params, cfg, cond, txt, mask,
                          jax.random.PRNGKey(7), ng, S, kv_caches=ctx)
    c_xla = M.ar_generate(params, cfg, cond, txt, mask,
                          jax.random.PRNGKey(7), ng, S, kv_caches=kvs)
    tr, tx = np.asarray(c_res.tokens[0]), np.asarray(c_xla.tokens[0])
    # identical prefix of at least 16 steps (ties beyond that are possible
    # but a shorter prefix means a real numerics bug)
    assert (tr[:16] == tx[:16]).all(), (tr[:16], tx[:16])

    s1 = M.ARSettings(
        top_p=jnp.float32(0.9), temperature=jnp.float32(1.05),
        recovery_top_p=jnp.float32(0.85), recovery_temp=jnp.float32(1.2),
        min_gen_frames=jnp.int32(12),
    )
    a = M.ar_generate(params, cfg, cond, txt, mask, jax.random.PRNGKey(1),
                      s1, S, kv_caches=ctx)
    b = M.ar_generate(params, cfg, cond, txt, mask, jax.random.PRNGKey(1),
                      s1, S, kv_caches=ctx)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))

    # chunked == full, bitwise, on hardware (the serving-tick contract)
    carry = M.init_ar_carry(cfg, 1, S, jax.random.PRNGKey(1))
    carry = M.maybe_pack_carry(carry, ctx)
    for _ in range(0, S + 6, 7):
        carry = M.ar_generate_chunk(
            params, cfg, carry, cond, ctx, s1, 7
        )
    np.testing.assert_array_equal(
        np.asarray(a.tokens), np.asarray(carry.tokens)
    )
    assert int(a.t[0]) == int(carry.t[0])


def test_pallas_vocoder_real_mosaic(rng):
    """Fused SEANet vocoder under the REAL Mosaic lowering vs the XLA
    decoder at full Mimi size (bf16 tolerance: different accumulation
    groupings)."""
    import jax
    import jax.numpy as jnp

    from sopro_tpu.codec.convert import init_mimi_params
    from sopro_tpu.codec.mimi_config import MimiConfig, decoder_plan
    from sopro_tpu.codec.mimi_jax import seanet_apply
    from sopro_tpu.codec.pallas_vocoder import (
        pack_seanet_decoder, seanet_decode_pallas,
    )

    cfg = MimiConfig()
    p = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16), init_mimi_params(0, cfg)
    )
    slabs = jax.device_put(pack_seanet_decoder(p["decoder"], cfg))
    dec = jax.device_put(p["decoder"])
    emb = jnp.asarray(
        rng.standard_normal((1, 90, cfg.hidden_size)) * 0.3, jnp.bfloat16
    )
    ref = np.asarray(
        jax.jit(lambda d, e: seanet_apply(d, decoder_plan(cfg), e)[..., 0])(
            dec, emb
        ),
        np.float32,
    )
    out = np.asarray(
        jax.jit(lambda s, e: seanet_decode_pallas(s, cfg, e))(slabs, emb),
        np.float32,
    )
    assert out.shape == ref.shape
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 0.02 * scale + 1e-4


def test_synthesize_small_on_chip():
    """End-to-end synthesize at full model size on the real device: finite,
    frame-aligned audio through the fused and adaptive plans."""
    from sopro_tpu import RuntimeConfig, SoproTTS
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    tts = SoproTTS.from_random(
        seed=0, runtime=RuntimeConfig(compute_dtype="bfloat16")
    )
    rng = np.random.default_rng(0)
    ref_tokens = rng.integers(
        0, tts.cfg.codebook_size, size=(40, tts.cfg.num_codebooks)
    ).astype(np.int32)
    ref = tts.engine.prepare_reference(ref_tokens)
    hop = tts.engine.mimi_cfg.hop_length

    wav = tts.synthesize("on chip check", ref=ref, max_frames=24, seed=1,
                         min_gen_frames=24)
    assert wav.shape[0] == 1 and wav.shape[1] % hop == 0 and wav.shape[1] > 0
    assert np.isfinite(wav).all()

    # NOTE: fused and adaptive are DIFFERENT compiled graphs; in bf16 their
    # logits differ by ulps, which can legitimately flip sampled tokens —
    # cross-path waveform equality is asserted in the CPU f32 lane
    # (test_e2e.test_synthesize_fused_matches_adaptive). On hardware we
    # assert the fused plan's format and bitwise run-to-run determinism.
    wav_f = tts.synthesize("on chip check", ref=ref, max_frames=24, seed=1,
                           min_gen_frames=24, fused=True, pcm16=True)
    assert wav_f.dtype == np.int16
    assert wav_f.shape == wav.shape
    assert np.abs(wav_f.astype(np.int64)).max() > 0
    wav_f2 = tts.synthesize("on chip check", ref=ref, max_frames=24, seed=1,
                            min_gen_frames=24, fused=True, pcm16=True)
    np.testing.assert_array_equal(wav_f, wav_f2)


def test_streaming_vocoder_real_mosaic(rng):
    """Stateful streaming vocoder step with packed slabs under the REAL
    Mosaic lowering: chunked kernel decode (including a ramp-sized chunk)
    matches the XLA streaming path at bf16 tolerance."""
    import jax
    import jax.numpy as jnp

    from sopro_tpu.codec.convert import init_mimi_params
    from sopro_tpu.codec.mimi_config import MimiConfig
    from sopro_tpu.codec.pallas_vocoder import pack_seanet_decoder
    from sopro_tpu.codec.streaming import (
        init_mimi_stream_state, mimi_decode_step,
    )

    cfg = MimiConfig()
    p = jax.device_put(jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16), init_mimi_params(0, cfg)
    ))
    slabs = jax.device_put(pack_seanet_decoder(p["decoder"], cfg))

    codes = jnp.asarray(
        rng.integers(0, cfg.codebook_size, (2, 24, cfg.num_quantizers)),
        jnp.int32,
    )
    step_x = jax.jit(lambda pp, c, s: mimi_decode_step(pp, cfg, c, s))
    step_k = jax.jit(
        lambda pp, c, s, sl: mimi_decode_step(pp, cfg, c, s, slabs=sl)
    )
    sx = init_mimi_stream_state(cfg, batch=2, dtype=jnp.bfloat16)
    sk = init_mimi_stream_state(cfg, batch=2, dtype=jnp.bfloat16)
    t = 0
    outs_x, outs_k = [], []
    for n in (16, 4, 4):  # serving tick + ramp-sized chunks
        wx, sx = step_x(p, codes[:, t: t + n], sx)
        wk, sk = step_k(p, codes[:, t: t + n], sk, slabs)
        outs_x.append(np.asarray(wx, np.float32))
        outs_k.append(np.asarray(wk, np.float32))
        t += n
    xla = np.concatenate(outs_x, axis=1)
    kern = np.concatenate(outs_k, axis=1)
    assert kern.shape == xla.shape
    scale = np.abs(xla).max()
    assert np.abs(kern - xla).max() < 0.02 * scale + 1e-4


def test_nar_heads_argmax_real_mosaic(rng):
    """Fused NAR heads+argmax kernel under the REAL Mosaic lowering vs the
    XLA einsum+argmax path, at the production stage-E shape in bf16. The
    kernel rounds its fp32 accumulation to bf16 exactly like the XLA dot,
    so the ids must agree except on exact bf16 ties (which both paths break
    toward the lowest index) — require bit equality."""
    import jax
    import jax.numpy as jnp

    from sopro_tpu.ops.pallas_nar import nar_heads_argmax

    b, t, h, hd, v = 8, 151, 16, 256, 2048
    z = jnp.asarray(rng.standard_normal((b, t, hd)), jnp.bfloat16)
    hid = jnp.asarray(rng.standard_normal((h, hd)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((h, hd, v)) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((h, v)) * 0.05, jnp.bfloat16)

    got = np.asarray(jax.jit(
        lambda *a: nar_heads_argmax(*a, interpret=False)
    )(z, hid, w, bias))

    def xla(z, hid, w, bias):
        zh = z[:, :, None, :] + hid[None, None, :, :]
        logits = jnp.einsum("bthd,hdv->bthv", zh, w) + bias[None, None]
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    want = np.asarray(jax.jit(xla)(z, hid, w, bias))
    assert got.shape == want.shape == (b, t, h)
    frac = float((got != want).mean())
    # identical rounding on both paths: allow only a vanishing near-tie tail
    assert frac <= 1e-3, frac
