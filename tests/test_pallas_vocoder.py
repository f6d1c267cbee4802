"""Fused Pallas SEANet vocoder vs the XLA decode path (interpret mode on
CPU in f32, where parity is ~1e-7; real-Mosaic coverage in tests/test_tpu.py
at bf16 tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopro_tpu.codec.convert import init_mimi_params
from sopro_tpu.codec.mimi_config import MimiConfig, decoder_plan
from sopro_tpu.codec.mimi_jax import mimi_decode, seanet_apply
from sopro_tpu.codec.pallas_vocoder import (
    mimi_decode_with_slabs,
    pack_seanet_decoder,
    pallas_vocoder_supported,
    required_halo,
    seanet_decode_pallas,
)

from tests.test_mimi_parity import SMALL as MIMI_SMALL

# CI lane: production-size kernels in interpret mode are compile-heavy;
# `just test` runs -m "not slow" (<5 min), `just test-all` runs everything
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def full_cfg():
    cfg = MimiConfig()  # production kyutai/mimi architecture
    return cfg, init_mimi_params(0, cfg)


def test_supported_configs(full_cfg):
    cfg, _ = full_cfg
    assert pallas_vocoder_supported(cfg)
    assert required_halo(cfg) == 8
    small = MimiConfig(**MIMI_SMALL)
    # the test-size codec has too few filters for full 128-lane tiles; the
    # engine must fall back to XLA for it
    assert not pallas_vocoder_supported(small)


def test_seanet_kernel_matches_xla(full_cfg, rng):
    """Sample-exact (f32) parity across tile boundaries, including a
    non-multiple-of-TILE length."""
    cfg, p = full_cfg
    slabs = pack_seanet_decoder(p["decoder"], cfg)
    for t25 in (20, 70):  # < one tile; multi-tile with remainder
        emb = jnp.asarray(
            rng.standard_normal((1, t25, cfg.hidden_size)) * 0.3, jnp.float32
        )
        ref = seanet_apply(p["decoder"], decoder_plan(cfg), emb)[..., 0]
        out = seanet_decode_pallas(slabs, cfg, emb, interpret=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg=f"t25={t25}",
        )


def test_seanet_kernel_batched(full_cfg, rng):
    """Batched rows (grid over B x tiles) must equal per-row decodes."""
    cfg, p = full_cfg
    slabs = pack_seanet_decoder(p["decoder"], cfg)
    emb = jnp.asarray(
        rng.standard_normal((3, 22, cfg.hidden_size)) * 0.3, jnp.float32
    )
    out = seanet_decode_pallas(slabs, cfg, emb, interpret=True)
    for bi in range(3):
        solo = seanet_decode_pallas(
            slabs, cfg, emb[bi: bi + 1], interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out[bi: bi + 1]), np.asarray(solo),
            rtol=1e-6, atol=1e-7, err_msg=f"row {bi}",
        )
    ref = seanet_apply(p["decoder"], decoder_plan(cfg), emb)[..., 0]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_mimi_decode_with_slabs_matches_full(full_cfg, rng):
    """End-to-end codes->wav equality between the slab path (Pallas SEANet)
    and the plain mimi_decode."""
    cfg, p = full_cfg
    slabs = pack_seanet_decoder(p["decoder"], cfg)
    codes = jnp.asarray(
        rng.integers(0, cfg.codebook_size, (1, 9, cfg.num_quantizers)),
        jnp.int32,
    )
    ref = mimi_decode(p, cfg, codes)
    out = mimi_decode_with_slabs(p, slabs, cfg, codes)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_streaming_kernel_matches_xla_stream(full_cfg, rng):
    """VERDICT r4 item 1: the stateful streaming vocoder step with packed
    slabs (Pallas SEANet over [emb_hist ++ chunk]) must produce exactly the
    XLA streaming path's samples chunk by chunk, across chunk-size changes
    (serving ramp ticks) and with per-row freeze masks."""
    from sopro_tpu.codec.streaming import (
        init_mimi_stream_state, mimi_decode_step,
    )

    cfg, p = full_cfg
    slabs = pack_seanet_decoder(p["decoder"], cfg)
    T = 10
    codes = jnp.asarray(
        rng.integers(0, cfg.codebook_size, (2, T, cfg.num_quantizers)),
        jnp.int32,
    )
    full = np.asarray(mimi_decode(p, cfg, codes))

    sx = init_mimi_stream_state(cfg, batch=2)
    sk = init_mimi_stream_state(cfg, batch=2)
    outs_x, outs_k = [], []
    t = 0
    for n in (4, 2, 4):  # chunk-size change mid-stream (ramp tick shape)
        chunk = codes[:, t: t + n]
        wx, sx = mimi_decode_step(p, cfg, chunk, sx)
        wk, sk = mimi_decode_step(p, cfg, chunk, sk, slabs=slabs)
        assert wk.shape == wx.shape == (2, n * cfg.hop_length)
        outs_x.append(np.asarray(wx))
        outs_k.append(np.asarray(wk))
        t += n
    kern = np.concatenate(outs_k, axis=1)
    np.testing.assert_allclose(
        kern, np.concatenate(outs_x, axis=1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(kern, full, rtol=1e-4, atol=1e-5)


def test_streaming_kernel_freeze_mask(full_cfg, rng):
    """A frozen row (mask=False) must keep its state — including the
    kernel's emb_hist — bit-identical, so the scheduler's mask-frozen
    vocoder semantics hold on the kernel path."""
    from sopro_tpu.codec.streaming import (
        init_mimi_stream_state, mimi_decode_step,
    )

    cfg, p = full_cfg
    slabs = pack_seanet_decoder(p["decoder"], cfg)
    codes = jnp.asarray(
        rng.integers(0, cfg.codebook_size, (2, 8, cfg.num_quantizers)),
        jnp.int32,
    )
    state = init_mimi_stream_state(cfg, batch=2)
    w1, state = mimi_decode_step(p, cfg, codes[:, :4], state, slabs=slabs)
    mask = jnp.asarray([True, False])
    w2, state2 = mimi_decode_step(
        p, cfg, codes[:, 4:], state, mask=mask, slabs=slabs
    )
    # frozen row: state untouched
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        if a.ndim >= 1 and a.shape[0] == 2:
            np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    # live row advanced and matches a solo 2-chunk stream
    solo = init_mimi_stream_state(cfg, batch=1)
    s1, solo = mimi_decode_step(p, cfg, codes[:1, :4], solo, slabs=slabs)
    s2, _ = mimi_decode_step(p, cfg, codes[:1, 4:], solo, slabs=slabs)
    np.testing.assert_allclose(
        np.asarray(w2[0]), np.asarray(s2[0]), rtol=1e-5, atol=1e-6
    )
