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
