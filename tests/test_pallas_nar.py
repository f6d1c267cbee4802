"""Interpret-mode parity for the fused NAR heads+argmax kernel
(ops/pallas_nar.py) against the XLA einsum + jnp.argmax path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopro_tpu.ops.pallas_nar import nar_heads_argmax

pytestmark = pytest.mark.slow


def _xla_preds(z, hid, w_stack, b_stack):
    zh = z[:, :, None, :] + hid[None, None, :, :]
    logits = jnp.einsum("bthd,hdv->bthv", zh, w_stack) + b_stack[None, None]
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@pytest.mark.parametrize("b,t,h,hd,v", [
    (2, 37, 3, 64, 256),    # unaligned T, small stage
    (1, 128, 4, 128, 384),  # V not a 128 multiple -> lane padding path
    (3, 151, 16, 256, 2048),  # production-stage shape (batch trimmed)
])
def test_kernel_matches_xla(b, t, h, hd, v):
    rng = np.random.default_rng(b * 1000 + t)
    z = jnp.asarray(rng.standard_normal((b, t, hd)), jnp.float32)
    hid = jnp.asarray(rng.standard_normal((h, hd)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((h, hd, v)) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, v)) * 0.05, jnp.float32)
    got = nar_heads_argmax(z, hid, w, bias, interpret=True)
    want = _xla_preds(z, hid, w, bias)
    assert got.shape == (b, t, h)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kernel_tie_breaks_to_lowest_index():
    """Ties must resolve to the first (lowest) index, like jnp.argmax."""
    b, t, h, hd, v = 1, 8, 2, 8, 128
    z = jnp.zeros((b, t, hd), jnp.float32)
    hid = jnp.zeros((h, hd), jnp.float32)
    w = jnp.zeros((h, hd, v), jnp.float32)
    bias = jnp.zeros((h, v), jnp.float32)  # all logits equal -> index 0
    got = nar_heads_argmax(z, hid, w, bias, interpret=True)
    assert np.all(np.asarray(got) == 0)
    # now a strict winner at a nonzero index
    bias = bias.at[:, 37].set(1.0)
    got = nar_heads_argmax(z, hid, w, bias, interpret=True)
    assert np.all(np.asarray(got) == 37)


def test_nar_refine_end_to_end_uses_same_tokens():
    """nar_refine with the kernel forced on (interpret) equals the XLA
    fallback at a tiny config — the decode path's token stream must not
    depend on which head implementation runs."""
    from sopro_tpu.config import SoproTTSConfig
    from sopro_tpu.models.nar import nar_refine
    from sopro_tpu.models.sopro import cb_spec, init_sopro_model

    cfg = SoproTTSConfig(
        d_model=64, n_layers_ar=2, n_layers_nar=2, num_codebooks=8,
        codebook_size=64, nar_head_dim=32, max_frames=16,
    )
    params = init_sopro_model(jax.random.PRNGKey(0), cfg, text_vocab_size=20)
    rng = np.random.default_rng(0)
    b, t = 2, 12
    cond = jnp.asarray(rng.standard_normal((b, t, cfg.d_model)), jnp.float32)
    rvq1 = jnp.asarray(rng.integers(0, 64, (b, t)), jnp.int32)

    import sopro_tpu.models.nar as nar_mod

    orig = nar_mod.nar_stage_preds

    def forced(*a, **k):
        k["use_kernel"] = True
        return orig(*a, **k)

    try:
        toks_xla = nar_refine(
            params["nar"], params["cb_embed"], cb_spec(cfg),
            params["nar_prev_cb_weights"], cfg, cond, rvq1,
        )
        nar_mod.nar_stage_preds = forced
        # force the kernel path through nar_refine's module-level call
        toks_kernel = nar_refine(
            params["nar"], params["cb_embed"], cb_spec(cfg),
            params["nar_prev_cb_weights"], cfg, cond, rvq1,
        )
    finally:
        nar_mod.nar_stage_preds = orig
    np.testing.assert_array_equal(np.asarray(toks_xla), np.asarray(toks_kernel))
