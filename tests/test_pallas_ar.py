"""Fused Pallas AR step vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopro_tpu.config import SoproTTSConfig
from sopro_tpu.models import generator as G
from sopro_tpu.models import sopro as M
from sopro_tpu.ops.pallas_ar import (
    ar_step_pallas,
    pack_conv_state,
    stack_ar_params,
    unpack_conv_state,
)

from tests.test_model_parity import CFG


@pytest.fixture(scope="module")
def setup():
    cfg = SoproTTSConfig(**CFG)
    key = jax.random.PRNGKey(4)
    params = M.init_sopro_model(key, cfg, text_vocab_size=50)
    l = 12
    txt = jax.random.normal(jax.random.PRNGKey(5), (1, l, cfg.d_model))
    mask = jnp.asarray(np.array([[True] * 9 + [False] * 3]))
    kvs = G.build_text_kv_caches(params["ar"], cfg, txt, mask)
    stacked = stack_ar_params(params["ar"], cfg)
    kv_k = jnp.stack([kv["k"] for kv in kvs if kv is not None])
    kv_v = jnp.stack([kv["v"] for kv in kvs if kv is not None])
    return cfg, params, kvs, stacked, kv_k, kv_v, mask


def test_pallas_step_matches_xla(setup, rng):
    cfg, params, kvs, stacked, kv_k, kv_v, mask = setup
    conv_state = G.init_ar_conv_state(cfg, 1)

    x = jnp.asarray(rng.standard_normal((1, cfg.d_model)), jnp.float32)
    ref_logits, ref_state = G.ar_step(params["ar"], cfg, x, conv_state, kvs)

    bufs = pack_conv_state(conv_state)
    logits, bufs_out = ar_step_pallas(
        stacked, cfg, x, bufs, kv_k, kv_v, mask, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )
    new_state = unpack_conv_state(bufs_out, cfg)
    for a, b in zip(new_state, ref_state):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-6)


def test_pallas_multi_step_sequence(setup, rng):
    """Drive 8 sequential steps through both paths: the ring-buffer state
    threading (and its interaction with dilations > 1) must stay exact."""
    cfg, params, kvs, stacked, kv_k, kv_v, mask = setup
    ref_state = G.init_ar_conv_state(cfg, 1)
    bufs = pack_conv_state(ref_state)

    for t in range(8):
        x = jnp.asarray(rng.standard_normal((1, cfg.d_model)), jnp.float32)
        ref_logits, ref_state = G.ar_step(params["ar"], cfg, x, ref_state, kvs)
        logits, bufs = ar_step_pallas(
            stacked, cfg, x, bufs, kv_k, kv_v, mask, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5,
            err_msg=f"step {t}",
        )


def test_full_generate_pallas_vs_xla(setup):
    """The entire while_loop decode with the fused step must produce the
    identical token stream (same RNG, same sampler) as the XLA step."""
    from sopro_tpu.ops.pallas_ar import PallasARContext

    cfg, params, kvs, stacked, kv_k, kv_v, mask = setup
    cond = jax.random.normal(
        jax.random.PRNGKey(7), (1, cfg.max_frames + 1, cfg.d_model)
    )
    txt = jax.random.normal(jax.random.PRNGKey(5), (1, 12, cfg.d_model))
    settings = M.default_ar_settings(min_gen_frames=cfg.min_gen_frames)
    dkey = jax.random.PRNGKey(9)

    ref = M.ar_generate(
        params, cfg, cond, txt, mask, dkey, settings, cfg.max_frames + 1,
        kv_caches=kvs,
    )
    ctx = PallasARContext(stacked=stacked, kv_k=kv_k, kv_v=kv_v, mask=mask)
    got = M.ar_generate(
        params, cfg, cond, txt, mask, dkey, settings, cfg.max_frames + 1,
        kv_caches=ctx,
    )
    assert int(got.t[0]) == int(ref.t[0])
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    assert int(got.first_eos[0]) == int(ref.first_eos[0])


def test_full_generate_pallas_batch(setup):
    """B>1 decode through ar_generate with a PallasARContext: the per-row
    freeze must mask the packed [N, B, CTX, D] conv buffer on its batch axis
    (axis 1) — regression test for the ADVICE r1 finding — and per-row
    results must match the XLA path exactly."""
    from sopro_tpu.ops.pallas_ar import PallasARContext

    cfg, params, _, stacked, _, _, _ = setup
    b, l = 2, 12
    txt = jax.random.normal(jax.random.PRNGKey(6), (b, l, cfg.d_model))
    mask = jnp.ones((b, l), bool)
    kvs = G.build_text_kv_caches(params["ar"], cfg, txt, mask)
    kv_k = jnp.stack([kv["k"] for kv in kvs if kv is not None])
    kv_v = jnp.stack([kv["v"] for kv in kvs if kv is not None])

    cond = jax.random.normal(
        jax.random.PRNGKey(7), (b, cfg.max_frames + 1, cfg.d_model)
    )
    settings = M.default_ar_settings(min_gen_frames=1)
    dkey = jax.random.PRNGKey(9)

    ref = M.ar_generate(
        params, cfg, cond, txt, mask, dkey, settings, cfg.max_frames + 1,
        kv_caches=kvs,
    )
    ctx = PallasARContext(stacked=stacked, kv_k=kv_k, kv_v=kv_v, mask=mask)
    got = M.ar_generate(
        params, cfg, cond, txt, mask, dkey, settings, cfg.max_frames + 1,
        kv_caches=ctx,
    )
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(ref.t))
    np.testing.assert_array_equal(np.asarray(got.tokens), np.asarray(ref.tokens))
    np.testing.assert_array_equal(
        np.asarray(got.first_eos), np.asarray(ref.first_eos)
    )


def test_pallas_batch_rows(setup, rng):
    """Batched rows (continuous batching uses B > 1)."""
    cfg, params, _, stacked, kv_k, kv_v, _ = setup
    b, l = 3, 12
    txt = jax.random.normal(jax.random.PRNGKey(6), (b, l, cfg.d_model))
    mask = jnp.asarray(rng.integers(0, 2, (b, l)).astype(bool))
    mask = mask.at[:, 0].set(True)
    kvs = G.build_text_kv_caches(params["ar"], cfg, txt, mask)
    kv_k = jnp.stack([kv["k"] for kv in kvs if kv is not None])
    kv_v = jnp.stack([kv["v"] for kv in kvs if kv is not None])

    conv_state = G.init_ar_conv_state(cfg, b)
    x = jnp.asarray(rng.standard_normal((b, cfg.d_model)), jnp.float32)
    ref_logits, _ = G.ar_step(params["ar"], cfg, x, conv_state, kvs)
    logits, _ = ar_step_pallas(
        stacked, cfg, x, pack_conv_state(conv_state), kv_k, kv_v, mask,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )
