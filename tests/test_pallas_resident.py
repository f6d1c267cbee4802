"""Whole-loop/chunk resident Pallas AR decode vs the XLA / per-step paths
(interpret mode on CPU; real-Mosaic coverage lives in tests/test_tpu.py).

The loop kernel runs every step — block stack, threefry sampler, anti-loop
bookkeeping — inside one pallas_call, batch-generic and resumable from an
arbitrary carry. Near-greedy decoding is RNG-free; SAMPLED decoding now
shares the explicit Threefry-2x32 stream with the XLA paths
(sopro_tpu/sampling.py), so token equality is asserted at production
temperature across every path — the reference's one-sampler contract
(src/sopro/sampling.py:24-93)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopro_tpu.config import SoproTTSConfig
from sopro_tpu.models import generator as G
from sopro_tpu.models import sopro as M
from sopro_tpu.ops.pallas_ar import (
    HEAD_PAD,
    PallasARContext,
    pad_kv_heads,
    pack_conv_state,
    stack_ar_params,
)
from sopro_tpu.ops.pallas_ar_loop import ResidentLoopContext

from tests.test_model_parity import CFG


# CI lane: these modules dominate suite wall-clock (compile-heavy); run them
# via `just test-all`; `just test` runs -m "not slow" (<5 min)
pytestmark = pytest.mark.slow

S = 25


def make_loop_context(params, cfg, kvs, mask):
    stacked = stack_ar_params(params["ar"], cfg)
    kv_k = jnp.stack([kv["k"] for kv in kvs if kv is not None])
    kv_v = jnp.stack([kv["v"] for kv in kvs if kv is not None])
    a, b, h, l, hd = kv_k.shape
    if hd != HEAD_PAD:
        kv_k, kv_v = pad_kv_heads(kv_k), pad_kv_heads(kv_v)
    emb = params["cb_embed"]["emb"]
    bos = cfg.num_codebooks * cfg.codebook_size
    emb_c = jnp.concatenate([emb[: cfg.ar_vocab], emb[bos: bos + 1]], axis=0)
    return ResidentLoopContext(
        stacked=stacked,
        kv_k=kv_k.reshape(a, b * h, l, HEAD_PAD),
        kv_v=kv_v.reshape(a, b * h, l, HEAD_PAD),
        mask=mask, emb=emb_c,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = SoproTTSConfig(**dict(CFG, min_gen_frames=4))
    key = jax.random.PRNGKey(4)
    params = M.init_sopro_model(key, cfg, text_vocab_size=50)
    l = 12
    txt = jax.random.normal(jax.random.PRNGKey(5), (1, l, cfg.d_model))
    mask = jnp.asarray(np.array([[True] * 9 + [False] * 3]))
    kvs = G.build_text_kv_caches(params["ar"], cfg, txt, mask)
    stacked = stack_ar_params(params["ar"], cfg)
    kv_k = jnp.stack([kv["k"] for kv in kvs if kv is not None])
    kv_v = jnp.stack([kv["v"] for kv in kvs if kv is not None])
    ctx_res = make_loop_context(params, cfg, kvs, mask)
    ctx_step = PallasARContext(
        stacked=stacked, kv_k=kv_k, kv_v=kv_v, mask=mask
    )
    cond = (
        jax.random.normal(jax.random.PRNGKey(6), (1, S, cfg.d_model)) * 0.1
    )
    return cfg, params, kvs, ctx_res, ctx_step, cond, txt, mask


def _near_greedy(min_gen=4):
    return M.ARSettings(
        top_p=jnp.float32(1e-5), temperature=jnp.float32(1e-3),
        recovery_top_p=jnp.float32(1e-5), recovery_temp=jnp.float32(1e-3),
        min_gen_frames=jnp.int32(min_gen),
    )


def _sampled(min_gen=4):
    return M.ARSettings(
        top_p=jnp.float32(0.9), temperature=jnp.float32(1.05),
        recovery_top_p=jnp.float32(0.85), recovery_temp=jnp.float32(1.2),
        min_gen_frames=jnp.int32(min_gen),
    )


def _gen(setup, ctx, settings, seed=7, s=S, cond=None):
    cfg, params, kvs, ctx_res, ctx_step, cond0, txt, mask = setup
    return M.ar_generate(
        params, cfg, cond0 if cond is None else cond, txt, mask,
        jax.random.PRNGKey(seed), settings, s, kv_caches=ctx,
    )


def _gen_chunked(setup, ctx, settings, seed=7, chunk=4):
    """Drive the same decode through ar_generate_chunk state-in/state-out."""
    cfg, params, kvs, ctx_res, ctx_step, cond, txt, mask = setup
    carry = M.init_ar_carry(cfg, 1, S, jax.random.PRNGKey(seed))
    carry = M.maybe_pack_carry(carry, ctx)
    for _ in range(0, S + chunk - 1, chunk):
        carry = M.ar_generate_chunk(
            params, cfg, carry, cond, ctx, settings, chunk
        )
    return carry


def test_resident_near_greedy_matches_xla(setup):
    """RNG-free decoding must agree bit-for-bit with the XLA while_loop —
    including anti-loop recovery switches and EOS bookkeeping."""
    cfg, params, kvs, ctx_res, ctx_step, cond, txt, mask = setup
    c_res = _gen(setup, ctx_res, _near_greedy())
    c_xla = _gen(setup, kvs, _near_greedy())
    np.testing.assert_array_equal(
        np.asarray(c_res.tokens), np.asarray(c_xla.tokens)
    )
    assert int(c_res.first_eos[0]) == int(c_xla.first_eos[0])
    assert int(c_res.t[0]) == int(c_xla.t[0])
    assert bool(c_res.stopped[0]) == bool(c_xla.stopped[0])


def test_resident_near_greedy_matches_per_step_kernel(setup):
    c_res = _gen(setup, setup[3], _near_greedy())
    c_stp = _gen(setup, setup[4], _near_greedy())
    np.testing.assert_array_equal(
        np.asarray(c_res.tokens), np.asarray(c_stp.tokens)
    )


def test_sampled_token_equality_across_all_paths(setup):
    """THE cross-path RNG contract (reference: one sampler, one stream —
    src/sopro/sampling.py): at production temperature 1.05, the same seed
    must yield the same tokens on the XLA while_loop, the XLA chunked scan,
    the per-step Pallas kernel, the resident whole-loop kernel, and the
    resident chunked path."""
    cfg, params, kvs, ctx_res, ctx_step, cond, txt, mask = setup
    for seed in (7, 11):
        c_xla = _gen(setup, kvs, _sampled(), seed=seed)
        t_ref = np.asarray(c_xla.tokens)
        for name, c in (
            ("xla-chunked", _gen_chunked(setup, kvs, _sampled(), seed=seed)),
            ("per-step-kernel", _gen(setup, ctx_step, _sampled(), seed=seed)),
            ("resident-full", _gen(setup, ctx_res, _sampled(), seed=seed)),
            ("resident-chunked",
             _gen_chunked(setup, ctx_res, _sampled(), seed=seed)),
        ):
            t_cut = int(c_xla.t[0])
            np.testing.assert_array_equal(
                t_ref[:, :t_cut], np.asarray(c.tokens)[:, :t_cut],
                err_msg=f"path {name} diverged at seed {seed}",
            )
            assert int(c.first_eos[0]) == int(c_xla.first_eos[0]), name
            assert int(c.t[0]) == int(c_xla.t[0]), name


def test_resident_chunked_equals_full_bitwise(setup):
    """Chunked state-in/state-out through the kernel must be bit-identical
    to one whole-loop call (same kernel, same stream — no ULP caveat)."""
    c_full = _gen(setup, setup[3], _sampled(), seed=3)
    c_chun = _gen_chunked(setup, setup[3], _sampled(), seed=3, chunk=7)
    np.testing.assert_array_equal(
        np.asarray(c_full.tokens), np.asarray(c_chun.tokens)
    )
    assert int(c_full.t[0]) == int(c_chun.t[0])
    assert int(c_full.first_eos[0]) == int(c_chun.first_eos[0])
    np.testing.assert_array_equal(
        np.asarray(c_full.hist), np.asarray(c_chun.hist)
    )


def test_resident_batched_rows_match_solo(setup):
    """B rows decoding together must produce exactly what each row produces
    alone (the serving-tick property: joining a batch never changes a
    session's audio). Rows get different conds so they stop at different
    times."""
    cfg, params, kvs, ctx_res, ctx_step, cond, txt, mask = setup
    b = 3
    conds = jnp.concatenate(
        [
            jax.random.normal(jax.random.PRNGKey(20 + i), (1, S, cfg.d_model))
            * 0.1
            for i in range(b)
        ],
        axis=0,
    )
    txt_b = jnp.broadcast_to(txt, (b,) + txt.shape[1:])
    mask_b = jnp.broadcast_to(mask, (b, mask.shape[1]))
    kvs_b = G.build_text_kv_caches(params["ar"], cfg, txt_b, mask_b)
    ctx_b = make_loop_context(params, cfg, kvs_b, mask_b)

    settings = _sampled()
    carry = M.init_ar_carry(cfg, b, S, jax.random.PRNGKey(0))
    # per-row keys exactly as the solo path derives them (batch=1 split)
    row_keys = jnp.concatenate(
        [jax.random.split(jax.random.PRNGKey(100 + i), 1) for i in range(b)]
    )
    carry = carry._replace(key=row_keys)
    carry = M.maybe_pack_carry(carry, ctx_b)
    for _ in range(0, S + 3, 4):
        carry = M.ar_generate_chunk(
            params, cfg, carry, conds, ctx_b, settings, 4
        )

    for i in range(b):
        solo = M.ar_generate(
            params, cfg, conds[i: i + 1], txt, mask,
            jax.random.PRNGKey(100 + i), settings, S, kv_caches=ctx_res,
        )
        t_i = int(solo.t[0])
        assert int(carry.t[i]) == t_i, (i, int(carry.t[i]), t_i)
        np.testing.assert_array_equal(
            np.asarray(carry.tokens[i, :t_i]),
            np.asarray(solo.tokens[0, :t_i]),
            err_msg=f"row {i} diverged from its solo run",
        )
        assert int(carry.first_eos[i]) == int(solo.first_eos[0])


def test_resident_min_gen_gates_eos(setup):
    """Force EOS as the greedy choice from step 0 by biasing the head: the
    kernel must keep decoding until min_gen_frames and stop exactly there
    (reference: src/sopro/model.py:304-305)."""
    cfg, params, kvs, ctx_res, ctx_step, cond, txt, mask = setup
    stacked = dict(ctx_res.stacked)
    bias = np.zeros((1, cfg.ar_vocab), np.float32)
    bias[0, cfg.eos_id] = 100.0
    stacked["head_b"] = stacked["head_b"] + jnp.asarray(bias)
    ctx_eos = ctx_res._replace(stacked=stacked)

    min_gen = 6
    c = _gen(setup, ctx_eos, _near_greedy(min_gen=min_gen))
    assert int(c.t[0]) == min_gen
    assert int(c.first_eos[0]) == 0  # EOS was argmax from the first step
    assert bool(c.stopped[0])
    toks = np.asarray(c.tokens[0])
    assert (toks[:min_gen] == cfg.eos_id).all()

    # and the XLA path agrees on the same biased weights
    p2 = dict(params)
    p2["ar"] = dict(p2["ar"])
    p2["ar"]["head"] = dict(p2["ar"]["head"])
    p2["ar"]["head"]["b"] = p2["ar"]["head"]["b"] + jnp.asarray(bias[0])
    kvs2 = G.build_text_kv_caches(p2["ar"], cfg, txt, mask)
    c_x = M.ar_generate(
        p2, cfg, cond, txt, mask, jax.random.PRNGKey(7),
        _near_greedy(min_gen=min_gen), S, kv_caches=kvs2,
    )
    assert int(c_x.t[0]) == int(c.t[0])
    assert int(c_x.first_eos[0]) == int(c.first_eos[0])


def test_resident_sampled_reproducible_and_in_range(setup):
    cfg = setup[0]
    a = _gen(setup, setup[3], _sampled(), seed=1)
    b = _gen(setup, setup[3], _sampled(), seed=1)
    c = _gen(setup, setup[3], _sampled(), seed=2)
    ta, tb, tc = (np.asarray(x.tokens) for x in (a, b, c))
    np.testing.assert_array_equal(ta, tb)
    assert (ta != tc).any()
    assert ta.min() >= 0 and ta.max() <= cfg.codebook_size


def test_resident_penalty_window_past_50(setup):
    """The repetition penalty must cover exactly the last HIST_LEN=50
    tokens, not the kernel's whole 64-row history buffer: near-greedy
    decoding past 50 frames stays bit-identical to the XLA path (a
    64-window would penalize tokens 51-64 steps old, shift xp, and flip
    argmaxes). Near-greedy is the right bitwise probe: the penalty applies
    BEFORE the argmax, so window bugs surface, while nucleus-boundary ULP
    sensitivity (see test below) does not."""
    cfg, params, kvs, ctx_res, ctx_step, cond, txt, mask = setup
    s_long = 88
    cond_l = (
        jax.random.normal(jax.random.PRNGKey(11), (1, s_long, cfg.d_model))
        * 0.1
    )
    settings = _near_greedy()
    c_res = M.ar_generate(
        params, cfg, cond_l, txt, mask, jax.random.PRNGKey(7), settings,
        s_long, kv_caches=ctx_res,
    )
    c_xla = M.ar_generate(
        params, cfg, cond_l, txt, mask, jax.random.PRNGKey(7), settings,
        s_long, kv_caches=kvs,
    )
    np.testing.assert_array_equal(
        np.asarray(c_res.tokens), np.asarray(c_xla.tokens)
    )
    assert int(c_res.t[0]) == int(c_xla.t[0])


def test_resident_sampled_long_horizon(setup):
    """SAMPLED decoding over 88 steps (past the 50-token window). Two
    assertions with different strengths, deliberately:

    1. resident-full vs resident-chunked: BITWISE — same kernel, so the
       count-grid/history state-out -> state-in handoff across chunk
       boundaries (including past t=50, where tokens expire from the
       window) must be exact.
    2. resident vs XLA while_loop: near-equality. All paths run the
       identical sampler + threefry stream, but XLA compiles each path's
       MODEL graph separately and f32 ULP differences between compilations
       can land exactly on a nucleus boundary (~1 event per few hundred
       steps on tiny random weights; both candidate tokens are
       near-equiprobable when it happens). Verified root cause: even two
       pure-XLA compilations (while_loop vs eager step chain) flip the
       same way — this is compilation-context ULP noise, not a kernel
       semantics gap, so the bound is a mismatch budget, not equality."""
    cfg, params, kvs, ctx_res, ctx_step, cond, txt, mask = setup
    s_long = 88
    cond_l = (
        jax.random.normal(jax.random.PRNGKey(11), (1, s_long, cfg.d_model))
        * 0.1
    )
    settings = _sampled()
    c_res = M.ar_generate(
        params, cfg, cond_l, txt, mask, jax.random.PRNGKey(7), settings,
        s_long, kv_caches=ctx_res,
    )

    carry = M.init_ar_carry(cfg, 1, s_long, jax.random.PRNGKey(7))
    carry = M.maybe_pack_carry(carry, ctx_res)
    for _ in range(0, s_long + 10, 11):
        carry = M.ar_generate_chunk(
            params, cfg, carry, cond_l, ctx_res, settings, 11
        )
    np.testing.assert_array_equal(
        np.asarray(c_res.tokens), np.asarray(carry.tokens)
    )
    np.testing.assert_array_equal(
        np.asarray(c_res.hist), np.asarray(carry.hist)
    )

    c_xla = M.ar_generate(
        params, cfg, cond_l, txt, mask, jax.random.PRNGKey(7), settings,
        s_long, kv_caches=kvs,
    )
    tr, tx = np.asarray(c_res.tokens[0]), np.asarray(c_xla.tokens[0])
    n = min(int(c_res.t[0]), int(c_xla.t[0]))
    mism = int((tr[:n] != tx[:n]).sum())
    assert (tr[:10] == tx[:10]).all(), (tr[:10], tx[:10])
    assert mism <= max(2, n // 10), (mism, n)


def test_resident_eligibility_flagship_shapes():
    """The resident fast path is gated by a VMEM working-set estimate, not a
    fixed text cap (VERDICT r2 #7: long prompts must keep the fast path).
    Pin the contract at flagship shapes: a 1024-token prompt at B=1 and the
    B=8 serving shape at bucket 256 are both eligible; B=8 at the 2048
    bucket is over budget and falls back to XLA."""
    from types import SimpleNamespace

    from sopro_tpu.engine import Engine

    flag = SimpleNamespace(cfg=SoproTTSConfig(), dtype=jnp.bfloat16)
    budget = Engine.RESIDENT_VMEM_BUDGET
    assert Engine.resident_vmem_bytes(flag, 1, 1024) <= budget
    assert Engine.resident_vmem_bytes(flag, 1, 2048) <= budget
    assert Engine.resident_vmem_bytes(flag, 8, 256) <= budget
    assert Engine.resident_vmem_bytes(flag, 8, 2048) > budget
