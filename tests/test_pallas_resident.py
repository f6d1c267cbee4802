"""Whole-loop resident Pallas AR decode vs the XLA / per-step paths
(interpret mode on CPU; real-Mosaic coverage lives in tests/test_tpu.py).

The resident kernel runs every step — block stack, sampler, anti-loop
bookkeeping — inside one pallas_call. Near-greedy decoding is RNG-free, so
tokens/first_eos/t must match the XLA while_loop path bit-for-bit; sampled
decoding uses the in-kernel counter RNG (a different stream than
jax.random), so those tests assert reproducibility and distributional
invariants instead of token equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopro_tpu.config import SoproTTSConfig
from sopro_tpu.models import generator as G
from sopro_tpu.models import sopro as M
from sopro_tpu.ops.pallas_ar import (
    PallasARContext,
    PallasResidentContext,
    ar_generate_pallas_resident,
    stack_ar_params,
)

from tests.test_model_parity import CFG

S = 25


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
    emb = params["cb_embed"]["emb"]
    bos = cfg.num_codebooks * cfg.codebook_size
    emb_c = jnp.concatenate([emb[: cfg.ar_vocab], emb[bos: bos + 1]], axis=0)
    ctx_res = PallasResidentContext(
        stacked=stacked, kv_k=kv_k, kv_v=kv_v, mask=mask, emb=emb_c
    )
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


def _gen(setup, ctx, settings, seed=7):
    cfg, params, kvs, ctx_res, ctx_step, cond, txt, mask = setup
    return M.ar_generate(
        params, cfg, cond, txt, mask, jax.random.PRNGKey(seed), settings, S,
        kv_caches=ctx,
    )


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


def test_resident_near_greedy_matches_per_step_kernel(setup):
    cfg, params, kvs, ctx_res, ctx_step, cond, txt, mask = setup
    c_res = _gen(setup, ctx_res, _near_greedy())
    c_stp = _gen(setup, ctx_step, _near_greedy())
    np.testing.assert_array_equal(
        np.asarray(c_res.tokens), np.asarray(c_stp.tokens)
    )


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
    toks = np.asarray(c.tokens[0])
    assert (toks[:min_gen] == cfg.eos_id).all()

    # and the XLA path agrees on the same biased weights
    p2 = jax.tree_util.tree_map(lambda x: x, params)
    p2 = dict(p2)
    p2["ar"] = dict(p2["ar"])
    p2["ar"]["head"] = dict(p2["ar"]["head"])
    p2["ar"]["head"]["b"] = p2["ar"]["head"]["b"] + jnp.asarray(bias[0])
    kvs2 = G.build_text_kv_caches(p2["ar"], cfg, setup[6], mask)
    c_x = M.ar_generate(
        p2, cfg, setup[5], setup[6], mask, jax.random.PRNGKey(7),
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


def test_resident_tokens_live_in_candidate_set(setup):
    """Every sampled token must be one the XLA sampler could also have
    drawn: re-run the step logits through the XLA path's candidate
    construction given the kernel's own history and check membership."""
    import sopro_tpu.sampling as Sa

    cfg, params, kvs, ctx_res, ctx_step, cond, txt, mask = setup
    c = _gen(setup, ctx_res, _sampled(), seed=3)
    toks = np.asarray(c.tokens[0])

    # replay deterministically: drive the XLA per-step path with the
    # kernel's sampled tokens as forced choices, checking each is in the
    # top-(k+H) candidate set of the step logits
    conv_state = G.init_ar_conv_state(cfg, 1)
    hist = Sa.init_history(1)
    emb = params["cb_embed"]["emb"]
    bos = cfg.num_codebooks * cfg.codebook_size
    last = None
    for t in range(int(c.t[0])):
        row = bos if t == 0 else int(last)
        x_t = cond[:, t] + emb[row][None]
        logits, conv_state = G.ar_step(
            params["ar"], cfg, x_t, conv_state, kvs
        )
        x = np.asarray(
            jnp.nan_to_num(logits.astype(jnp.float32), nan=-1e9)
        )[0]
        # top-(k + HIST_LEN) candidate superset (temperature/penalty only
        # reorder within it, cf. sampling.sample_token)
        n_cand = min(50 + Sa.HIST_LEN, x.shape[0])
        cand = np.argpartition(-x, n_cand - 1)[:n_cand]
        assert toks[t] in cand or toks[t] == np.argmax(x), (
            f"step {t}: token {toks[t]} outside candidate set"
        )
        hist = Sa.push_history(hist, jnp.asarray([toks[t]]))
        last = toks[t]


def test_resident_penalty_window_past_50(setup):
    """The repetition penalty must cover exactly the last HIST_LEN=50
    tokens, not the kernel's whole 64-row history buffer: near-greedy
    decoding past 50 frames stays bit-identical to the XLA path (a
    64-window would penalize tokens 51-64 steps old and diverge)."""
    cfg, params, kvs, ctx_res, ctx_step, cond, txt, mask = setup
    s_long = 88
    cond_l = (
        jax.random.normal(jax.random.PRNGKey(11), (1, s_long, cfg.d_model))
        * 0.1
    )
    ng = _near_greedy()
    c_res = M.ar_generate(
        params, cfg, cond_l, txt, mask, jax.random.PRNGKey(7), ng, s_long,
        kv_caches=ctx_res,
    )
    c_xla = M.ar_generate(
        params, cfg, cond_l, txt, mask, jax.random.PRNGKey(7), ng, s_long,
        kv_caches=kvs,
    )
    np.testing.assert_array_equal(
        np.asarray(c_res.tokens), np.asarray(c_xla.tokens)
    )
    assert int(c_res.t[0]) == int(c_xla.t[0])
