"""Fully on-device sampling with the reference's history-dependent heuristics.

The reference samples on the host with a scalar round-trip per frame
(src/sopro/sampling.py:24-93, src/sopro/model.py:284-299). Here the whole
pipeline — NaN scrub, temperature, CTRL-style repetition penalty over the
last-50 token set, top-k, top-p nucleus, degenerate-mass fallback to argmax,
cycle detection and streak-based recovery — is expressed as masked tensor ops
over a rolling history buffer carried through the decode scan, so zero host
syncs happen per frame.

History buffer convention: [B, H] int32 with the newest token at index H-1
(rolled left each step); entries older than `t` steps are invalid and masked
by position. H = HIST_LEN = 50 covers both the repetition-penalty window
(last 50) and the cycle-detection window (last 2*16 = 32).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

HIST_LEN = 50  # repetition-penalty window (reference: sampling.py:42)
CYCLE_MAX_N = 16  # max cycle length checked (reference: sampling.py:16)
CYCLE_MIN_N = 3
EPS = 1e-12


class SamplerSettings(NamedTuple):
    top_p: jnp.ndarray  # f32 scalar
    temperature: jnp.ndarray  # f32 scalar
    top_k: int = 50  # static (reference call site: model.py:289)
    repetition_penalty: float = 1.1


def init_history(batch: int, fill: int = -1) -> jnp.ndarray:
    return jnp.full((batch, HIST_LEN), fill, jnp.int32)


def push_history(hist: jnp.ndarray, tok: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([hist[:, 1:], tok[:, None].astype(jnp.int32)], axis=1)


def repeated_tail(hist: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """True iff the last n tokens exactly repeat the previous n, for any
    n in [3, 16] with at least 2n tokens generated
    (reference: src/sopro/sampling.py:16-21). hist [B, H], t = tokens so far.

    The reference caps n at len(hist)//2, i.e. requires t >= 2n.
    """
    flags = jnp.zeros((hist.shape[0],), bool)
    h = hist.shape[1]
    for n in range(CYCLE_MIN_N, CYCLE_MAX_N + 1):
        a = hist[:, h - n :]
        b = hist[:, h - 2 * n : h - n]
        cond = jnp.all(a == b, axis=1) & (t >= 2 * n)
        flags = flags | cond
    return flags


def sample_token(
    key: jax.Array,
    logits: jnp.ndarray,
    hist: jnp.ndarray,
    t: jnp.ndarray,
    settings: SamplerSettings,
) -> jnp.ndarray:
    """Sample one token per batch row from logits [B, V]
    (vectorized re-creation of reference: src/sopro/sampling.py:24-93)."""
    b, v = logits.shape
    temp = jnp.asarray(settings.temperature, jnp.float32).reshape(-1, 1)
    top_p = jnp.asarray(settings.top_p, jnp.float32).reshape(-1, 1)
    x = jnp.nan_to_num(
        logits.astype(jnp.float32), nan=-1e9, posinf=1e9, neginf=-1e9
    )
    x = x / temp

    # repetition penalty over the set of the last-50 tokens; only valid
    # (already generated) history entries participate
    n_valid = jnp.minimum(jnp.broadcast_to(t, (b,)), HIST_LEN)  # [B]
    pos = jnp.arange(HIST_LEN)
    valid = pos[None, :] >= (HIST_LEN - n_valid)[:, None]  # [B, H]
    ids = jnp.where(valid, hist, v)  # invalid -> out-of-range, dropped
    present = jnp.zeros((b, v), bool)
    present = present.at[jnp.arange(b)[:, None], ids].set(True, mode="drop")
    pen = settings.repetition_penalty
    x = jnp.where(present, jnp.where(x < 0, x * pen, x / pen), x)

    probs = jax.nn.softmax(x, axis=-1)
    probs = jnp.nan_to_num(probs, nan=0.0, posinf=0.0, neginf=0.0)

    k = min(int(settings.top_k), v)
    vals, idx = jax.lax.top_k(probs, k)  # sorted descending
    mass = jnp.sum(vals, axis=-1, keepdims=True)
    degenerate = mass[:, 0] <= EPS
    vals = vals / jnp.maximum(mass, EPS)

    # nucleus: drop entries once the cumulative prob of *previous* entries
    # exceeds top_p (the first entry always survives)
    cum_prev = jnp.cumsum(vals, axis=-1) - vals
    vals = jnp.where(cum_prev > top_p, 0.0, vals)
    mass2 = jnp.sum(vals, axis=-1, keepdims=True)
    degenerate = degenerate | (mass2[:, 0] <= EPS)

    logv = jnp.log(jnp.maximum(vals, 1e-30))
    if key.ndim >= 2:  # per-row keys [B, 2] (continuous-batching path)
        j = jax.vmap(lambda k, lv: jax.random.categorical(k, lv))(key, logv)
    else:
        j = jax.random.categorical(key, logv, axis=-1)
    tok = jnp.take_along_axis(idx, j[:, None], axis=-1)[:, 0]
    fallback = jnp.argmax(x, axis=-1)
    return jnp.where(degenerate, fallback, tok).astype(jnp.int32)


def anti_loop_settings(
    hist: jnp.ndarray,
    t: jnp.ndarray,
    streak: jnp.ndarray,
    base: Tuple[jnp.ndarray, jnp.ndarray],
    recovery: Tuple[jnp.ndarray, jnp.ndarray],
    loop_streak: int = 8,
    enabled: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (top_p, temperature) with recovery values when the history
    tail is an exact cycle or the same token repeated >= loop_streak times
    (reference: src/sopro/model.py:274-279)."""
    if not enabled:
        tp = jnp.broadcast_to(base[0], hist.shape[:1])
        tm = jnp.broadcast_to(base[1], hist.shape[:1])
        return tp, tm
    cyc = repeated_tail(hist, t)
    stuck = (t > 0) & (streak >= loop_streak)
    rec = cyc | stuck
    tp = jnp.where(rec, recovery[0], base[0])
    tm = jnp.where(rec, recovery[1], base[1])
    return tp, tm


def update_streak(
    streak: jnp.ndarray, last: jnp.ndarray, tok: jnp.ndarray, t: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """streak counts consecutive repeats of the previous token
    (reference: src/sopro/model.py:296-299)."""
    same = (tok == last) & (t > 0)
    return jnp.where(same, streak + 1, 0), tok
