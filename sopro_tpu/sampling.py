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


def _cycle_gather_indices(h: int):
    """Static index matrices for the vectorized cycle check: row r = cycle
    length n = CYCLE_MIN_N + r; column j compares hist[H-1-j] with
    hist[H-1-j-n] (entries beyond j < n are padded to compare a cell with
    itself, i.e. always-equal)."""
    import numpy as np

    ns = np.arange(CYCLE_MIN_N, CYCLE_MAX_N + 1)
    js = np.arange(CYCLE_MAX_N)
    idx_a = h - 1 - js[None, :].repeat(len(ns), 0)
    idx_b = idx_a - ns[:, None]
    pad = js[None, :] >= ns[:, None]
    idx_b = np.where(pad, idx_a, idx_b)
    return idx_a, idx_b


def repeated_tail(hist: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """True iff the last n tokens exactly repeat the previous n, for any
    n in [3, 16] with at least 2n tokens generated
    (reference: src/sopro/sampling.py:16-21). hist [B, H], t = tokens so far.

    Vectorized over all cycle lengths: two static gathers + one compare
    instead of 14 per-length window comparisons (this check runs every AR
    step inside the decode loop)."""
    h = hist.shape[1]
    idx_a, idx_b = _cycle_gather_indices(h)
    a = jnp.take(hist, jnp.asarray(idx_a), axis=1)  # [B, 14, 16]
    b = jnp.take(hist, jnp.asarray(idx_b), axis=1)
    eq = jnp.all(a == b, axis=2)  # [B, 14]
    ns = jnp.arange(CYCLE_MIN_N, CYCLE_MAX_N + 1)
    ok = eq & (jnp.asarray(t).reshape(-1, 1) >= 2 * ns[None, :])
    return jnp.any(ok, axis=1)


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

    # Candidate-set restructuring (decode-loop hot path): the repetition
    # penalty only ever *lowers* a logit, and at most HIST_LEN history tokens
    # are penalized — so the penalized top-k is provably contained in the raw
    # top-(k + HIST_LEN). Take those candidates with the TPU-native
    # approx_max_k (exact at recall 1.0), penalize by membership against the
    # history (a [B, k+H, H] compare instead of a [B, V] scatter), re-rank,
    # and softmax only the k survivors (the full-vocab softmax cancels out of
    # the reference's renormalization exactly).
    k = min(int(settings.top_k), v)
    n_cand = min(k + HIST_LEN, v)
    cand_x, cand_i = jax.lax.approx_max_k(x, n_cand, recall_target=1.0)

    n_valid = jnp.minimum(jnp.broadcast_to(t, (b,)), HIST_LEN)  # [B]
    pos = jnp.arange(HIST_LEN)
    valid = pos[None, :] >= (HIST_LEN - n_valid)[:, None]  # [B, H]
    ids = jnp.where(valid, hist, v)  # invalid -> out-of-range, never matches
    member = jnp.any(cand_i[:, :, None] == ids[:, None, :], axis=-1)
    pen = settings.repetition_penalty
    cand_x = jnp.where(
        member, jnp.where(cand_x < 0, cand_x * pen, cand_x / pen), cand_x
    )

    vals_x, sel = jax.lax.top_k(cand_x, k)  # small: [B, k+H] -> [B, k]
    idx = jnp.take_along_axis(cand_i, sel, axis=-1)
    vals = jax.nn.softmax(vals_x, axis=-1)  # == renormalized full-softmax
    degenerate = ~jnp.isfinite(vals_x[:, 0])

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
