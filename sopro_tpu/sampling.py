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


# --------------------------------------------------------------------------
# Explicit Threefry-2x32 RNG — ONE stream for every decode path.
#
# The reference has a single sampler, so a given seed yields the same tokens
# no matter how it is called (src/sopro/sampling.py:24-93 via
# torch.multinomial). To give the same contract across our XLA, per-step
# Pallas, whole-loop resident, and batched paths, the categorical draw is
# expressed as Gumbel-max with noise that is a pure function of
# (key, vocab id): g(key, id) = -log(-log(u(key, id))), u from a
# Threefry-2x32 block (the jax.random generator — 32-bit adds/xors/rotates,
# which Mosaic lowers natively). The Pallas kernels re-implement exactly
# these functions in-kernel (ops/pallas_ar.py), so all paths draw identical
# tokens for identical (penalized) logits. Noise indexed by vocab ID (not
# candidate rank) makes the draw independent of each path's candidate
# ordering.
# --------------------------------------------------------------------------

_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)
THREEFRY_C240 = 0x1BD11BDA


def _rotl(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(k0, k1, x0, x1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard 20-round Threefry-2x32 block over uint32 arrays
    (broadcastable). Mirrored bit-for-bit inside the Pallas kernels."""
    k0 = jnp.asarray(k0, jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32)
    x0 = jnp.asarray(x0, jnp.uint32)
    x1 = jnp.asarray(x1, jnp.uint32)
    ks = (k0, k1, k0 ^ k1 ^ jnp.uint32(THREEFRY_C240))
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for i, rots in enumerate((_ROT_A, _ROT_B, _ROT_A, _ROT_B, _ROT_A)):
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r) ^ x0
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + jnp.uint32(i + 1)
    return x0, x1


def split_keys(key: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """key [..., 2] uint32 -> (next_key, subkey), each [..., 2]: two
    Threefry blocks at counters (0,0) and (1,0). This is the per-step key
    chain carried through the decode loop (ARCarry.key)."""
    key = jnp.asarray(key, jnp.uint32)
    k0, k1 = key[..., 0], key[..., 1]
    a0, a1 = threefry2x32(k0, k1, jnp.uint32(0), jnp.uint32(0))
    b0, b1 = threefry2x32(k0, k1, jnp.uint32(1), jnp.uint32(0))
    return jnp.stack([a0, a1], -1), jnp.stack([b0, b1], -1)


def uniform_for_ids(key: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """uniform(0,1) floats as a pure function of (key, id): one Threefry
    block per id at counters (id, 0), 23 mantissa bits, strictly inside
    (0, 1) so log(u) and log(-log(u)) stay finite.
    key [..., 2] uint32; ids [..., N] int32 -> [..., N] f32."""
    key = jnp.asarray(key, jnp.uint32)
    bits, _ = threefry2x32(
        key[..., 0:1], key[..., 1:2], ids.astype(jnp.uint32), jnp.uint32(0)
    )
    m = (bits >> jnp.uint32(9)).astype(jnp.int32)  # 23-bit, sign-safe
    return (m.astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -23)


def gumbel_for_ids(key: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Per-vocab-id Gumbel noise: argmax(logits + g) over a kept set is an
    exact categorical draw over the kept set's renormalized softmax."""
    return -jnp.log(-jnp.log(uniform_for_ids(key, ids)))


def sample_full_vocab(
    k0: jnp.ndarray,  # [B, 1] uint32 — subkey halves (split_keys()[1])
    k1: jnp.ndarray,
    logits: jnp.ndarray,  # [B, V] f32
    member: jnp.ndarray,  # [B, V] bool — repetition-penalty membership
    top_p: jnp.ndarray,  # [B, 1] f32
    temp: jnp.ndarray,  # [B, 1] f32
    *,
    top_k: int = 50,
    repetition_penalty: float = 1.1,
) -> jnp.ndarray:
    """The ONE sampler body every decode path runs — full-vocab masked-grid
    form (reference contract: a single sampler, src/sopro/sampling.py:24-93).

    The XLA paths call it directly (sample_token) and the resident Pallas
    kernel runs this very function under Mosaic (ops/pallas_ar_loop.py), so
    cross-path token equality is by construction: same op sequence, same
    shapes, same reduction orders. Every op here is verified Mosaic-legal
    (docs/kernels.md). top-k and nucleus are threshold bisections rather
    than sorts (no sort primitive in Mosaic), then SNAPPED to an actual
    candidate value: the final kept-set decisions are comparisons between
    exact element values, never against a bisected point. This matters for
    stability, not just exactness — a raw bisected threshold converges TO
    the boundary value, so the boundary token's membership would hinge on
    ~2^-26 margins and f32 ULP noise between separately-compiled model
    graphs would flip it on ~1% of steps (measured). With the snap, a flip
    requires two candidates within ULP noise of EACH OTHER — genuine
    near-ties, measure-zero. Returns tok [B, 1] int32."""
    b, v = logits.shape
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (b, v), 1)
    x = jnp.nan_to_num(logits, nan=-1e9, posinf=1e9, neginf=-1e9) / temp

    pen = jnp.float32(repetition_penalty)
    xp = jnp.where(member, jnp.where(x < 0.0, x * pen, x / pen), x)

    # top-k by per-row threshold bisection (converges to the (k+1)-th value;
    # keep = the k larger entries)
    k = min(int(top_k), v)

    def bis_k(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((xp >= mid).astype(jnp.int32), axis=-1, keepdims=True)
        over = cnt > k
        return jnp.where(over, mid, lo), jnp.where(over, hi, mid)

    lo0 = jnp.min(xp, axis=-1, keepdims=True) - 1.0
    hi0 = jnp.max(xp, axis=-1, keepdims=True)
    _, hi_k = jax.lax.fori_loop(0, 26, bis_k, (lo0, hi0))
    # snap to the smallest element >= hi_k — the k-th largest value itself
    # (count(xp >= hi_k) <= k by the bisection invariant)
    thr = jnp.min(
        jnp.where(xp >= hi_k, xp, jnp.inf), axis=-1, keepdims=True
    )
    keep1 = xp >= thr

    m = jnp.max(jnp.where(keep1, xp, -jnp.inf), axis=-1, keepdims=True)
    e = jnp.where(keep1, jnp.exp(xp - m), 0.0)
    z = jnp.sum(e, axis=-1, keepdims=True)
    p = e / jnp.maximum(z, 1e-30)
    degenerate = ~jnp.isfinite(m)  # [B, 1]

    # nucleus: drop entries once the mass of strictly-greater entries
    # exceeds top_p (== the reference's sorted-prefix rule)
    def bis_p(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        mass = jnp.sum(jnp.where(p > mid, p, 0.0), axis=-1, keepdims=True)
        over = mass > top_p
        return jnp.where(over, mid, lo), jnp.where(over, hi, mid)

    zero = jnp.zeros((b, 1), jnp.float32)
    lo_p, _ = jax.lax.fori_loop(0, 26, bis_p, (zero, zero + 1.0))
    # snap to the smallest kept probability ABOVE the bracket's left edge:
    # the crossing element itself is always kept (the reference's "first
    # entry past the cut survives" rule, src/sopro/sampling.py:70-76), and
    # membership is decided by element-vs-element comparisons
    c = jnp.min(
        jnp.where(keep1 & (p > lo_p), p, jnp.inf), axis=-1, keepdims=True
    )
    # force-include the penalized argmax (guards top_p below p_max)
    keep2 = keep1 & ((p >= c) | (xp == m))
    mass2 = jnp.sum(jnp.where(keep2, p, 0.0), axis=-1, keepdims=True)
    degenerate = degenerate | (mass2 <= 1e-12)

    # Gumbel-max draw with noise keyed by (subkey, VOCAB id) — a pure
    # function, so the draw is independent of candidate ordering
    bits, _ = threefry2x32(k0, k1, iota_v.astype(jnp.uint32), jnp.uint32(0))
    mant = (bits >> jnp.uint32(9)).astype(jnp.int32)
    u = (mant.astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -23)
    gum = -jnp.log(-jnp.log(u))

    score = jnp.where(keep2, xp + gum, -jnp.inf)
    ms = jnp.max(score, axis=-1, keepdims=True)
    tok_s = jnp.min(jnp.where(score == ms, iota_v, v), axis=-1, keepdims=True)
    mg = jnp.max(x, axis=-1, keepdims=True)
    tok_g = jnp.min(jnp.where(x == mg, iota_v, v), axis=-1, keepdims=True)
    return jnp.where(degenerate, tok_g, tok_s)  # [B, 1] i32


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
    (vectorized re-creation of reference: src/sopro/sampling.py:24-93).
    Thin wrapper over sample_full_vocab: builds the penalty-membership grid
    from the rolling history and delegates to the shared body the Pallas
    kernels also run. Valid history entries are exactly those >= 0 (-1 fill
    marks both never-written and reset slots), matching the kernels'
    incrementally-maintained count grid."""
    b, v = logits.shape
    temp = jnp.asarray(settings.temperature, jnp.float32).reshape(-1, 1)
    top_p = jnp.asarray(settings.top_p, jnp.float32).reshape(-1, 1)
    temp = jnp.broadcast_to(temp, (b, 1))
    top_p = jnp.broadcast_to(top_p, (b, 1))
    ids = jnp.where(hist >= 0, hist, v)  # [B, H]; v never matches
    member = jnp.any(
        ids[:, :, None] == jnp.arange(v)[None, None, :], axis=1
    )  # [B, V]
    if key.ndim == 1:  # single key for the whole batch -> broadcast
        key = jnp.broadcast_to(key[None, :], (b, 2))
    key = jnp.asarray(key, jnp.uint32)
    tok = sample_full_vocab(
        key[:, 0:1], key[:, 1:2], logits.astype(jnp.float32), member,
        top_p, temp, top_k=int(settings.top_k),
        repetition_penalty=float(settings.repetition_penalty),
    )
    return tok[:, 0].astype(jnp.int32)


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
