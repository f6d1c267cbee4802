"""Pallas TPU kernel: one fused AR decode step.

The AR hot loop runs `max_frames+1` sequential steps; inside `lax.while_loop`
each step costs dozens of small XLA kernel launches (6 SSMLite blocks, 3 text
cross-attentions, head) — launch overhead dominates at [1, 384] shapes. This
kernel executes the whole step in ONE `pallas_call`:

* grid = (n_layers,): per-block weight slabs stream HBM->VMEM through the
  Pallas pipeline (double-buffered against compute), so a step approaches
  the weight-bandwidth bound instead of the launch-overhead bound;
* the hidden state lives in VMEM scratch across grid steps; conv ring
  buffers are shifted in-place per block; the final grid step also applies
  the output RMSNorm and the vocab head (head weights resident).

Numerics match ops/blocks.py + ops/attention.py (same fp32 islands: RMSNorm,
attention softmax, NaN scrub). Parity-tested against the XLA path
(tests/test_pallas_ar.py, real Mosaic lowering in tests/test_tpu.py).
Default-ON on TPU backends (RuntimeConfig.use_pallas_ar=None -> auto):
measured 55 vs 84 us/step including sampling vs the XLA step at batch 1 on
v5e — the weight-slab streaming approaches the 21 MB/step HBM bandwidth
bound, where the XLA while_loop body pays per-op sequencing overhead.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sopro_tpu.config import SoproTTSConfig

Params = Dict[str, Any]

TEXT_HEADS = 4  # reference text cross-attention head count



class PallasARContext(NamedTuple):
    """Opaque AR-step context selecting the fused kernel path: stacked weight
    slabs + stacked text KV. Flows through jit as a pytree; ar_single_step
    dispatches on this type."""

    stacked: Any
    kv_k: jnp.ndarray  # [A, B, H, L, hd]
    kv_v: jnp.ndarray
    mask: jnp.ndarray  # [B, L]


# --------------------------------------------------------------------------
# parameter restructuring (once, at engine init)
# --------------------------------------------------------------------------


def stack_ar_params(p_ar: Params, cfg: SoproTTSConfig) -> Params:
    """AR generator params -> stacked slabs with a leading block/attn axis.

    The depthwise kernels are pre-expanded to zero-stuffed [CTX, D] matrices
    (tap j of a block with dilation d lands at row CTX-1-(k-1-j)*d): the
    conv step is then one multiply-reduce over the ring buffer — Mosaic has
    no strided vector slices, and this removes the per-dilation branching."""
    blocks = p_ar["blocks"]
    k = int(cfg.ar_kernel)
    dils = cfg.ar_dilations()
    ctx_max = (k - 1) * max(dils) + 1
    dw_full = jnp.zeros(
        (len(blocks), ctx_max, blocks[0]["dw"]["w"].shape[-1]),
        blocks[0]["dw"]["w"].dtype,
    )
    for bi, (b, dil) in enumerate(zip(blocks, dils)):
        w = b["dw"]["w"][:, 0, :]  # [k, D]
        for j in range(k):
            row = ctx_max - ((k - 1) * dil + 1) + j * dil
            dw_full = dw_full.at[bi, row].set(w[j])

    def stack(*path):
        return jnp.stack([functools.reduce(lambda d, k: d[k], path, b)
                          for b in blocks])

    xattn = [x for x in p_ar["xattn"] if x is not None]
    # per-block vectors carry an explicit middle singleton axis: Mosaic
    # requires a block's last-2 dims to divide (8, 128) or equal the array's,
    # so slabs are shaped [N, 1, len] with block (1, 1, len).
    out = {
        "norm": stack("norm", "scale")[:, None],            # [N, 1, D]
        "glu_w": stack("glu", "pro", "w"),                  # [N, D, 2D]
        "glu_b": stack("glu", "pro", "b")[:, None],         # [N, 1, 2D]
        "dw_w": dw_full,                                    # [N, CTX, D]
        "dw_b": stack("dw", "b")[:, None],                  # [N, 1, D]
        "ff_norm": stack("ff_norm", "scale")[:, None],      # [N, 1, D]
        "ff1_w": stack("ff1", "w"),                         # [N, D, 4D]
        "ff1_b": stack("ff1", "b")[:, None],                # [N, 1, 4D]
        "ff2_w": stack("ff2", "w"),                         # [N, 4D, D]
        "ff2_b": stack("ff2", "b")[:, None],                # [N, 1, D]
        "head_w": p_ar["head"]["w"],                        # [D, V]
        "head_b": p_ar["head"]["b"][None],                  # [1, V]
        "out_norm": p_ar["norm"]["scale"][None],            # [1, D]
        "x_nq": jnp.stack([x["nq"]["scale"] for x in xattn])[:, None],  # [A, 1, D]
        # Per-head dims are zero-padded 96 -> 128 inside the projection
        # weights: Mosaic crashes on lane-dim reshapes into non-128 chunks
        # ((1, 384) -> (1, 4, 96)), so q comes out of its matmul already at
        # [B, H*128], reshapes stay lane-aligned, and x_out's zero rows
        # cancel the padding exactly.
        "x_q": jnp.stack(
            [_pad_head_cols(x["q"]["w"], TEXT_HEADS) for x in xattn]
        ),                                                  # [A, D, H*128]
        "x_out": jnp.stack(
            [_pad_head_rows(x["out"]["w"], TEXT_HEADS) for x in xattn]
        ),                                                  # [A, H*128, D]
        "x_gate": jnp.stack(
            [jnp.ravel(x["gate"]) for x in xattn]
        )[:, None],                                         # [A, 1, 1]
    }
    return out


HEAD_PAD = 128  # lane-aligned per-head width inside the kernel


def _pad_head_cols(w: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[D, H*hd] -> [D, H*HEAD_PAD] with zero columns after each head."""
    d, dh = w.shape
    hd = dh // heads
    w4 = w.reshape(d, heads, hd)
    w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, HEAD_PAD - hd)))
    return w4.reshape(d, heads * HEAD_PAD)


def _pad_head_rows(w: jnp.ndarray, heads: int) -> jnp.ndarray:
    """[H*hd, D] -> [H*HEAD_PAD, D] with zero rows after each head."""
    dh, d = w.shape
    hd = dh // heads
    w4 = w.reshape(heads, hd, d)
    w4 = jnp.pad(w4, ((0, 0), (0, HEAD_PAD - hd), (0, 0)))
    return w4.reshape(heads * HEAD_PAD, d)


def pad_kv_heads(kv: jnp.ndarray) -> jnp.ndarray:
    """[A, B, H, L, hd] -> [A, B, H, L, HEAD_PAD] (zero-padded)."""
    hd = kv.shape[-1]
    return jnp.pad(kv, ((0, 0),) * (kv.ndim - 1) + ((0, HEAD_PAD - hd),))


def pack_conv_state(conv_state: List[jnp.ndarray]) -> jnp.ndarray:
    """Per-block ring buffers [B, ctx_i, D] -> one padded [N, B, CTX, D]
    (left-padded with zeros; the newest sample sits at index CTX-1)."""
    ctx_max = max(c.shape[1] for c in conv_state)
    padded = [
        jnp.pad(c, ((0, 0), (ctx_max - c.shape[1], 0), (0, 0)))
        for c in conv_state
    ]
    return jnp.stack(padded)


def unpack_conv_state(
    packed: jnp.ndarray, cfg: SoproTTSConfig
) -> List[jnp.ndarray]:
    k = cfg.ar_kernel
    ctx_max = packed.shape[2]
    return [
        packed[i, :, ctx_max - ((k - 1) * d + 1):, :]
        for i, d in enumerate(cfg.ar_dilations())
    ]


def _erf_poly(x: jnp.ndarray) -> jnp.ndarray:
    """erf via Abramowitz & Stegun 7.1.26 (|abs err| <= 1.5e-7): Mosaic has
    no erf/erfc lowering, and the tanh-approximate GELU would change
    numerics vs the reference's exact GELU by ~1e-3."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------


def _ar_step_kernel(
    cfg: SoproTTSConfig,
    kv_len: int,
    # inputs
    x_ref, bufs_ref, norm_ref, glu_w_ref, glu_b_ref, dw_w_ref, dw_b_ref,
    ff_norm_ref, ff1_w_ref, ff1_b_ref, ff2_w_ref, ff2_b_ref,
    x_nq_ref, x_q_ref, x_out_ref, x_gate_ref, kv_k_ref, kv_v_ref,
    kv_mask_ref, out_norm_ref, head_w_ref, head_b_ref,
    # outputs
    logits_ref, bufs_out_ref,
    # scratch
    h_ref,
):
    i = pl.program_id(0)
    n_layers = int(cfg.n_layers_ar)
    k = int(cfg.ar_kernel)
    dils = cfg.ar_dilations()
    freq = int(cfg.ar_text_attn_freq)
    eps = 1e-6

    @pl.when(i == 0)
    def _():
        h_ref[:, :] = x_ref[:, :].astype(jnp.float32)

    def rmsnorm(h, scale):
        var = jnp.mean(h * h, axis=-1, keepdims=True)
        return h * lax.rsqrt(var + eps) * scale.astype(jnp.float32)

    def vec(ref):
        """Read a [.., 1, L]-blocked vector slab as [1, L] (rank-agnostic;
        kept 2-D — Mosaic handles 1-D vectors poorly)."""
        return ref[...].reshape(1, -1)

    def mat(ref, shape):
        """Read a matrix slab as `shape` regardless of leading singletons."""
        return ref[...].reshape(shape)

    def mm(a, w, bias=None):
        y = jnp.dot(a.astype(w.dtype), w, preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y

    h = h_ref[:, :]  # [B, D] fp32

    # ---- SSMLite block i -------------------------------------------------
    d_model = h.shape[-1]
    hn = rmsnorm(h, vec(norm_ref))
    ab = mm(hn, mat(glu_w_ref, (d_model, 2 * d_model)), vec(glu_b_ref))
    g = ab[:, :d_model] * jax.nn.sigmoid(ab[:, d_model:])

    bsz = h.shape[0]
    ctx_max = bufs_ref.shape[-2]
    buf = mat(bufs_ref, (bsz, ctx_max, d_model))  # [B, CTX, D]
    shifted = jnp.concatenate(
        [buf[:, 1:, :], g[:, None, :].astype(buf.dtype)], axis=1
    )
    bufs_out_ref[...] = shifted.reshape(bufs_out_ref.shape)

    # depthwise conv step: one multiply-reduce over the ring buffer against
    # the zero-stuffed [CTX, D] kernel (the zeros encode the dilation)
    w_dw = mat(dw_w_ref, (ctx_max, d_model)).astype(jnp.float32)
    y = jnp.sum(shifted.astype(jnp.float32) * w_dw[None], axis=1)
    y = y + vec(dw_b_ref).astype(jnp.float32)
    h = h + y

    hn = rmsnorm(h, vec(ff_norm_ref))
    f = mm(hn, mat(ff1_w_ref, (d_model, 4 * d_model)), vec(ff1_b_ref))
    f = 0.5 * f * (1.0 + _erf_poly(f * (1.0 / math.sqrt(2.0))))
    f = mm(f, mat(ff2_w_ref, (4 * d_model, d_model)), vec(ff2_b_ref))
    h = h + f

    # ---- text cross-attention after every `freq`-th block ----------------
    has_attn = (i + 1) % freq == 0

    @pl.when(has_attn)
    def _attn():
        hh = h
        bsz = hh.shape[0]
        qn = rmsnorm(hh, vec(x_nq_ref))
        # q projection is head-padded to HEAD_PAD lanes per head (see
        # stack_ar_params) so every reshape below splits on 128 boundaries
        q = mm(qn, mat(x_q_ref, (d_model, TEXT_HEADS * HEAD_PAD)))
        qh = q.reshape(bsz, TEXT_HEADS, HEAD_PAD)
        kk = mat(kv_k_ref, (bsz, TEXT_HEADS, kv_len, HEAD_PAD)).astype(jnp.float32)
        vv = mat(kv_v_ref, (bsz, TEXT_HEADS, kv_len, HEAD_PAD)).astype(jnp.float32)
        scale = 1.0 / math.sqrt(d_model // TEXT_HEADS)
        # broadcast multiply-reduce: Mosaic cannot lower multi-batch-dim dots
        logits = jnp.sum(qh[:, :, None, :] * kk, axis=-1) * scale
        keep = kv_mask_ref[:, :] != 0  # [B, L]
        none_valid = ~jnp.any(keep, axis=-1, keepdims=True)  # [B, 1]
        first = jax.lax.broadcasted_iota(jnp.int32, keep.shape, 1) == 0
        keep = keep | (none_valid & first)
        logits = jnp.where(keep[:, None, :], logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1)
        a = jnp.sum(w[..., None] * vv, axis=2)  # [B, H, HEAD_PAD]
        a = jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
        a = mm(a.reshape(bsz, TEXT_HEADS * HEAD_PAD),
               mat(x_out_ref, (TEXT_HEADS * HEAD_PAD, d_model)))
        # keep the gate as a (1,) array: Mosaic only squeezes 32-bit scalars
        gate = jnp.tanh(vec(x_gate_ref).astype(jnp.float32))
        h_ref[:, :] = hh + gate * a

    @pl.when(jnp.logical_not(has_attn))
    def _noattn():
        h_ref[:, :] = h

    # ---- output norm + head on the last block ----------------------------
    @pl.when(i == n_layers - 1)
    def _head():
        ho = rmsnorm(h_ref[:, :], vec(out_norm_ref))
        logits_ref[:, :] = mm(ho, head_w_ref[...].reshape(d_model, -1),
                              vec(head_b_ref))


def ar_step_pallas(
    stacked: Params,
    cfg: SoproTTSConfig,
    x_bd: jnp.ndarray,
    bufs: jnp.ndarray,  # [N, B, CTX, D] packed conv state
    kv_k: jnp.ndarray,  # [A, B, H, L, hd]
    kv_v: jnp.ndarray,
    kv_mask: jnp.ndarray,  # [B, L] bool
    *,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One fused AR step -> (logits [B, V] fp32, new packed conv state).

    `interpret` defaults to True off-TPU so the same model code runs (slowly
    but exactly) on the CPU test mesh."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = int(cfg.n_layers_ar)
    b, d = x_bd.shape
    n_attn, _, heads, l, hd = kv_k.shape
    if hd != HEAD_PAD:  # lane-align per-head dims (loop-invariant, hoisted)
        kv_k = pad_kv_heads(kv_k)
        kv_v = pad_kv_heads(kv_v)
        hd = HEAD_PAD
    v = stacked["head_w"].shape[1]
    ctx = bufs.shape[2]
    freq = int(cfg.ar_text_attn_freq)
    k = int(cfg.ar_kernel)

    def aidx(i):
        return jnp.minimum(i // freq, n_attn - 1)

    def slab(shape_tail, index=None):
        idx = index or (lambda i: (i,))
        return pl.BlockSpec(
            (1,) + shape_tail,
            lambda i, idx=idx: idx(i) + (0,) * len(shape_tail),
            memory_space=pltpu.VMEM,
        )

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    kv_flat_k = kv_k.reshape(n_attn, b * heads, l, hd)
    kv_flat_v = kv_v.reshape(n_attn, b * heads, l, hd)

    in_specs = [
        full(),                                     # x
        slab((b, ctx, d)),                          # bufs
        slab((1, d)),                               # norm
        slab((d, 2 * d)),                           # glu_w
        slab((1, 2 * d)),                           # glu_b
        slab((ctx, d)),                             # dw_w
        slab((1, d)),                               # dw_b
        slab((1, d)),                               # ff_norm
        slab((d, 4 * d)),                           # ff1_w
        slab((1, 4 * d)),                           # ff1_b
        slab((4 * d, d)),                           # ff2_w
        slab((1, d)),                               # ff2_b
        slab((1, d), lambda i: (aidx(i),)),         # x_nq
        slab((d, TEXT_HEADS * HEAD_PAD), lambda i: (aidx(i),)),  # x_q
        slab((TEXT_HEADS * HEAD_PAD, d), lambda i: (aidx(i),)),  # x_out
        slab((1, 1), lambda i: (aidx(i),)),         # x_gate
        slab((b * heads, l, hd), lambda i: (aidx(i),)),  # kv_k
        slab((b * heads, l, hd), lambda i: (aidx(i),)),  # kv_v
        full(),                                     # kv_mask
        full(),                                     # out_norm [1, D]
        full(),                                     # head_w [D, V]
        full(),                                     # head_b [1, V]
    ]
    out_specs = [
        full(),                                     # logits
        slab((b, ctx, d)),                          # bufs_out
    ]

    kernel = functools.partial(_ar_step_kernel, cfg, l)
    logits, bufs_out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((b, v), jnp.float32),
            jax.ShapeDtypeStruct(bufs.shape, bufs.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((b, d), jnp.float32)],
        interpret=interpret,
    )(
        x_bd, bufs,
        stacked["norm"], stacked["glu_w"], stacked["glu_b"],
        stacked["dw_w"], stacked["dw_b"], stacked["ff_norm"],
        stacked["ff1_w"], stacked["ff1_b"], stacked["ff2_w"], stacked["ff2_b"],
        stacked["x_nq"], stacked["x_q"], stacked["x_out"], stacked["x_gate"],
        kv_flat_k, kv_flat_v,
        kv_mask.astype(jnp.int32),
        stacked["out_norm"], stacked["head_w"], stacked["head_b"],
    )
    return logits, bufs_out


# ==========================================================================
# whole-loop resident AR decode: all max_frames+1 steps in ONE pallas_call
# ==========================================================================
#
# The per-step paths (XLA while_loop body OR the per-step kernel above) cost
# ~70 us/step on v5e at batch 1, split ~43 us kernel-launch/slab-streaming
# and ~33 us XLA sampling glue — both fixed overheads, not compute. Here the
# ENTIRE decode loop runs inside one kernel: every weight slab is resident
# in VMEM across all steps (~24 MB bf16 at text bucket 256 — past XLA's
# 16 MB default scoped-VMEM limit, so the kernel raises vmem_limit_bytes;
# v5e's physical VMEM accepts it), the sampler (temperature, CTRL
# repetition penalty,
# top-k + nucleus via threshold bisection, Gumbel-max draw, degenerate-mass
# argmax fallback) runs on the VPU, and the anti-loop machinery (cycle
# detect, streak recovery, min_gen-gated EOS — reference:
# src/sopro/model.py:218-305, src/sopro/sampling.py:16-93) updates scalar
# state in SMEM. Once every row has stopped the remaining iterations are
# predicated off.
#
# RNG: an in-kernel counter-based generator (murmur3-style finalizer over
# (seed, step, lane)) replaces jax.random — identical in interpret and
# Mosaic modes, but a different stream than the XLA path's threefry, so
# sampled tokens differ run-path-to-run-path at the same seed. Near-greedy
# decoding (temperature -> 0) is RNG-free and matches the per-step kernel
# exactly (tests/test_pallas_resident.py; real-Mosaic: tests/test_tpu.py).


HIST_PAD = 64  # >= sampling.HIST_LEN (50), whole sublanes


class PallasResidentContext(NamedTuple):
    """Context for the whole-loop kernel: stacked slabs + text KV + the
    compact prev-token embedding table ([V+1, D]: rows 0..V-1 = codebook-1
    token embeddings, row V = BOS)."""

    stacked: Any
    kv_k: jnp.ndarray  # [A, B*H, L, HEAD_PAD]
    kv_v: jnp.ndarray
    mask: jnp.ndarray  # [B, L]
    emb: jnp.ndarray  # [V+1, D]


def _uniform_bits(seed: jnp.ndarray, step: jnp.ndarray, shape) -> jnp.ndarray:
    """Counter-based uniform(0,1) floats: murmur3 fmix32 over
    (lane, step, seed). Statistically ample for choosing among <= 50
    sampler candidates, and bit-identical across interpret/Mosaic."""
    lane = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
    h = lane * jnp.uint32(0x9E3779B1)
    h = h ^ (step.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
    h = h ^ (seed.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    # 24 high bits -> (0, 1): never exactly 0, so log(u) is finite.
    # (route uint32 -> int32 -> f32: Mosaic has no direct uint32 cast, and
    # the 24-bit value is sign-safe in int32)
    h24 = (h >> 8).astype(jnp.int32)
    return h24.astype(jnp.float32) * jnp.float32(2.0 ** -24) + jnp.float32(
        2.0 ** -25
    )


def _ar_resident_kernel(
    cfg: SoproTTSConfig,
    kv_len: int,
    max_steps: int,
    anti_loop: bool,
    # inputs
    scal_f_ref, scal_i_ref, cond_ref, emb_ref,
    norm_ref, glu_w_ref, glu_b_ref, dw_w_ref, dw_b_ref,
    ff_norm_ref, ff1_w_ref, ff1_b_ref, ff2_w_ref, ff2_b_ref,
    x_nq_ref, x_q_ref, x_out_ref, x_gate_ref, kv_k_ref, kv_v_ref,
    kv_mask_ref, out_norm_ref, head_w_ref, head_b_ref,
    # outputs
    tokens_ref,  # [S, 1] i32
    info_ref,  # [1, 3] i32: (first_eos, t_final, stopped)
    # scratch
    bufs_ref,  # [N, CTX, D]
    hist_ref,  # [HIST_PAD, 1] i32, newest at HIST_PAD-1
    st_ref,  # SMEM (8,) i32: last, streak, stopped, first_eos, t_final
):
    n_layers = int(cfg.n_layers_ar)
    freq = int(cfg.ar_text_attn_freq)
    d = int(cfg.d_model)
    v = int(cfg.ar_vocab)
    eos = int(cfg.eos_id)
    eps = 1e-6
    from sopro_tpu.sampling import CYCLE_MAX_N, CYCLE_MIN_N, HIST_LEN

    top_p0 = scal_f_ref[0, 0]
    temp0 = scal_f_ref[0, 1]
    rec_top_p = scal_f_ref[0, 2]
    rec_temp = scal_f_ref[0, 3]
    seed = scal_i_ref[0, 0]
    min_gen = scal_i_ref[0, 1]
    loop_streak = scal_i_ref[0, 2]

    bufs_ref[...] = jnp.zeros_like(bufs_ref)
    hist_ref[...] = jnp.full_like(hist_ref, -1)
    tokens_ref[...] = jnp.zeros_like(tokens_ref)
    st_ref[0] = 0  # last
    st_ref[1] = 0  # streak
    st_ref[2] = 0  # stopped
    st_ref[3] = max_steps  # first_eos
    st_ref[4] = 0  # t_final

    def rmsnorm(h, scale):
        var = jnp.mean(h * h, axis=-1, keepdims=True)
        return h * lax.rsqrt(var + eps) * scale.astype(jnp.float32)

    def vec(ref, i=None):
        x = ref[...] if i is None else ref[i]
        return x.reshape(1, -1)

    def mm(a, w, bias=None):
        y = jnp.dot(a.astype(w.dtype), w, preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y

    iota_v = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)

    def step(t, _):
        @pl.when(st_ref[2] == 0)
        def _active():
            # ---- previous-token embedding (BOS row = v at t == 0) --------
            # Dynamic sublane indexing needs 8-aligned offsets on TPU, so
            # arbitrary-row reads are expressed as one-hot matmuls (the
            # tables are tiny; the MXU does these in noise).
            prev_row = jnp.where(t == 0, v, st_ref[0])
            n_emb = emb_ref.shape[0]
            oh_e = (
                jax.lax.broadcasted_iota(jnp.int32, (1, n_emb), 1) == prev_row
            ).astype(emb_ref.dtype)
            prev_emb = jnp.dot(
                oh_e, emb_ref[...], preferred_element_type=jnp.float32
            )  # [1, D]
            oh_c = (
                jax.lax.broadcasted_iota(jnp.int32, (1, max_steps), 1) == t
            ).astype(cond_ref.dtype)
            cond_t = jnp.dot(
                oh_c, cond_ref[...], preferred_element_type=jnp.float32
            )
            # add in the carry dtype first: the per-step path forms
            # x_t = cond_t + prev_emb in bf16 before the kernel's f32 cast,
            # and matching the association keeps near-greedy bit-parity
            x_t = (
                cond_t.astype(cond_ref.dtype) + prev_emb.astype(cond_ref.dtype)
            ).astype(jnp.float32)

            # ---- block stack (same math as _ar_step_kernel) --------------
            h = x_t
            for li in range(n_layers):
                hn = rmsnorm(h, vec(norm_ref, li))
                ab = mm(hn, glu_w_ref[li], vec(glu_b_ref, li))
                g = ab[:, :d] * jax.nn.sigmoid(ab[:, d:])

                buf = bufs_ref[li]  # [CTX, D]
                shifted = jnp.concatenate(
                    [buf[1:, :], g.astype(buf.dtype)], axis=0
                )
                bufs_ref[li] = shifted
                w_dw = dw_w_ref[li].astype(jnp.float32)
                y = jnp.sum(shifted.astype(jnp.float32) * w_dw, axis=0,
                            keepdims=True)
                y = y + vec(dw_b_ref, li).astype(jnp.float32)
                h = h + y  # same float association as _ar_step_kernel

                hn = rmsnorm(h, vec(ff_norm_ref, li))
                f = mm(hn, ff1_w_ref[li], vec(ff1_b_ref, li))
                f = 0.5 * f * (1.0 + _erf_poly(f * (1.0 / math.sqrt(2.0))))
                h = h + mm(f, ff2_w_ref[li], vec(ff2_b_ref, li))

                if (li + 1) % freq == 0:
                    ai = min(li // freq, x_q_ref.shape[0] - 1)
                    qn = rmsnorm(h, vec(x_nq_ref, ai))
                    q = mm(qn, x_q_ref[ai])  # [1, H*HP]
                    qh = q.reshape(TEXT_HEADS, HEAD_PAD)
                    kk = kv_k_ref[ai].astype(jnp.float32)  # [H, L, HP]
                    vv = kv_v_ref[ai].astype(jnp.float32)
                    scale = 1.0 / math.sqrt(d // TEXT_HEADS)
                    logits = jnp.sum(qh[:, None, :] * kk, axis=-1) * scale
                    keep = kv_mask_ref[...] != 0  # [1, L]
                    none_valid = ~jnp.any(keep)
                    first = (
                        jax.lax.broadcasted_iota(jnp.int32, (1, kv_len), 1)
                        == 0
                    )
                    keep = keep | (none_valid & first)
                    logits = jnp.where(keep, logits, -jnp.inf)
                    w = jax.nn.softmax(logits, axis=-1)
                    a = jnp.sum(w[..., None] * vv, axis=1)  # [H, HP]
                    a = jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
                    a = mm(a.reshape(1, TEXT_HEADS * HEAD_PAD), x_out_ref[ai])
                    gate = jnp.tanh(vec(x_gate_ref, ai).astype(jnp.float32))
                    h = h + gate * a

            ho = rmsnorm(h, vec(out_norm_ref))
            logits = mm(ho, head_w_ref[...], vec(head_b_ref))  # [1, V] f32

            # ---- anti-loop settings (sampling.anti_loop_settings) --------
            if anti_loop:
                cyc = jnp.bool_(False)
                for n_cyc in range(CYCLE_MIN_N, CYCLE_MAX_N + 1):
                    a_sl = hist_ref[HIST_PAD - n_cyc:, :]
                    b_sl = hist_ref[HIST_PAD - 2 * n_cyc: HIST_PAD - n_cyc, :]
                    eq = jnp.all(a_sl == b_sl)
                    cyc = cyc | (eq & (t >= 2 * n_cyc))
                stuck = (t > 0) & (st_ref[1] >= loop_streak)
                rec = cyc | stuck
                top_p = jnp.where(rec, rec_top_p, top_p0)
                temp = jnp.where(rec, rec_temp, temp0)
            else:
                top_p, temp = top_p0, temp0

            # ---- sampler (sampling.sample_token, full-vocab form) --------
            x = jnp.nan_to_num(
                logits, nan=-1e9, posinf=1e9, neginf=-1e9
            ) / temp

            # penalty window is the reference's last-HIST_LEN tokens, NOT
            # the whole HIST_PAD buffer: rows 0..HIST_PAD-HIST_LEN-1 hold
            # tokens 51+ steps old once t > HIST_LEN and must not penalize
            member = jnp.any(
                hist_ref[HIST_PAD - HIST_LEN:, :] == iota_v,
                axis=0, keepdims=True,
            )  # [1, V] ([HIST_LEN,1] == [1,V] broadcast; -1 never matches)
            pen = 1.1
            xp = jnp.where(
                member, jnp.where(x < 0.0, x * pen, x / pen), x
            )

            # top-k by threshold bisection: smallest thr with
            # count(xp >= thr) <= k keeps the k largest (ties at the
            # boundary wobble by float resolution — measure-zero for real
            # logits)
            k = 50

            def bis_k(_, lohi):
                lo, hi = lohi
                mid = 0.5 * (lo + hi)
                cnt = jnp.sum((xp >= mid).astype(jnp.int32))
                return jnp.where(cnt > k, mid, lo), jnp.where(cnt > k, hi, mid)

            lo0 = jnp.min(xp) - 1.0
            hi0 = jnp.max(xp)
            _, thr = lax.fori_loop(0, 26, bis_k, (lo0, hi0))
            keep1 = xp >= thr

            m = jnp.max(jnp.where(keep1, xp, -jnp.inf))
            e = jnp.where(keep1, jnp.exp(xp - m), 0.0)
            z = jnp.sum(e)
            p = e / jnp.maximum(z, 1e-30)
            degenerate = ~jnp.isfinite(m)

            # nucleus by threshold bisection: smallest c with
            # sum(p[p > c]) <= top_p; keep p >= c (first-crossing token
            # included, matching the sorted-cumsum rule)
            def bis_p(_, lohi):
                lo, hi = lohi
                mid = 0.5 * (lo + hi)
                mass = jnp.sum(jnp.where(p > mid, p, 0.0))
                return (
                    jnp.where(mass > top_p, mid, lo),
                    jnp.where(mass > top_p, hi, mid),
                )

            _, c = lax.fori_loop(0, 26, bis_p, (jnp.float32(0.0), jnp.float32(1.0)))
            # force-include the penalized argmax: the bisection threshold can
            # land one float32 ULP above p_max when p_max < 2^-3 (the [0,1]
            # bisection's resolution is coarser than ULP there), which would
            # empty the kept set and silently bypass the repetition penalty
            # via the argmax fallback. The reference's sorted-cumsum rule
            # keeps the first nucleus entry unconditionally
            # (src/sopro/sampling.py:70-76); mirror that.
            keep2 = keep1 & ((p >= c) | (xp == m))
            mass2 = jnp.sum(jnp.where(keep2, p, 0.0))
            degenerate = degenerate | (mass2 <= 1e-12)

            # Gumbel-max draw over the kept set (argmax(x + g) == categorical
            # over renormalized kept probabilities)
            u = _uniform_bits(seed, t, (1, v))
            gum = -jnp.log(-jnp.log(u))
            score = jnp.where(keep2, xp + gum, -jnp.inf)
            tok_s = jnp.argmax(score, axis=-1)[0].astype(jnp.int32)
            tok_g = jnp.argmax(x, axis=-1)[0].astype(jnp.int32)
            tok = jnp.where(degenerate, tok_g, tok_s)

            # ---- bookkeeping (models/sopro.ar_single_step) ---------------
            # masked rewrite instead of a dynamic-offset store (alignment)
            row_s = jax.lax.broadcasted_iota(jnp.int32, (max_steps, 1), 0)
            tokens_ref[...] = jnp.where(row_s == t, tok, tokens_ref[...])
            rolled = pltpu.roll(hist_ref[...], shift=HIST_PAD - 1, axis=0)
            row_h = jax.lax.broadcasted_iota(jnp.int32, (HIST_PAD, 1), 0)
            hist_ref[...] = jnp.where(row_h == HIST_PAD - 1, tok, rolled)

            same = (tok == st_ref[0]) & (t > 0)
            st_ref[1] = jnp.where(same, st_ref[1] + 1, 0)
            st_ref[0] = tok

            is_eos = tok == eos
            st_ref[3] = jnp.where(
                is_eos & (st_ref[3] >= max_steps), t, st_ref[3]
            )
            st_ref[2] = jnp.where(
                is_eos & ((t + 1) >= min_gen), 1, st_ref[2]
            )
            st_ref[4] = t + 1

        return _

    lax.fori_loop(0, max_steps, step, 0)
    info_ref[...] = jnp.concatenate(
        [st_ref[3].reshape(1, 1), st_ref[4].reshape(1, 1),
         st_ref[2].reshape(1, 1)], axis=1
    )


def ar_generate_pallas_resident(
    ctx: PallasResidentContext,
    cfg: SoproTTSConfig,
    cond_ar: jnp.ndarray,  # [1, S, D]
    seed: jnp.ndarray,
    top_p: jnp.ndarray,
    temperature: jnp.ndarray,
    recovery_top_p: jnp.ndarray,
    recovery_temp: jnp.ndarray,
    min_gen: jnp.ndarray,
    max_steps: int,
    anti_loop: bool = True,
    loop_streak: int = 8,
    *,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Whole AR decode in one kernel ->
    (tokens [1, S], first_eos [1], t [1], stopped [1] bool)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    stacked = ctx.stacked
    kv_k, kv_v = ctx.kv_k, ctx.kv_v
    if kv_k.shape[-1] != HEAD_PAD:
        kv_k, kv_v = pad_kv_heads(kv_k), pad_kv_heads(kv_v)
    n_attn = kv_k.shape[0]
    l = kv_k.shape[-2]
    d = int(cfg.d_model)
    k_sz = int(cfg.ar_kernel)
    ctx_len = (k_sz - 1) * max(cfg.ar_dilations()) + 1
    s = int(max_steps)

    scal_f = jnp.stack(
        [jnp.float32(top_p), jnp.float32(temperature),
         jnp.float32(recovery_top_p), jnp.float32(recovery_temp)]
    ).reshape(1, 4)
    scal_i = jnp.stack(
        [jnp.int32(seed), jnp.int32(min_gen), jnp.int32(loop_streak)]
    ).reshape(1, 3)

    kernel = functools.partial(
        _ar_resident_kernel, cfg, l, s, bool(anti_loop)
    )
    smem = lambda n: pl.BlockSpec(memory_space=pltpu.SMEM)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    tokens, info = pl.pallas_call(
        kernel,
        in_specs=[smem(4), smem(3)] + [full()] * 22,
        out_specs=[full(), full()],
        out_shape=[
            jax.ShapeDtypeStruct((s, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, 3), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (int(cfg.n_layers_ar), ctx_len, d), cond_ar.dtype
            ),
            pltpu.VMEM((HIST_PAD, 1), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        scal_f, scal_i, cond_ar[0], ctx.emb,
        stacked["norm"], stacked["glu_w"], stacked["glu_b"],
        stacked["dw_w"], stacked["dw_b"], stacked["ff_norm"],
        stacked["ff1_w"], stacked["ff1_b"], stacked["ff2_w"], stacked["ff2_b"],
        stacked["x_nq"], stacked["x_q"], stacked["x_out"], stacked["x_gate"],
        kv_k.reshape(n_attn, -1, l, HEAD_PAD)[:, :TEXT_HEADS],
        kv_v.reshape(n_attn, -1, l, HEAD_PAD)[:, :TEXT_HEADS],
        ctx.mask.astype(jnp.int32), stacked["out_norm"],
        stacked["head_w"], stacked["head_b"],
    )
    return tokens[:, 0][None], info[:, 0], info[:, 1], info[:, 2] != 0
