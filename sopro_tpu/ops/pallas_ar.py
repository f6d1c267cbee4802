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



# The whole-loop resident decode now lives in ops/pallas_ar_loop.py
# (batch-generic, chunk-capable, state-in/state-out, shared threefry
# sampler). HIST_PAD stays here as the packed rolling-history height used
# by both kernels' layouts.
HIST_PAD = 64  # >= sampling.HIST_LEN (50), whole sublanes
