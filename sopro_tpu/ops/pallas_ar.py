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
(tests/test_pallas_ar.py); enabled via RuntimeConfig(use_pallas_ar=True).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sopro_tpu.config import SoproTTSConfig

Params = Dict[str, Any]

TEXT_HEADS = 4  # reference text cross-attention head count


from typing import NamedTuple


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
    """AR generator params -> stacked slabs with a leading block/attn axis."""
    blocks = p_ar["blocks"]

    def stack(*path):
        return jnp.stack([functools.reduce(lambda d, k: d[k], path, b)
                          for b in blocks])

    xattn = [x for x in p_ar["xattn"] if x is not None]
    out = {
        "norm": stack("norm", "scale"),            # [N, D]
        "glu_w": stack("glu", "pro", "w"),         # [N, D, 2D]
        "glu_b": stack("glu", "pro", "b"),         # [N, 2D]
        "dw_w": jnp.stack([b["dw"]["w"][:, 0, :] for b in blocks]),  # [N, k, D]
        "dw_b": stack("dw", "b"),                  # [N, D]
        "ff_norm": stack("ff_norm", "scale"),      # [N, D]
        "ff1_w": stack("ff1", "w"),                # [N, D, 4D]
        "ff1_b": stack("ff1", "b"),                # [N, 4D]
        "ff2_w": stack("ff2", "w"),                # [N, 4D, D]
        "ff2_b": stack("ff2", "b"),                # [N, D]
        "head_w": p_ar["head"]["w"],               # [D, V]
        "head_b": p_ar["head"]["b"][None],         # [1, V]
        "out_norm": p_ar["norm"]["scale"][None],   # [1, D]
        "x_nq": jnp.stack([x["nq"]["scale"] for x in xattn]),   # [A, D]
        "x_q": jnp.stack([x["q"]["w"] for x in xattn]),         # [A, D, D]
        "x_out": jnp.stack([x["out"]["w"] for x in xattn]),     # [A, D, D]
        "x_gate": jnp.stack([jnp.ravel(x["gate"]) for x in xattn]),  # [A, 1]
    }
    return out


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

    def mm(a, w_ref_slab, bias=None):
        y = jnp.dot(a.astype(w_ref_slab.dtype), w_ref_slab,
                    preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y

    h = h_ref[:, :]  # [B, D] fp32

    # ---- SSMLite block i -------------------------------------------------
    hn = rmsnorm(h, norm_ref[0, :])
    ab = mm(hn, glu_w_ref[0], glu_b_ref[0, :])
    d_model = h.shape[-1]
    g = ab[:, :d_model] * jax.nn.sigmoid(ab[:, d_model:])

    buf = bufs_ref[0]  # [B, CTX, D]
    ctx_max = buf.shape[1]
    shifted = jnp.concatenate(
        [buf[:, 1:, :], g[:, None, :].astype(buf.dtype)], axis=1
    )
    bufs_out_ref[0] = shifted

    # dilated taps: dilation is static per block index — compute each
    # distinct variant and select by program_id (cheap [B, k, D] einsums)
    w_dw = dw_w_ref[0].astype(jnp.float32)  # [k, D]
    uniq = sorted(set(dils))
    acc = None
    for dil in uniq:
        taps = lax.slice(
            shifted,
            (0, ctx_max - ((k - 1) * dil + 1), 0),
            (shifted.shape[0], ctx_max, shifted.shape[2]),
            (1, dil, 1),
        ).astype(jnp.float32)  # [B, k, D]
        yv = jnp.einsum("bkd,kd->bd", taps, w_dw)
        sel = jnp.zeros((), bool)
        for bi, bd in enumerate(dils):
            if bd == dil:
                sel = jnp.logical_or(sel, i == bi)
        acc = yv if acc is None else jnp.where(sel, yv, acc)
    y = acc + dw_b_ref[0, :].astype(jnp.float32)
    h = h + y

    hn = rmsnorm(h, ff_norm_ref[0, :])
    f = mm(hn, ff1_w_ref[0], ff1_b_ref[0, :])
    f = jax.nn.gelu(f, approximate=False)
    f = mm(f, ff2_w_ref[0], ff2_b_ref[0, :])
    h = h + f

    # ---- text cross-attention after every `freq`-th block ----------------
    has_attn = (i + 1) % freq == 0

    @pl.when(has_attn)
    def _attn():
        hh = h
        qn = rmsnorm(hh, x_nq_ref[0, :])
        q = mm(qn, x_q_ref[0])  # [B, D]
        bsz = q.shape[0]
        hd = d_model // TEXT_HEADS
        qh = q.reshape(bsz, TEXT_HEADS, hd)
        kk = kv_k_ref[0].astype(jnp.float32).reshape(bsz, TEXT_HEADS, kv_len, hd)
        vv = kv_v_ref[0].astype(jnp.float32).reshape(bsz, TEXT_HEADS, kv_len, hd)
        scale = 1.0 / math.sqrt(hd)
        logits = jnp.einsum("bhd,bhld->bhl", qh, kk) * scale
        keep = kv_mask_ref[:, :] != 0  # [B, L]
        none_valid = ~jnp.any(keep, axis=-1, keepdims=True)  # [B, 1]
        first = jax.lax.broadcasted_iota(jnp.int32, keep.shape, 1) == 0
        keep = keep | (none_valid & first)
        logits = jnp.where(keep[:, None, :], logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1)
        a = jnp.einsum("bhl,bhld->bhd", w, vv)
        a = jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
        a = mm(a.reshape(bsz, d_model), x_out_ref[0])
        gate = jnp.tanh(x_gate_ref[0, 0].astype(jnp.float32))
        h_ref[:, :] = hh + gate * a

    @pl.when(jnp.logical_not(has_attn))
    def _noattn():
        h_ref[:, :] = h

    # ---- output norm + head on the last block ----------------------------
    @pl.when(i == n_layers - 1)
    def _head():
        ho = rmsnorm(h_ref[:, :], out_norm_ref[0, :])
        logits_ref[:, :] = mm(ho, head_w_ref[:, :], head_b_ref[0, :])


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
        slab((d,)),                                 # norm
        slab((d, 2 * d)),                           # glu_w
        slab((2 * d,)),                             # glu_b
        slab((k, d)),                               # dw_w
        slab((d,)),                                 # dw_b
        slab((d,)),                                 # ff_norm
        slab((d, 4 * d)),                           # ff1_w
        slab((4 * d,)),                             # ff1_b
        slab((4 * d, d)),                           # ff2_w
        slab((d,)),                                 # ff2_b
        slab((d,), lambda i: (aidx(i),)),           # x_nq
        slab((d, d), lambda i: (aidx(i),)),         # x_q
        slab((d, d), lambda i: (aidx(i),)),         # x_out
        slab((1,), lambda i: (aidx(i),)),           # x_gate
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
        kv_mask.astype(jnp.int8),
        stacked["out_norm"], stacked["head_w"], stacked["head_b"],
    )
    return logits, bufs_out
