"""Pallas TPU kernel: the NAR stage's fused per-head vocab projection +
greedy argmax, without materializing the logits through HBM.

The XLA path (models/nar.py nar_forward_stage + jnp.argmax) computes
logits [B, T, H, V] with one stacked einsum and reduces them with argmax —
at the batch-32 refine shape that writes + re-reads ~613 MB of bf16 logits
across the four stages (H = 3/4/8/16, V = 2049) for outputs that are only
[B, T, H] int32. Here one pallas_call per stage computes each head's
[T, hd] @ [hd, V] projection in VMEM and reduces it to token ids in-register;
only the ids leave the kernel.

Grid is (H, B) — heads OUTER — so each head's [hd, V] weight block has a
constant index map over the inner batch walk and is fetched into VMEM once
per head, not once per (head, batch) step.

Matches the XLA path's numerics: XLA compiles the bf16 einsum + bias + argmax
chain with excess precision (`--xla_allow_excess_precision`, default on), so
the argmax really sees the fp32 MXU accumulator — the kernel therefore keeps
the accumulation in fp32 end-to-end (no bf16 round-trip) and adds the bias in
fp32; ties resolve to the lowest index on both paths.

Reference behavior being reproduced: per-codebook linear heads with head-id
embedding offsets + greedy argmax (src/sopro/nn/nar.py:89-116,
src/sopro/model.py:307-347).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(v_total, z_ref, hid_ref, w_ref, b_ref, o_ref):
    z = z_ref[0]  # [T_pad, hd]
    zh = z + hid_ref[0]  # [1, hd] broadcasts over rows
    acc = jnp.dot(zh, w_ref[0], preferred_element_type=jnp.float32)
    # fp32 accumulator straight into the bias add + compare: XLA's excess-
    # precision compilation of the reference einsum chain never rounds the
    # dot output to bf16, so neither do we
    logits = acc + b_ref[0].astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)  # [T_pad, 1]
    ii = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    idx = jnp.min(
        jnp.where(logits == m, ii, v_total), axis=-1, keepdims=True
    )  # [T_pad, 1]; lowest index among ties == jnp.argmax
    o_ref[0, 0] = idx.reshape(1, -1).astype(jnp.int32)


def nar_heads_argmax(
    z: jnp.ndarray,        # [B, T, hd]
    hid: jnp.ndarray,      # [H, hd] head-id embedding offsets
    w_stack: jnp.ndarray,  # [H, hd, V]
    b_stack: jnp.ndarray,  # [H, V]
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """argmax_v((z + hid_h) @ W_h + b_h) -> preds [B, T, H] int32."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t, hd = z.shape
    h, _, v = w_stack.shape
    # 16-row granularity (the bf16 sublane tile), not 128: every block dim
    # here EQUALS its array dim, which Mosaic accepts regardless of the
    # 128-divisibility rule — T=151 pads to 160 instead of 256, and the
    # serving tick's head_tail=16 pays 16 rows instead of 128
    t_pad = max(16, pl.cdiv(t, 16) * 16)
    zp = jnp.pad(z, ((0, 0), (0, t_pad - t), (0, 0)))
    # V = 2049: the EOS row is AR-only — the NAR heads' vocab is the
    # codebook; pad the lane dim to a 128 multiple with -inf-free zeros and
    # let the iota guard (index >= v never wins: padded columns share the
    # zero bias so they can tie, hence mask them hard)
    v_pad = pl.cdiv(v, 128) * 128
    if v_pad != v:
        w_stack = jnp.pad(w_stack, ((0, 0), (0, 0), (0, v_pad - v)))
        neg = jnp.full((h, v_pad - v), -jnp.inf, b_stack.dtype)
        b_stack = jnp.concatenate([b_stack, neg], axis=1)
    # rank-3 lift: Mosaic requires each block's last two dims be
    # (8k, 128k)-divisible or exactly the array dims — a (1, d) block over
    # [H, d] fails on the H axis, while (1, 1, d) over [H, 1, d] passes
    hid3 = hid[:, None, :]
    b3 = b_stack[:, None, :]
    out = pl.pallas_call(
        functools.partial(_kernel, v_pad),
        grid=(h, b),
        in_specs=[
            pl.BlockSpec((1, t_pad, hd), lambda hi, bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hd), lambda hi, bi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hd, v_pad), lambda hi, bi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, v_pad), lambda hi, bi: (hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, t_pad), lambda hi, bi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, t_pad), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zp, hid3, w_stack, b3)
    return jnp.transpose(out[:, :, 0, :t], (0, 2, 1))  # [B, T, H]
