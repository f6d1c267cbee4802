"""Core NN primitives as pure functions over parameter pytrees.

These re-create, numerically, the behaviors of the reference's primitive layer
(reference: src/sopro/nn/blocks.py) but are designed TPU-first:

* parameters are plain nested dicts of `jnp` arrays (pytrees), so every model
  is directly jit/scan/vmap/pjit-able;
* the streaming (single-step) variants operate on explicit immutable state
  pytrees so the whole AR decode loop can live inside one `lax.scan` /
  `lax.while_loop` on device;
* sequence masks are threaded through so padded (bucketed, static-shape)
  batches are numerically identical to the reference's exact-length runs:
  masking the *conv inputs* reproduces the reference's zero padding at the
  sequence boundary, and every other op is position-wise.

Dtype policy: norms compute in float32 regardless of input dtype (matching
reference: src/sopro/nn/blocks.py:32-37).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, jnp.ndarray]


# --------------------------------------------------------------------------
# elementary ops
# --------------------------------------------------------------------------


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch's nn.GELU default, NOT the tanh approximation."""
    return jax.nn.gelu(x, approximate=False)


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x @ w (+ b). Weight layout is [in, out] (transposed vs torch)."""
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def init_linear(
    key: jax.Array, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32
) -> Params:
    """Uniform(-1/sqrt(in), 1/sqrt(in)) init (torch nn.Linear default)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    p: Params = {
        "w": jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound),
    }
    if bias:
        p["b"] = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
    return p


def rmsnorm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with float32 compute (reference: src/sopro/nn/blocks.py:26-37)."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y32 = x32 * lax.rsqrt(var + eps)
    y32 = y32 * p["scale"].astype(jnp.float32)
    return y32.astype(x.dtype)


def init_rmsnorm(d: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((d,), dtype)}


def layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Standard LayerNorm (used by SpeakerFiLM and the Mimi transformer)."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def init_layernorm(d: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def glu(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """a * sigmoid(b) gating (reference: src/sopro/nn/blocks.py:16-23)."""
    ab = linear(p["pro"], x)
    a, b = jnp.split(ab, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def init_glu(key: jax.Array, d: int, dtype=jnp.float32) -> Params:
    return {"pro": init_linear(key, d, 2 * d, dtype=dtype)}


# --------------------------------------------------------------------------
# depthwise dilated conv1d — full-sequence and streaming-step variants
# --------------------------------------------------------------------------


def dwconv1d(
    p: Params,
    x: jnp.ndarray,
    *,
    kernel_size: int,
    dilation: int = 1,
    causal: bool = False,
) -> jnp.ndarray:
    """Depthwise dilated conv over [B, T, D].

    Weight layout [k, 1, D] (HIO) with feature_group_count=D; equals torch
    Conv1d(d, d, k, groups=d, dilation=dil) with the reference's same-length
    padding (causal: all-left; centered: split left/right with the extra
    sample on the right — reference: src/sopro/nn/blocks.py:63-74).
    """
    k, d = int(kernel_size), int(dilation)
    total = (k - 1) * d
    if causal:
        pad = (total, 0)
    else:
        left = total // 2
        pad = (left, total - left)
    y = lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(1,),
        padding=(pad,),
        rhs_dilation=(d,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=x.shape[-1],
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def init_dwconv1d(
    key: jax.Array, d: int, kernel_size: int, dtype=jnp.float32
) -> Params:
    # torch Conv1d default: U(-sqrt(g/(Cin*k)), ...) with groups=d, Cin=d.
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(kernel_size)
    return {
        "w": jax.random.uniform(kw, (kernel_size, 1, d), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (d,), dtype, -bound, bound),
    }


def dwconv_ctx_len(kernel_size: int, dilation: int) -> int:
    return (int(kernel_size) - 1) * int(dilation) + 1


def init_dwconv_state(
    batch: int, d: int, kernel_size: int, dilation: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Zero rolling buffer [B, ctx, D], oldest-first (newest at index ctx-1)."""
    return jnp.zeros((batch, dwconv_ctx_len(kernel_size, dilation), d), dtype)


def dwconv1d_step(
    p: Params,
    x_bd: jnp.ndarray,
    buf: jnp.ndarray,
    *,
    kernel_size: int,
    dilation: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One causal step. x_bd [B, D]; buf [B, ctx, D] oldest-first.

    Equivalent to the reference's ring-buffer step (src/sopro/nn/blocks.py:
    76-110): shift the buffer left, append x, gather the dilated taps and
    contract against the kernel.
    """
    k, d = int(kernel_size), int(dilation)
    ctx = buf.shape[1]
    if ctx > 1:
        buf = jnp.concatenate([buf[:, 1:], x_bd[:, None, :]], axis=1)
    else:
        buf = x_bd[:, None, :]
    taps = buf[:, ::d, :] if d > 1 else buf  # [B, k, D], oldest-first
    w = p["w"].reshape(k, -1).astype(x_bd.dtype)  # [k, D]
    y = jnp.einsum("bkd,kd->bd", taps, w)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y, buf


# --------------------------------------------------------------------------
# SSMLite block (the universal residual block of the model)
# --------------------------------------------------------------------------


def init_ssmlite(
    key: jax.Array, d: int, kernel_size: int = 7, dtype=jnp.float32
) -> Params:
    kg, kc, k1, k2 = jax.random.split(key, 4)
    return {
        "norm": init_rmsnorm(d, dtype),
        "glu": init_glu(kg, d, dtype),
        "dw": init_dwconv1d(kc, d, kernel_size, dtype),
        "ff_norm": init_rmsnorm(d, dtype),
        "ff1": init_linear(k1, d, 4 * d, dtype=dtype),
        "ff2": init_linear(k2, 4 * d, d, dtype=dtype),
    }


def _ssmlite_ff(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = rmsnorm(p["ff_norm"], x)
    h = linear(p["ff1"], h)
    h = gelu(h)
    return linear(p["ff2"], h)


def ssmlite(
    p: Params,
    x: jnp.ndarray,
    *,
    kernel_size: int,
    dilation: int = 1,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x + dwconv(glu(norm(x))); x + FFN(x)
    (reference: src/sopro/nn/blocks.py:143-148). Inference-mode (no dropout).

    `mask` [B, T] (True=valid): masking the conv input makes padded batches
    numerically identical to exact-length runs.
    """
    h = glu(p["glu"], rmsnorm(p["norm"], x))
    if mask is not None:
        h = h * mask[..., None].astype(h.dtype)
    h = dwconv1d(
        p["dw"], h, kernel_size=kernel_size, dilation=dilation, causal=causal
    )
    x = x + h
    x = x + _ssmlite_ff(p, x)
    return x


def init_ssmlite_state(
    batch: int, d: int, kernel_size: int, dilation: int, dtype=jnp.float32
) -> jnp.ndarray:
    return init_dwconv_state(batch, d, kernel_size, dilation, dtype)


def ssmlite_step(
    p: Params,
    x_bd: jnp.ndarray,
    buf: jnp.ndarray,
    *,
    kernel_size: int,
    dilation: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One causal step over [B, D] (reference: src/sopro/nn/blocks.py:150-162)."""
    h = glu(p["glu"], rmsnorm(p["norm"], x_bd))
    y, buf = dwconv1d_step(
        p["dw"], h, buf, kernel_size=kernel_size, dilation=dilation
    )
    x = x_bd + y
    x = x + _ssmlite_ff(p, x)
    return x, buf


# --------------------------------------------------------------------------
# attentive statistics pooling
# --------------------------------------------------------------------------


def init_attentive_stats_pool(key: jax.Array, d: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "a1": init_linear(k1, d, d, dtype=dtype),
        "a2": init_linear(k2, d, 1, dtype=dtype),
    }


def attentive_stats_pool(
    p: Params, h: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Attention-weighted mean‖std over time
    (reference: src/sopro/nn/blocks.py:165-188). h [B, T, D] → [B, 2D]."""
    logits = linear(p["a2"], jnp.tanh(linear(p["a1"], h)))[..., 0]  # [B, T]
    if mask is not None:
        logits = jnp.where(mask, logits, -1e9)
    w = jax.nn.softmax(logits, axis=1)[..., None]  # [B, T, 1]
    mu = jnp.sum(h * w, axis=1)  # [B, D]
    var = jnp.sum(w * jnp.square(h - mu[:, None, :]), axis=1)
    std = jnp.sqrt(jnp.maximum(var, 1e-6))
    return jnp.concatenate([mu, std], axis=-1)
