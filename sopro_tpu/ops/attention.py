"""Gated cross-attention blocks (text conditioning and reference conditioning).

Re-creates the behavior of the reference's two cross-attention flavors
(reference: src/sopro/nn/text.py:47-132 and src/sopro/nn/ref.py:16-108):

* pre-RMSNorm on queries and on the KV context,
* bias-free q/k/v/out projections,
* attention computed in float32 (the reference disables autocast + upcasts),
* NaN scrub on the attention output,
* zero-init tanh-gated residual; the "ref" flavor additionally rescales the
  attention output per-token to the query's RMS (clamped to [0, 10]) and
  bounds the gate by gmax * tanh(gate).

KV caches are plain dicts {"k","v","mask"} so they sit naturally in jit
closures: the AR decode loop attends to *fixed* text/reference caches, so
they never enter the scan carry.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sopro_tpu.ops.blocks import Params, init_linear, init_rmsnorm, rmsnorm


def _to_heads(t: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, s, d = t.shape
    return t.reshape(b, s, heads, d // heads).transpose(0, 2, 1, 3)


def _from_heads(t: jnp.ndarray) -> jnp.ndarray:
    b, h, s, hd = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, s, h * hd)


def init_xattn(key: jax.Array, d_model: int, dtype=jnp.float32) -> Params:
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "nq": init_rmsnorm(d_model, dtype),
        "nkv": init_rmsnorm(d_model, dtype),
        "q": init_linear(kq, d_model, d_model, bias=False, dtype=dtype),
        "k": init_linear(kk, d_model, d_model, bias=False, dtype=dtype),
        "v": init_linear(kv, d_model, d_model, bias=False, dtype=dtype),
        "out": init_linear(ko, d_model, d_model, bias=False, dtype=dtype),
        "gate": jnp.zeros((), dtype),
    }


def build_kv_cache(
    p: Params,
    context: jnp.ndarray,
    *,
    heads: int,
    mask: Optional[jnp.ndarray] = None,
) -> Dict[str, Optional[jnp.ndarray]]:
    """Precompute K/V over a fixed context [B, S, D]. `mask` [B, S] True=valid
    (note: inverted vs the reference's key_padding_mask, where True=pad)."""
    kv = rmsnorm(p["nkv"], context)
    return {
        "k": _to_heads(linear_nobias(p["k"], kv), heads),
        "v": _to_heads(linear_nobias(p["v"], kv), heads),
        "mask": mask,
    }


def linear_nobias(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"]


def _attend_fp32(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Scaled dot-product attention in float32 with the reference's
    all-masked-row fixup: a row with no valid keys attends to key 0
    (reference: src/sopro/nn/text.py:109-116, src/sopro/nn/ref.py:76-86)."""
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhqd,bhkd->bhqk", q32, k32) * scale
    if mask is not None:
        keep = mask.astype(bool)  # [B, S], True = valid
        none_valid = ~jnp.any(keep, axis=-1, keepdims=True)  # [B, 1]
        keep = keep.at[..., 0].set(keep[..., 0] | none_valid[..., 0])
        logits = jnp.where(keep[:, None, None, :], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    a = jnp.einsum("bhqk,bhkd->bhqd", w, v32)
    # NaN scrub (reference: text.py:128 / ref.py:98)
    return jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)


def text_xattn(
    p: Params,
    x: jnp.ndarray,
    kv: Dict[str, Optional[jnp.ndarray]],
    *,
    heads: int = 4,
) -> jnp.ndarray:
    """Text cross-attention with tanh-gated residual
    (reference: src/sopro/nn/text.py:85-132)."""
    q = _to_heads(linear_nobias(p["q"], rmsnorm(p["nq"], x)), heads)
    a = _attend_fp32(q, kv["k"], kv["v"], kv["mask"])
    a = _from_heads(a).astype(x.dtype)
    a = linear_nobias(p["out"], a)
    return x + jnp.tanh(p["gate"]).astype(x.dtype) * a


def _rms_per_token(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    return jnp.sqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)


def ref_xattn(
    p: Params,
    x: jnp.ndarray,
    kv: Dict[str, Optional[jnp.ndarray]],
    *,
    heads: int = 2,
    gmax: float = 0.35,
) -> jnp.ndarray:
    """Reference-audio cross-attention: RMS-matched output, bounded gate
    (reference: src/sopro/nn/ref.py:54-108)."""
    q = _to_heads(linear_nobias(p["q"], rmsnorm(p["nq"], x)), heads)
    a = _attend_fp32(q, kv["k"], kv["v"], kv["mask"])  # fp32
    a = _from_heads(a)
    scale = jnp.clip(_rms_per_token(x) / _rms_per_token(a), 0.0, 10.0)
    a = (a * scale).astype(x.dtype)
    a = linear_nobias(p["out"], a)
    gate_eff = (gmax * jnp.tanh(p["gate"].astype(jnp.float32))).astype(x.dtype)
    return x + gate_eff * a
