"""Speaker verification student (Token2SV) and FiLM conditioning
(reference: src/sopro/nn/speaker.py).

Token2SV embeds Mimi tokens per codebook, mixes them with learned softmax
weights, runs two non-causal depthwise convs + GELU, attentive-stats pooling,
a projection and an L2 normalization. Masked so bucketed (padded) reference
lengths are numerically identical to exact-length runs.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sopro_tpu.ops.blocks import (
    attentive_stats_pool,
    dwconv1d,
    gelu,
    init_attentive_stats_pool,
    init_dwconv1d,
    init_linear,
    layernorm,
    init_layernorm,
    linear,
)
from sopro_tpu.ops.embeddings import init_embedding

Params = Dict


def init_token2sv(
    key: jax.Array,
    num_codebooks: int,
    vocab_size: int,
    d: int = 192,
    out_dim: int = 192,
    dtype=jnp.float32,
) -> Params:
    ke, k1, k2, kp, kq = jax.random.split(key, 5)
    return {
        "emb": init_embedding(ke, num_codebooks * vocab_size, d, dtype),
        # learned codebook mix, initialized linspace(1.0, 0.1)
        # (reference: src/sopro/nn/speaker.py:20-21)
        "cb_weights": jnp.linspace(1.0, 0.1, num_codebooks, dtype=dtype),
        "conv1": init_dwconv1d(k1, d, 7, dtype),
        "conv2": init_dwconv1d(k2, d, 7, dtype),
        "pool": init_attentive_stats_pool(kp, d, dtype),
        "proj": init_linear(kq, 2 * d, out_dim, dtype=dtype),
    }


def token2sv(
    p: Params,
    tokens_btq: jnp.ndarray,
    vocab_size: int,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """tokens [B, T, Q] int32, mask [B, T] bool → L2-normalized [B, out_dim]."""
    b, t, q = tokens_btq.shape
    if mask is None:
        mask = jnp.ones((b, t), bool)
    q_idx = jnp.arange(q, dtype=jnp.int32)[None, None, :]
    idx = q_idx * vocab_size + tokens_btq
    raw = jnp.take(p["emb"]["emb"], idx, axis=0)  # [B, T, Q, d]
    raw = raw * mask[:, :, None, None].astype(raw.dtype)
    w = jax.nn.softmax(p["cb_weights"].astype(jnp.float32), axis=0).astype(raw.dtype)
    x = jnp.einsum("btqd,q->btd", raw, w)
    x = x * mask[..., None].astype(x.dtype)

    # two masked non-causal convs; masking the conv inputs reproduces the
    # reference's exact-length zero padding at the boundary
    h = dwconv1d(p["conv1"], x, kernel_size=7, causal=False)
    h = gelu(h)
    h = h * mask[..., None].astype(h.dtype)
    h = dwconv1d(p["conv2"], h, kernel_size=7, causal=False)
    h = gelu(h)
    h = h * mask[..., None].astype(h.dtype)

    pooled = attentive_stats_pool(p["pool"], h, mask=mask)
    e = linear(p["proj"], pooled)
    norm = jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-6)
    return e / norm


def init_speaker_film(
    key: jax.Array, d_model: int, sv_dim: int, dtype=jnp.float32
) -> Params:
    k1, k2 = jax.random.split(key)
    p2 = init_linear(k2, d_model, 2 * d_model, dtype=dtype)
    # zero-init the FiLM output layer (reference: src/sopro/nn/speaker.py:73-74)
    p2 = {"w": jnp.zeros_like(p2["w"]), "b": jnp.zeros_like(p2["b"])}
    return {
        "mlp1": init_linear(k1, sv_dim, d_model, dtype=dtype),
        "mlp2": p2,
        "norm": init_layernorm(d_model, dtype),
    }


def speaker_film(
    p: Params, base_btd: jnp.ndarray, spk_bd: jnp.ndarray, strength: float = 1.0
) -> jnp.ndarray:
    """norm(x) * (1 + s*tanh γ) + s*tanh β
    (reference: src/sopro/nn/speaker.py:76-85)."""
    film = linear(p["mlp2"], gelu(linear(p["mlp1"], spk_bd)))
    gamma, beta = jnp.split(film, 2, axis=-1)
    x = layernorm(p["norm"], base_btd)
    s = jnp.asarray(strength, x.dtype)
    return x * (1 + s * jnp.tanh(gamma)[:, None, :]) + s * jnp.tanh(beta)[:, None, :]
