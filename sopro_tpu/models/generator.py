"""Autoregressive RVQ-codebook-1 generator.

The reference's ARRVQ1Generator (src/sopro/nn/generator.py) is a stack of 6
causal dilated SSMLite blocks with a text cross-attention after every 2nd
block and a linear head to codebook_size+1 (EOS). Here the per-step state is
an explicit pytree of per-layer conv ring buffers, so the whole decode loop
runs on device inside `lax.scan` / `lax.while_loop`; text KV caches are fixed
and live in the jit closure, never in the carry.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from sopro_tpu.config import SoproTTSConfig
from sopro_tpu.ops.attention import build_kv_cache, init_xattn, text_xattn
from sopro_tpu.ops.blocks import (
    init_linear,
    init_rmsnorm,
    init_ssmlite,
    init_ssmlite_state,
    linear,
    rmsnorm,
    ssmlite,
    ssmlite_step,
)

Params = Dict


def _has_xattn(cfg: SoproTTSConfig, layer_idx: int) -> bool:
    # cross-attention after every `ar_text_attn_freq`-th block
    # (reference: src/sopro/nn/generator.py:31-39)
    return (layer_idx + 1) % int(cfg.ar_text_attn_freq) == 0


def init_ar_generator(
    key: jax.Array, cfg: SoproTTSConfig, dtype=jnp.float32
) -> Params:
    n = int(cfg.n_layers_ar)
    keys = jax.random.split(key, 2 * n + 1)
    blocks = [
        init_ssmlite(keys[i], cfg.d_model, kernel_size=cfg.ar_kernel, dtype=dtype)
        for i in range(n)
    ]
    xattn = [
        init_xattn(keys[n + i], cfg.d_model, dtype) if _has_xattn(cfg, i) else None
        for i in range(n)
    ]
    return {
        "blocks": blocks,
        "xattn": xattn,
        "norm": init_rmsnorm(cfg.d_model, dtype),
        "head": init_linear(keys[-1], cfg.d_model, cfg.ar_vocab, dtype=dtype),
    }


def init_ar_conv_state(
    cfg: SoproTTSConfig, batch: int, dtype=jnp.float32
) -> List[jnp.ndarray]:
    return [
        init_ssmlite_state(batch, cfg.d_model, cfg.ar_kernel, d, dtype)
        for d in cfg.ar_dilations()
    ]


def build_text_kv_caches(
    p: Params,
    cfg: SoproTTSConfig,
    text_emb: jnp.ndarray,
    text_mask: Optional[jnp.ndarray],
) -> List[Optional[Dict]]:
    """Precompute fixed text KV caches for the cross-attention layers
    (reference: src/sopro/nn/generator.py:44-68)."""
    return [
        build_kv_cache(xp, text_emb, heads=4, mask=text_mask)
        if xp is not None
        else None
        for xp in p["xattn"]
    ]


def ar_step(
    p: Params,
    cfg: SoproTTSConfig,
    x_bd: jnp.ndarray,
    conv_state: List[jnp.ndarray],
    kv_caches: List[Optional[Dict]],
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """One decode step over [B, D] → (logits [B, V+1], new conv state)
    (reference: src/sopro/nn/generator.py:98-130)."""
    dils = cfg.ar_dilations()
    h = x_bd
    new_state = []
    for i, bp in enumerate(p["blocks"]):
        h, buf = ssmlite_step(
            bp, h, conv_state[i], kernel_size=cfg.ar_kernel, dilation=dils[i]
        )
        new_state.append(buf)
        if p["xattn"][i] is not None and kv_caches[i] is not None:
            h = text_xattn(p["xattn"][i], h[:, None, :], kv_caches[i], heads=4)[:, 0]
    h = rmsnorm(p["norm"], h)
    return linear(p["head"], h), new_state


def ar_forward(
    p: Params,
    cfg: SoproTTSConfig,
    x_btd: jnp.ndarray,
    text_emb: Optional[jnp.ndarray] = None,
    text_mask: Optional[jnp.ndarray] = None,
    frame_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Teacher-forcing full-sequence forward (training / tests)
    (reference: src/sopro/nn/generator.py:70-96)."""
    dils = cfg.ar_dilations()
    kvs = build_text_kv_caches(p, cfg, text_emb, text_mask) if text_emb is not None else [None] * len(p["blocks"])
    h = x_btd
    for i, bp in enumerate(p["blocks"]):
        h = ssmlite(
            bp, h, kernel_size=cfg.ar_kernel, dilation=dils[i], causal=True,
            mask=frame_mask,
        )
        if p["xattn"][i] is not None and kvs[i] is not None:
            h = text_xattn(p["xattn"][i], h, kvs[i], heads=4)
    h = rmsnorm(p["norm"], h)
    return linear(p["head"], h)
