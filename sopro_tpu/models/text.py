"""Text encoder: token embeddings + sinusoidal positions + 2 non-causal
SSMLite blocks + RMSNorm, returning the per-token sequence and a masked
mean-pooled vector (reference: src/sopro/nn/text.py:16-44).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from sopro_tpu.config import SoproTTSConfig
from sopro_tpu.ops.blocks import init_rmsnorm, init_ssmlite, rmsnorm, ssmlite
from sopro_tpu.ops.embeddings import embed, init_embedding, sinusoidal_table

Params = Dict


@functools.lru_cache(maxsize=8)
def _pos_table(d_model: int, max_len: int):
    return sinusoidal_table(d_model, max_len)


def init_text_encoder(
    key: jax.Array, cfg: SoproTTSConfig, vocab_size: int, dtype=jnp.float32
) -> Params:
    keys = jax.random.split(key, cfg.n_layers_text + 1)
    return {
        "embed": init_embedding(keys[0], vocab_size, cfg.d_model, dtype),
        "layers": [
            init_ssmlite(keys[i + 1], cfg.d_model, kernel_size=7, dtype=dtype)
            for i in range(cfg.n_layers_text)
        ],
        "norm": init_rmsnorm(cfg.d_model, dtype),
    }


def text_encoder(
    p: Params, cfg: SoproTTSConfig, text_ids: jnp.ndarray, mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """text_ids [B, L] int32, mask [B, L] bool (True=valid) →
    (txt_seq [B, L, D], txt_pool [B, D])."""
    x = embed(p["embed"], text_ids)
    pos = _pos_table(cfg.d_model, cfg.max_text_len + 8)[: x.shape[1]]
    x = x + pos[None].astype(x.dtype)
    x = x * mask[..., None].astype(x.dtype)
    for lp in p["layers"]:
        x = ssmlite(lp, x, kernel_size=7, dilation=1, causal=False, mask=mask)
    x = rmsnorm(p["norm"], x)
    mask_f = mask[..., None].astype(x.dtype)
    pooled = jnp.sum(x * mask_f, axis=1) / (jnp.sum(mask_f, axis=1) + 1e-6)
    return x, pooled
