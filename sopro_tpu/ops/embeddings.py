"""Embedding tables: sinusoidal positions, text, and the fused codebook table.

Re-creates reference: src/sopro/nn/embeddings.py. The codebook table is a
single fused embedding of Q*V (+1 BOS) rows indexed as cb*V + token, exactly
as the checkpoint lays it out; `sum_embed_subset` is the NAR's
"previously-decoded codebooks" conditioning (softmax-weighted sum), expressed
as one gather + einsum so XLA maps it onto a batched matmul.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, jnp.ndarray]


def sinusoidal_table(d_model: int, max_len: int):
    """Precomputed sin/cos table [max_len, d] with interleaved sin/cos
    (reference: src/sopro/nn/embeddings.py:11-22). Built in numpy so callers
    may lru_cache it without leaking tracers."""
    import numpy as np

    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32)
        * (-math.log(10000.0) / d_model)
    )
    angles = position * div  # [L, d/2]
    pe = np.zeros((max_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(angles)
    pe[:, 1::2] = np.cos(angles)
    return pe


def init_embedding(
    key: jax.Array, num: int, dim: int, dtype=jnp.float32
) -> Params:
    # torch nn.Embedding default: N(0, 1)
    return {"emb": jax.random.normal(key, (num, dim), dtype)}


def embed(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["emb"], ids, axis=0)


class CodebookEmbeddingSpec:
    """Shape bookkeeping for the fused codebook table
    (reference: src/sopro/nn/embeddings.py:37-49)."""

    def __init__(self, num_codebooks: int, vocab_size: int, use_bos: bool = True):
        self.Q = int(num_codebooks)
        self.V = int(vocab_size)
        self.use_bos = bool(use_bos)
        self.table_size = self.Q * self.V + (1 if use_bos else 0)
        self.bos_id = self.Q * self.V if use_bos else None


def init_codebook_embedding(
    key: jax.Array, spec: CodebookEmbeddingSpec, d_model: int, dtype=jnp.float32
) -> Params:
    return init_embedding(key, spec.table_size, d_model, dtype)


def cb_embed_tokens(
    p: Params, spec: CodebookEmbeddingSpec, tokens: jnp.ndarray, cb_index: int
) -> jnp.ndarray:
    """Embed tokens of one codebook: row = cb*V + token."""
    return jnp.take(p["emb"], cb_index * spec.V + tokens, axis=0)


def cb_sum_embed_subset(
    p: Params,
    spec: CodebookEmbeddingSpec,
    tokens_btk: jnp.ndarray,
    cb_indices: Sequence[int],
    cb_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Softmax(cb_weights)-weighted sum of embeddings over a codebook subset
    (reference: src/sopro/nn/embeddings.py:77-112).

    tokens_btk: [B, T, K] tokens for codebooks `cb_indices` (len K).
    cb_weights: [Q] (full) or [K] logits; softmax over the K selected entries.

    Accumulates K per-codebook gathers in place instead of one flattened
    [B, T, K]-index gather: the fused form materializes a [B, T, K, D]
    intermediate through HBM, which measures 2.7x slower on v5e at the
    batch-32 NAR shape (0.74 -> 0.27 ms at K=16,
    benchmarks/probe_nar.py)."""
    table = p["emb"]
    w = None
    if cb_weights is not None:
        w = cb_weights
        if w.shape[0] == spec.Q:
            w = w[jnp.asarray(list(cb_indices), jnp.int32)]
        w = jax.nn.softmax(w.astype(jnp.float32), axis=0).astype(table.dtype)
    out = None
    for j, cb in enumerate(cb_indices):
        g = jnp.take(table, cb * spec.V + tokens_btk[:, :, j], axis=0)
        if w is not None:
            g = g * w[j]
        out = g if out is None else out + g
    return out
