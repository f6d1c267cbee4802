"""Streaming Mimi decode with explicit, fixed-shape state.

The reference streams the codec by re-decoding a 2-frame overlap and
truncating the HF transformer KV cache each chunk
(reference: src/sopro/codec/mimi.py:88-181) — an approximation forced by
torch modules that hide their conv state. Every stage of the decode path is
causal, so here the chunked decode is *exact*: concatenated stream chunks are
bit-identical (up to float addition order) to a full decode.

State is one pytree of fixed-shape arrays, so a decode step jits once per
chunk size and the whole streaming loop stays on device:

* per-conv left-context caches (length = effective_kernel - 1) for every
  stride-1 conv in the SEANet decoder;
* bias-free overlap-add carries (length = kernel - stride) for every
  transpose conv, including the 512-group 12.5->25 Hz upsampler;
* a ring KV cache of `sliding_window` slots per transformer layer with the
  absolute position of each slot, giving exact sliding-window causal
  attention with RoPE at absolute positions.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from sopro_tpu.codec.mimi_config import (
    CONV,
    CONVT,
    ELU,
    RESNET,
    MimiConfig,
    decoder_plan,
    upsample_spec,
)
from sopro_tpu.codec.mimi_jax import (
    _conv_nhc,
    _elu,
    apply_rope,
    _layernorm,
    _merge_heads,
    _split_heads,
    rope_cos_sin,
    rvq_decode,
)

Params = Dict[str, Any]


class MimiStreamState(NamedTuple):
    pos: jnp.ndarray  # i32 scalar: transformer tokens decoded so far
    kv_k: Tuple[jnp.ndarray, ...]  # per layer [B, H, W, hd]
    kv_v: Tuple[jnp.ndarray, ...]
    kv_pos: jnp.ndarray  # [W] absolute position stored in each ring slot
    upsample_carry: jnp.ndarray  # [B, k-s, hidden], bias-free partial sums
    conv_caches: Tuple[jnp.ndarray, ...]  # flattened per-plan-entry caches


# --------------------------------------------------------------------------
# streaming conv primitives
# --------------------------------------------------------------------------


def _conv_cache_len(spec: Dict[str, Any]) -> int:
    k, dil = int(spec["k"]), int(spec.get("dilation", 1))
    return (k - 1) * dil


def stream_conv(
    p: Params, x: jnp.ndarray, cache: jnp.ndarray, spec: Dict[str, Any]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stride-1 causal conv over a chunk [B, n, C] with left-context cache
    [B, (k-1)*dil, C]. Zero-init cache == the full path's causal zero pad."""
    dil = int(spec.get("dilation", 1))
    ext = jnp.concatenate([cache, x], axis=1)
    y = _conv_nhc(ext, p["w"], stride=1, dilation=dil,
                  groups=int(spec.get("groups", 1)))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    ctx = cache.shape[1]
    new_cache = ext[:, ext.shape[1] - ctx:] if ctx > 0 else cache
    return y, new_cache


def stream_convt(
    p: Params, x: jnp.ndarray, carry: jnp.ndarray, spec: Dict[str, Any]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Causal transpose conv over a chunk [B, n, C_in] -> [B, n*s, C_out]
    with a bias-free overlap-add carry [B, k-s, C_out]."""
    k, stride = int(spec["k"]), int(spec["stride"])
    groups = int(spec.get("groups", 1))
    n = x.shape[1]
    raw = _conv_nhc(x, p["w"], stride=1, lhs_dilation=stride,
                    pad=(k - 1, k - 1), groups=groups)  # [B, n*s + (k-s), C]
    ov = k - stride
    emit = raw[:, : n * stride]
    emit = emit.at[:, :ov].add(carry)
    new_carry = raw[:, n * stride:]
    if "b" in p:
        emit = emit + p["b"].astype(emit.dtype)
    return emit, new_carry


# --------------------------------------------------------------------------
# state init
# --------------------------------------------------------------------------


def _plan_cache_shapes(cfg: MimiConfig) -> List[Tuple[str, Tuple[int, int]]]:
    """(kind, (len, channels)) per cache slot, flattened over the decoder
    plan (resnet contributes one slot per inner conv)."""
    shapes: List[Tuple[str, Tuple[int, int]]] = []
    for kind, spec in decoder_plan(cfg):
        if kind == CONV:
            shapes.append((CONV, (_conv_cache_len(spec), int(spec["in"]))))
        elif kind == CONVT:
            shapes.append(
                (CONVT, (int(spec["k"]) - int(spec["stride"]), int(spec["out"])))
            )
        elif kind == RESNET:
            for cs in spec["convs"]:
                shapes.append((CONV, (_conv_cache_len(cs), int(cs["in"]))))
    return shapes


def init_mimi_stream_state(
    cfg: MimiConfig, batch: int, dtype=jnp.float32
) -> MimiStreamState:
    w = int(cfg.sliding_window)
    heads = int(cfg.num_key_value_heads)
    hd = int(cfg.head_dim)
    n_layers = int(cfg.num_hidden_layers)
    us = upsample_spec(cfg)
    return MimiStreamState(
        pos=jnp.int32(0),
        kv_k=tuple(jnp.zeros((batch, heads, w, hd), dtype) for _ in range(n_layers)),
        kv_v=tuple(jnp.zeros((batch, heads, w, hd), dtype) for _ in range(n_layers)),
        kv_pos=jnp.full((w,), -(10 ** 9), jnp.int32),
        upsample_carry=jnp.zeros(
            (batch, int(us["k"]) - int(us["stride"]), int(us["out"])), dtype
        ),
        conv_caches=tuple(
            jnp.zeros((batch, length, ch), dtype)
            for _, (length, ch) in _plan_cache_shapes(cfg)
        ),
    )


# --------------------------------------------------------------------------
# streaming transformer
# --------------------------------------------------------------------------


def _stream_transformer(
    p: Params,
    cfg: MimiConfig,
    x: jnp.ndarray,
    state: MimiStreamState,
) -> Tuple[jnp.ndarray, MimiStreamState]:
    """Chunk of m tokens through all layers with the ring KV cache.
    Any chunk size works, including m > sliding_window."""
    b, m, _ = x.shape
    w = int(cfg.sliding_window)
    q_pos = state.pos + jnp.arange(m, dtype=jnp.int32)
    cos, sin = rope_cos_sin(q_pos, cfg.head_dim, cfg.rope_theta)

    # Attend against [ring keys (all older than the chunk) ++ in-chunk keys],
    # and only write the chunk's tail into the ring afterwards — writing
    # first would overwrite old keys that early chunk queries still need.
    tail = max(m - w, 0)  # only the last min(m, w) chunk keys survive anyway
    tail_pos = q_pos[tail:]
    slots = jnp.mod(tail_pos, w)
    kv_pos = state.kv_pos.at[slots].set(tail_pos)

    # bias [m, W + m]: key j visible to query q iff 0 <= q_pos - k_pos < W
    k_pos = jnp.concatenate([state.kv_pos, q_pos])
    diff = q_pos[:, None] - k_pos[None, :]
    bias = jnp.where((diff >= 0) & (diff < w), 0.0, -jnp.inf).astype(jnp.float32)

    scale = 1.0 / math.sqrt(cfg.head_dim)
    new_k, new_v = [], []
    for lp, k_ring, v_ring in zip(p["layers"], state.kv_k, state.kv_v):
        h = _layernorm(lp["ln1"], x, cfg.norm_eps)
        q = apply_rope(_split_heads(h @ lp["q"]["w"], cfg.num_attention_heads), cos, sin)
        k = apply_rope(_split_heads(h @ lp["k"]["w"], cfg.num_key_value_heads), cos, sin)
        v = _split_heads(h @ lp["v"]["w"], cfg.num_key_value_heads)

        k_all = jnp.concatenate([k_ring, k], axis=2)  # [B, H, W+m, hd]
        v_all = jnp.concatenate([v_ring, v], axis=2)
        new_k.append(k_ring.at[:, :, slots].set(k[:, :, tail:]))
        new_v.append(v_ring.at[:, :, slots].set(v[:, :, tail:]))

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk",
            q.astype(jnp.float32),
            k_all.astype(jnp.float32),
        ) * scale + bias[None, None]
        a = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhqk,bhkd->bhqd", a, v_all.astype(x.dtype))
        x = x + lp["scale_attn"].astype(x.dtype) * (_merge_heads(a) @ lp["o"]["w"])

        h = _layernorm(lp["ln2"], x, cfg.norm_eps)
        h = jax.nn.gelu(h @ lp["fc1"]["w"], approximate=False) @ lp["fc2"]["w"]
        x = x + lp["scale_mlp"].astype(x.dtype) * h

    return x, state._replace(
        pos=state.pos + m,
        kv_k=tuple(new_k),
        kv_v=tuple(new_v),
        kv_pos=kv_pos,
    )


# --------------------------------------------------------------------------
# streaming SEANet decoder
# --------------------------------------------------------------------------


def _stream_decoder(
    params: List[Params],
    cfg: MimiConfig,
    x: jnp.ndarray,
    caches: Tuple[jnp.ndarray, ...],
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
    new_caches = list(caches)
    ci = 0
    for p, (kind, spec) in zip(params, decoder_plan(cfg)):
        if kind == CONV:
            x, new_caches[ci] = stream_conv(p, x, caches[ci], spec)
            ci += 1
        elif kind == CONVT:
            x, new_caches[ci] = stream_convt(p, x, caches[ci], spec)
            ci += 1
        elif kind == RESNET:
            r = x
            h = x
            for cp, cs in zip(p["convs"], spec["convs"]):
                h, new_caches[ci] = stream_conv(cp, _elu(h), caches[ci], cs)
                ci += 1
            x = r + h
        elif kind == ELU:
            x = _elu(x)
    return x, tuple(new_caches)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------


def mimi_decode_step(
    p: Params,
    cfg: MimiConfig,
    codes_btq: jnp.ndarray,
    state: MimiStreamState,
) -> Tuple[jnp.ndarray, MimiStreamState]:
    """Decode a chunk of n frames -> exactly n*hop_length new samples.

    codes [B, n, Q]; returns (wav [B, n*hop], new state). Chunks of the same
    n reuse one jit compilation; different n's compile separately.
    """
    emb = rvq_decode(p["quantizer"], codes_btq)  # [B, n, H]
    emb, up_carry = stream_convt(
        p["upsample"], emb, state.upsample_carry, upsample_spec(cfg)
    )  # [B, 2n, H]
    state = state._replace(upsample_carry=up_carry)
    emb, state = _stream_transformer(p["dec_tf"], cfg, emb, state)
    wav, conv_caches = _stream_decoder(p["decoder"], cfg, emb, state.conv_caches)
    state = state._replace(conv_caches=conv_caches)
    return wav[..., 0], state
