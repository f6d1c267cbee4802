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
    """Fully per-row streaming state: rows may sit at different stream
    positions (continuous-batching vocoder) and can be frozen per tick via
    the `mask` argument of mimi_decode_step."""

    pos: jnp.ndarray  # [B] i32: transformer tokens decoded so far per row
    kv_k: Tuple[jnp.ndarray, ...]  # per layer [B, H, W, hd]
    kv_v: Tuple[jnp.ndarray, ...]
    kv_pos: jnp.ndarray  # [B, W] absolute position stored in each ring slot
    upsample_carry: jnp.ndarray  # [B, k-s, hidden], bias-free partial sums
    conv_caches: Tuple[jnp.ndarray, ...]  # flattened per-plan-entry caches
    # rolling buffer of the last `required_halo` post-transformer frames:
    # the fused Pallas SEANet kernel's entire left-context state (the whole
    # causal conv stack's receptive field is `halo` 25 Hz frames, see
    # codec/pallas_vocoder.required_halo). Maintained on the XLA path too,
    # so states are interchangeable between the two vocoder paths.
    emb_hist: jnp.ndarray  # [B, halo, hidden]


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
    with a bias-free overlap-add carry [B, k-s, C_out].

    Same polyphase fast path as mimi_jax.mimi_convt for k == 2s ungrouped
    kernels: the in-chunk output is one dense matmul, and the carry is the
    last frame's "previous-frame" product w[s-1-r] . x[n-1]."""
    k, stride = int(spec["k"]), int(spec["stride"])
    groups = int(spec.get("groups", 1))
    n = x.shape[1]
    ov = k - stride
    cin = int(spec.get("in", 0))
    cout = int(spec.get("out", 0))
    if groups == 1 and stride > 1 and k == 2 * stride:
        from sopro_tpu.codec.mimi_jax import _convt_polyphase

        emit = _convt_polyphase(p["w"], x, stride)  # [B, n*s, C_out]
        w_prev = p["w"][stride - 1 - jnp.arange(stride)]  # [s, C_in, C_out]
        new_carry = jnp.einsum(
            "bc,scd->bsd", x[:, -1], w_prev.astype(x.dtype)
        )  # [B, k-s, C_out]
    elif groups == cin == cout and stride > 1 and k == 2 * stride:
        from sopro_tpu.codec.mimi_jax import _convt_polyphase_depthwise

        emit = _convt_polyphase_depthwise(p["w"], x, stride)
        # depthwise carry: w[s-1-r, 0, c] * x[n-1, c], shape [B, s=k-s, C]
        w_prev = p["w"][stride - 1 - jnp.arange(stride), 0]  # [s, C]
        new_carry = x[:, -1, None, :] * w_prev[None].astype(x.dtype)
    else:
        raw = _conv_nhc(x, p["w"], stride=1, lhs_dilation=stride,
                        pad=(k - 1, k - 1), groups=groups)  # [B, n*s+(k-s), C]
        emit = raw[:, : n * stride]
        new_carry = raw[:, n * stride:]
    emit = emit.at[:, :ov].add(carry)
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
        pos=jnp.zeros((batch,), jnp.int32),
        kv_k=tuple(jnp.zeros((batch, heads, w, hd), dtype) for _ in range(n_layers)),
        kv_v=tuple(jnp.zeros((batch, heads, w, hd), dtype) for _ in range(n_layers)),
        kv_pos=jnp.full((batch, w), -(10 ** 9), jnp.int32),
        upsample_carry=jnp.zeros(
            (batch, int(us["k"]) - int(us["stride"]), int(us["out"])), dtype
        ),
        conv_caches=tuple(
            jnp.zeros((batch, length, ch), dtype)
            for _, (length, ch) in _plan_cache_shapes(cfg)
        ),
        emb_hist=jnp.zeros(
            (batch, _stream_halo(cfg), int(us["out"])), dtype
        ),
    )


def _stream_halo(cfg: MimiConfig) -> int:
    from sopro_tpu.codec.pallas_vocoder import required_halo

    return required_halo(cfg)


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
    q_pos = state.pos[:, None] + jnp.arange(m, dtype=jnp.int32)[None]  # [B, m]
    cos, sin = jax.vmap(
        lambda pos: rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
    )(q_pos)  # [B, m, hd] each

    def rope(t):  # t [B, H, m, hd]
        c = cos[:, None].astype(t.dtype)
        s = sin[:, None].astype(t.dtype)
        from sopro_tpu.codec.mimi_jax import _rotate_half

        return t * c + _rotate_half(t) * s

    # Attend against [ring keys (all older than the chunk) ++ in-chunk keys],
    # and only write the chunk's tail into the ring afterwards — writing
    # first would overwrite old keys that early chunk queries still need.
    tail = max(m - w, 0)  # only the last min(m, w) chunk keys survive anyway
    tail_pos = q_pos[:, tail:]  # [B, mt]
    slots = jnp.mod(tail_pos, w)
    b_idx = jnp.arange(b)[:, None]
    kv_pos = state.kv_pos.at[b_idx, slots].set(tail_pos)

    # bias [B, m, W + m]: key j visible to query q iff 0 <= q_pos - k_pos < W
    k_pos = jnp.concatenate([state.kv_pos, q_pos], axis=1)  # [B, W+m]
    diff = q_pos[:, :, None] - k_pos[:, None, :]
    bias = jnp.where((diff >= 0) & (diff < w), 0.0, -jnp.inf).astype(jnp.float32)

    scale = 1.0 / math.sqrt(cfg.head_dim)
    new_k, new_v = [], []
    for lp, k_ring, v_ring in zip(p["layers"], state.kv_k, state.kv_v):
        h = _layernorm(lp["ln1"], x, cfg.norm_eps)
        q = rope(_split_heads(h @ lp["q"]["w"], cfg.num_attention_heads))
        k = rope(_split_heads(h @ lp["k"]["w"], cfg.num_key_value_heads))
        v = _split_heads(h @ lp["v"]["w"], cfg.num_key_value_heads)

        k_all = jnp.concatenate([k_ring, k], axis=2)  # [B, H, W+m, hd]
        v_all = jnp.concatenate([v_ring, v], axis=2)
        new_k.append(_ring_write(k_ring, k[:, :, tail:], slots))
        new_v.append(_ring_write(v_ring, v[:, :, tail:], slots))

        # bf16 MXU with fp32 accumulation == fp32-cast matmul for bf16
        # inputs (see mimi_jax.transformer_layer), without the fp32 copies
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k_all,
            preferred_element_type=jnp.float32,
        ) * scale + bias[:, None]
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


def _ring_write(ring: jnp.ndarray, vals: jnp.ndarray, slots: jnp.ndarray) -> jnp.ndarray:
    """ring [B, H, W, hd] <- vals [B, H, mt, hd] at per-row slots [B, mt]."""
    return jax.vmap(lambda r, v, s: r.at[:, s].set(v))(ring, vals, slots)


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
    mask: jnp.ndarray | None = None,
    slabs: Params | None = None,
) -> Tuple[jnp.ndarray, MimiStreamState]:
    """Decode a chunk of n frames -> exactly n*hop_length new samples.

    codes [B, n, Q]; returns (wav [B, n*hop], new state). Chunks of the same
    n reuse one jit compilation; different n's compile separately.

    `mask` [B] bool (continuous batching): rows with False keep their state
    untouched and their output row is meaningless — the scheduler advances
    only the sessions that emitted this tick.

    `slabs` (packed kernel weights from pallas_vocoder.pack_seanet_decoder):
    run the SEANet stage as the fused Pallas kernel over
    [emb_hist ++ chunk] instead of the per-conv XLA streaming decoder —
    same samples (valid-region exactness), one kernel instead of ~20
    HBM-round-tripping convs. The serving tick's device time is dominated
    by this stage (reference counterpart: Mimi decode per chunk,
    src/sopro/codec/mimi.py:115-181).
    """
    prev = state
    emb = rvq_decode(p["quantizer"], codes_btq)  # [B, n, H]
    emb, up_carry = stream_convt(
        p["upsample"], emb, state.upsample_carry, upsample_spec(cfg)
    )  # [B, 2n, H]
    state = state._replace(upsample_carry=up_carry)
    emb, state = _stream_transformer(p["dec_tf"], cfg, emb, state)
    # rolling kernel left-context ([B, halo, H] — negligible next to the KV
    # rings). Maintained on the XLA path too, so a stream may switch
    # XLA->kernel mid-flight; the reverse is unsupported (the kernel path
    # leaves conv_caches at zero).
    ext = jnp.concatenate([state.emb_hist.astype(emb.dtype), emb], axis=1)
    halo = state.emb_hist.shape[1]
    state = state._replace(emb_hist=ext[:, ext.shape[1] - halo:])
    if slabs is not None:
        from sopro_tpu.codec.pallas_vocoder import seanet_decode_pallas_chunk

        wav = seanet_decode_pallas_chunk(slabs, cfg, ext)[..., None]
    else:
        wav, conv_caches = _stream_decoder(
            p["decoder"], cfg, emb, state.conv_caches
        )
        state = state._replace(conv_caches=conv_caches)
    if mask is not None:
        def freeze(new, old):
            m = mask.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        state = jax.tree.map(freeze, state, prev)
    return wav[..., 0], state


def reset_stream_rows(
    state: MimiStreamState, rows: jnp.ndarray
) -> MimiStreamState:
    """Zero the state of the given rows ([B] bool) — slot recycling when a
    serving session ends and a new one joins."""
    def z(leaf):
        m = rows.reshape((-1,) + (1,) * (leaf.ndim - 1))
        if leaf.dtype == jnp.int32 and leaf.ndim == 2:  # kv_pos sentinel
            return jnp.where(m, jnp.full_like(leaf, -(10 ** 9)), leaf)
        return jnp.where(m, jnp.zeros_like(leaf), leaf)

    return MimiStreamState(
        pos=jnp.where(rows, 0, state.pos),
        kv_k=tuple(z(x) for x in state.kv_k),
        kv_v=tuple(z(x) for x in state.kv_v),
        kv_pos=jnp.where(rows[:, None], -(10 ** 9), state.kv_pos),
        upsample_carry=z(state.upsample_carry),
        conv_caches=tuple(z(x) for x in state.conv_caches),
        emb_hist=z(state.emb_hist),
    )
