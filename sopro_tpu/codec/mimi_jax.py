"""Mimi codec forward paths as pure JAX functions (NHC layout).

Numerically re-creates `transformers.MimiModel.decode/encode`
(installed transformers: models/mimi/modeling_mimi.py; used by the reference
at src/sopro/codec/mimi.py:28-72) with a TPU-first structure:

* all activations are [B, T, C] so convs lower to `conv_general_dilated`
  with NHC/HIO dimension numbers (XLA's preferred TPU layout);
* transpose convs are expressed as lhs-dilated convs with pre-flipped
  kernels, so grouped transposes (the 512-group upsampler) hit the same
  conv path;
* the RVQ *decode* folds each codebook's output projection into the
  dequant table at load time, so dequantization is one gather + sum;
* attention runs with a sliding-window causal bias, softmax in float32.

The SEANet stacks are driven by static "layer plans" (mimi_config.py), so
the parameter pytree contains only arrays.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from sopro_tpu.codec.mimi_config import (
    CONV,
    CONVT,
    ELU,
    RESNET,
    MimiConfig,
    Plan,
    decoder_plan,
    downsample_spec,
    encoder_plan,
    upsample_spec,
)

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# causal convs (SEANet building blocks)
# --------------------------------------------------------------------------


def _conv_nhc(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    lhs_dilation: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride,),
        padding=(pad,),
        lhs_dilation=(lhs_dilation,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )


def causal_conv_padding(
    length: int, k: int, stride: int, dilation: int
) -> Tuple[int, int]:
    """(left, right) padding of Mimi's causal conv: left = effective kernel −
    stride, right = extra so the last window is complete
    (HF modeling_mimi.py MimiConv1d._get_extra_padding_for_conv1d/forward)."""
    k_eff = (k - 1) * dilation + 1
    padding_total = k_eff - stride
    n_frames = math.ceil((length - k_eff + padding_total) / stride + 1) - 1
    ideal = n_frames * stride + k_eff - padding_total
    return padding_total, max(ideal - length, 0)


def mimi_conv(p: Params, x: jnp.ndarray, spec: Dict[str, Any]) -> jnp.ndarray:
    """Causal Conv1d over [B, T, C_in] -> [B, T', C_out]."""
    k, stride, dil = int(spec["k"]), int(spec["stride"]), int(spec.get("dilation", 1))
    left, right = causal_conv_padding(x.shape[1], k, stride, dil)
    mode = spec.get("pad_mode", "constant")
    if mode == "replicate":
        x = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="edge")
    else:
        x = jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    y = _conv_nhc(x, p["w"], stride=stride, dilation=dil,
                  groups=int(spec.get("groups", 1)))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def mimi_convt(p: Params, x: jnp.ndarray, spec: Dict[str, Any]) -> jnp.ndarray:
    """Causal ConvTranspose1d over [B, T, C_in] -> [B, T*stride, C_out].

    Fast path (all SEANet-decoder upsamplers have k == 2*stride): polyphase
    decomposition. With the pre-flipped HIO kernel the lhs-dilated conv is
    y[n] = sum_j w[j] . x[(n + j - (k-1)) / s] (integer divisions only), so
    for k = 2s each output phase r takes exactly two input frames:

        y[m*s + r] = w[s-1-r] . x[m-1]  +  w[2s-1-r] . x[m]

    which is ONE dense [B*T, 2*C_in] @ [2*C_in, s*C_out] matmul — MXU-shaped,
    instead of an lhs-dilated conv whose input is (s-1)/s zeros. Bit-identical
    output ordering to the slow path (tested vs HF in test_mimi_parity).

    Slow path (grouped / other k): lhs-dilated conv with full padding, causal
    trim to T*s (trim_right_ratio=1.0, HF modeling_mimi.py
    MimiConvTranspose1d)."""
    k, stride = int(spec["k"]), int(spec["stride"])
    groups = int(spec.get("groups", 1))
    cin, cout = int(spec["in"]), int(spec["out"])
    if groups == 1 and stride > 1 and k == 2 * stride:
        y = _convt_polyphase(p["w"], x, stride)
    elif groups == cin == cout and stride > 1 and k == 2 * stride:
        y = _convt_polyphase_depthwise(p["w"], x, stride)
    else:
        y = _conv_nhc(x, p["w"], stride=1, lhs_dilation=stride,
                      pad=(k - 1, k - 1), groups=groups)
        y = y[:, : x.shape[1] * stride, :]
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _convt_polyphase(w: jnp.ndarray, x: jnp.ndarray, s: int) -> jnp.ndarray:
    """k=2s transpose conv as a single dense matmul (see mimi_convt)."""
    k, cin, cout = w.shape
    r = jnp.arange(s)
    w_prev = w[s - 1 - r]      # [s, C_in, C_out] -> multiplies x[m-1]
    w_curr = w[2 * s - 1 - r]  # [s, C_in, C_out] -> multiplies x[m]
    w2 = jnp.concatenate(
        [
            jnp.transpose(w_prev, (1, 0, 2)).reshape(cin, s * cout),
            jnp.transpose(w_curr, (1, 0, 2)).reshape(cin, s * cout),
        ],
        axis=0,
    ).astype(x.dtype)  # [2*C_in, s*C_out]
    b, t, _ = x.shape
    xprev = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :t]
    xx = jnp.concatenate([xprev, x], axis=-1)  # [B, T, 2*C_in]
    y = jnp.einsum("btc,cd->btd", xx, w2)
    return y.reshape(b, t * s, cout)


def _convt_polyphase_depthwise(
    w: jnp.ndarray, x: jnp.ndarray, s: int
) -> jnp.ndarray:
    """Fully-depthwise (groups == C) k=2s transpose conv as elementwise
    multiply-adds — the same polyphase identity as `_convt_polyphase` with a
    per-channel (diagonal) weight, so each output phase is

        y[m*s + r, c] = w[s-1-r, c] * x[m-1, c]  +  w[2s-1-r, c] * x[m, c]

    Mimi's 12.5->25 Hz upsampler (k=4, s=2, groups=hidden=512) otherwise
    takes the lhs-dilated *grouped* conv path, which XLA on TPU lowers far
    off the MXU; two VPU fmas replace it exactly."""
    k, _one, c = w.shape  # grouped HIO: [k, 1, C]
    r = jnp.arange(s)
    w_prev = w[s - 1 - r, 0].astype(x.dtype)      # [s, C] multiplies x[m-1]
    w_curr = w[2 * s - 1 - r, 0].astype(x.dtype)  # [s, C] multiplies x[m]
    b, t, _ = x.shape
    xprev = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :t]
    y = (
        xprev[:, :, None, :] * w_prev[None, None]
        + x[:, :, None, :] * w_curr[None, None]
    )  # [B, T, s, C]
    return y.reshape(b, t * s, c)


def _elu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.elu(x)


def seanet_apply(params: List[Params], plan: Plan, x: jnp.ndarray) -> jnp.ndarray:
    """Run a SEANet stack (encoder or decoder) over [B, T, C]."""
    for p, (kind, spec) in zip(params, plan):
        if kind == CONV:
            x = mimi_conv(p, x, spec)
        elif kind == CONVT:
            x = mimi_convt(p, x, spec)
        elif kind == RESNET:
            r = x
            h = x
            for cp, cs in zip(p["convs"], spec["convs"]):
                h = mimi_conv(cp, _elu(h), cs)
            x = r + h
        elif kind == ELU:
            x = _elu(x)
        else:  # pragma: no cover
            raise ValueError(f"unknown plan kind {kind}")
    return x


# --------------------------------------------------------------------------
# transformer (8 layers, RoPE, sliding-window causal, LayerScale)
# --------------------------------------------------------------------------


def rope_cos_sin(
    positions: jnp.ndarray, head_dim: int, theta: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions [T] -> (cos, sin) [T, head_dim] (HF MimiRotaryEmbedding)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, H, T, hd]; cos/sin [T, hd]."""
    c = cos[None, None].astype(x.dtype)
    s = sin[None, None].astype(x.dtype)
    return x * c + _rotate_half(x) * s


def _layernorm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, heads, d // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def sliding_causal_bias(
    q_pos: jnp.ndarray, k_pos: jnp.ndarray, window: int
) -> jnp.ndarray:
    """Additive bias [Tq, Tk]: allow keys with 0 <= q_pos - k_pos < window
    (HF sliding-window causal mask convention)."""
    diff = q_pos[:, None] - k_pos[None, :]
    ok = (diff >= 0) & (diff < window)
    return jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)


def transformer_layer(
    p: Params,
    cfg: MimiConfig,
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    bias: jnp.ndarray,
    kv_override: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """One pre-LN block with LayerScale residuals (HF MimiTransformerLayer).

    `kv_override`, when given, supplies externally managed (k, v) tensors
    (already RoPE'd) for streaming with a ring cache; `bias` must then match
    their key axis.
    """
    h = _layernorm(p["ln1"], x, cfg.norm_eps)
    q = _split_heads(h @ p["q"]["w"], cfg.num_attention_heads)
    q = apply_rope(q, cos, sin)
    if kv_override is None:
        k = _split_heads(h @ p["k"]["w"], cfg.num_key_value_heads)
        v = _split_heads(h @ p["v"]["w"], cfg.num_key_value_heads)
        k = apply_rope(k, cos, sin)
    else:
        k, v = kv_override
    scale = 1.0 / math.sqrt(cfg.head_dim)
    # bf16 MXU passes with fp32 accumulation: for bf16 inputs this is
    # bit-identical to casting q/k to fp32 first (bf16 products are exact in
    # fp32) but skips the fp32 Q/K copies and the fp32 matmul lowering
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    logits = logits + bias[None, None]
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    a = jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(x.dtype))
    a = _merge_heads(a) @ p["o"]["w"]
    x = x + p["scale_attn"].astype(x.dtype) * a

    h = _layernorm(p["ln2"], x, cfg.norm_eps)
    h = jax.nn.gelu(h @ p["fc1"]["w"], approximate=False) @ p["fc2"]["w"]
    return x + p["scale_mlp"].astype(x.dtype) * h


def mimi_transformer(
    p: Params, cfg: MimiConfig, x: jnp.ndarray, positions: jnp.ndarray
) -> jnp.ndarray:
    """Full-sequence transformer [B, T, D] with sliding-window causal mask
    (HF MimiTransformerModel.forward)."""
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    bias = sliding_causal_bias(positions, positions, cfg.sliding_window)
    for lp in p["layers"]:
        x = transformer_layer(lp, cfg, x, cos, sin, bias)
    return x


# --------------------------------------------------------------------------
# residual vector quantizer
# --------------------------------------------------------------------------


def rvq_decode(q: Params, codes_btq: jnp.ndarray) -> jnp.ndarray:
    """codes [B, T, Q] -> embeddings [B, T, hidden].

    Uses the load-time-folded tables `dec_embed` [Q, V, hidden] (each
    codebook's centroids premultiplied by its split's output projection), so
    dequantization is Q per-codebook gathers accumulated in place —
    equivalent to HF MimiSplitResidualVectorQuantizer.decode. One flattened
    [B, T, Q]-index gather + sum materializes a [B, T, Q, H] intermediate
    (158 MB bf16 at the batch-32 decode shape) through HBM; the unrolled
    per-codebook form measures 2x faster on v5e (2.56 -> 1.29 ms,
    benchmarks/probe_gather.py)."""
    nq = codes_btq.shape[-1]
    dec = q["dec_embed"][:nq]  # [Q, V, H]
    # clamp defensively: an out-of-vocab id (e.g. a leaked EOS) must degrade
    # gracefully, not poison the stream state with NaN fill values
    codes = jnp.clip(codes_btq, 0, dec.shape[1] - 1)
    out = jnp.take(dec[0], codes[:, :, 0], axis=0)
    for i in range(1, nq):
        out = out + jnp.take(dec[i], codes[:, :, i], axis=0)
    return out


def _nearest_code(embed_vd: jnp.ndarray, x_btd: jnp.ndarray) -> jnp.ndarray:
    """argmin_v ||x - e_v||^2 == argmax_v (2 x.e_v - ||e_v||^2)."""
    x32 = x_btd.astype(jnp.float32)
    e32 = embed_vd.astype(jnp.float32)
    score = 2.0 * jnp.einsum("btd,vd->btv", x32, e32) - jnp.sum(
        e32 * e32, axis=-1
    )[None, None, :]
    return jnp.argmax(score, axis=-1).astype(jnp.int32)


def rvq_encode(
    q: Params, cfg: MimiConfig, emb_btd: jnp.ndarray,
    num_quantizers: Optional[int] = None,
) -> jnp.ndarray:
    """embeddings [B, T, hidden] -> codes [B, T, Q]
    (HF MimiSplitResidualVectorQuantizer.encode: semantic RVQ on the raw
    embedding, acoustic RVQ *also* on the raw embedding — the splits do not
    share residuals)."""
    nq = int(num_quantizers or cfg.num_quantizers)
    ns = int(cfg.num_semantic_quantizers)
    codes = []

    def run_rvq(in_proj, embeds, n):
        res = jnp.einsum("btd,dc->btc", emb_btd, in_proj)
        out = []
        for i in range(n):
            idx = _nearest_code(embeds[i], res)
            quant = jnp.take(embeds[i], idx, axis=0)
            res = res - quant
            out.append(idx)
        return out

    codes += run_rvq(q["in_proj_sem"], q["embed"][:ns], ns)
    if nq > ns:
        codes += run_rvq(q["in_proj_ac"], q["embed"][ns:], nq - ns)
    return jnp.stack(codes, axis=-1)


# --------------------------------------------------------------------------
# end-to-end decode / encode
# --------------------------------------------------------------------------


def mimi_decode(
    p: Params, cfg: MimiConfig, codes_btq: jnp.ndarray,
    positions: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """codes [B, T, Q] -> waveform [B, T*hop] (HF MimiModel._decode_frame:
    RVQ dequant -> grouped transpose-conv upsample -> decoder transformer ->
    SEANet decoder)."""
    emb = rvq_decode(p["quantizer"], codes_btq)  # [B, T, H]
    emb = mimi_convt(p["upsample"], emb, upsample_spec(cfg))  # [B, 2T, H]
    if positions is None:
        positions = jnp.arange(emb.shape[1])
    emb = mimi_transformer(p["dec_tf"], cfg, emb, positions)
    wav = seanet_apply(p["decoder"], decoder_plan(cfg), emb)  # [B, S, 1]
    return wav[..., 0]


def mimi_encode(
    p: Params, cfg: MimiConfig, wav_bs: jnp.ndarray,
    num_quantizers: Optional[int] = None,
) -> jnp.ndarray:
    """waveform [B, S] -> codes [B, T, Q] (HF MimiModel._encode_frame:
    SEANet encoder -> encoder transformer -> stride-2 downsample -> RVQ)."""
    x = wav_bs[..., None]  # [B, S, 1]
    x = seanet_apply(p["encoder"], encoder_plan(cfg), x)  # [B, T25, H]
    x = mimi_transformer(p["enc_tf"], cfg, x, jnp.arange(x.shape[1]))
    x = mimi_conv(p["downsample"], x, downsample_spec(cfg))  # [B, T12.5, H]
    return rvq_encode(p["quantizer"], cfg, x, num_quantizers)
