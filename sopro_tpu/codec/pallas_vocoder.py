"""Pallas TPU kernel: the SEANet decoder (Mimi vocoder) as one fused,
time-tiled kernel.

The SEANet decoder turns 25 Hz embeddings into 24 kHz waveform through 4
upsampling stages (x8 x6 x5 x4), each a transpose conv + residual block,
bracketed by k=7 and k=3 convs (HF modeling_mimi.py MimiDecoder; our XLA
plan: codec/mimi_config.py decoder_plan). On the XLA path this costs
~11.7 ms on-chip for 32 s of audio on v5e — ~6x the bandwidth floor —
because every stage round-trips its activations (up to [770k, 64]) through
HBM and every causal pad copies the tensor.

Here ONE pallas_call runs the whole stack: the grid walks output tiles of
TILE 25 Hz frames; every weight slab is VMEM-resident across tiles
(constant index_map — fetched once, ~30 MB bf16); each tile recomputes all
stages for its slice in VMEM and writes only its waveform samples to HBM.
Per-tile left context works because every decoder conv is CAUSAL with
constant zero padding: a HALO of 8 extra input frames provides exactly the
receptive field of the whole stack (the "valid-region" arithmetic below:
e0=8 -> conv7 e=2 -> x8 e=8 -> res e=6 -> x6 e=30 -> res e=28 -> x5 e=135
-> res e=133 -> x4 e=528 -> res e=526 -> final k3 e=524; 524 + TILE*960
samples = exactly the tile's valid output).

Transpose convs use the same polyphase-matmul identity as the XLA path
(mimi_jax.mimi_convt: k = 2*stride => y[m*s+r] = w[s-1-r]@x[m-1] +
w[2s-1-r]@x[m], one dense [T, 2*Cin] @ [2*Cin, s*Cout] matmul), with the
packed weight assembled host-side by `pack_seanet_decoder`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sopro_tpu.codec.mimi_config import (
    CONV, CONVT, ELU, RESNET, MimiConfig, decoder_plan,
)

Params = Dict[str, Any]

TILE = 64  # 25 Hz frames of output per grid step


def required_halo(cfg: MimiConfig) -> int:
    """Left-context frames (at the decoder-input rate) a tile needs so the
    whole causal stack's receptive field is covered: walk the plan
    backwards (conv k consumes k-1; transpose conv s consumes
    ceil(need/s)+1). For the production config (k7, ratios 8/6/5/4, res k3)
    this is 8."""
    import math

    need = int(cfg.last_kernel_size) - 1
    for ratio in reversed(cfg.upsampling_ratios):
        need += (int(cfg.residual_kernel_size) - 1)
        need = math.ceil(need / int(ratio)) + 1
    return need + int(cfg.kernel_size) - 1


def _poly_pack(w: jnp.ndarray, s: int) -> jnp.ndarray:
    """[k=2s, Cin, Cout] transpose-conv kernel -> [2*Cin, s*Cout] polyphase
    matrix (same layout as mimi_jax._convt_polyphase)."""
    k, cin, cout = w.shape
    r = jnp.arange(s)
    w_prev = w[s - 1 - r]
    w_curr = w[2 * s - 1 - r]
    return jnp.concatenate(
        [
            jnp.transpose(w_prev, (1, 0, 2)).reshape(cin, s * cout),
            jnp.transpose(w_curr, (1, 0, 2)).reshape(cin, s * cout),
        ],
        axis=0,
    )


def pack_seanet_decoder(dec_params, cfg: MimiConfig) -> Params:
    """Decoder param list (parallel to decoder_plan) -> kernel slabs.

    Conv kernels become unfold-ready [k*Cin, Cout]; transpose convs become
    polyphase [2*Cin, s*Cout] with the bias tiled per phase. The LAST stage
    (C=64 < one 128-lane tile — Mosaic cannot shape-cast to <128 lanes) is
    re-expressed in a packed-2 layout (2 samples x 64 ch per row): its
    residual block becomes block-banded [128, 128] matrices over
    (current row, previous row), and the final k=3 conv becomes two
    [128, 2] matmuls emitting (even, odd) sample columns."""
    plan = decoder_plan(cfg)
    n_stages = len(cfg.upsampling_ratios)
    slabs: Params = {}
    stage = 0
    for p, (kind, spec) in zip(dec_params, plan):
        if kind == CONV:
            k, cin, cout = p["w"].shape
            if "conv0_w" not in slabs:
                slabs["conv0_w"] = p["w"].reshape(k * cin, cout)
                slabs["conv0_b"] = p["b"][None]
            else:
                slabs["_fin_w"] = p["w"]  # [k, C, 1]; packed below
                slabs["_fin_b"] = p["b"]
        elif kind == CONVT:
            s = int(spec["stride"])
            slabs[f"up{stage}_w"] = _poly_pack(p["w"], s)
            slabs[f"up{stage}_b"] = jnp.tile(p["b"], (s,))[None]
        elif kind == RESNET:
            c3, c1 = p["convs"]
            k, cin, ch = c3["w"].shape
            if stage < n_stages - 1:
                slabs[f"res{stage}_w3"] = c3["w"].reshape(k * cin, ch)
                slabs[f"res{stage}_b3"] = c3["b"][None]
                slabs[f"res{stage}_w1"] = c1["w"][0]  # [Ch, C]
                slabs[f"res{stage}_b1"] = c1["b"][None]
            else:
                slabs.update(_pack_tail_resnet(c3, c1, k, cin, ch))
            stage += 1
    slabs.update(_pack_tail_final(slabs.pop("_fin_w"), slabs.pop("_fin_b")))
    return slabs


def _pack_tail_resnet(c3, c1, k: int, c: int, ch: int) -> Params:
    """Last-stage residual block in packed-2 form. Hidden ch pads to 2*ch so
    the packed hidden row is 2*(2*ch) = 128 lanes for the production c=64,
    ch=32. Sample 2m ('phase 0') taps x[2m-2..2m]; sample 2m+1 taps
    x[2m-1..2m+1] (k=3, dilation 1)."""
    assert k == 3
    w = np.asarray(c3["w"], np.float32)  # [3, C, Ch]
    hp = 2 * ch  # padded hidden per sample
    A = np.zeros((2 * c, 2 * hp), np.float32)  # current packed row
    B = np.zeros((2 * c, 2 * hp), np.float32)  # previous packed row
    # h_ph0 (sample 2m): taps 2m-2 (prev ph0, w0), 2m-1 (prev ph1, w1),
    #                    2m   (curr ph0, w2)
    B[:c, :ch] = w[0]
    B[c:, :ch] = w[1]
    A[:c, :ch] = w[2]
    # h_ph1 (sample 2m+1): taps 2m-1 (prev ph1, w0), 2m (curr ph0, w1),
    #                      2m+1 (curr ph1, w2)
    B[c:, hp: hp + ch] = w[0]
    A[:c, hp: hp + ch] = w[1]
    A[c:, hp: hp + ch] = w[2]
    b3 = np.asarray(c3["b"], np.float32)
    b3p = np.concatenate([b3, np.zeros(hp - ch, np.float32)] * 2)[None]
    w1 = np.asarray(c1["w"][0], np.float32)  # [Ch, C]
    w1p = np.zeros((hp, c), np.float32)
    w1p[:ch] = w1
    C1 = np.zeros((2 * hp, 2 * c), np.float32)
    C1[:hp, :c] = w1p
    C1[hp:, c:] = w1p
    b1 = np.asarray(c1["b"], np.float32)
    return {
        "tail_A": jnp.asarray(A), "tail_B": jnp.asarray(B),
        "tail_b3": jnp.asarray(b3p),
        "tail_C1": jnp.asarray(C1),
        "tail_b1": jnp.asarray(np.tile(b1, 2)[None]),
    }


GROUP = 64  # packed-2 rows per regrouped output row (= 128 samples)


def _pack_tail_final(w, b) -> Params:
    """Final k=3 conv (C -> 1) over a regrouped layout: GROUP packed-2 rows
    (128 samples) flatten into one [2C*GROUP]-lane row, and output sample p
    of a row is a banded contraction over samples p-2..p — i.e. TWO dense
    matmuls Y[R] = Xg[R] @ Gc + Xg[R-1] @ Gp with [2C*GROUP, 128] slabs
    (Gp only touches the previous row's last two samples, for p < 2).
    Mosaic cannot build <128-lane vectors, so this keeps every shape at
    full lane tiles."""
    w = np.asarray(w, np.float32)  # [3, C, 1]
    k, c, _ = w.shape
    assert k == 3
    lanes = 2 * c * GROUP
    n_s = 2 * GROUP  # samples per regrouped row
    Gc = np.zeros((lanes, n_s), np.float32)
    Gp = np.zeros((lanes, n_s), np.float32)
    for p in range(n_s):
        for j in range(k):
            s = p - (k - 1) + j
            if s >= 0:
                Gc[s * c: (s + 1) * c, p] = w[j, :, 0]
            else:
                Gp[(n_s + s) * c: (n_s + s + 1) * c, p] = w[j, :, 0]
    return {
        "fin_Gc": jnp.asarray(Gc), "fin_Gp": jnp.asarray(Gp),
        "fin_b": jnp.asarray(
            np.full((1, n_s), np.float32(b[0]), np.float32)
        ),
    }


def _elu(x):
    # jax.nn.elu lowers through expm1, which Mosaic lacks; exp(x) - 1 is
    # equivalent to well under bf16 resolution on the negative branch.
    # Compare/select in f32: v5e has no bf16 vector compare.
    xf = x.astype(jnp.float32)
    return jnp.where(xf > 0.0, xf, jnp.exp(xf) - 1.0).astype(x.dtype)


def _vconv(x, w_ref, b_ref, k: int):
    """Valid-mode causal conv: x [T, Cin] -> [T-(k-1), Cout] as a sum of k
    per-tap matmuls against the [k*Cin, Cout] slab's row blocks (Mosaic
    cannot concatenate slices with different sublane offsets, so the
    unfold-then-one-matmul form does not lower)."""
    t, cin = x.shape
    acc = None
    for j in range(k):
        xj = x[j: t - (k - 1) + j, :]
        wj = w_ref[j * cin: (j + 1) * cin, :]
        y = jnp.dot(xj, wj, preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    return (acc + b_ref[...].astype(jnp.float32)).astype(x.dtype)


def _vconvt(x, w_ref, b_ref, s: int):
    """Valid-mode polyphase transpose conv: x [T, Cin] -> [(T-1)*s, Cout]
    (output block j uses input rows j, j+1); two per-tap matmuls."""
    t, cin = x.shape
    y = (
        jnp.dot(x[: t - 1, :], w_ref[:cin, :],
                preferred_element_type=jnp.float32)
        + jnp.dot(x[1:, :], w_ref[cin:, :],
                  preferred_element_type=jnp.float32)
    )
    y = (y + b_ref[...].astype(jnp.float32)).astype(x.dtype)
    cout = w_ref.shape[1] // s
    return y.reshape((t - 1) * s, cout)


def _seanet_kernel(
    cfg: MimiConfig,
    halo: int,
    tile: int,
    # inputs
    x_ref,
    conv0_w, conv0_b,
    up0_w, up0_b, res0_w3, res0_b3, res0_w1, res0_b1,
    up1_w, up1_b, res1_w3, res1_b3, res1_w1, res1_b1,
    up2_w, up2_b, res2_w3, res2_b3, res2_w1, res2_b1,
    up3_w, up3_b, tail_A, tail_B, tail_b3, tail_C1, tail_b1,
    fin_Gc, fin_Gp, fin_b,
    # output
    out_ref,  # [1, TILE*hop25//128, 128]: 128 consecutive samples per row
):
    i = pl.program_id(1)  # tile index (grid dim 0 is the batch row)
    start = pl.multiple_of(i * tile, 8)
    h = x_ref[0, pl.ds(start, tile + halo), :]

    h = _vconv(h, conv0_w, conv0_b, int(cfg.kernel_size))

    ups = [
        (up0_w, up0_b, res0_w3, res0_b3, res0_w1, res0_b1),
        (up1_w, up1_b, res1_w3, res1_b3, res1_w1, res1_b1),
        (up2_w, up2_b, res2_w3, res2_b3, res2_w1, res2_b1),
    ]
    for ratio, (uw, ub, w3, b3, w1, b1) in zip(
        cfg.upsampling_ratios[:-1], ups
    ):
        h = _vconvt(_elu(h), uw, ub, int(ratio))
        r = h[2:, :]
        y = _vconv(_elu(h), w3, b3, int(cfg.residual_kernel_size))
        y = jnp.dot(_elu(y), w1[...],
                    preferred_element_type=jnp.float32)
        y = (y + b1[...].astype(jnp.float32)).astype(h.dtype)
        h = r + y

    # ---- last stage in packed-2 layout (2 samples x C ch = 128 lanes) ----
    s_last = int(cfg.upsampling_ratios[-1])
    t, cin_l = h.shape
    eh = _elu(h)
    y = (
        jnp.dot(eh[: t - 1, :], up3_w[:cin_l, :],
                preferred_element_type=jnp.float32)
        + jnp.dot(eh[1:, :], up3_w[cin_l:, :],
                  preferred_element_type=jnp.float32)
    )
    y = (y + up3_b[...].astype(jnp.float32)).astype(h.dtype)
    cout = up3_w.shape[1] // s_last
    # [T', s*C] -> packed-2 [T'*s/2, 2*C] (target lanes 2*C = 128)
    x2 = y.reshape((t - 1) * s_last // 2, 2 * cout)

    e2 = _elu(x2)
    h2 = (
        jnp.dot(e2[1:, :], tail_A[...], preferred_element_type=jnp.float32)
        + jnp.dot(e2[:-1, :], tail_B[...],
                  preferred_element_type=jnp.float32)
        + tail_b3[...].astype(jnp.float32)
    ).astype(x2.dtype)
    h2 = (
        jnp.dot(_elu(h2), tail_C1[...], preferred_element_type=jnp.float32)
        + tail_b1[...].astype(jnp.float32)
    ).astype(x2.dtype)
    x3 = x2[1:, :] + h2

    # final k=3 conv over the regrouped layout: the tile's output is the
    # LAST (rows+1)*GROUP packed-2 rows (one GROUP of left context)
    e3 = _elu(x3)
    rows = out_ref.shape[1]
    need = (rows + 1) * GROUP
    start3 = e3.shape[0] - need
    xg = e3[start3:, :].reshape(rows + 1, GROUP * e3.shape[1])
    y = (
        jnp.dot(xg[1:, :], fin_Gc[...], preferred_element_type=jnp.float32)
        + jnp.dot(xg[:-1, :], fin_Gp[...],
                  preferred_element_type=jnp.float32)
        + fin_b[...].astype(jnp.float32)
    ).astype(x2.dtype)  # [rows, 128]
    out_ref[...] = y[None]


def pallas_vocoder_supported(cfg: MimiConfig) -> bool:
    """True when the kernel's layout assumptions hold for this config:
    every stage's lane dim is a whole number of 128-lane tiles, one
    residual block per stage, k=3 residual/final convs, and the tile's
    sample count divides into 128-sample output rows."""
    lanes_ok = (2 * int(cfg.num_filters)) % 128 == 0
    hop = 1
    for r in cfg.upsampling_ratios:
        hop *= int(r)
    return (
        lanes_ok
        and len(cfg.upsampling_ratios) == 4
        and int(cfg.num_residual_layers) == 1
        and int(cfg.residual_kernel_size) == 3
        and int(cfg.last_kernel_size) == 3
        and (TILE * hop) % 128 == 0
        and int(cfg.audio_channels) == 1
    )


def mimi_decode_with_slabs(
    p: Params,
    slabs: Params,
    cfg: MimiConfig,
    codes_btq: jnp.ndarray,
    positions=None,
) -> jnp.ndarray:
    """mimi_jax.mimi_decode with the SEANet stage replaced by the fused
    Pallas kernel: codes [B, T, Q] -> wav [B, T*hop].
    Measured 3.24 vs 14.93 ms on-chip for B=1, 32 s of audio on v5e-1."""
    from sopro_tpu.codec.mimi_jax import (
        mimi_convt, mimi_transformer, rvq_decode, upsample_spec,
    )

    emb = rvq_decode(p["quantizer"], codes_btq)
    emb = mimi_convt(p["upsample"], emb, upsample_spec(cfg))
    if positions is None:
        positions = jnp.arange(emb.shape[1])
    emb = mimi_transformer(p["dec_tf"], cfg, emb, positions)
    return seanet_decode_pallas(slabs, cfg, emb)


def seanet_decode_pallas(
    slabs: Params,
    cfg: MimiConfig,
    emb: jnp.ndarray,  # [B, T25, H] (post-upsample, post-transformer)
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """SEANet decode -> wav [B, T25 * hop25] (hop25 = 960 @ 24 kHz).

    Batched inputs extend the grid to (B, n_tiles); weight slabs keep a
    constant index map so they are fetched into VMEM once for the whole
    batch."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, t25, hdim = emb.shape
    assert int(cfg.num_residual_layers) == 1, "kernel packs 1 resnet/stage"
    hop25 = 1
    for r in cfg.upsampling_ratios:
        hop25 *= int(r)  # 8*6*5*4 = 960

    halo = required_halo(cfg)
    n_tiles = pl.cdiv(t25, TILE)
    t_pad = n_tiles * TILE
    x = jnp.pad(
        emb, ((0, 0), (halo, t_pad - t25), (0, 0))
    )  # causal zeros + tail pad
    return _seanet_pallas_call(slabs, cfg, x, halo, TILE, n_tiles, hop25,
                               interpret)[:, : t25 * hop25]


def seanet_decode_pallas_chunk(
    slabs: Params,
    cfg: MimiConfig,
    ext: jnp.ndarray,  # [B, halo + m25, H]: REAL left context + chunk
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Streaming variant: decode one chunk of m25 25 Hz frames whose left
    context is the caller's rolling `emb_hist` buffer (the last `halo`
    post-transformer frames) instead of causal zero padding. Exact by the
    same valid-region argument as the offline tiles; a zero-initialized
    history reproduces the stream's first chunk. m25 must be even
    (m25*960 % 128 == 0) — chunks are 2 frames per 12.5 Hz AR frame, so
    any chunk_frames qualifies. Single-tile grid: tile == m25."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hop25 = 1
    for r in cfg.upsampling_ratios:
        hop25 *= int(r)
    halo = required_halo(cfg)
    m25 = ext.shape[1] - halo
    assert (m25 * hop25) % 128 == 0, (m25, hop25)
    return _seanet_pallas_call(slabs, cfg, ext, halo, m25, 1, hop25,
                               interpret)


def _seanet_pallas_call(
    slabs: Params,
    cfg: MimiConfig,
    x: jnp.ndarray,  # [B, n_tiles*tile + halo, H]
    halo: int,
    tile: int,
    n_tiles: int,
    hop25: int,
    interpret: bool,
) -> jnp.ndarray:

    b, t_ext, hdim = x.shape
    order = [
        "conv0_w", "conv0_b",
        "up0_w", "up0_b", "res0_w3", "res0_b3", "res0_w1", "res0_b1",
        "up1_w", "up1_b", "res1_w3", "res1_b3", "res1_w1", "res1_b1",
        "up2_w", "up2_b", "res2_w3", "res2_b3", "res2_w1", "res2_b1",
        "up3_w", "up3_b", "tail_A", "tail_B", "tail_b3", "tail_C1",
        "tail_b1", "fin_Gc", "fin_Gp", "fin_b",
    ]
    args = [x] + [slabs[k].astype(x.dtype) for k in order]

    rows = tile * hop25 // 128
    assert tile * hop25 % 128 == 0
    kernel = functools.partial(_seanet_kernel, cfg, halo, tile)
    in_specs = [
        pl.BlockSpec(
            (1, t_ext, hdim), lambda bi, i: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ] + [
        pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args[1:]
    ]
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, rows, 128), lambda bi, i: (bi, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * rows, 128), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(b, -1)
