"""Batch-generic, chunk-capable VMEM-resident AR decode kernel.

Generalizes the round-2 whole-loop resident kernel (B=1, full generate only)
to the serving shapes: B rows decode `n_steps` steps from an ARBITRARY carry
(state in / state out), so the same kernel drives

* the single-stream full generate (B=1, n_steps = max_frames+1),
* the streaming steady state (B=1, n_steps = chunk_frames), and
* the continuous-batching serving tick (B = slots, n_steps = chunk_frames) —
  the one capability that beats the reference outright
  (reference serializes all generation behind a lock, demo/server.py:56;
  loop semantics scaled here: src/sopro/model.py:218-305 at batch > 1).

Design notes (constraints from docs/kernels.md, verified on v5e Mosaic):

* per-row scalar state (t, last, streak, stopped, first_eos, key) lives in
  [B, 1] VMEM vectors — every update is a masked select, so rows of
  different ages advance independently and EOS-stopped rows freeze exactly
  like the XLA path's per-row masking;
* the rolling history sits TRANSPOSED as [HIST_PAD, 128] (lanes = rows):
  the roll is along sublanes (pltpu.roll) and cycle detection reduces along
  sublanes to a per-lane flag. Row<->column moves use an identity-mask
  matmul-free trick (mask with a [B, 128] eye, reduce the other axis) since
  Mosaic cannot transpose tiny [B, 1] vectors;
* the repetition-penalty membership is an incrementally-maintained count
  grid cnt[B, V] (+1 for the entering token, -1 for the token leaving the
  50-token window) — O(V) per step instead of an O(H*V) compare;
* sampling reuses sopro_tpu.sampling's explicit Threefry-2x32 functions
  VERBATIM (they are pure jnp over uint32, which Mosaic lowers natively),
  so the in-kernel stream is the same stream every XLA path draws from:
  one seed -> one token sequence, regardless of path;
* weights stay resident in VMEM for the whole pallas_call; at the serving
  shape (B=8, text bucket 256) the working set is ~41 MB (22 weights +
  12.6 KV + state), under the raised vmem limit.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sopro_tpu.config import SoproTTSConfig
from sopro_tpu.ops.pallas_ar import (
    HEAD_PAD,
    HIST_PAD,
    TEXT_HEADS,
    _erf_poly,
    pad_kv_heads,
)
from sopro_tpu.sampling import HIST_LEN, CYCLE_MAX_N, CYCLE_MIN_N
from sopro_tpu import sampling as S

LANES = 128  # row-lane padding for transposed per-row layouts


class ResidentLoopContext(NamedTuple):
    """Model-side context for the loop kernel: stacked weight slabs, padded
    per-row text KV, and the compact prev-token embedding table
    ([V+1, D]: rows 0..V-1 codebook-1 embeddings, row V = BOS)."""

    stacked: Any
    kv_k: jnp.ndarray  # [A, B*H, L, HEAD_PAD]
    kv_v: jnp.ndarray
    mask: jnp.ndarray  # [B, L]
    emb: jnp.ndarray  # [V+1, D]


def _row_from_col(col: jnp.ndarray, bsz: int) -> jnp.ndarray:
    """[B, 1] -> [1, 128] (value of row b lands in lane b; other lanes 0).
    Identity-mask + cross-sublane reduce: Mosaic cannot transpose sub-tile
    vectors directly."""
    eye = (
        lax.broadcasted_iota(jnp.int32, (bsz, LANES), 0)
        == lax.broadcasted_iota(jnp.int32, (bsz, LANES), 1)
    )
    w = jnp.where(eye, jnp.broadcast_to(col, (bsz, LANES)), jnp.zeros_like(col))
    return jnp.sum(w, axis=0, keepdims=True)


def _col_from_row(row: jnp.ndarray, bsz: int) -> jnp.ndarray:
    """[1, 128] -> [B, 1] (lane b -> row b)."""
    eye = (
        lax.broadcasted_iota(jnp.int32, (bsz, LANES), 0)
        == lax.broadcasted_iota(jnp.int32, (bsz, LANES), 1)
    )
    w = jnp.where(eye, jnp.broadcast_to(row, (bsz, LANES)), jnp.zeros_like(row))
    return jnp.sum(w, axis=1, keepdims=True)


def _ar_loop_kernel(
    cfg: SoproTTSConfig,
    kv_len: int,
    n_steps: int,
    max_steps: int,  # S: cond rows / token-buffer length / active cap
    anti_loop: bool,
    bsz: int,
    # per-row settings (inputs)
    top_p_ref, temp_ref, rtp_ref, rtemp_ref,  # [B, 1] f32
    min_gen_ref,  # [B, 1] i32
    # state in
    t_in, last_in, streak_in, stop_in, feos_in, k0_in, k1_in,  # [B, 1] i32
    hist_in,  # [HIST_PAD, 128] i32
    cnt_in,  # [B, V] i32
    bufs_in,  # [N, B, CTX, D]
    # model inputs
    cond_ref,  # [B*S, D]
    emb_ref,  # [V+1, D]
    norm_ref, glu_w_ref, glu_b_ref, dw_w_ref, dw_b_ref,
    ff_norm_ref, ff1_w_ref, ff1_b_ref, ff2_w_ref, ff2_b_ref,
    x_nq_ref, x_q_ref, x_out_ref, x_gate_ref, kv_k_ref, kv_v_ref,
    kv_mask_ref, out_norm_ref, head_w_ref, head_b_ref,
    # outputs
    tokens_ref,  # [n_steps, 128] i32
    t_out, last_out, streak_out, stop_out, feos_out, k0_out, k1_out,  # [B,1]
    hist_out,  # [HIST_PAD, 128]
    bufs_out,  # [N, B, CTX, D]
    # scratch
    cnt_ref,  # [B, V] i32
    nact_ref,  # SMEM (1,) i32
):
    n_layers = int(cfg.n_layers_ar)
    freq = int(cfg.ar_text_attn_freq)
    d = int(cfg.d_model)
    v = int(cfg.ar_vocab)
    eos = int(cfg.eos_id)
    eps = 1e-6
    loop_streak = 8  # reference: src/sopro/model.py:276

    # working state lives in the (read-write) output refs
    t_out[...] = t_in[...]
    last_out[...] = last_in[...]
    streak_out[...] = streak_in[...]
    stop_out[...] = stop_in[...]
    feos_out[...] = feos_in[...]
    k0_out[...] = k0_in[...]
    k1_out[...] = k1_in[...]
    hist_out[...] = hist_in[...]
    bufs_out[...] = bufs_in[...]
    cnt_ref[...] = cnt_in[...]
    tokens_ref[...] = jnp.zeros_like(tokens_ref)

    act0 = (t_in[...] < max_steps) & (stop_in[...] == 0)
    nact_ref[0] = jnp.sum(act0.astype(jnp.int32))

    def rmsnorm(h, scale):
        var = jnp.mean(h * h, axis=-1, keepdims=True)
        return h * lax.rsqrt(var + eps) * scale.astype(jnp.float32)

    def vec(ref, i=None):
        x = ref[...] if i is None else ref[i]
        return x.reshape(1, -1)

    def mm(a, w, bias=None):
        y = jnp.dot(a.astype(w.dtype), w, preferred_element_type=jnp.float32)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y

    iota_v = lax.broadcasted_iota(jnp.int32, (bsz, v), 1)

    def step(i, _):
        @pl.when(nact_ref[0] > 0)
        def _active():
            t = t_out[...]  # [B, 1]
            active = (t < max_steps) & (stop_out[...] == 0)  # [B, 1] bool

            # ---- previous-token embedding (BOS row = v at t == 0) --------
            prev_row = jnp.where(t == 0, v, last_out[...])
            n_emb = emb_ref.shape[0]
            oh_e = (
                lax.broadcasted_iota(jnp.int32, (bsz, n_emb), 1) == prev_row
            ).astype(emb_ref.dtype)
            prev_emb = jnp.dot(
                oh_e, emb_ref[...], preferred_element_type=jnp.float32
            )  # [B, D]
            # per-row cond gather via the flattened [B*S, D] layout
            row_idx = (
                lax.broadcasted_iota(jnp.int32, (bsz, 1), 0) * max_steps + t
            )
            oh_c = (
                lax.broadcasted_iota(jnp.int32, (bsz, bsz * max_steps), 1)
                == row_idx
            ).astype(cond_ref.dtype)
            cond_t = jnp.dot(
                oh_c, cond_ref[...], preferred_element_type=jnp.float32
            )  # [B, D]
            # bf16-first association matches the XLA step (x_t = cond + emb
            # in the carry dtype, then the kernel's f32 cast)
            x_t = (
                cond_t.astype(cond_ref.dtype) + prev_emb.astype(cond_ref.dtype)
            ).astype(jnp.float32)

            # ---- block stack (same math as pallas_ar._ar_step_kernel) ----
            h = x_t
            for li in range(n_layers):
                hn = rmsnorm(h, vec(norm_ref, li))
                ab = mm(hn, glu_w_ref[li], vec(glu_b_ref, li))
                g = ab[:, :d] * jax.nn.sigmoid(ab[:, d:])

                buf = bufs_out[li]  # [B, CTX, D]
                shifted = jnp.concatenate(
                    [buf[:, 1:, :], g[:, None, :].astype(buf.dtype)], axis=1
                )
                shifted = jnp.where(active[:, :, None], shifted, buf)
                bufs_out[li] = shifted
                w_dw = dw_w_ref[li].astype(jnp.float32)
                y = jnp.sum(shifted.astype(jnp.float32) * w_dw[None], axis=1)
                y = y + vec(dw_b_ref, li).astype(jnp.float32)
                h = h + y

                hn = rmsnorm(h, vec(ff_norm_ref, li))
                f = mm(hn, ff1_w_ref[li], vec(ff1_b_ref, li))
                f = 0.5 * f * (1.0 + _erf_poly(f * (1.0 / math.sqrt(2.0))))
                h = h + mm(f, ff2_w_ref[li], vec(ff2_b_ref, li))

                if (li + 1) % freq == 0:
                    ai = min(li // freq, x_q_ref.shape[0] - 1)
                    qn = rmsnorm(h, vec(x_nq_ref, ai))
                    q = mm(qn, x_q_ref[ai])  # [B, H*HP]
                    qh = q.reshape(bsz, TEXT_HEADS, HEAD_PAD)
                    kk = kv_k_ref[ai].reshape(
                        bsz, TEXT_HEADS, kv_len, HEAD_PAD
                    ).astype(jnp.float32)
                    vv = kv_v_ref[ai].reshape(
                        bsz, TEXT_HEADS, kv_len, HEAD_PAD
                    ).astype(jnp.float32)
                    scale = 1.0 / math.sqrt(d // TEXT_HEADS)
                    logits = jnp.sum(qh[:, :, None, :] * kk, axis=-1) * scale
                    keep = kv_mask_ref[...] != 0  # [B, L]
                    none_valid = ~jnp.any(keep, axis=-1, keepdims=True)
                    first = (
                        lax.broadcasted_iota(jnp.int32, keep.shape, 1) == 0
                    )
                    keep = keep | (none_valid & first)
                    logits = jnp.where(keep[:, None, :], logits, -jnp.inf)
                    w = jax.nn.softmax(logits, axis=-1)
                    a = jnp.sum(w[..., None] * vv, axis=2)  # [B, H, HP]
                    a = jnp.nan_to_num(a, nan=0.0, posinf=0.0, neginf=0.0)
                    a = mm(a.reshape(bsz, TEXT_HEADS * HEAD_PAD),
                           x_out_ref[ai])
                    # x_gate arrives pre-broadcast to [A, 1, D] (see the
                    # pallas_call site): Mosaic cannot broadcast [1, 1] in
                    # both sublanes and lanes at once, so the caller
                    # replicates the scalar across lanes and the mul here
                    # only broadcasts sublanes
                    gate = jnp.tanh(vec(x_gate_ref, ai).astype(jnp.float32))
                    h = h + gate * a

            ho = rmsnorm(h, vec(out_norm_ref))
            logits = mm(ho, head_w_ref[...], vec(head_b_ref))  # [B, V] f32

            # ---- anti-loop settings (sampling.anti_loop_settings) --------
            t_row = _row_from_col(t, bsz)  # [1, 128] i32
            if anti_loop:
                cyc_row = jnp.zeros((1, LANES), jnp.int32)
                for n_cyc in range(CYCLE_MIN_N, CYCLE_MAX_N + 1):
                    a_sl = hist_out[HIST_PAD - n_cyc:, :]
                    b_sl = hist_out[
                        HIST_PAD - 2 * n_cyc: HIST_PAD - n_cyc, :
                    ]
                    eq = jnp.all(a_sl == b_sl, axis=0, keepdims=True)
                    cyc_row = cyc_row | (
                        eq & (t_row >= 2 * n_cyc)
                    ).astype(jnp.int32)
                cyc = _col_from_row(cyc_row, bsz) != 0  # [B, 1]
                stuck = (t > 0) & (streak_out[...] >= loop_streak)
                rec = cyc | stuck
                top_p = jnp.where(rec, rtp_ref[...], top_p_ref[...])
                temp = jnp.where(rec, rtemp_ref[...], temp_ref[...])
            else:
                top_p, temp = top_p_ref[...], temp_ref[...]

            # ---- threefry key chain + shared sampler ---------------------
            # sampling.split_keys / sample_full_vocab are pure jnp over
            # Mosaic-legal ops: the SAME function bodies run here under
            # Mosaic as in every XLA path, so kept sets, reduction orders,
            # and the Gumbel stream are identical — one seed, one token
            # sequence, regardless of path.
            k0 = k0_out[...].astype(jnp.uint32)
            k1 = k1_out[...].astype(jnp.uint32)
            a0, a1 = S.threefry2x32(k0, k1, jnp.uint32(0), jnp.uint32(0))
            b0, b1 = S.threefry2x32(k0, k1, jnp.uint32(1), jnp.uint32(0))
            tok = S.sample_full_vocab(
                b0, b1, logits, cnt_ref[...] > 0, top_p, temp
            )  # [B, 1] i32

            k0_out[...] = jnp.where(
                active, a0.astype(jnp.int32), k0_out[...]
            )
            k1_out[...] = jnp.where(
                active, a1.astype(jnp.int32), k1_out[...]
            )

            # ---- bookkeeping (models/sopro.ar_single_step semantics) -----
            act_i = active.astype(jnp.int32)
            act_row = _row_from_col(act_i, bsz)  # [1, 128]
            tok_row = _row_from_col(tok, bsz)  # [1, 128]

            row_s = lax.broadcasted_iota(jnp.int32, (n_steps, 1), 0)
            upd = (row_s == i) & (act_row != 0)
            tokens_ref[...] = jnp.where(upd, tok_row, tokens_ref[...])

            # penalty-window count update: +entering token, -token sliding
            # out of the last-HIST_LEN window (one-hot matmul reads the
            # expiring row — dynamic sublane indexing must be 8-aligned,
            # one-hot matmuls are not)
            ohr = (
                lax.broadcasted_iota(
                    jnp.int32, (1, HIST_PAD), 1
                ) == (HIST_PAD - HIST_LEN)
            ).astype(jnp.float32)
            exp_row = jnp.dot(
                ohr, hist_out[...].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )  # [1, 128] token ids (or -1)
            exp_col = _col_from_row(exp_row, bsz).astype(jnp.int32)  # [B, 1]
            inc = (iota_v == tok).astype(jnp.int32)
            dec = (iota_v == exp_col).astype(jnp.int32)  # -1 matches nothing
            cnt_ref[...] = cnt_ref[...] + jnp.where(
                active, inc - dec, 0
            )

            rolled = pltpu.roll(hist_out[...], shift=HIST_PAD - 1, axis=0)
            row_h = lax.broadcasted_iota(jnp.int32, (HIST_PAD, 1), 0)
            new_hist = jnp.where(row_h == HIST_PAD - 1, tok_row, rolled)
            hist_out[...] = jnp.where(act_row != 0, new_hist, hist_out[...])

            same = (tok == last_out[...]) & (t > 0)
            streak_out[...] = jnp.where(
                active, jnp.where(same, streak_out[...] + 1, 0),
                streak_out[...],
            )
            last_out[...] = jnp.where(active, tok, last_out[...])

            is_eos = tok == eos
            feos_out[...] = jnp.where(
                active & is_eos & (feos_out[...] >= max_steps),
                t, feos_out[...],
            )
            new_stop = jnp.where(
                active & is_eos & ((t + 1) >= min_gen_ref[...]),
                1, stop_out[...],
            )
            stop_out[...] = new_stop
            t_new = jnp.where(active, t + 1, t)
            t_out[...] = t_new

            still = (t_new < max_steps) & (new_stop == 0)
            nact_ref[0] = jnp.sum(still.astype(jnp.int32))

        return _

    lax.fori_loop(0, n_steps, step, 0)


def ar_loop_pallas(
    ctx: ResidentLoopContext,
    cfg: SoproTTSConfig,
    cond_flat: jnp.ndarray,  # [B*S, D]
    state: Dict[str, jnp.ndarray],
    settings: Dict[str, jnp.ndarray],  # per-row [B] arrays
    n_steps: int,
    max_steps: int,
    anti_loop: bool,
    *,
    interpret: bool | None = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Run `n_steps` decode steps for B rows inside one pallas_call.

    state: {t, last, streak, stopped, first_eos [B] i32; key [B, 2] u32;
    hist [B, HIST_LEN] i32; bufs [N, B, CTX, D]}.
    Returns (tokens [B, n_steps] i32 — junk beyond each row's advance,
    masked by the caller via t deltas — and the updated state dict)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    stacked = ctx.stacked
    bsz = int(state["t"].shape[0])
    if bsz == 1 and not interpret:
        # Mosaic's layout inference assigns an unsupported implicit-dim
        # layout to the [1, 1] reduce outputs when B == 1 (verified: B >= 2
        # compiles clean, B == 1 fails with "Unsupported output implicit
        # dimension"). Pad to B = 2 with a dead row (t = max_steps,
        # stopped = 1): every state update in the kernel is active-masked,
        # so row 0 is bit-identical to a true solo run, and the extra row
        # is free on the MXU/VPU (8-sublane minimum tile).
        z = lambda x: jnp.zeros_like(x[:1])
        state2 = {
            "t": jnp.concatenate([state["t"], jnp.full((1,), max_steps, jnp.int32)]),
            "last": jnp.concatenate([state["last"], z(state["last"])]),
            "streak": jnp.concatenate([state["streak"], z(state["streak"])]),
            "stopped": jnp.concatenate(
                [state["stopped"], jnp.ones((1,), state["stopped"].dtype)]
            ),
            "first_eos": jnp.concatenate(
                [state["first_eos"], jnp.full((1,), max_steps, jnp.int32)]
            ),
            "key": jnp.concatenate([state["key"], z(state["key"])]),
            "hist": jnp.concatenate(
                [state["hist"], jnp.full_like(state["hist"][:1], -1)]
            ),
            "bufs": jnp.concatenate(
                [state["bufs"], jnp.zeros_like(state["bufs"][:, :1])], axis=1
            ),
        }
        ctx2 = ctx._replace(
            kv_k=jnp.concatenate(
                [ctx.kv_k, jnp.zeros_like(ctx.kv_k)], axis=1
            ),
            kv_v=jnp.concatenate(
                [ctx.kv_v, jnp.zeros_like(ctx.kv_v)], axis=1
            ),
            mask=jnp.concatenate(
                [ctx.mask, jnp.zeros_like(ctx.mask)], axis=0
            ),
        )
        cond2 = jnp.concatenate([cond_flat, jnp.zeros_like(cond_flat)], axis=0)
        toks, ns = ar_loop_pallas(
            ctx2, cfg, cond2, state2, settings, n_steps, max_steps,
            anti_loop, interpret=interpret,
        )
        return toks[:1], {
            k: (v[:, :1] if k == "bufs" else v[:1]) for k, v in ns.items()
        }
    d = int(cfg.d_model)
    vv = int(cfg.ar_vocab)
    l = int(ctx.kv_k.shape[-2])
    s = int(max_steps)

    col = lambda x, dt=jnp.int32: x.astype(dt).reshape(bsz, 1)
    # transposed history: [B, HIST_LEN] -> [HIST_PAD, 128] (lanes = rows)
    hist = state["hist"].astype(jnp.int32)
    hist_pad = jnp.pad(
        hist, ((0, 0), (HIST_PAD - hist.shape[1], 0)), constant_values=-1
    )  # [B, HIST_PAD]
    hist_t = jnp.pad(
        hist_pad.T, ((0, 0), (0, LANES - bsz)), constant_values=-1
    )  # [HIST_PAD, 128]
    # penalty counts from the valid window (tokens are >= 0; -1 fill never
    # counts, matching sample_token's position-validity mask)
    ids = jnp.where(hist >= 0, hist, vv)
    cnt = jnp.sum(
        (ids[:, :, None] == jnp.arange(vv)[None, None, :]).astype(jnp.int32),
        axis=1,
    )  # [B, V]

    sett = lambda name: jnp.broadcast_to(
        jnp.asarray(settings[name], jnp.float32).reshape(-1), (bsz,)
    ).reshape(bsz, 1)
    mgen = jnp.broadcast_to(
        jnp.asarray(settings["min_gen"], jnp.int32).reshape(-1), (bsz,)
    ).reshape(bsz, 1)

    kernel = functools.partial(
        _ar_loop_kernel, cfg, l, int(n_steps), s, bool(anti_loop), bsz
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = 5 + 7 + 3 + 2 + 20  # settings + state + hist/cnt/bufs + cond/emb + weights
    outs = pl.pallas_call(
        kernel,
        in_specs=[full()] * n_in,
        out_specs=[full()] * 10,
        out_shape=[
            jax.ShapeDtypeStruct((int(n_steps), LANES), jnp.int32),  # tokens
        ] + [jax.ShapeDtypeStruct((bsz, 1), jnp.int32)] * 7  # t..k1
        + [
            jax.ShapeDtypeStruct((HIST_PAD, LANES), jnp.int32),  # hist
            jax.ShapeDtypeStruct(state["bufs"].shape, state["bufs"].dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, vv), jnp.int32),  # cnt
            pltpu.SMEM((1,), jnp.int32),  # active-row count
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        sett("top_p"), sett("temperature"),
        sett("recovery_top_p"), sett("recovery_temp"), mgen,
        col(state["t"]), col(state["last"]), col(state["streak"]),
        col(state["stopped"]), col(state["first_eos"]),
        col(state["key"][:, 0]), col(state["key"][:, 1]),
        hist_t, cnt, state["bufs"],
        cond_flat, ctx.emb,
        stacked["norm"], stacked["glu_w"], stacked["glu_b"],
        stacked["dw_w"], stacked["dw_b"], stacked["ff_norm"],
        stacked["ff1_w"], stacked["ff1_b"], stacked["ff2_w"], stacked["ff2_b"],
        stacked["x_nq"], stacked["x_q"], stacked["x_out"],
        # [A, 1, 1] -> [A, 1, D]: lane-replicate the per-attn gate scalar
        # host-side (elementwise tanh downstream is value-identical) so the
        # kernel's gate*a mul never needs a dual-axis Mosaic broadcast
        jnp.broadcast_to(stacked["x_gate"], stacked["x_gate"].shape[:2] + (d,)),
        ctx.kv_k, ctx.kv_v,
        ctx.mask.astype(jnp.int32), stacked["out_norm"],
        stacked["head_w"], stacked["head_b"],
    )
    (tokens, t_o, last_o, streak_o, stop_o, feos_o, k0_o, k1_o,
     hist_o, bufs_o) = outs

    new_state = {
        "t": t_o[:, 0],
        "last": last_o[:, 0],
        "streak": streak_o[:, 0],
        "stopped": stop_o[:, 0],
        "first_eos": feos_o[:, 0],
        "key": jnp.stack(
            [k0_o[:, 0].astype(jnp.uint32), k1_o[:, 0].astype(jnp.uint32)], -1
        ),
        "hist": hist_o[:, :bsz].T[:, HIST_PAD - HIST_LEN:],
        "bufs": bufs_o,
    }
    return tokens[:, :bsz].T, new_state
