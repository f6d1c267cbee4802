"""Sopro model graph: conditioning preparation, the on-device AR decode loop,
and NAR refinement (reference: src/sopro/model.py:53-401), re-designed
TPU-first:

* all decode state (per-layer conv ring buffers, sampling history, RNG key,
  EOS bookkeeping) is one explicit carry pytree;
* the AR hot loop is a single `lax.while_loop` on device with zero host
  round-trips (the reference syncs a scalar per frame) and early exit on EOS;
* a chunked `lax.scan` variant powers streaming (fixed chunk of steps per
  dispatch, carry threaded between chunks);
* sampling (top-k/top-p/repetition penalty/anti-loop recovery) runs on device
  (sopro_tpu/sampling.py).
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sopro_tpu.config import SoproTTSConfig
from sopro_tpu.models import generator as G
from sopro_tpu.models import nar as N
from sopro_tpu.models import speaker as SPK
from sopro_tpu.models import text as TXT
from sopro_tpu.ops.attention import build_kv_cache, init_xattn, ref_xattn
from sopro_tpu.ops.blocks import init_rmsnorm, init_ssmlite, rmsnorm, ssmlite
from sopro_tpu.ops.embeddings import (
    CodebookEmbeddingSpec,
    cb_sum_embed_subset,
    init_codebook_embedding,
    sinusoidal_table,
)
from sopro_tpu import sampling as S

Params = Dict
SoproModelParams = Dict


class PreparedReference(NamedTuple):
    """Precomputed reference-audio conditioning
    (reference: src/sopro/model.py:45-51). A pure-array pytree, so it is
    trivially serializable and jit-transparent."""

    sv_ref: jnp.ndarray  # [B, sv_dim]
    ref_seq: jnp.ndarray  # [B, Tr, D]
    ref_kv: Tuple  # per ref-xattn layer: {"k","v","mask"}


@functools.lru_cache(maxsize=8)
def _frame_pos_table(d_model: int, max_len: int):
    return sinusoidal_table(d_model, max_len)


def init_sopro_model(
    key: jax.Array, cfg: SoproTTSConfig, text_vocab_size: int, dtype=jnp.float32
) -> SoproModelParams:
    ks = jax.random.split(key, 8 + cfg.ref_enc_layers + cfg.ref_xattn_layers)
    i = iter(range(len(ks)))
    return {
        "text_enc": TXT.init_text_encoder(ks[next(i)], cfg, text_vocab_size, dtype),
        "cb_embed": init_codebook_embedding(
            ks[next(i)], cb_spec(cfg), cfg.d_model, dtype
        ),
        "nar_prev_cb_weights": jnp.zeros((cfg.num_codebooks,), jnp.float32),
        "token2sv": SPK.init_token2sv(
            ks[next(i)], cfg.num_codebooks, cfg.codebook_size,
            d=192, out_dim=cfg.sv_student_dim, dtype=dtype,
        ),
        "spk_film": SPK.init_speaker_film(
            ks[next(i)], cfg.d_model, cfg.sv_student_dim, dtype
        ),
        "ar": G.init_ar_generator(ks[next(i)], cfg, dtype),
        "nar": N.init_nar(ks[next(i)], cfg, dtype),
        "cond_norm": init_rmsnorm(cfg.d_model, dtype),
        "ref_enc_blocks": [
            init_ssmlite(ks[next(i)], cfg.d_model, kernel_size=7, dtype=dtype)
            for _ in range(cfg.ref_enc_layers)
        ],
        "ref_enc_norm": init_rmsnorm(cfg.d_model, dtype),
        "ref_xattn": [
            init_xattn(ks[next(i)], cfg.d_model, dtype)
            for _ in range(cfg.ref_xattn_layers)
        ],
        # non-learned mixing buffer (reference: src/sopro/model.py:113-117)
        "ref_cb_weights": jnp.linspace(1.0, 0.1, cfg.num_codebooks, dtype=jnp.float32),
    }


def cb_spec(cfg: SoproTTSConfig) -> CodebookEmbeddingSpec:
    return CodebookEmbeddingSpec(cfg.num_codebooks, cfg.codebook_size, use_bos=True)


# --------------------------------------------------------------------------
# reference conditioning
# --------------------------------------------------------------------------


def encode_reference_seq(
    p: SoproModelParams,
    cfg: SoproTTSConfig,
    ref_tokens_btq: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """softmax(ref_cb_weights)-mixed codebook embeddings → 2 SSMLite blocks →
    RMSNorm (reference: src/sopro/model.py:133-149)."""
    spec = cb_spec(cfg)
    x = cb_sum_embed_subset(
        p["cb_embed"], spec, ref_tokens_btq, list(range(cfg.num_codebooks)),
        cb_weights=p["ref_cb_weights"],
    )
    if mask is not None:
        x = x * mask[..., None].astype(x.dtype)
    for bp in p["ref_enc_blocks"]:
        x = ssmlite(bp, x, kernel_size=7, dilation=1, causal=False, mask=mask)
    return rmsnorm(p["ref_enc_norm"], x)


def prepare_reference(
    p: SoproModelParams,
    cfg: SoproTTSConfig,
    ref_tokens_btq: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> PreparedReference:
    """(reference: src/sopro/model.py:151-170)"""
    sv_ref = SPK.token2sv(
        p["token2sv"], ref_tokens_btq, cfg.codebook_size, mask=mask
    )
    ref_seq = encode_reference_seq(p, cfg, ref_tokens_btq, mask=mask)
    ref_kv = tuple(
        build_kv_cache(xp, ref_seq, heads=cfg.ref_xattn_heads, mask=mask)
        for xp in p["ref_xattn"]
    )
    return PreparedReference(sv_ref=sv_ref, ref_seq=ref_seq, ref_kv=ref_kv)


def prepare_conditioning(
    p: SoproModelParams,
    cfg: SoproTTSConfig,
    text_ids: jnp.ndarray,
    text_mask: jnp.ndarray,
    ref: PreparedReference,
    *,
    max_frames: int,
    style_strength: float,
) -> Dict[str, jnp.ndarray]:
    """Per-frame conditioning for every output frame at once
    (reference: src/sopro/model.py:172-216)."""
    txt_seq, txt_pool = TXT.text_encoder(p["text_enc"], cfg, text_ids, text_mask)

    tar = int(max_frames) + 1
    if tar > cfg.pos_emb_max + 8:
        raise ValueError(
            f"max_frames={max_frames} needs a positional table of {tar} "
            f"rows but cfg.pos_emb_max={cfg.pos_emb_max}; raise pos_emb_max"
        )
    pos = _frame_pos_table(cfg.d_model, cfg.pos_emb_max + 8)[:tar]
    base = txt_pool[:, None, :] + pos[None].astype(txt_pool.dtype)
    cond = SPK.speaker_film(p["spk_film"], base, ref.sv_ref, strength=style_strength)

    for xp, kv in zip(p["ref_xattn"], ref.ref_kv):
        cond = ref_xattn(xp, cond, kv, heads=cfg.ref_xattn_heads, gmax=cfg.ref_xattn_gmax)
    cond = rmsnorm(p["cond_norm"], cond)

    return {"txt_seq": txt_seq, "text_mask": text_mask, "cond_ar": cond}


# --------------------------------------------------------------------------
# AR decode loop
# --------------------------------------------------------------------------


class ARCarry(NamedTuple):
    """Fully per-row decode state: rows advance independently, so a serving
    scheduler can run sessions of different ages in one batch (continuous
    batching — the reference instead serializes behind a global lock,
    demo/server.py:56)."""

    t: jnp.ndarray  # [B] i32: next step index per row
    conv_state: List[jnp.ndarray]
    hist: jnp.ndarray  # [B, 50] rolling history
    streak: jnp.ndarray  # [B] consecutive-repeat count
    last: jnp.ndarray  # [B] previous token (BOS placeholder at t=0)
    key: jax.Array  # [B] per-row PRNG keys (uint32 key data)
    tokens: jnp.ndarray  # [B, S] sampled tokens
    first_eos: jnp.ndarray  # [B] index of first EOS, S if none
    stopped: jnp.ndarray  # [B] bool: EOS honored (past min_gen)


class ARSettings(NamedTuple):
    top_p: jnp.ndarray
    temperature: jnp.ndarray
    recovery_top_p: jnp.ndarray
    recovery_temp: jnp.ndarray
    min_gen_frames: jnp.ndarray  # i32
    anti_loop: bool = True
    loop_streak: int = 8


def default_ar_settings(
    *,
    top_p: float = 0.9,
    temperature: float = 1.05,
    anti_loop: bool = True,
    recovery_top_p: float = 0.85,
    recovery_temp: float = 1.2,
    min_gen_frames: int = 12,
    loop_streak: int = 8,
) -> ARSettings:
    """Defaults mirror reference: src/sopro/model.py:218-231."""
    return ARSettings(
        top_p=jnp.float32(top_p),
        temperature=jnp.float32(temperature),
        recovery_top_p=jnp.float32(recovery_top_p),
        recovery_temp=jnp.float32(recovery_temp),
        min_gen_frames=jnp.int32(min_gen_frames),
        anti_loop=bool(anti_loop),
        loop_streak=int(loop_streak),
    )


def init_ar_carry(
    cfg: SoproTTSConfig, batch: int, max_steps: int, key: jax.Array, dtype=jnp.float32
) -> ARCarry:
    return ARCarry(
        t=jnp.zeros((batch,), jnp.int32),
        conv_state=G.init_ar_conv_state(cfg, batch, dtype),
        hist=S.init_history(batch),
        streak=jnp.zeros((batch,), jnp.int32),
        last=jnp.zeros((batch,), jnp.int32),
        key=jax.random.split(key, batch),
        tokens=jnp.zeros((batch, max_steps), jnp.int32),
        first_eos=jnp.full((batch,), max_steps, jnp.int32),
        stopped=jnp.zeros((batch,), bool),
    )


def ar_row_active(carry: ARCarry, max_steps: int) -> jnp.ndarray:
    """[B] bool: rows still decoding."""
    return (carry.t < max_steps) & ~carry.stopped


def maybe_pack_carry(carry: ARCarry, kv_caches) -> ARCarry:
    """Pack the per-block conv buffers into the fused kernels' single padded
    buffer when running with a Pallas context."""
    from sopro_tpu.ops.pallas_ar import PallasARContext, pack_conv_state
    from sopro_tpu.ops.pallas_ar_loop import ResidentLoopContext

    if (
        isinstance(kv_caches, (PallasARContext, ResidentLoopContext))
        and len(carry.conv_state) > 1
    ):
        return carry._replace(conv_state=[pack_conv_state(carry.conv_state)])
    return carry


def ar_resident_chunk(
    cfg: SoproTTSConfig,
    carry: ARCarry,
    cond_ar: jnp.ndarray,
    ctx,
    settings: ARSettings,
    n_steps: int,
) -> ARCarry:
    """Advance B rows by `n_steps` steps inside ONE whole-chunk resident
    Pallas call (state in / state out). Drop-in for ar_generate_chunk's XLA
    scan; also the full-generate body when n_steps = max_steps (the kernel
    predicates off once every row has stopped). Requires a packed conv
    carry (maybe_pack_carry) and a ResidentLoopContext."""
    from sopro_tpu.ops.pallas_ar_loop import ar_loop_pallas

    b, s_tok = carry.tokens.shape
    s_cond = int(cond_ar.shape[1])
    assert s_cond == s_tok, (s_cond, s_tok)
    state = {
        "t": carry.t, "last": carry.last, "streak": carry.streak,
        "stopped": carry.stopped.astype(jnp.int32),
        "first_eos": carry.first_eos, "key": carry.key,
        "hist": carry.hist, "bufs": carry.conv_state[0],
    }
    sett = {
        "top_p": settings.top_p, "temperature": settings.temperature,
        "recovery_top_p": settings.recovery_top_p,
        "recovery_temp": settings.recovery_temp,
        "min_gen": settings.min_gen_frames,
    }
    tok_chunk, ns = ar_loop_pallas(
        ctx, cfg, cond_ar.reshape(b * s_cond, cond_ar.shape[-1]), state,
        sett, int(n_steps), s_cond, bool(settings.anti_loop),
    )
    # merge the chunk's tokens into the absolute buffer at [t0, t_new) per
    # row (gather-select: a dynamic_update_slice would clamp near the end
    # of the buffer and overwrite real tokens with padding)
    t0, t_new = carry.t, ns["t"]
    pos = jnp.arange(s_tok)[None, :]
    rel = pos - t0[:, None]
    in_chunk = (rel >= 0) & (rel < int(n_steps)) & (pos < t_new[:, None])
    gath = jnp.take_along_axis(
        tok_chunk, jnp.clip(rel, 0, int(n_steps) - 1), axis=1
    )
    tokens = jnp.where(in_chunk, gath, carry.tokens)
    return ARCarry(
        t=ns["t"], conv_state=[ns["bufs"]], hist=ns["hist"],
        streak=ns["streak"], last=ns["last"], key=ns["key"], tokens=tokens,
        first_eos=ns["first_eos"], stopped=ns["stopped"] != 0,
    )


def ar_single_step(
    p: SoproModelParams,
    cfg: SoproTTSConfig,
    carry: ARCarry,
    cond_ar: jnp.ndarray,
    kv_caches: List[Optional[Dict]],
    settings: ARSettings,
) -> ARCarry:
    """One AR frame for every row, entirely on device
    (loop body of reference: src/sopro/model.py:265-305). Rows advance
    independently (per-row t); inactive rows (stopped / at max steps) are
    frozen by masking every state update."""
    spec = cb_spec(cfg)
    t = carry.t  # [B]
    max_steps = carry.tokens.shape[1]
    active = ar_row_active(carry, max_steps)

    # previous-token embedding; BOS row at t=0 (reference: model.py:265-270)
    emb_row = jnp.where(t == 0, jnp.int32(spec.bos_id), carry.last)
    prev_emb = jnp.take(p["cb_embed"]["emb"], emb_row, axis=0)
    t_safe = jnp.minimum(t, cond_ar.shape[1] - 1)
    cond_t = jnp.take_along_axis(cond_ar, t_safe[:, None, None], axis=1)[:, 0]
    x_t = cond_t + prev_emb

    top_p, temp = S.anti_loop_settings(
        carry.hist,
        t,
        carry.streak,
        base=(settings.top_p, settings.temperature),
        recovery=(settings.recovery_top_p, settings.recovery_temp),
        loop_streak=settings.loop_streak,
        enabled=settings.anti_loop,
    )

    from sopro_tpu.ops.pallas_ar import PallasARContext, ar_step_pallas

    if isinstance(kv_caches, PallasARContext):
        # fused Pallas step: conv state is one packed [N, B, CTX, D] buffer
        logits, packed = ar_step_pallas(
            kv_caches.stacked, cfg, x_t, carry.conv_state[0],
            kv_caches.kv_k, kv_caches.kv_v, kv_caches.mask,
        )
        conv_state = [packed]
    else:
        logits, conv_state = G.ar_step(
            p["ar"], cfg, x_t, carry.conv_state, kv_caches
        )

    # explicit threefry key chain — bit-identical to the in-kernel chain, so
    # every decode path draws the same tokens at the same seed (the
    # reference's single-sampler contract, src/sopro/sampling.py:24-93)
    key, sub = S.split_keys(carry.key)  # [B, 2] each
    tok = S.sample_token(
        sub, logits, carry.hist, t,
        S.SamplerSettings(top_p=top_p, temperature=temp),
    )

    hist = S.push_history(carry.hist, tok)
    streak, last = S.update_streak(carry.streak, carry.last, tok, t)

    is_eos = tok == cfg.eos_id
    b_idx = jnp.arange(tok.shape[0])
    tokens = carry.tokens.at[b_idx, t_safe].set(
        jnp.where(active, tok, carry.tokens[b_idx, t_safe])
    )
    first_eos = jnp.where(
        active & is_eos & (carry.first_eos >= max_steps), t, carry.first_eos
    )
    stopped = carry.stopped | (active & is_eos & ((t + 1) >= settings.min_gen_frames))

    def freeze(new, old, batch_axis=0):
        shape = [1] * new.ndim
        shape[batch_axis] = -1
        return jnp.where(active.reshape(shape), new, old)

    # the fused-kernel conv state is one packed [N_layers, B, CTX, D] buffer:
    # its batch axis is axis 1, not 0
    conv_axis = 1 if isinstance(kv_caches, PallasARContext) else 0

    return ARCarry(
        t=jnp.where(active, t + 1, t),
        conv_state=[
            freeze(n, o, batch_axis=conv_axis)
            for n, o in zip(conv_state, carry.conv_state)
        ],
        hist=freeze(hist, carry.hist),
        streak=jnp.where(active, streak, carry.streak),
        last=jnp.where(active, last, carry.last),
        key=freeze(key, carry.key),
        tokens=tokens,
        first_eos=first_eos,
        stopped=stopped,
    )


def ar_generate(
    p: SoproModelParams,
    cfg: SoproTTSConfig,
    cond_ar: jnp.ndarray,
    txt_seq: jnp.ndarray,
    text_mask: Optional[jnp.ndarray],
    key: jax.Array,
    settings: ARSettings,
    max_steps: int,
    kv_caches=None,
) -> ARCarry:
    """Full AR decode as one on-device while_loop with EOS early exit
    (reference: src/sopro/model.py:218-305). Pass a PallasARContext as
    `kv_caches` to run the fused-kernel step."""
    if kv_caches is None:
        kv_caches = G.build_text_kv_caches(p["ar"], cfg, txt_seq, text_mask)

    from sopro_tpu.ops.pallas_ar_loop import ResidentLoopContext

    carry = init_ar_carry(cfg, cond_ar.shape[0], max_steps, key, cond_ar.dtype)
    carry = maybe_pack_carry(carry, kv_caches)

    if isinstance(kv_caches, ResidentLoopContext):
        # whole-loop kernel: every step (block stack + threefry sampler +
        # anti-loop bookkeeping) runs inside ONE pallas_call with
        # VMEM-resident weights, predicating off once every row has stopped
        return ar_resident_chunk(
            cfg, carry, cond_ar, kv_caches, settings, max_steps
        )

    def cond_fn(c: ARCarry):
        return jnp.any(ar_row_active(c, max_steps))

    def body_fn(c: ARCarry):
        return ar_single_step(p, cfg, c, cond_ar, kv_caches, settings)

    return jax.lax.while_loop(cond_fn, body_fn, carry)


def ar_generate_chunk(
    p: SoproModelParams,
    cfg: SoproTTSConfig,
    carry: ARCarry,
    cond_ar: jnp.ndarray,
    kv_caches: List[Optional[Dict]],
    settings: ARSettings,
    n_steps: int,
) -> ARCarry:
    """Advance the AR decode by a fixed chunk of steps (streaming driver /
    serving tick). Rows past EOS-stop or max_steps are no-ops (per-row
    masking inside ar_single_step / the resident chunk kernel)."""
    from sopro_tpu.ops.pallas_ar_loop import ResidentLoopContext

    if isinstance(kv_caches, ResidentLoopContext):
        return ar_resident_chunk(
            cfg, carry, cond_ar, kv_caches, settings, n_steps
        )

    def body_fn(c: ARCarry, _):
        return ar_single_step(p, cfg, c, cond_ar, kv_caches, settings), None

    carry, _ = jax.lax.scan(body_fn, carry, None, length=n_steps)
    return carry


# --------------------------------------------------------------------------
# NAR refinement
# --------------------------------------------------------------------------


def nar_refine(
    p: SoproModelParams,
    cfg: SoproTTSConfig,
    cond_seq: jnp.ndarray,
    rvq1_bt: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    head_tail: Optional[int] = None,
) -> jnp.ndarray:
    """(reference: src/sopro/model.py:307-347)"""
    return N.nar_refine(
        p["nar"],
        p["cb_embed"],
        cb_spec(cfg),
        p["nar_prev_cb_weights"],
        cfg,
        cond_seq,
        rvq1_bt,
        mask=mask,
        head_tail=head_tail,
    )
