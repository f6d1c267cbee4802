"""Non-autoregressive single-pass refiner.

The reference NARSinglePass (src/sopro/nn/nar.py) runs one shared non-causal
dilated-conv trunk per refinement stage (B/C/D/E), conditioned by a stage
FiLM adapter and a softmax mix of the conditioning sequence and the summed
embeddings of previously decoded codebooks; each stage then applies a
bottleneck projection and per-codebook linear heads with zero-init head-id
embedding offsets. Greedy argmax per codebook.

TPU design: all per-stage heads of a stage are evaluated as a single fused
einsum over a stacked [n_heads, head_dim, V] weight tensor, so the head
computation is one large MXU matmul instead of n_heads small ones.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from sopro_tpu.config import SoproTTSConfig
from sopro_tpu.ops.blocks import (
    init_linear,
    init_rmsnorm,
    init_ssmlite,
    linear,
    rmsnorm,
    ssmlite,
    gelu,
)
from sopro_tpu.ops.embeddings import init_embedding

Params = Dict


def init_nar(key: jax.Array, cfg: SoproTTSConfig, dtype=jnp.float32) -> Params:
    stage_idx = cfg.stage_indices()
    stages = cfg.stage_order()
    n = int(cfg.n_layers_nar)
    keys = jax.random.split(key, n + 4 + 2 * len(stages))
    p: Params = {
        "blocks": [
            init_ssmlite(keys[i], cfg.d_model, kernel_size=cfg.nar_kernel_size, dtype=dtype)
            for i in range(n)
        ],
        "norm": init_rmsnorm(cfg.d_model, dtype),
        "pre": init_linear(keys[n], cfg.d_model, cfg.nar_head_dim, dtype=dtype),
        "stage_emb": init_embedding(keys[n + 1], len(stages), cfg.d_model, dtype),
        "adapter": {
            "norm": init_rmsnorm(cfg.d_model, dtype),
            "mlp1": init_linear(keys[n + 2], cfg.d_model, 256, dtype=dtype),
            "mlp2": {
                # zero-init (reference: src/sopro/nn/nar.py:22-23)
                "w": jnp.zeros((256, 2 * cfg.d_model), dtype),
                "b": jnp.zeros((2 * cfg.d_model,), dtype),
            },
        },
        "heads": {},
        "head_id_emb": {},
        "mix": {},
    }
    for si, s in enumerate(stages):
        nh = len(stage_idx[s])
        hkeys = jax.random.split(keys[n + 3 + si], nh)
        p["heads"][s] = [
            init_linear(hkeys[i], cfg.nar_head_dim, cfg.codebook_size, dtype=dtype)
            for i in range(nh)
        ]
        # zero-init head-id embeddings (reference: src/sopro/nn/nar.py:78-79)
        p["head_id_emb"][s] = {"emb": jnp.zeros((nh, cfg.nar_head_dim), dtype)}
        p["mix"][s] = jnp.zeros((2,), jnp.float32)
    return p


def _stage_adapter(p: Params, x: jnp.ndarray, stage_vec: jnp.ndarray) -> jnp.ndarray:
    """FiLM from the stage embedding (reference: src/sopro/nn/nar.py:25-32)."""
    gb = linear(p["mlp2"], gelu(linear(p["mlp1"], stage_vec)))
    g, b = jnp.split(gb, 2, axis=-1)
    x = rmsnorm(p["norm"], x)
    return x * (1 + jnp.tanh(g))[None, None, :] + jnp.tanh(b)[None, None, :]


def _stage_hidden(
    p: Params,
    cfg: SoproTTSConfig,
    stage: str,
    cond: jnp.ndarray,
    prev_emb: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    head_tail: Optional[int] = None,
) -> jnp.ndarray:
    """One stage's trunk → pre-head hidden z [B, T', head_dim]
    (reference: src/sopro/nn/nar.py:89-110). With `head_tail`, only the
    last `head_tail` frames of z are returned (the trunk still runs the
    full window — the non-causal convs need it)."""
    stages = cfg.stage_order()
    sid = stages.index(stage)

    w = jax.nn.softmax(p["mix"][stage].astype(jnp.float32), axis=0).astype(cond.dtype)
    x = w[0] * cond + w[1] * prev_emb

    stage_vec = p["stage_emb"]["emb"][sid]
    x = _stage_adapter(p["adapter"], x, stage_vec)

    dils = cfg.nar_dilations()
    for i, bp in enumerate(p["blocks"]):
        x = ssmlite(
            bp, x, kernel_size=cfg.nar_kernel_size, dilation=dils[i],
            causal=False, mask=mask,
        )
    x = rmsnorm(p["norm"], x)
    z = linear(p["pre"], x)  # [B, T, head_dim]
    if head_tail is not None:
        z = z[:, -int(head_tail):]
    return z


def _stage_head_stacks(p: Params, stage: str):
    hid = p["head_id_emb"][stage]["emb"]  # [n_heads, head_dim]
    w_stack = jnp.stack([hp["w"] for hp in p["heads"][stage]], axis=0)  # [H, hd, V]
    b_stack = jnp.stack([hp["b"] for hp in p["heads"][stage]], axis=0)  # [H, V]
    return hid, w_stack, b_stack


def nar_forward_stage(
    p: Params,
    cfg: SoproTTSConfig,
    stage: str,
    cond: jnp.ndarray,
    prev_emb: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    head_tail: Optional[int] = None,
) -> jnp.ndarray:
    """One refinement stage → logits [B, T, n_heads, codebook_size]
    (reference: src/sopro/nn/nar.py:89-116).

    `head_tail`: evaluate the head einsum only on the LAST `head_tail`
    frames (logits [B, head_tail, H, V]). The trunk still runs the full
    window (non-causal convs need it); only the per-frame head matmul +
    logits materialization shrink. Used by the training objective (which
    needs logits); the greedy-decode path uses `nar_stage_preds`."""
    z = _stage_hidden(p, cfg, stage, cond, prev_emb, mask, head_tail)
    # fused heads: stack per-head weights -> one einsum
    hid, w_stack, b_stack = _stage_head_stacks(p, stage)
    zh = z[:, :, None, :] + hid[None, None, :, :]  # [B, T, H, hd]
    logits = jnp.einsum("bthd,hdv->bthv", zh, w_stack) + b_stack[None, None]
    return logits


def nar_stage_preds(
    p: Params,
    cfg: SoproTTSConfig,
    stage: str,
    cond: jnp.ndarray,
    prev_emb: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    head_tail: Optional[int] = None,
    use_kernel: Optional[bool] = None,
) -> jnp.ndarray:
    """One stage's greedy tokens [B, T', H] int32.

    On TPU the head projection + argmax run as one Pallas kernel
    (ops/pallas_nar.py) so the [B, T, H, V] logits never reach HBM — only
    the ids do. Off-TPU (and under `use_kernel=False`) this is the einsum +
    jnp.argmax path with identical tie-breaking (lowest index)."""
    z = _stage_hidden(p, cfg, stage, cond, prev_emb, mask, head_tail)
    hid, w_stack, b_stack = _stage_head_stacks(p, stage)
    if use_kernel is None:
        # the kernel pays off when the logits it elides are big; at the
        # serving tick's head_tail shape (B*T' = 8*16) the per-(head,row)
        # grid launches cost more than the ~9 MB of logits saved (tick
        # device time measured +0.7 ms with the kernel at that shape)
        use_kernel = (
            jax.default_backend() == "tpu"
            and z.shape[0] * z.shape[1] >= 256
        )
    if use_kernel:
        from sopro_tpu.ops.pallas_nar import nar_heads_argmax

        return nar_heads_argmax(z, hid, w_stack, b_stack)
    zh = z[:, :, None, :] + hid[None, None, :, :]
    logits = jnp.einsum("bthd,hdv->bthv", zh, w_stack) + b_stack[None, None]
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def nar_refine(
    p: Params,
    cb_embed_params: Params,
    cb_spec,
    nar_prev_cb_weights: jnp.ndarray,
    cfg: SoproTTSConfig,
    cond_seq: jnp.ndarray,
    rvq1_bt: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    head_tail: Optional[int] = None,
) -> jnp.ndarray:
    """Fill codebooks 2..Q given codebook-1 tokens: 4 sequential stage passes
    with greedy argmax (reference: src/sopro/model.py:307-347).

    cond_seq [B, T, D]; rvq1_bt [B, T] → tokens [B, T, Q].

    `head_tail`: only the FINAL stage's heads run, and only on the last
    `head_tail` frames — every earlier stage still refines the full window
    because its argmax tokens feed the next stage's trunk input. Outside
    the tail, the final stage's codebooks stay zero: callers that pass
    head_tail (the streaming/serving tick) consume ONLY tokens[:, -tail:].
    """
    from sopro_tpu.ops.embeddings import cb_sum_embed_subset

    b, t, _ = cond_seq.shape
    q = int(cfg.num_codebooks)
    stage_idx = cfg.stage_indices()

    out = jnp.zeros((b, t, q), jnp.int32)
    out = out.at[:, :, 0].set(rvq1_bt)

    prev_tokens = rvq1_bt[..., None]  # [B, T, K_so_far]
    prev_cbs: List[int] = [0]

    stages = cfg.stage_order()
    for stage in stages:
        idxs = stage_idx[stage]
        last = stage == stages[-1]
        prev_emb = cb_sum_embed_subset(
            cb_embed_params, cb_spec, prev_tokens, prev_cbs,
            cb_weights=nar_prev_cb_weights,
        )
        preds = nar_stage_preds(
            p, cfg, stage, cond_seq, prev_emb, mask=mask,
            head_tail=head_tail if last else None,
        )  # [B, T', H]
        if last and head_tail is not None:
            out = out.at[:, t - int(head_tail):, jnp.asarray(idxs)].set(preds)
        else:
            out = out.at[:, :, jnp.asarray(idxs)].set(preds)
        if not last:
            prev_tokens = jnp.concatenate([prev_tokens, preds], axis=-1)
            prev_cbs = prev_cbs + list(idxs)

    return out
