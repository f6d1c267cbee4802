"""Golden-parity helpers: load the upstream PyTorch reference (read-only mount)
and convert its module weights into sopro_tpu parameter pytrees.

The reference has no tests of its own (SURVEY.md §4); our strategy is to run
its torch modules with fixed seeds as oracles and assert the JAX rebuild
matches numerically. Skipped automatically when the reference isn't mounted.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

REF_SRC = "/root/reference/src"


def import_ref():
    """Import the reference `sopro` package, or skip the test."""
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    try:
        import sopro  # noqa: F401

        return sopro
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference package unavailable: {e}")


def t2n(t) -> np.ndarray:
    return t.detach().cpu().numpy()


# ---- per-module weight converters (torch module -> sopro_tpu params) ------


def conv_linear(lin) -> dict:
    p = {"w": t2n(lin.weight).T.copy()}
    if lin.bias is not None:
        p["b"] = t2n(lin.bias).copy()
    return p


def conv_rmsnorm(norm) -> dict:
    return {"scale": t2n(norm.weight).copy()}


def conv_layernorm(norm) -> dict:
    return {"scale": t2n(norm.weight).copy(), "bias": t2n(norm.bias).copy()}


def conv_glu(g) -> dict:
    return {"pro": conv_linear(g.pro)}


def conv_dwconv(dw) -> dict:
    # torch depthwise Conv1d weight [D, 1, k] -> ours [k, 1, D]
    w = t2n(dw.dw.weight)
    p = {"w": np.transpose(w, (2, 1, 0)).copy()}
    if dw.dw.bias is not None:
        p["b"] = t2n(dw.dw.bias).copy()
    return p


def conv_ssmlite(blk) -> dict:
    return {
        "norm": conv_rmsnorm(blk.norm),
        "glu": conv_glu(blk.glu),
        "dw": conv_dwconv(blk.dw),
        "ff_norm": conv_rmsnorm(blk.ff[0]),
        "ff1": conv_linear(blk.ff[1]),
        "ff2": conv_linear(blk.ff[3]),
    }


def conv_attnpool(pool) -> dict:
    return {"a1": conv_linear(pool.attn[0]), "a2": conv_linear(pool.attn[2])}


def conv_xattn(blk) -> dict:
    return {
        "nq": conv_rmsnorm(blk.nq),
        "nkv": conv_rmsnorm(blk.nkv),
        "q": conv_linear(blk.q_proj),
        "k": conv_linear(blk.k_proj),
        "v": conv_linear(blk.v_proj),
        "out": conv_linear(blk.out_proj),
        "gate": t2n(blk.gate).copy(),
    }


def conv_embedding(emb) -> dict:
    return {"emb": t2n(emb.weight).copy()}


def conv_token2sv(m) -> dict:
    return {
        "emb": conv_embedding(m.emb),
        "cb_weights": t2n(m.cb_weights).copy(),
        "conv1": conv_dwconv_raw(m.enc[0]),
        "conv2": conv_dwconv_raw(m.enc[3]),
        "pool": conv_attnpool(m.pool),
        "proj": conv_linear(m.proj),
    }


def conv_dwconv_raw(dw) -> dict:
    return conv_dwconv(dw)


def conv_film(m) -> dict:
    return {
        "mlp1": conv_linear(m.mlp[0]),
        "mlp2": conv_linear(m.mlp[2]),
        "norm": conv_layernorm(m.norm),
    }


def conv_text_encoder(m) -> dict:
    return {
        "embed": conv_embedding(m.embed.emb),
        "layers": [conv_ssmlite(b) for b in m.layers],
        "norm": conv_rmsnorm(m.norm),
    }


def conv_ar_generator(m) -> dict:
    import torch.nn as nn

    return {
        "blocks": [conv_ssmlite(b) for b in m.blocks],
        "xattn": [
            (None if isinstance(x, nn.Identity) else conv_xattn(x))
            for x in m.x_attns
        ],
        "norm": conv_rmsnorm(m.norm),
        "head": conv_linear(m.head),
    }


def conv_nar(m) -> dict:
    p = {
        "blocks": [conv_ssmlite(b) for b in m.blocks],
        "norm": conv_rmsnorm(m.norm),
        "pre": conv_linear(m.pre),
        "stage_emb": conv_embedding(m.stage_emb),
        "adapter": {
            "norm": conv_rmsnorm(m.adapter.norm),
            "mlp1": conv_linear(m.adapter.mlp[0]),
            "mlp2": conv_linear(m.adapter.mlp[2]),
        },
        "heads": {},
        "head_id_emb": {},
        "mix": {},
    }
    for s in m.stage_names:
        p["heads"][s] = [conv_linear(h) for h in m.heads[s]]
        p["head_id_emb"][s] = conv_embedding(m.head_id_emb[s])
        p["mix"][s] = t2n(m.mix[s]).copy()
    return p


def conv_sopro_model(m) -> dict:
    """Convert the full reference SoproTTSModel into a sopro_tpu param pytree."""
    return {
        "text_enc": conv_text_encoder(m.text_enc),
        "cb_embed": conv_embedding(m.cb_embed.emb),
        "nar_prev_cb_weights": t2n(m.nar_prev_cb_weights).copy(),
        "token2sv": conv_token2sv(m.token2sv),
        "spk_film": conv_film(m.spk_film),
        "ar": conv_ar_generator(m.ar),
        "nar": conv_nar(m.nar),
        "cond_norm": conv_rmsnorm(m.cond_norm),
        "ref_enc_blocks": [conv_ssmlite(b) for b in m.ref_enc_blocks],
        "ref_enc_norm": conv_rmsnorm(m.ref_enc_norm),
        "ref_xattn": [conv_xattn(b) for b in m.ref_xattn.blocks],
        "ref_cb_weights": t2n(m.ref_cb_weights).copy(),
    }
