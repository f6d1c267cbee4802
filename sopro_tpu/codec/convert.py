"""Mimi checkpoint conversion: HF/torch state-dict -> sopro_tpu pytree.

Weight-name contract follows the `kyutai/mimi` checkpoint as instantiated by
`transformers.MimiModel` (the reference loads it at src/sopro/codec/mimi.py:
28-31). Works on any flat mapping name -> numpy array, so it serves both the
safetensors loader (hub path) and tests that convert a random-init torch
MimiModel via `.state_dict()`.

Layout transforms:
* Conv1d [out, in/g, k]            -> HIO [k, in/g, out]
* ConvTranspose1d [in, out/g, k]   -> the kernel of the equivalent
  lhs-dilated *forward* conv: flipped along k and regrouped to
  HIO [k, in/g, out] with group-major out channels (see mimi_jax.mimi_convt)
* Linear [out, in]                 -> [in, out]
* Euclidean codebooks: embed = embed_sum / clamp(cluster_usage, eps); the
  decode tables additionally fold in the split's 1x1 output projection.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from sopro_tpu.codec.mimi_config import (
    CONV,
    CONVT,
    ELU,
    RESNET,
    MimiConfig,
    Plan,
    decoder_plan,
    encoder_plan,
)

Array = np.ndarray
SD = Dict[str, Array]


def conv_weight(w: Array) -> Array:
    """torch Conv1d [out, in/g, k] -> HIO [k, in/g, out]."""
    return np.ascontiguousarray(np.transpose(w, (2, 1, 0)))


def convt_weight(w: Array, groups: int) -> Array:
    """torch ConvTranspose1d [in, out/g, k] -> flipped HIO [k, in/g, out]."""
    i, og, k = w.shape
    w4 = w.reshape(groups, i // groups, og, k)[..., ::-1]
    return np.ascontiguousarray(np.transpose(w4, (3, 1, 0, 2)).reshape(k, i // groups, groups * og))


def _lin(sd: SD, name: str) -> Dict[str, Array]:
    return {"w": np.ascontiguousarray(sd[f"{name}.weight"].T)}


def _ln(sd: SD, name: str) -> Dict[str, Array]:
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _conv(sd: SD, name: str) -> Dict[str, Array]:
    p = {"w": conv_weight(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _convt(sd: SD, name: str, groups: int) -> Dict[str, Array]:
    p = {"w": convt_weight(sd[f"{name}.weight"], groups)}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"]
    return p


def _seanet(sd: SD, prefix: str, plan: Plan) -> List[Dict[str, Any]]:
    params: List[Dict[str, Any]] = []
    for i, (kind, spec) in enumerate(plan):
        name = f"{prefix}.layers.{i}"
        if kind == CONV:
            params.append(_conv(sd, f"{name}.conv"))
        elif kind == CONVT:
            params.append(_convt(sd, f"{name}.conv", int(spec.get("groups", 1))))
        elif kind == RESNET:
            params.append(
                {"convs": [
                    _conv(sd, f"{name}.block.1.conv"),
                    _conv(sd, f"{name}.block.3.conv"),
                ]}
            )
        elif kind == ELU:
            params.append({})
    return params


def _transformer(sd: SD, prefix: str, cfg: MimiConfig) -> Dict[str, Any]:
    layers = []
    for i in range(cfg.num_hidden_layers):
        name = f"{prefix}.layers.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{name}.input_layernorm"),
                "q": _lin(sd, f"{name}.self_attn.q_proj"),
                "k": _lin(sd, f"{name}.self_attn.k_proj"),
                "v": _lin(sd, f"{name}.self_attn.v_proj"),
                "o": _lin(sd, f"{name}.self_attn.o_proj"),
                "ln2": _ln(sd, f"{name}.post_attention_layernorm"),
                "fc1": _lin(sd, f"{name}.mlp.fc1"),
                "fc2": _lin(sd, f"{name}.mlp.fc2"),
                "scale_attn": sd[f"{name}.self_attn_layer_scale.scale"],
                "scale_mlp": sd[f"{name}.mlp_layer_scale.scale"],
            }
        )
    return {"layers": layers}


def _codebook_embed(sd: SD, name: str, eps: float = 1e-5) -> Array:
    if f"{name}.initialized" in sd:
        # EMA bookkeeping flag, not a weight — read it so coverage manifests
        # (hub.TrackedStateDict) see it as intentionally consumed
        sd[f"{name}.initialized"]
    usage = np.clip(sd[f"{name}.cluster_usage"], eps, None)
    return sd[f"{name}.embed_sum"] / usage[:, None]


def _quantizer(sd: SD, cfg: MimiConfig) -> Dict[str, Any]:
    ns = cfg.num_semantic_quantizers
    na = cfg.num_quantizers - ns
    sem = "quantizer.semantic_residual_vector_quantizer"
    ac = "quantizer.acoustic_residual_vector_quantizer"

    embeds = [
        _codebook_embed(sd, f"{sem}.layers.{i}.codebook") for i in range(ns)
    ] + [
        _codebook_embed(sd, f"{ac}.layers.{i}.codebook") for i in range(na)
    ]
    embed = np.stack(embeds)  # [Q, V, cb_dim]

    # 1x1 output projections [hidden, cb_dim, 1] -> right-matmul [cb_dim, hidden]
    out_sem = np.ascontiguousarray(sd[f"{sem}.output_proj.weight"][..., 0].T)
    out_ac = np.ascontiguousarray(sd[f"{ac}.output_proj.weight"][..., 0].T)
    dec_embed = np.concatenate(
        [embed[:ns] @ out_sem, embed[ns:] @ out_ac], axis=0
    )  # [Q, V, hidden]

    return {
        "embed": embed,
        "dec_embed": dec_embed,
        "in_proj_sem": np.ascontiguousarray(sd[f"{sem}.input_proj.weight"][..., 0].T),
        "in_proj_ac": np.ascontiguousarray(sd[f"{ac}.input_proj.weight"][..., 0].T),
    }


def convert_mimi_state_dict(sd: SD, cfg: MimiConfig) -> Dict[str, Any]:
    """Full MimiModel state dict -> sopro_tpu Mimi parameter pytree."""
    from sopro_tpu.codec.mimi_config import upsample_spec

    return {
        "encoder": _seanet(sd, "encoder", encoder_plan(cfg)),
        "enc_tf": _transformer(sd, "encoder_transformer", cfg),
        "downsample": {"w": conv_weight(sd["downsample.conv.weight"])},
        "upsample": {
            "w": convt_weight(
                sd["upsample.conv.weight"], int(upsample_spec(cfg)["groups"])
            )
        },
        "dec_tf": _transformer(sd, "decoder_transformer", cfg),
        "decoder": _seanet(sd, "decoder", decoder_plan(cfg)),
        "quantizer": _quantizer(sd, cfg),
    }


# --------------------------------------------------------------------------
# random init (benchmarks / smoke tests without a checkpoint)
# --------------------------------------------------------------------------


def init_mimi_params(seed: int, cfg: MimiConfig) -> Dict[str, Any]:
    """Random Mimi parameter pytree with checkpoint-correct shapes."""
    rng = np.random.default_rng(seed)

    def g(*shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    def conv_p(spec):
        groups = int(spec.get("groups", 1))
        return {
            "w": g(spec["k"], spec["in"] // groups, spec["out"]),
            "b": np.zeros((spec["out"],), np.float32),
        }

    def seanet_p(plan):
        out = []
        for kind, spec in plan:
            if kind in (CONV, CONVT):
                out.append(conv_p(spec))
            elif kind == RESNET:
                out.append({"convs": [conv_p(cs) for cs in spec["convs"]]})
            else:
                out.append({})
        return out

    def tf_p():
        d, i = cfg.hidden_size, cfg.intermediate_size
        kvd = cfg.num_key_value_heads * cfg.head_dim
        qd = cfg.num_attention_heads * cfg.head_dim
        return {
            "layers": [
                {
                    "ln1": {"scale": np.ones((d,), np.float32),
                            "bias": np.zeros((d,), np.float32)},
                    "q": {"w": g(d, qd)},
                    "k": {"w": g(d, kvd)},
                    "v": {"w": g(d, kvd)},
                    "o": {"w": g(qd, d)},
                    "ln2": {"scale": np.ones((d,), np.float32),
                            "bias": np.zeros((d,), np.float32)},
                    "fc1": {"w": g(d, i)},
                    "fc2": {"w": g(i, d)},
                    "scale_attn": np.full((d,), cfg.layer_scale_initial_scale,
                                          np.float32),
                    "scale_mlp": np.full((d,), cfg.layer_scale_initial_scale,
                                         np.float32),
                }
                for _ in range(cfg.num_hidden_layers)
            ]
        }

    from sopro_tpu.codec.mimi_config import downsample_spec, upsample_spec

    embed = g(cfg.num_quantizers, cfg.codebook_size, cfg.codebook_dim, scale=1.0)
    out_sem = g(cfg.codebook_dim, cfg.hidden_size)
    out_ac = g(cfg.codebook_dim, cfg.hidden_size)
    ns = cfg.num_semantic_quantizers
    dec_embed = np.concatenate([embed[:ns] @ out_sem, embed[ns:] @ out_ac], axis=0)

    ds = downsample_spec(cfg)
    us = upsample_spec(cfg)
    return {
        "encoder": seanet_p(encoder_plan(cfg)),
        "enc_tf": tf_p(),
        "downsample": {"w": g(ds["k"], ds["in"], ds["out"])},
        "upsample": {"w": g(us["k"], us["in"] // us["groups"], us["out"])},
        "dec_tf": tf_p(),
        "decoder": seanet_p(decoder_plan(cfg)),
        "quantizer": {
            "embed": embed,
            "dec_embed": dec_embed,
            "in_proj_sem": g(cfg.hidden_size, cfg.codebook_dim),
            "in_proj_ac": g(cfg.hidden_size, cfg.codebook_dim),
        },
    }
