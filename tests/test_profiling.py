"""Analytic FLOP accounting (profiling.py) vs XLA's own cost model.

bench.py's MFU numerator restores the work XLA's post-compile
cost_analysis() cannot see (Mosaic custom calls count as zero; while-loop
bodies count once). These tests pin the analytic formulas against the one
oracle that exists on every backend: cost_analysis() of the *XLA* version
of the same stage, where the counting conventions must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopro_tpu.codec.mimi_config import (
    CONV, CONVT, ELU, MimiConfig, RESNET, decoder_plan,
)
from sopro_tpu.codec.mimi_jax import seanet_apply
from sopro_tpu.config import SoproTTSConfig
from sopro_tpu.profiling import (
    ar_loop_flops, ar_step_flops, seanet_decoder_flops,
)


def _graph_flops(fn, *args) -> float:
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns a per-device list
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _random_seanet_params(plan, rng):
    params = []
    for kind, spec in plan:
        if kind in (CONV, CONVT):
            w = rng.standard_normal((spec["k"], spec["in"], spec["out"]))
            params.append({"w": jnp.asarray(w, jnp.float32)})
        elif kind == RESNET:
            convs = []
            for cs in spec["convs"]:
                w = rng.standard_normal((cs["k"], cs["in"], cs["out"]))
                convs.append({"w": jnp.asarray(w, jnp.float32)})
            params.append({"convs": tuple(convs)})
        elif kind == ELU:
            params.append({})
    return params


def test_seanet_decoder_flops_matches_xla_cost_model():
    """The formula must track cost_analysis() of the XLA SEANet decoder to
    within a few percent (the delta is ELU/bias elementwise work and edge
    padding, which the matmul-only formula deliberately omits)."""
    cfg = MimiConfig()
    plan = decoder_plan(cfg)
    rng = np.random.default_rng(0)
    params = _random_seanet_params(plan, rng)
    b, t25 = 2, 16
    x = jnp.asarray(
        rng.standard_normal((b, t25, cfg.hidden_size)), jnp.float32
    )

    measured = _graph_flops(lambda a: seanet_apply(params, plan, a), x)
    predicted = seanet_decoder_flops(cfg, b, t25)
    assert measured > 0
    # formula counts matmuls only; XLA adds elementwise + edge-padding work
    assert predicted <= measured * 1.02
    assert predicted >= measured * 0.90


def test_ar_step_flops_structure():
    """ar_step_flops: the text-KV term must scale linearly with text length
    at exactly 4*d per token per cross-attn layer, and the whole-loop total
    must be batch x steps x per-step."""
    cfg = SoproTTSConfig()
    d = cfg.d_model
    n_x = sum(
        1 for i in range(cfg.n_layers_ar)
        if (i + 1) % cfg.ar_text_attn_freq == 0
    )
    f64, f128 = ar_step_flops(cfg, 64), ar_step_flops(cfg, 128)
    assert f128 - f64 == pytest.approx(n_x * 4 * 64 * d)
    assert ar_loop_flops(cfg, 8, 64, 100) == pytest.approx(8 * 100 * f64)
