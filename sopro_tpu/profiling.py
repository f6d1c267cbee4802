"""Observability: structured timing metrics, jax.profiler hooks, and the
persistent compilation cache.

The reference's only instrumentation is wall-clock prints in its CLI
(reference: src/sopro/cli.py:87-89,159-165) and browser-side TTFA
(demo/static/app.js:905-908). Here TTFA/RTF/frames-per-second are
first-class (SURVEY.md §5), plus device traces via `jax.profiler`.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Persist compiled executables across processes (first compile of the
    135M graph set costs minutes on a fresh process; cached runs skip it)."""
    import jax

    cache_dir = cache_dir or os.environ.get(
        "SOPRO_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@contextlib.contextmanager
def device_trace(out_dir: str):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class GenerationMetrics:
    """Per-utterance structured metrics."""

    ttfa_s: Optional[float] = None
    wall_s: float = 0.0
    audio_s: float = 0.0
    frames: int = 0

    @property
    def rtf(self) -> float:
        return self.wall_s / self.audio_s if self.audio_s > 0 else float("inf")

    @property
    def frames_per_s(self) -> float:
        return self.frames / self.wall_s if self.wall_s > 0 else 0.0

    def to_dict(self) -> Dict:
        return {
            "ttfa_ms": round(self.ttfa_s * 1000, 1) if self.ttfa_s else None,
            "wall_s": round(self.wall_s, 4),
            "audio_s": round(self.audio_s, 3),
            "rtf": round(self.rtf, 5),
            "frames_per_s": round(self.frames_per_s, 1),
        }


class Timer:
    """Named section timer: `with timer.section("ar"): ...`."""

    def __init__(self):
        self.sections: Dict[str, float] = {}
        self._order: List[str] = []

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if name not in self.sections:
                self._order.append(name)
            self.sections[name] = self.sections.get(name, 0.0) + dt

    def report(self) -> str:
        return " ".join(
            f"{k}={self.sections[k] * 1000:.1f}ms" for k in self._order
        )


# --------------------------------------------------------------------------
# analytic FLOP accounting for the Pallas stages
# --------------------------------------------------------------------------
#
# XLA's post-compile cost_analysis() is the MFU numerator of record, but it
# has two blind spots on this pipeline:
#   1. Mosaic kernels are custom calls — their work is counted as ZERO
#      (the whole-loop resident AR decode and the fused SEANet vocoder
#      together are ~60% of the batch-32 graph's algorithmic flops);
#   2. while_loop bodies are counted ONCE (the trip count is dynamic), so
#      the XLA AR fallback is undercounted by a factor of the step count.
# These formulas restore that work using the SAME counting conventions XLA
# applies to the equivalent XLA-stage graphs (conv: 2*T*k*Cin*Cout;
# transpose conv in the polyphase dense-matmul form both our paths compute:
# 2*T*(2*Cin)*(s*Cout)), so "MFU" means the same thing whichever path runs.
# Validated against measured cost_analysis deltas on v5e: switching the
# SEANet stage pallas->XLA adds 1606.9 G at B=32/T25=302 (formula: 1594 G,
# -0.8% from edge padding); the XLA AR while body counts 0.70 G per trip at
# B=32/L=64 (formula: 0.68 G).


def ar_step_flops(cfg, text_len: int) -> float:
    """Matmul FLOPs of ONE AR decode step for ONE row.

    Per ssmlite layer (ops/blocks.py): GLU pro d->2d (4d^2), FFN d->4d->d
    (16d^2), depthwise conv (2*k*d). Per text cross-attention layer
    (every cfg.ar_text_attn_freq-th layer): q+out projections (4d^2) and
    score/value contractions against the length-`text_len` KV (4*L*d).
    Plus the vocab head d -> codebook_size+1."""
    d = int(cfg.d_model)
    per_layer = 20 * d * d + 2 * int(cfg.ar_kernel) * d
    n_x = sum(
        1 for i in range(int(cfg.n_layers_ar))
        if (i + 1) % int(cfg.ar_text_attn_freq) == 0
    )
    xattn = 4 * d * d + 4 * int(text_len) * d
    head = 2 * d * (int(cfg.codebook_size) + 1)
    return float(int(cfg.n_layers_ar) * per_layer + n_x * xattn + head)


def ar_loop_flops(cfg, batch: int, text_len: int, steps: int) -> float:
    """Algorithmic FLOPs of the whole AR decode stage (`steps` sequential
    steps over `batch` rows) — what cost_analysis would report for the XLA
    per-step path if it could see the while_loop's trip count."""
    return float(batch) * float(steps) * ar_step_flops(cfg, text_len)


def nar_heads_flops(cfg, batch: int, t: int) -> float:
    """Matmul FLOPs of the NAR stages' head projections — the einsum
    (z + hid_h) @ W_h over every stage's heads that the fused heads+argmax
    kernel (ops/pallas_nar.py) replaces. cost_analysis counted this dot as
    2*B*T*H*hd*V when it ran as XLA; the custom call counts as zero, so
    bench restores it with the same convention at the NAR frame bucket."""
    hd, v = int(cfg.nar_head_dim), int(cfg.codebook_size)
    n_heads = sum(len(ix) for ix in cfg.stage_indices().values())
    return 2.0 * float(batch) * float(t) * n_heads * hd * v


def seanet_decoder_flops(mimi_cfg, batch: int, t25: int) -> float:
    """Algorithmic FLOPs of the SEANet decoder (the stage the fused Pallas
    vocoder replaces) for `batch` rows of `t25` 25 Hz frames, walking the
    same plan both implementations execute (codec/mimi_config.decoder_plan)."""
    from sopro_tpu.codec.mimi_config import CONV, CONVT, RESNET, decoder_plan

    t = int(t25)
    total = 0.0
    for kind, spec in decoder_plan(mimi_cfg):
        if kind == CONV:
            total += 2.0 * t * spec["k"] * spec["in"] * spec["out"]
        elif kind == CONVT:
            s = int(spec["stride"])
            total += 2.0 * t * (2 * spec["in"]) * (s * spec["out"])
            t *= s
        elif kind == RESNET:
            c3, c1 = spec["convs"]
            total += 2.0 * t * c3["k"] * c3["in"] * c3["out"]
            total += 2.0 * t * c1["k"] * c1["in"] * c1["out"]
    return float(batch) * total
