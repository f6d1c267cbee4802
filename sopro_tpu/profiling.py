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
