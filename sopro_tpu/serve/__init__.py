"""Serving: continuous-batching scheduler + HTTP server.

The reference demo server serializes all generation behind one global lock
(reference: demo/server.py:56,223,240 — concurrency 1). Here N concurrent
sessions share one device batch: per-row AR decode state, windowed NAR and a
per-row-masked streaming vocoder advance together every tick, and sessions
join/leave slots between ticks (BASELINE configs 4-5).
"""

from sopro_tpu.serve.scheduler import ContinuousBatcher, SessionHandle

__all__ = ["ContinuousBatcher", "SessionHandle"]
