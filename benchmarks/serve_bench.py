"""Batched-serving benchmark (BASELINE configs 4-5): N concurrent streaming
sessions through the continuous-batching scheduler on one chip.

Reports per-session TTFA/RTF and aggregate generated-audio throughput. The
reference cannot run this shape at all — its server FIFO-serializes behind a
global lock (reference: demo/server.py:56), so its aggregate throughput at N
clients is its single-stream throughput.

Usage: python benchmarks/serve_bench.py [n_sessions] [slots] [chunk_frames]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_sessions = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    chunk_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from sopro_tpu import RuntimeConfig, SoproTTS
    from sopro_tpu.profiling import enable_compilation_cache
    from sopro_tpu.serve.scheduler import ContinuousBatcher

    enable_compilation_cache()
    rt = RuntimeConfig(
        compute_dtype=os.environ.get("SOPRO_BENCH_DTYPE", "bfloat16")
    )
    tts = SoproTTS.from_random(seed=0, runtime=rt)

    rng = np.random.default_rng(0)
    fps = float(tts.cfg.mimi_fps)
    ref = tts.engine.prepare_reference(
        rng.integers(0, tts.cfg.codebook_size,
                     size=(int(5 * fps), tts.cfg.num_codebooks)).astype(np.int32)
    )
    batcher = ContinuousBatcher(
        tts, slots=slots, chunk_frames=chunk_frames, max_frames=400
    )
    batcher.start()
    batcher.warmup(ref=ref)

    text = (
        "The quick brown fox jumps over the lazy dog while the curious cat "
        "watches from a sunny windowsill in the early morning light."
    )
    max_frames = 200  # ~16 s per session

    results = {}

    def client(i):
        t0 = time.perf_counter()
        h = batcher.submit(text, ref, seed=i, max_frames=max_frames)
        samples = 0
        for c in h.chunks():
            samples += c.shape[1]
        wall = time.perf_counter() - t0
        results[i] = {
            "ttfa_ms": (h.first_chunk_s or 0.0) * 1000.0,
            "audio_s": samples / 24000.0,
            "wall_s": wall,
        }

    t_start = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(n_sessions)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total_wall = time.perf_counter() - t_start
    sched_stats = batcher.stats()
    batcher.stop()

    audio_total = sum(r["audio_s"] for r in results.values())
    per_rtf = [r["wall_s"] / r["audio_s"] for r in results.values()]
    out = {
        "metric": f"batched serving: {n_sessions} concurrent sessions, {slots} slots",
        "value": round(audio_total / total_wall, 2),
        "unit": "aggregate_x_realtime",
        "vs_baseline": round((audio_total / total_wall) / (1.0 / 0.05), 2),
        "extras": {
            "sessions": n_sessions,
            "slots": slots,
            "chunk_frames": chunk_frames,
            "total_audio_s": round(audio_total, 1),
            "total_wall_s": round(total_wall, 1),
            "per_session_rtf_p50": round(statistics.median(per_rtf), 4),
            "ttfa_ms_p50": round(
                statistics.median(r["ttfa_ms"] for r in results.values()), 1
            ),
            "ttfa_ms_max": round(
                max(r["ttfa_ms"] for r in results.values()), 1
            ),
            # scheduler-internal timing: where a tick's wall time goes
            "tick_dispatch_ms_p50": sched_stats["tick_dispatch_ms_p50"],
            "tick_read_ms_p50": sched_stats["tick_read_ms_p50"],
            "ticks": sched_stats["ticks"],
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
