"""Serving-path probe on the live device: 8 concurrent streams through the
continuous batcher, reporting aggregate x-realtime and per-tick wall stats.

Usage: python benchmarks/serve_probe.py [slots] [chunk_frames] [max_frames]
"""

from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from sopro_tpu import RuntimeConfig, SoproTTS
    from sopro_tpu.profiling import enable_compilation_cache
    from sopro_tpu.serve.scheduler import ContinuousBatcher

    slots = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cf = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    max_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 150

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    sr = int(tts.engine.mimi_cfg.sampling_rate)
    print("backend:", jax.devices()[0].platform,
          f"slots={slots} cf={cf} max_frames={max_frames}", flush=True)

    rng = np.random.default_rng(0)
    ref_tokens = rng.integers(
        0, tts.cfg.codebook_size, size=(62, tts.cfg.num_codebooks)
    ).astype(np.int32)
    ref = tts.engine.prepare_reference(ref_tokens)
    text = ("The quick brown fox jumps over the lazy dog while the curious "
            "cat watches from a sunny windowsill in the early morning light.")

    batcher = ContinuousBatcher(tts, slots=slots, chunk_frames=cf, pcm16=True)
    batcher.start()
    t0 = time.perf_counter()
    batcher.warmup(ref=ref)
    print(f"warmup: {time.perf_counter()-t0:.1f}s", flush=True)

    for trial in range(2):
        done = {}

        def client(i):
            h = batcher.submit(text, ref, seed=100 * trial + i,
                               max_frames=max_frames)
            done[i] = sum(c.shape[1] for c in h.chunks()) / sr

        ticks0 = batcher.ticks
        t0 = time.perf_counter()
        ths = [threading.Thread(target=client, args=(i,))
               for i in range(slots)]
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        dt = time.perf_counter() - t0
        nticks = batcher.ticks - ticks0
        agg = sum(done.values()) / dt
        print(f"trial {trial}: {sum(done.values()):.1f}s audio in {dt:.2f}s "
              f"-> {agg:.1f}x realtime | {nticks} ticks, "
              f"{dt/max(nticks,1)*1e3:.0f} ms/tick | "
              f"stats={batcher.stats()}", flush=True)
    batcher.stop()


if __name__ == "__main__":
    main()
