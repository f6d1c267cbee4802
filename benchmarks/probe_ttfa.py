"""Timeline probe for burst TTFA: one warmed 8-way burst, per-session stamp
deltas (prep | queue | admit->tick | tick->chunk) plus the scheduler's
per-tick dispatch timeline, to locate where the first-chunk milliseconds go.
Run on the live TPU."""

from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from sopro_tpu import RuntimeConfig, SoproTTS
    from sopro_tpu.profiling import enable_compilation_cache
    from sopro_tpu.serve.scheduler import ContinuousBatcher

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    rng = np.random.default_rng(0)
    fps = float(tts.cfg.mimi_fps)
    ref_tokens = rng.integers(
        0, tts.cfg.codebook_size, size=(int(5 * fps), tts.cfg.num_codebooks)
    ).astype(np.int32)
    ref = tts.engine.prepare_reference(ref_tokens)
    text = ("The quick brown fox jumps over the lazy dog while the "
            "continuous batcher streams audio to every client at once.")

    b = ContinuousBatcher(tts, slots=8, chunk_frames=16, pcm16=True)
    b.start()
    b.warmup(ref=ref)

    # instrument tick dispatch/process with wall stamps
    ticks = []
    orig_dispatch = b._dispatch_tick
    orig_process = b._process_tick

    def dispatch():
        t0 = time.perf_counter()
        out = orig_dispatch()
        ticks.append(("dispatch", t0, time.perf_counter(),
                      out[2] if out else None))
        return out

    def process(packed, snap, cf_used, *a):
        t0 = time.perf_counter()
        orig_process(packed, snap, cf_used, *a)
        ticks.append(("process", t0, time.perf_counter(), cf_used))

    b._dispatch_tick = dispatch
    b._process_tick = process

    # one full 8-burst (second burst after warm ticks settle)
    for trial in range(2):
        ticks.clear()
        handles = {}
        base = time.perf_counter()

        def client(i):
            h = b.submit(text, ref, seed=100 + i, max_frames=150)
            handles[i] = h
            for _ in h.chunks():
                pass

        ths = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        if trial == 0:
            continue
        print("per-session stamps (ms relative to burst start):")
        for i in sorted(handles):
            h = handles[i]
            row = {
                "created": (h.created_s - base) * 1e3,
                "prep_done": (h.prep_done_s - base) * 1e3,
                "admitted": (h.admitted_s - base) * 1e3,
                "first_tick": (h.first_tick_s - base) * 1e3,
                "first_chunk": (h.created_s + h.first_chunk_s - base) * 1e3,
            }
            print(f"  s{i}: " + " ".join(f"{k}={v:7.1f}" for k, v in row.items()),
                  flush=True)
        print("tick timeline (ms relative to burst start):")
        for kind, t0, t1, cf in ticks[:40]:
            print(f"  {kind:8s} {(t0 - base) * 1e3:7.1f} -> "
                  f"{(t1 - base) * 1e3:7.1f}  (cf={cf})", flush=True)
    st = b.stats()
    b.stop()
    print({k: st.get(k) for k in (
        "ttfa_p50_ms", "ttfa_prep_p50_ms", "ttfa_queue_p50_ms",
        "ttfa_admit_tick_p50_ms", "ttfa_tick_chunk_p50_ms",
        "tick_dispatch_ms_p50", "tick_read_ms_p50", "ramp_ticks", "admit_groups")})


if __name__ == "__main__":
    main()
