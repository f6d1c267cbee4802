"""Isolate the admit-path graph costs on the live TPU: the plain fused join,
the ramp tick, and the fused join+ramp-tick, each timed blocking over a few
reps (wall = dispatch + device + readback of outputs kept on device except
the ramp tick's packed buffer)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

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

    b = ContinuousBatcher(tts, slots=8, chunk_frames=16, pcm16=True)
    carry, cond, txt_kv, row, mimi_state, emitted = b.bench_state(ref)

    ids = tts.encode_text("join ramp probe text")
    ids_p = np.zeros((1, b.L), np.int32)
    ids_p[0, : len(ids)] = ids
    msk = np.zeros((1, b.L), bool)
    msk[0, : len(ids)] = True
    ids_b = np.concatenate([ids_p] * b.B, axis=0)
    mask_b = np.concatenate([msk] * b.B, axis=0)
    ref_parts = tuple(ref for _ in range(b.B))
    strength_b = np.ones((b.B,), np.float32)
    seeds_b = np.arange(b.B, dtype=np.int32)
    jmask = np.ones((b.B,), bool)
    src = np.arange(b.B, dtype=np.int32)
    scal = {
        "top_p": np.full((b.B,), 0.9, np.float32),
        "temp": np.full((b.B,), 1.05, np.float32),
        "rtp": np.full((b.B,), 0.85, np.float32),
        "rtemp": np.full((b.B,), 1.2, np.float32),
        "min_gen": np.full((b.B,), 1, np.int32),
        "max_frames": np.full((b.B,), 150, np.int32),
    }

    def timed(name, fn, reps=5):
        out = fn()
        jax.block_until_ready(out)  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append((time.perf_counter() - t0) * 1e3)
        ts.sort()
        print(f"{name:14s} min {ts[0]:7.1f} ms  med {ts[len(ts)//2]:7.1f} ms",
              flush=True)

    timed("join", lambda: b._join(
        b.eng.params, carry, cond, txt_kv, row, mimi_state, emitted,
        jmask, src, ids_b, mask_b, ref_parts, strength_b, seeds_b, scal))
    timed("ramp_tick", lambda: b._tick_ramp(
        b.eng.params, b.eng.mimi_params, carry, cond, txt_kv, row,
        mimi_state, emitted, b._res_static))
    timed("full_tick", lambda: b._tick(
        b.eng.params, b.eng.mimi_params, carry, cond, txt_kv, row,
        mimi_state, emitted, b._res_static))
    if b._join_ramp_tick is not None:
        timed("join+ramp", lambda: b._join_ramp_tick(
            b.eng.params, b.eng.mimi_params, carry, cond, txt_kv, row,
            mimi_state, emitted, jmask, src, ids_b, mask_b, ref_parts,
            strength_b, seeds_b, scal, b._res_static))


if __name__ == "__main__":
    main()
