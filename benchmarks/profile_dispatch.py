"""Where does fused-synthesize wall time go on the live tunnel?

Breaks the single-dispatch synthesize into: Python-side jit call overhead
(big-pytree arg processing), device compute (block_until_ready, no
readback), and the packed readback transfer.

Usage: python benchmarks/profile_dispatch.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, n=5, warm=1):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from sopro_tpu import RuntimeConfig, SoproTTS
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    cfg = tts.cfg
    print("backend:", jax.devices()[0].platform, flush=True)

    rng = np.random.default_rng(0)
    ref_tokens = rng.integers(0, cfg.codebook_size,
                              size=(62, cfg.num_codebooks)).astype(np.int32)
    ref = eng.prepare_reference(ref_tokens)
    text = ("The quick brown fox jumps over the lazy dog while the curious "
            "cat watches from a sunny windowsill in the early morning light.")
    ids = np.asarray(tts.encode_text(text), np.int32)

    # ---- Python jit-call overhead with the big param pytree ---------------
    n_leaves = len(jax.tree.leaves(eng.params))
    print(f"param pytree leaves: {n_leaves}", flush=True)
    trivial = jax.jit(lambda p, x: x + 1.0)
    x1 = jax.device_put(jnp.zeros((), jnp.float32))
    trivial(eng.params, x1)

    def call_big():
        return jax.block_until_ready(trivial(eng.params, x1))

    mn, md = t(call_big, n=9)
    print(f"trivial jit w/ params arg: min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)

    trivial2 = jax.jit(lambda x: x + 1.0)
    trivial2(x1)

    def call_small():
        return jax.block_until_ready(trivial2(x1))

    mn, md = t(call_small, n=9)
    print(f"trivial jit scalar arg:    min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)

    # ---- fused synthesize: full / no-readback / readback-only -------------
    seeds = iter(range(1, 100))

    def full():
        return eng.synthesize_fused(
            ids, ref, max_frames=400, style_strength=1.0,
            seed=next(seeds), top_p=0.9, temperature=1.05, anti_loop=True,
            min_gen=12, pcm16=True,
        )

    mn, md = t(full, n=5)
    print(f"synthesize_fused (full, readback): min {mn*1e3:.1f} ms med "
          f"{md*1e3:.1f} ms", flush=True)

    # dispatch+compute only: call the cached jitted fn directly, block, no np
    key = ("synth_fused", 128, 400, True, True)
    for k in eng._fns:
        if k[0] == "synth_fused":
            key = k
    fn = eng._fns[key]
    lb = key[1]
    ids_p = np.zeros((1, lb), np.int32)
    ids_p[0, : len(ids)] = ids
    mask = np.zeros((1, lb), bool)
    mask[0, : len(ids)] = True
    ids_d, mask_d = jnp.asarray(ids_p), jnp.asarray(mask)

    def compute_only():
        packed = fn(eng.params, eng.mimi_params, ids_d, mask_d, ref,
                    jnp.float32(1.0), jax.random.PRNGKey(next(seeds)),
                    jnp.float32(0.9), jnp.float32(1.05), jnp.int32(12))
        return jax.block_until_ready(packed)

    mn_c, md_c = t(compute_only, n=5)
    print(f"synthesize_fused (block, no readback): min {mn_c*1e3:.1f} ms med "
          f"{md_c*1e3:.1f} ms", flush=True)

    packed = compute_only()

    def readback_only():
        return np.asarray(packed)

    # np.asarray of an already-ready buffer still pays the transfer each call?
    # (jax caches host copies after the first; use fresh buffers)
    fresh = [compute_only() for _ in range(6)]

    def readback_fresh():
        return np.asarray(fresh.pop())

    mn, md = t(readback_fresh, n=5, warm=1)
    print(f"packed readback only ({packed.nbytes/1e6:.2f} MB): "
          f"min {mn*1e3:.1f} ms med {md*1e3:.1f} ms", flush=True)

    # dispatch-call latency alone (async, should return fast)
    def dispatch_async():
        fn(eng.params, eng.mimi_params, ids_d, mask_d, ref,
           jnp.float32(1.0), jax.random.PRNGKey(next(seeds)),
           jnp.float32(0.9), jnp.float32(1.05), jnp.int32(12))

    mn, md = t(dispatch_async, n=5)
    print(f"dispatch call only (async): min {mn*1e3:.1f} ms med {md*1e3:.1f} "
          f"ms", flush=True)


if __name__ == "__main__":
    main()
