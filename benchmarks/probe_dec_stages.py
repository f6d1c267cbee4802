"""Focused on-chip probe of the batch-32 Mimi-decode XLA stages
(rvq+upsample, dec transformer, and their sum) — used to evaluate the
round-5 upsample-polyphase / attention-accumulation changes without paying
the full profile.py compile bill. Rep-trick timing (see docs/benchmarks.md).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sopro_tpu import RuntimeConfig, SoproTTS
    from sopro_tpu.codec.mimi_jax import (
        mimi_convt, mimi_transformer, rvq_decode, upsample_spec,
    )
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    mcfg = eng.mimi_cfg
    rng = np.random.default_rng(0)

    B, T = 32, 151
    codes = jnp.asarray(
        rng.integers(0, tts.cfg.codebook_size, (B, T, tts.cfg.num_codebooks)),
        jnp.int32,
    )
    emb0 = jnp.asarray(
        rng.standard_normal((B, 2 * T, mcfg.hidden_size)), eng.dtype
    )
    pos = jnp.arange(2 * T)
    mp = eng.mimi_params

    def rep(body, reps):
        @jax.jit
        def run(mp, x0):
            return lax.fori_loop(0, reps, lambda i, x: body(mp, x, i), x0)

        return run

    def timed(fn, *args, n=5, warm=2):
        for _ in range(warm):
            jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def tf_body(mp, x, i):
        y = mimi_transformer(mp["dec_tf"], mcfg, x + 0.0 * i, pos)
        return x + 1e-6 * y

    def rvq_up_body(mp, x, i):
        e = rvq_decode(mp["quantizer"], (codes + i) % 2048)
        e = mimi_convt(mp["upsample"], e, upsample_spec(mcfg))
        return x + 1e-6 * jnp.mean(e)

    for name, body, x0 in (
        ("rvq+upsample", rvq_up_body, jnp.zeros((), eng.dtype)),
        ("dec_transformer", tf_body, emb0),
    ):
        r1, r5 = rep(body, 1), rep(body, 5)
        t1 = timed(r1, mp, x0)
        t5 = timed(r5, mp, x0)
        per = (t5 - t1) / 4.0
        print(f"{name:18s} on-chip {per * 1e3:7.2f} ms "
              f"(n1 {t1 * 1e3:6.1f}, n5 {t5 * 1e3:6.1f})", flush=True)


if __name__ == "__main__":
    main()
