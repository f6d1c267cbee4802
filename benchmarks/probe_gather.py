"""Probe alternative formulations of the RVQ dequant gather+sum at the
batch-32 decode shape: codes [B, T, Q=32] -> sum_q dec[q, codes[..,q], :].
XLA's single flattened gather materializes [B, T, Q, H] (158 MB bf16)
through HBM; the alternatives trade that against per-codebook gathers or
one-hot MXU matmuls."""

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
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    rng = np.random.default_rng(0)

    B, T, Q = 32, 151, int(tts.cfg.num_codebooks)
    codes = jnp.asarray(
        rng.integers(0, tts.cfg.codebook_size, (B, T, Q)), jnp.int32
    )
    dec = eng.mimi_params["quantizer"]["dec_embed"]  # [Q, V, H]
    V, H = int(dec.shape[1]), int(dec.shape[2])
    print(f"dec table [Q={Q}, V={V}, H={H}] {dec.dtype}", flush=True)

    def cur(dec, c):
        offs = jnp.arange(Q, dtype=c.dtype) * V
        flat = dec.reshape(-1, H)
        emb = jnp.take(flat, c + offs[None, None, :], axis=0)
        return jnp.sum(emb, axis=2)

    def per_q(dec, c):
        out = jnp.zeros((B, T, H), dec.dtype)
        for q in range(Q):
            out = out + jnp.take(dec[q], c[:, :, q], axis=0)
        return out

    def per_q_scan(dec, c):
        def step(acc, qv):
            d, cq = qv
            return acc + jnp.take(d, cq, axis=0), None

        acc0 = jnp.zeros((B, T, H), dec.dtype)
        out, _ = lax.scan(step, acc0, (dec, jnp.moveaxis(c, 2, 0)))
        return out

    def onehot(dec, c):
        oh = jax.nn.one_hot(c, V, dtype=dec.dtype)  # [B, T, Q, V]
        return jnp.einsum("btqv,qvh->bth", oh, dec)

    def onehot_flat(dec, c):
        offs = jnp.arange(Q, dtype=c.dtype) * V
        oh = jax.nn.one_hot(
            (c + offs[None, None]).reshape(B, T * Q), Q * V, dtype=dec.dtype
        )  # [B, T*Q, Q*V] -- too big? (151*32 x 65536) = 9.9M lanes/row: skip
        return jnp.einsum("btn,nh->bth", oh.reshape(B, T, Q, Q * V).sum(2),
                          dec.reshape(-1, H))

    def rep(body, reps):
        @jax.jit
        def run(dec, c):
            def it(i, acc):
                return acc + 1e-6 * jnp.mean(body(dec, (c + i) % V))

            return lax.fori_loop(0, reps, it, jnp.float32(0.0))

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

    # correctness first (vs current), then timing
    ref = np.asarray(cur(dec, codes), np.float32)
    for name, body in (
        ("current_flat_take", cur),
        ("per_q_unrolled", per_q),
        ("per_q_scan", per_q_scan),
        ("onehot_einsum", onehot),
    ):
        got = np.asarray(body(dec, codes), np.float32)
        err = float(np.max(np.abs(got - ref)))
        r1, r9 = rep(body, 1), rep(body, 9)
        t1 = timed(r1, dec, codes)
        t9 = timed(r9, dec, codes)
        per = (t9 - t1) / 8.0
        print(f"{name:18s} on-chip {per * 1e3:7.3f} ms  maxerr {err:.3e} "
              f"(n1 {t1 * 1e3:6.1f}, n9 {t9 * 1e3:6.1f})", flush=True)


if __name__ == "__main__":
    main()
