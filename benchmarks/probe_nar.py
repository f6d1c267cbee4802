"""Micro-probe of the batch-32 NAR refine stage internals: full 4-stage
refine, one stage's trunk, one stage's fused-head einsum + argmax, and the
prev-codebook embedding sum (current [B,T,K,D] gather vs per-codebook
accumulation). Rep-trick timing; run on the live TPU."""

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
    from sopro_tpu.models.nar import nar_forward_stage, nar_refine
    from sopro_tpu.models.sopro import cb_spec as _cb_spec
    from sopro_tpu.ops.embeddings import cb_sum_embed_subset
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    cfg = tts.cfg
    rng = np.random.default_rng(0)

    B, T = 32, 151
    V = cfg.codebook_size
    p = eng.params
    spec = _cb_spec(cfg)
    cond = jnp.asarray(rng.standard_normal((B, T, cfg.d_model)), eng.dtype)
    rvq1 = jnp.asarray(rng.integers(0, V, (B, T)), jnp.int32)
    prev_emb = jnp.asarray(
        rng.standard_normal((B, T, cfg.d_model)), eng.dtype
    )
    stages = cfg.stage_order()
    sidx = cfg.stage_indices()
    last = stages[-1]
    k_last = 1 + sum(len(sidx[s]) for s in stages[:-1])
    toks_k = jnp.asarray(rng.integers(0, V, (B, T, k_last)), jnp.int32)
    cbs_last = [0] + [i for s in stages[:-1] for i in sidx[s]]
    print(f"stages={ {s: len(sidx[s]) for s in stages} } k_last={k_last}",
          flush=True)

    def rep(body, reps):
        @jax.jit
        def run(p, x0):
            return lax.fori_loop(0, reps, lambda i, x: body(p, x, i), x0)

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

    def full_refine(p, x, i):
        toks = nar_refine(
            p["nar"], p["cb_embed"], spec, p["nar_prev_cb_weights"],
            cfg, cond, (x + i) % V,
        )
        return jnp.sum(toks, axis=-1) % V

    def one_stage(p, x, i):
        logits = nar_forward_stage(
            p["nar"], cfg, last, cond, prev_emb + 0.0 * i,
        )
        return x + (1e-6 * jnp.sum(
            jnp.argmax(logits, axis=-1).astype(jnp.float32)
        )).astype(x.dtype) * jnp.ones_like(x)

    def embed_cur(p, x, i):
        e = cb_sum_embed_subset(
            p["cb_embed"], spec, (toks_k + i) % V, cbs_last,
            cb_weights=p["nar_prev_cb_weights"],
        )
        return x + (1e-6 * jnp.mean(e)).astype(x.dtype) * jnp.ones_like(x)

    def embed_per_k(p, x, i):
        tk = (toks_k + i) % V
        w = p["nar_prev_cb_weights"]
        w = w[jnp.asarray(cbs_last, jnp.int32)]
        w = jax.nn.softmax(w.astype(jnp.float32), axis=0).astype(eng.dtype)
        emb = p["cb_embed"]["emb"]
        out = None
        for j, cb in enumerate(cbs_last):
            g = jnp.take(emb, cb * spec.V + tk[:, :, j], axis=0) * w[j]
            out = g if out is None else out + g
        return x + (1e-6 * jnp.mean(out)).astype(x.dtype) * jnp.ones_like(x)

    cases = [
        ("nar_refine(all4)", full_refine, rvq1),
        ("stage_trunk+heads", one_stage, prev_emb),
        ("embed_sum_cur(K=%d)" % k_last, embed_cur, prev_emb),
        ("embed_sum_perk", embed_per_k, prev_emb),
    ]
    for name, body, x0 in cases:
        r1, r9 = rep(body, 1), rep(body, 5)
        t1 = timed(r1, p, x0)
        t9 = timed(r9, p, x0)
        per = (t9 - t1) / 4.0
        print(f"{name:22s} on-chip {per * 1e3:7.3f} ms "
              f"(n1 {t1 * 1e3:6.1f}, n5 {t9 * 1e3:6.1f})", flush=True)


if __name__ == "__main__":
    main()
