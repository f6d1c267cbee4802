"""Decompose the AR per-step cost on-chip (net of tunnel RTT).

Times, via the N=1-vs-N=3 repeat-inside-one-dispatch trick:
  * full ar_generate, fused Pallas path        (production single-stream)
  * full ar_generate, XLA step path
  * kernel-only while_loop: ar_step_pallas with argmax feedback, no sampler
  * sampler-only loop: anti_loop_settings + sample_token + history updates
    on a fixed logits row

This tells whether the ~100 us/step budget is weight-slab DMA (attack with
int8 slabs) or per-step glue (attack by moving the loop inside the kernel).
"""

from __future__ import annotations

import time

import numpy as np


def timed(fn, n=5, warm=2):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import sopro_tpu.models.sopro as M
    import sopro_tpu.sampling as S
    from sopro_tpu import RuntimeConfig, SoproTTS
    from sopro_tpu.models import generator as G
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    cfg = tts.cfg
    p = eng.params
    print("backend:", jax.devices()[0].platform, flush=True)

    rng = np.random.default_rng(0)
    T = 400
    cond_ar = jnp.asarray(
        rng.standard_normal((1, T + 1, cfg.d_model)) * 0.02, eng.dtype
    )
    txt_seq = jnp.asarray(
        rng.standard_normal((1, 64, cfg.d_model)) * 0.02, eng.dtype
    )
    text_mask = jnp.ones((1, 64), bool)
    settings = M.default_ar_settings()

    def rep(body, reps):
        @jax.jit
        def run(seed):
            def it(i, acc):
                return acc + body(seed + i)

            return lax.fori_loop(0, reps, it, jnp.int32(0))

        return run

    def measure(name, body, n_steps):
        r1, r3 = rep(body, 1), rep(body, 3)
        t1 = timed(lambda: jax.block_until_ready(r1(jnp.int32(0))))
        t3 = timed(lambda: jax.block_until_ready(r3(jnp.int32(0))))
        per = (t3 - t1) / 2.0
        print(
            f"{name:34s} {per*1e3:8.2f} ms/run -> {per/n_steps*1e6:7.1f} us/step"
            f"   (n1 {t1*1e3:6.1f} n3 {t3*1e3:6.1f})",
            flush=True,
        )
        return per

    # ---- full ar_generate, both paths ------------------------------------
    kv_xla = G.build_text_kv_caches(p["ar"], cfg, txt_seq, text_mask)
    ctx_pallas = eng._ar_kv(p, txt_seq, text_mask)

    def full_gen(ctx):
        def body(seed):
            carry = M.ar_generate(
                p, cfg, cond_ar, txt_seq, text_mask,
                jax.random.PRNGKey(seed), settings, T + 1, kv_caches=ctx,
            )
            return jnp.sum(carry.tokens[:, :4]).astype(jnp.int32)

        return body

    measure("ar_generate pallas (sampled)", full_gen(ctx_pallas), T + 1)
    measure("ar_generate XLA (sampled)", full_gen(kv_xla), T + 1)

    # ---- kernel-only loop: argmax feedback, no sampler -------------------
    from sopro_tpu.ops.pallas_ar import ar_step_pallas, pack_conv_state

    def kernel_only(seed):
        bufs0 = pack_conv_state(G.init_ar_conv_state(cfg, 1, eng.dtype))
        emb = p["cb_embed"]["emb"]

        def body(i, st):
            tok, bufs, acc = st
            x = cond_ar[:, 0] + jnp.take(emb, tok, axis=0)
            logits, bufs = ar_step_pallas(
                ctx_pallas.stacked, cfg, x, bufs,
                ctx_pallas.kv_k, ctx_pallas.kv_v, ctx_pallas.mask,
            )
            tok = jnp.argmax(logits[:, : cfg.codebook_size], -1).astype(
                jnp.int32
            ) + seed * 0
            return tok, bufs, acc + tok[0]

        _, _, acc = lax.fori_loop(
            0, T + 1, body, (jnp.zeros((1,), jnp.int32), bufs0, jnp.int32(0))
        )
        return acc

    measure("pallas kernel-only (argmax)", kernel_only, T + 1)

    # ---- sampler-only loop on fixed logits -------------------------------
    logits0 = jnp.asarray(
        rng.standard_normal((1, cfg.codebook_size + 1)), jnp.float32
    )

    def sampler_only(seed):
        hist0 = S.init_history(1)
        key0 = jax.random.split(jax.random.PRNGKey(0), 1)

        def body(i, st):
            hist, key, streak, last, acc = st
            top_p, temp = S.anti_loop_settings(
                hist, jnp.zeros((1,), jnp.int32) + i, streak,
                base=(settings.top_p, settings.temperature),
                recovery=(settings.recovery_top_p, settings.recovery_temp),
                loop_streak=settings.loop_streak, enabled=True,
            )
            splits = jax.vmap(jax.random.split)(key)
            key, sub = splits[:, 0], splits[:, 1]
            tok = S.sample_token(
                sub, logits0 + seed * 0, hist, jnp.zeros((1,), jnp.int32) + i,
                S.SamplerSettings(top_p=top_p, temperature=temp),
            )
            hist = S.push_history(hist, tok)
            streak, last = S.update_streak(
                streak, last, tok, jnp.zeros((1,), jnp.int32) + i
            )
            return hist, key, streak, last, acc + tok[0]

        st = lax.fori_loop(
            0, T + 1, body,
            (hist0, key0, jnp.zeros((1,), jnp.int32),
             jnp.zeros((1,), jnp.int32), jnp.int32(0)),
        )
        return st[-1]

    measure("sampler-only loop", sampler_only, T + 1)


if __name__ == "__main__":
    main()
