"""On-chip stage times net of tunnel RTT: loop each stage N times inside ONE
jitted dispatch (outputs chained into inputs so XLA can't elide iterations),
then difference N=1 vs N=5 runs — the slope is pure device time.

Stages: NAR refine, full mimi_decode, decoder transformer only, SEANet
decoder only, at the single-stream long-form shape (B=1, T=401) and the
batch-32 offline shape (B=32, T=151).
"""

from __future__ import annotations

import functools
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

    from sopro_tpu import RuntimeConfig, SoproTTS
    from sopro_tpu.codec.mimi_jax import (
        decoder_plan, mimi_convt, mimi_transformer, rvq_decode, seanet_apply,
        upsample_spec,
    )
    from sopro_tpu.models.nar import nar_refine
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    cfg = tts.cfg
    mcfg = eng.mimi_cfg
    print("backend:", jax.devices()[0].platform, flush=True)

    rng = np.random.default_rng(0)

    def rep(body, reps):
        """Run body reps times inside one jit; chain an int32 perturbation of
        the inputs through iterations so nothing is CSE'd or hoisted."""

        @jax.jit
        def run(x0):
            def it(i, x):
                return body(x, i)

            return lax.fori_loop(0, reps, it, x0)

        return run

    for label, B, T in (("single-stream", 1, 401), ("batch-32", 32, 151)):
        codes = jnp.asarray(
            rng.integers(0, cfg.codebook_size, (B, T, cfg.num_codebooks)),
            jnp.int32,
        )
        cond = jnp.asarray(
            rng.standard_normal((B, T, cfg.d_model)), eng.dtype
        )
        rvq1 = codes[:, :, 0]
        mp, p = eng.mimi_params, eng.params

        # ---- NAR ----
        from sopro_tpu.models.sopro import cb_spec as _cb_spec

        def nar_body(x, i):
            toks = nar_refine(
                p["nar"], p["cb_embed"], _cb_spec(cfg),
                p["nar_prev_cb_weights"],
                cfg, cond, (x + i) % cfg.codebook_size,
            )
            # consume EVERY codebook: returning a single stage's slice lets
            # XLA dead-code-eliminate the other stage passes entirely
            return jnp.sum(toks, axis=-1) % cfg.codebook_size

        # ---- full vocoder ----
        def voc_body(x, i):
            wav = mimi_decode_codes((x[..., None] + codes + i) % 2048)
            # fold the waveform back into an int token grid
            return (x + jnp.mean(wav).astype(jnp.int32)) % 2048

        def mimi_decode_codes(c):
            from sopro_tpu.codec.mimi_jax import mimi_decode

            return mimi_decode(mp, mcfg, c)

        # ---- vocoder pieces ----
        emb0 = jnp.asarray(
            rng.standard_normal((B, 2 * T, mcfg.hidden_size)), eng.dtype
        )
        pos = jnp.arange(2 * T)

        def tf_body(x, i):
            y = mimi_transformer(mp["dec_tf"], mcfg, x + 0.0 * i, pos)
            return x + 1e-6 * y

        def seanet_body(x, i):
            y = seanet_apply(mp["decoder"], decoder_plan(mcfg), x + 0.0 * i)
            return x + 1e-6 * jnp.mean(y)

        def rvq_up_body(x, i):
            e = rvq_decode(mp["quantizer"], (codes + i) % 2048)
            e = mimi_convt(mp["upsample"], e, upsample_spec(mcfg))
            return x + 1e-6 * jnp.mean(e)

        cases = [
            ("nar_refine", nar_body, rvq1),
            ("mimi_decode(full)", voc_body, rvq1),
            ("dec_transformer", tf_body, emb0),
            ("seanet_decoder", seanet_body, emb0),
            ("rvq+upsample", rvq_up_body, jnp.zeros((), eng.dtype)),
        ]
        print(f"--- {label}: B={B} T={T} ({T/12.5:.1f}s audio/row) ---",
              flush=True)
        for name, body, x0 in cases:
            r1, r5 = rep(body, 1), rep(body, 5)
            t1 = timed(lambda: jax.block_until_ready(r1(x0)))
            t5 = timed(lambda: jax.block_until_ready(r5(x0)))
            per = (t5 - t1) / 4.0
            print(
                f"{name:20s} on-chip {per*1e3:7.2f} ms   "
                f"(n1 {t1*1e3:6.1f} ms, n5 {t5*1e3:6.1f} ms)",
                flush=True,
            )


if __name__ == "__main__":
    main()
