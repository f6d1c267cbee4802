"""AR decode-loop step-cost comparison on the live device: XLA step vs the
fused Pallas kernel, plus the sampler's marginal cost.

Usage: python benchmarks/ar_bench.py [n_steps]
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
    from sopro_tpu.models import generator as G
    import sopro_tpu.models.sopro as M
    from sopro_tpu.profiling import enable_compilation_cache

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    cfg = tts.cfg
    print("backend:", jax.devices()[0].platform, "steps:", n_steps, flush=True)

    rng = np.random.default_rng(0)
    ref_tokens = rng.integers(0, cfg.codebook_size,
                              size=(62, cfg.num_codebooks)).astype(np.int32)
    ref = eng.prepare_reference(ref_tokens)
    ids = tts.encode_text("benchmark " * 10)
    prep = eng.prepare_conditioning(ids, ref, max_frames=400,
                                    style_strength=1.0)

    settings = M.ARSettings(
        top_p=jnp.float32(0.9), temperature=jnp.float32(1.05),
        recovery_top_p=jnp.float32(0.85), recovery_temp=jnp.float32(1.2),
        min_gen_frames=jnp.int32(12), anti_loop=True,
    )

    def run_variant(name, kv_builder):
        def scan_fn(params, cond, txt, mask, key):
            kv = kv_builder(params, txt, mask)
            carry = M.init_ar_carry(cfg, 1, n_steps + 1, key, eng.dtype)
            carry = M.maybe_pack_carry(carry, kv)
            carry = M.ar_generate_chunk(params, cfg, carry, cond, kv,
                                        settings, n_steps)
            return carry.tokens

        f = jax.jit(scan_fn)

        def run():
            return np.asarray(f(eng.params, prep["cond_ar"], prep["txt_seq"],
                                prep["text_mask"], jax.random.PRNGKey(0)))

        mn, md = t(run, n=5)
        print(f"{name}: min {mn*1e3:.1f} ms med {md*1e3:.1f} ms -> "
              f"{mn/n_steps*1e6:.0f} us/step (min, incl ~23ms fixed)",
              flush=True)
        return run()

    def xla_kv(params, txt, mask):
        return G.build_text_kv_caches(params["ar"], cfg, txt, mask)

    toks_xla = run_variant("XLA step", xla_kv)

    def pallas_kv(params, txt, mask):
        from sopro_tpu.ops.pallas_ar import PallasARContext, stack_ar_params

        kvs = G.build_text_kv_caches(params["ar"], cfg, txt, mask)
        return PallasARContext(
            stacked=stack_ar_params(params["ar"], cfg),
            kv_k=jnp.stack([kv["k"] for kv in kvs if kv is not None]),
            kv_v=jnp.stack([kv["v"] for kv in kvs if kv is not None]),
            mask=mask,
        )

    try:
        toks_pl = run_variant("Pallas fused step", pallas_kv)
        same = np.array_equal(toks_xla, toks_pl)
        print("token parity (bf16, sampled):", same, flush=True)
    except Exception as e:
        print("Pallas variant failed:", repr(e)[:300], flush=True)


if __name__ == "__main__":
    main()
