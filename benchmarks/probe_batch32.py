"""Whole-graph batch-32 on-chip time + MFU (same method as bench.py's
mfu_batch32_pct) — focused rerun for iterating on decode-stage changes."""

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
    from sopro_tpu.config import pick_bucket
    from sopro_tpu.engine import _pad_axis
    from sopro_tpu.profiling import (
        ar_loop_flops, enable_compilation_cache, nar_heads_flops,
        seanet_decoder_flops,
    )

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    rng = np.random.default_rng(0)
    fps = float(tts.cfg.mimi_fps)

    ref_tokens = rng.integers(
        0, tts.cfg.codebook_size, size=(int(5 * fps), tts.cfg.num_codebooks)
    ).astype(np.int32)
    ref = eng.prepare_reference(ref_tokens)

    bt = [f"Utterance number {i} spoken by the batched synthesizer."
          for i in range(32)]
    rows = [tts.encode_text(x) for x in bt]
    lb = pick_bucket(max(len(r) for r in rows), rt.text_buckets)
    ids_b = np.zeros((32, lb), np.int32)
    mask_b = np.zeros((32, lb), bool)
    for i, r in enumerate(rows):
        ids_b[i, : len(r)] = r
        mask_b[i, : len(r)] = True
    ids_b, mask_b = jnp.asarray(ids_b), jnp.asarray(mask_b)
    bf = 150

    def tile(x):
        return (jnp.broadcast_to(x, (32,) + x.shape[1:])
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 1
                else x)

    ref32 = jax.tree.map(tile, ref)
    use_slabs = eng.mimi_slabs is not None

    def batch_body(params, mp, slabs, ref_arg, seed_i):
        keys = jax.vmap(
            lambda s: jax.random.split(jax.random.PRNGKey(s), 1)[0]
        )(seed_i + jnp.arange(32))
        wav, lengths = eng.batch_synth_graph(
            params, mp, slabs, ids_b, mask_b, ref_arg,
            jnp.float32(1.0), keys, jnp.float32(0.9), jnp.float32(1.05),
            jnp.int32(tts.cfg.min_gen_frames),
            max_frames=bf, anti_loop=True, use_slabs=use_slabs,
        )
        return (jnp.sum(wav[:, ::8192]) + jnp.sum(lengths)).astype(
            jnp.float32
        )

    @jax.jit
    def brep_run(params, mp, slabs, ref_arg, seed0, n):
        def it(i, acc):
            return acc + batch_body(params, mp, slabs, ref_arg, seed0 + 100 * i)

        return lax.fori_loop(0, n, it, jnp.float32(0.0))

    def tsamples(fn, n=5, warm=1):
        for _ in range(warm):
            jax.block_until_ready(fn())
        out = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            out.append(time.perf_counter() - t0)
        return out

    BREPS = 5
    slabs = eng.mimi_slabs if use_slabs else None
    bs1 = tsamples(lambda: brep_run(eng.params, eng.mimi_params, slabs,
                                    ref32, jnp.int32(0), jnp.int32(1)))
    bs5 = tsamples(lambda: brep_run(eng.params, eng.mimi_params, slabs,
                                    ref32, jnp.int32(0), jnp.int32(BREPS)))
    b_ms = (min(bs5) - min(bs1)) / (BREPS - 1)
    audio_s32 = 32 * bf / fps
    print(f"batch32 whole-graph on-chip {b_ms * 1e3:.2f} ms "
          f"({audio_s32 / b_ms:.0f}x realtime)", flush=True)

    comp = brep_run.lower(
        eng.params, eng.mimi_params, slabs, ref32, jnp.int32(0), jnp.int32(1)
    ).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    s32 = bf + 1
    ar_total = ar_loop_flops(tts.cfg, 32, lb, s32)
    if eng.resident_eligible(32, lb, s32):
        flops += ar_total
    else:
        flops += ar_total * (s32 - 1) / s32
    if use_slabs:
        flops += seanet_decoder_flops(eng.mimi_cfg, 32, 2 * s32)
    if jax.default_backend() == "tpu":
        flops += nar_heads_flops(tts.cfg, 32, s32)
    kind = jax.devices()[0].device_kind.lower()
    peak = (197e12 if "v5 lite" in kind or "v5e" in kind
            else 275e12 if "v6" in kind else None)
    if peak:
        print(f"mfu_batch32 {100.0 * flops / max(b_ms, 1e-9) / peak:.2f}% "
              f"(flops {flops / 1e9:.1f} G)", flush=True)


if __name__ == "__main__":
    main()
