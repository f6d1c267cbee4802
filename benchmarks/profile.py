"""Unified profiler for the sopro-tpu hot paths (run on the live TPU).

Subcommands (``python benchmarks/profile.py <cmd>``):

* ``stages``   — wall-clock per pipeline stage on the live backend
                 (prepare_conditioning, AR loop, NAR, vocoder, readback,
                 fused NAR+vocoder, end-to-end synthesize).
* ``onchip``   — pure device time per stage net of tunnel RTT (loop each
                 stage N times inside ONE dispatch with data-dependence
                 chaining, difference N=1 vs N=5), at the single-stream and
                 batch-32 shapes.
* ``dispatch`` — tunnel anatomy of the fused synthesize dispatch: Python
                 jit-call overhead with the big param pytree, device compute
                 (block, no readback), packed readback transfer, async
                 dispatch-call latency.
* ``ar``       — AR per-step cost decomposition on-chip: full ar_generate on
                 the fused-kernel vs the XLA path, kernel-only argmax loop,
                 sampler-only loop.
* ``tick``     — serving-tick decomposition at the production shape (8 rows,
                 16-frame chunks): device cost of the full fused tick and of
                 the resident AR chunk / windowed NAR / streaming vocoder in
                 isolation.

Timing methodology notes: wall times on this environment include 15-25 ms of
remote-tunnel RTT per dispatch/readback; the ``onchip``/``ar`` subcommands
use the rep trick (N iterations inside one dispatch with every output
consumed — unconsumed stages get dead-code-eliminated) to isolate device
time. See docs/benchmarks.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# runnable as `python benchmarks/profile.py` without installing the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXT = (
    "The quick brown fox jumps over the lazy dog while the curious cat "
    "watches from a sunny windowsill in the early morning light."
)


def t(fn, n=5, warm=1):
    for _ in range(warm):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), sorted(ts)[len(ts) // 2]


def timed(fn, n=5, warm=2):
    return t(fn, n=n, warm=warm)[0]


def _setup(dtype="bfloat16"):
    import jax

    from sopro_tpu import RuntimeConfig, SoproTTS
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    tts = SoproTTS.from_random(seed=0, runtime=RuntimeConfig(compute_dtype=dtype))
    print("backend:", jax.devices()[0].platform, flush=True)
    return tts


# --------------------------------------------------------------------------
# stages: wall-clock per pipeline stage
# --------------------------------------------------------------------------


def cmd_stages(args):
    import jax
    import jax.numpy as jnp

    import sopro_tpu.models.sopro as M
    from sopro_tpu.codec.mimi_jax import mimi_decode

    tts = _setup()
    eng = tts.engine
    rng = np.random.default_rng(0)
    fps = float(tts.cfg.mimi_fps)
    ref_tokens = rng.integers(
        0, tts.cfg.codebook_size, size=(int(5 * fps), tts.cfg.num_codebooks)
    ).astype(np.int32)
    ref = eng.prepare_reference(ref_tokens)
    jax.block_until_ready(ref)
    ids = tts.encode_text(TEXT)
    max_frames = 400

    def prep_fn():
        p = eng.prepare_conditioning(ids, ref, max_frames=max_frames,
                                     style_strength=1.0)
        jax.block_until_ready(p["cond_ar"])
        return p

    mn, md = t(prep_fn)
    print(f"prepare_conditioning(400): min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)
    prep = prep_fn()

    for mf in (100, 400):
        def ar_fn(mf=mf):
            return eng.ar_generate_device(
                prep, max_frames=mf, seed=1, top_p=0.9, temperature=1.05,
                anti_loop=True, min_gen_frames=None,
            )

        mn, md = t(ar_fn)
        toks, cut = ar_fn()
        print(f"ar_generate_device({mf}): min {mn*1e3:.1f} ms med {md*1e3:.1f} "
              f"ms -> {(md/mf)*1e6:.0f} us/step (cut={cut})", flush=True)

    tokens_dev, cut = eng.ar_generate_device(
        prep, max_frames=max_frames, seed=1, top_p=0.9, temperature=1.05,
        anti_loop=True, min_gen_frames=None,
    )
    tcut = int(cut) if int(cut) > 0 else max_frames
    print("AR produced frames:", tcut, flush=True)

    tb = min(eng._frame_bucket(tcut), prep["cond_ar"].shape[1])
    nar_jit = jax.jit(lambda p, cond, rvq, mask: M.nar_refine(
        p, eng.cfg, cond, rvq, mask=mask))
    mask = (jnp.arange(tb)[None] < tcut)
    rvq = tokens_dev[:, :tb]

    def nar_fn():
        out = nar_jit(eng.params, prep["cond_ar"][:, :tb], rvq, mask)
        jax.block_until_ready(out)
        return out

    mn, md = t(nar_fn)
    print(f"nar_refine({tb}): min {mn*1e3:.1f} ms med {md*1e3:.1f} ms", flush=True)
    toks_q = nar_fn()

    dec_jit = jax.jit(lambda mp, c: mimi_decode(mp, eng.mimi_cfg, c))

    def voc_fn():
        w = dec_jit(eng.mimi_params, toks_q)
        jax.block_until_ready(w)
        return w

    mn, md = t(voc_fn)
    print(f"mimi_decode({tb}): min {mn*1e3:.1f} ms med {md*1e3:.1f} ms", flush=True)
    wav_dev = voc_fn()

    pcm_jit = jax.jit(lambda w: jnp.round(
        jnp.clip(w.astype(jnp.float32), -1, 1) * 32767.0).astype(jnp.int16))
    pcm_dev = jax.block_until_ready(pcm_jit(wav_dev))
    for name, dev, width in (("f32", wav_dev, 4), ("i16", pcm_dev, 2)):
        def read():
            return np.asarray(dev)

        mn, md = t(read)
        nbytes = dev.size * width
        print(f"readback {name} ({nbytes/1e6:.1f} MB): min {mn*1e3:.1f} ms med "
              f"{md*1e3:.1f} ms ({nbytes/1e6/md:.0f} MB/s)", flush=True)

    for pcm16 in (True, False):
        def fused_fn():
            return eng.nar_decode_fused(prep["cond_ar"], tokens_dev, tcut,
                                        pcm16=pcm16)

        mn, md = t(fused_fn)
        print(f"nar_decode_fused {'pcm16' if pcm16 else 'f32  '} (incl "
              f"readback): min {mn*1e3:.1f} ms med {md*1e3:.1f} ms", flush=True)

    for pcm16 in (False, True):
        def e2e():
            return tts.synthesize(TEXT, ref=ref, max_frames=max_frames, seed=2,
                                  pcm16=pcm16)

        mn, md = t(e2e, n=3)
        print(f"synthesize {'pcm16' if pcm16 else 'f32  '} e2e: min "
              f"{mn*1e3:.1f} ms med {md*1e3:.1f} ms (RTF {md/32.08:.5f})",
              flush=True)


# --------------------------------------------------------------------------
# onchip: rep-trick device time per stage
# --------------------------------------------------------------------------


def cmd_onchip(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sopro_tpu.codec.mimi_jax import (
        decoder_plan, mimi_convt, mimi_decode, mimi_transformer, rvq_decode,
        seanet_apply, upsample_spec,
    )
    from sopro_tpu.models.nar import nar_refine
    from sopro_tpu.models.sopro import cb_spec as _cb_spec

    tts = _setup()
    eng = tts.engine
    cfg = tts.cfg
    mcfg = eng.mimi_cfg
    rng = np.random.default_rng(0)

    def rep(body, reps):
        @jax.jit
        def run(x0):
            return lax.fori_loop(0, reps, lambda i, x: body(x, i), x0)

        return run

    for label, B, T in (("single-stream", 1, 401), ("batch-32", 32, 151)):
        codes = jnp.asarray(
            rng.integers(0, cfg.codebook_size, (B, T, cfg.num_codebooks)),
            jnp.int32,
        )
        cond = jnp.asarray(rng.standard_normal((B, T, cfg.d_model)), eng.dtype)
        rvq1 = codes[:, :, 0]
        mp, p = eng.mimi_params, eng.params

        def nar_body(x, i):
            toks = nar_refine(
                p["nar"], p["cb_embed"], _cb_spec(cfg),
                p["nar_prev_cb_weights"],
                cfg, cond, (x + i) % cfg.codebook_size,
            )
            # consume EVERY codebook: returning a single stage's slice lets
            # XLA dead-code-eliminate the other stage passes entirely
            return jnp.sum(toks, axis=-1) % cfg.codebook_size

        def voc_body(x, i):
            wav = mimi_decode(mp, mcfg, (x[..., None] + codes + i) % 2048)
            return (x + jnp.mean(wav).astype(jnp.int32)) % 2048

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
            print(f"{name:20s} on-chip {per*1e3:7.2f} ms   "
                  f"(n1 {t1*1e3:6.1f} ms, n5 {t5*1e3:6.1f} ms)", flush=True)


# --------------------------------------------------------------------------
# dispatch: tunnel anatomy of the fused synthesize call
# --------------------------------------------------------------------------


def cmd_dispatch(args):
    import jax
    import jax.numpy as jnp

    tts = _setup()
    eng = tts.engine
    cfg = tts.cfg
    rng = np.random.default_rng(0)
    ref_tokens = rng.integers(0, cfg.codebook_size,
                              size=(62, cfg.num_codebooks)).astype(np.int32)
    ref = eng.prepare_reference(ref_tokens)
    ids = np.asarray(tts.encode_text(TEXT), np.int32)

    n_leaves = len(jax.tree.leaves(eng.params))
    print(f"param pytree leaves: {n_leaves}", flush=True)
    trivial = jax.jit(lambda p, x: x + 1.0)
    x1 = jax.device_put(jnp.zeros((), jnp.float32))
    trivial(eng.params, x1)
    mn, md = t(lambda: jax.block_until_ready(trivial(eng.params, x1)), n=9)
    print(f"trivial jit w/ params arg: min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)
    trivial2 = jax.jit(lambda x: x + 1.0)
    trivial2(x1)
    mn, md = t(lambda: jax.block_until_ready(trivial2(x1)), n=9)
    print(f"trivial jit scalar arg:    min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)

    seeds = iter(range(1, 200))

    def full():
        return eng.synthesize_fused(
            ids, ref, max_frames=400, style_strength=1.0,
            seed=next(seeds), top_p=0.9, temperature=1.05, anti_loop=True,
            min_gen=12, pcm16=True,
        )

    mn, md = t(full, n=5)
    print(f"synthesize_fused (full, readback): min {mn*1e3:.1f} ms med "
          f"{md*1e3:.1f} ms", flush=True)

    key = next(k for k in eng._fns if k[0] == "synth_fused")
    fn = eng._fns[key]
    lb = key[1]
    ids_p = np.zeros((1, lb), np.int32)
    ids_p[0, : len(ids)] = ids
    mask = np.zeros((1, lb), bool)
    mask[0, : len(ids)] = True
    ids_d, mask_d = jnp.asarray(ids_p), jnp.asarray(mask)

    def compute_only():
        packed = fn(eng.params, eng.mimi_params, eng.mimi_slabs, ids_d, mask_d,
                    ref, jnp.float32(1.0), jax.random.PRNGKey(next(seeds)),
                    jnp.float32(0.9), jnp.float32(1.05), jnp.int32(12))
        return jax.block_until_ready(packed)

    mn, md = t(compute_only, n=5)
    print(f"synthesize_fused (block, no readback): min {mn*1e3:.1f} ms med "
          f"{md*1e3:.1f} ms", flush=True)

    packed = compute_only()
    fresh = [compute_only() for _ in range(6)]
    mn, md = t(lambda: np.asarray(fresh.pop()), n=5, warm=1)
    print(f"packed readback only ({packed.nbytes/1e6:.2f} MB): "
          f"min {mn*1e3:.1f} ms med {md*1e3:.1f} ms", flush=True)

    def dispatch_async():
        fn(eng.params, eng.mimi_params, eng.mimi_slabs, ids_d, mask_d, ref,
           jnp.float32(1.0), jax.random.PRNGKey(next(seeds)),
           jnp.float32(0.9), jnp.float32(1.05), jnp.int32(12))

    mn, md = t(dispatch_async, n=5)
    print(f"dispatch call only (async): min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)


# --------------------------------------------------------------------------
# ar: per-step cost decomposition
# --------------------------------------------------------------------------


def cmd_ar(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    import sopro_tpu.models.sopro as M
    import sopro_tpu.sampling as S
    from sopro_tpu.models import generator as G
    from sopro_tpu.ops.pallas_ar import ar_step_pallas, pack_conv_state

    tts = _setup()
    eng = tts.engine
    cfg = tts.cfg
    p = eng.params
    rng = np.random.default_rng(0)
    T = 400
    L = int(getattr(args, "text_bucket", 64) or 64)
    cond_ar = jnp.asarray(
        rng.standard_normal((1, T + 1, cfg.d_model)) * 0.02, eng.dtype
    )
    txt_seq = jnp.asarray(
        rng.standard_normal((1, L, cfg.d_model)) * 0.02, eng.dtype
    )
    text_mask = jnp.ones((1, L), bool)
    print(f"text bucket L={L}", flush=True)
    settings = M.default_ar_settings()

    def rep(body, reps):
        @jax.jit
        def run(seed):
            return lax.fori_loop(0, reps, lambda i, acc: acc + body(seed + i),
                                 jnp.int32(0))

        return run

    def measure(name, body, n_steps):
        r1, r3 = rep(body, 1), rep(body, 3)
        t1 = timed(lambda: jax.block_until_ready(r1(jnp.int32(0))))
        t3 = timed(lambda: jax.block_until_ready(r3(jnp.int32(0))))
        per = (t3 - t1) / 2.0
        print(f"{name:34s} {per*1e3:8.2f} ms/run -> "
              f"{per/n_steps*1e6:7.1f} us/step   (n1 {t1*1e3:6.1f} "
              f"n3 {t3*1e3:6.1f})", flush=True)
        return per

    kv_xla = G.build_text_kv_caches(p["ar"], cfg, txt_seq, text_mask)
    ctx_resident = eng._ar_kv(p, txt_seq, text_mask, resident=True)
    ctx_pallas = eng._ar_kv(p, txt_seq, text_mask)

    def full_gen(ctx):
        def body(seed):
            carry = M.ar_generate(
                p, cfg, cond_ar, txt_seq, text_mask,
                jax.random.PRNGKey(seed), settings, T + 1, kv_caches=ctx,
            )
            return jnp.sum(carry.tokens[:, :4]).astype(jnp.int32)

        return body

    if type(ctx_resident) is not type(ctx_pallas):
        measure("ar_generate resident (sampled)", full_gen(ctx_resident), T + 1)
    measure("ar_generate per-step pallas", full_gen(ctx_pallas), T + 1)
    measure("ar_generate XLA (sampled)", full_gen(kv_xla), T + 1)

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
                jnp.int32) + seed * 0
            return tok, bufs, acc + tok[0]

        _, _, acc = lax.fori_loop(
            0, T + 1, body, (jnp.zeros((1,), jnp.int32), bufs0, jnp.int32(0))
        )
        return acc

    measure("pallas kernel-only (argmax)", kernel_only, T + 1)

    logits0 = jnp.asarray(
        rng.standard_normal((1, cfg.codebook_size + 1)), jnp.float32
    )

    def sampler_only(seed):
        hist0 = S.init_history(1)
        key0 = jax.random.split(jax.random.PRNGKey(0), 1)

        def body(i, st):
            hist, key, streak, last, acc = st
            ti = jnp.zeros((1,), jnp.int32) + i
            top_p, temp = S.anti_loop_settings(
                hist, ti, streak,
                base=(settings.top_p, settings.temperature),
                recovery=(settings.recovery_top_p, settings.recovery_temp),
                loop_streak=settings.loop_streak, enabled=True,
            )
            key, sub = S.split_keys(key)
            tok = S.sample_token(
                sub, logits0 + seed * 0, hist, ti,
                S.SamplerSettings(top_p=top_p, temperature=temp),
            )
            hist = S.push_history(hist, tok)
            streak, last = S.update_streak(streak, last, tok, ti)
            return hist, key, streak, last, acc + tok[0]

        st = lax.fori_loop(
            0, T + 1, body,
            (hist0, key0, jnp.zeros((1,), jnp.int32),
             jnp.zeros((1,), jnp.int32), jnp.int32(0)),
        )
        return st[-1]

    measure("sampler-only loop", sampler_only, T + 1)


def cmd_tick(args):
    """Serving-tick decomposition: on-chip device cost of the full 8-row
    tick and of its three stages in isolation (resident AR chunk, windowed
    NAR, streaming vocoder) — what `serve8_tick_device_ms` is made of."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    import sopro_tpu.models.sopro as M
    from sopro_tpu.codec.streaming import mimi_decode_step
    from sopro_tpu.serve.scheduler import (
        ContinuousBatcher, build_resident_ctx,
    )

    tts = _setup()
    eng, cfg = tts.engine, tts.cfg
    rng = np.random.default_rng(0)
    ref = eng.prepare_reference(
        rng.integers(0, cfg.codebook_size, (62, cfg.num_codebooks)).astype(
            np.int32
        )
    )
    cf = 16
    b = ContinuousBatcher(tts, slots=8, chunk_frames=cf, pcm16=True)
    print(f"tick path: {'resident' if b.use_resident else 'xla'}  rows=8 "
          f"cf={cf}  W={cf + b.nar_ctx}", flush=True)

    full = b.measure_tick_device_ms(ref)
    carry, cond, txt_kv, row, mimi_state, emitted = b.bench_state(ref)
    settings = M.ARSettings(
        top_p=row["top_p"], temperature=row["temp"],
        recovery_top_p=row["rtp"], recovery_temp=row["rtemp"],
        min_gen_frames=row["min_gen"], anti_loop=True,
    )
    W = cf + b.nar_ctx

    def rep_ar(n):
        @jax.jit
        def f(carry, cond, tkv, res_static):
            kvc = (build_resident_ctx(res_static, tkv)
                   if res_static is not None else tkv)

            def it(i, c):
                return M.ar_generate_chunk(
                    eng.params, cfg, c, cond, kvc, settings, cf
                )

            c = lax.fori_loop(0, n, it, carry)
            return c.tokens, c.t

        return f

    def rep_nar(n):
        win = cond[:, :W]
        rvq0 = carry.tokens[:, :W]
        mask = jnp.ones((8, W), bool)

        @jax.jit
        def f(params, rvq0):
            def it(i, rvq):
                toks = M.nar_refine(params, cfg, win, rvq, mask=mask)
                # feed cb-2 back as next rvq-1 so iterations chain (nothing
                # hoistable / dead-code-eliminable)
                return toks[..., 1] % cfg.codebook_size

            return lax.fori_loop(0, n, it, rvq0)

        return f

    def rep_voc(n):
        codes = jnp.asarray(
            rng.integers(0, cfg.codebook_size, (8, cf, cfg.num_codebooks)),
            jnp.int32,
        )
        mask = jnp.ones((8,), bool)

        @jax.jit
        def f(mp, st):
            def it(i, s):
                wav, s2 = mimi_decode_step(
                    mp, eng.mimi_cfg, (codes + i) % cfg.codebook_size, s,
                    mask=mask, slabs=b._voc_slabs,
                )
                return s2

            s = lax.fori_loop(0, n, it, st)
            return jax.tree.map(
                lambda x: jnp.sum(x.astype(jnp.float32)), s
            )

        return f

    def dev_ms(mk, *xargs, reps=3):
        r1, rn = mk(1), mk(1 + 2 * reps)
        t1 = timed(lambda: jax.block_until_ready(r1(*xargs)))
        tn = timed(lambda: jax.block_until_ready(rn(*xargs)))
        return max(tn - t1, 0.0) / (2 * reps) * 1000.0

    ar_ms = dev_ms(rep_ar, carry, cond, txt_kv, b._res_static)
    nar_ms = dev_ms(rep_nar, eng.params, carry.tokens[:, :W])
    voc_ms = dev_ms(rep_voc, eng.mimi_params, mimi_state)
    b.stop()
    tick = full["tick_device_ms"]
    print(f"full tick        {tick:7.2f} ms   ({full['path']})", flush=True)
    for name, v in (("ar chunk (16)", ar_ms), ("windowed NAR", nar_ms),
                    ("vocoder step", voc_ms)):
        pct = f"({100 * v / tick:4.1f}% of tick)" if tick > 0 else ""
        print(f"{name:16s} {v:7.2f} ms   {pct}", flush=True)
    if tick > 0:
        print(f"residual (pack/emit bookkeeping) "
              f"{tick - ar_ms - nar_ms - voc_ms:7.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "cmd", choices=["stages", "onchip", "dispatch", "ar", "tick"]
    )
    ap.add_argument(
        "--text_bucket", type=int, default=64,
        help="ar: padded text length (e.g. 1024 probes the long-prompt "
        "resident path — eligibility is a VMEM budget, not a text cap)",
    )
    args = ap.parse_args()
    {"stages": cmd_stages, "onchip": cmd_onchip,
     "dispatch": cmd_dispatch, "ar": cmd_ar, "tick": cmd_tick}[args.cmd](args)


if __name__ == "__main__":
    main()
