"""Stage-by-stage wall-clock profile of the synthesize pipeline on the live
backend (run on the TPU tunnel to see where the RTF budget goes).

Prints per-stage times: prepare_conditioning, AR while_loop, NAR-only,
vocoder-only, fused NAR+vocoder, waveform readback (f32 vs pcm16), and the
per-AR-step time at several max_frames.
"""

from __future__ import annotations

import time

import numpy as np


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
    from sopro_tpu.codec.mimi_jax import mimi_decode
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    print("backend:", jax.devices()[0].platform, flush=True)

    rng = np.random.default_rng(0)
    fps = float(tts.cfg.mimi_fps)
    text = (
        "The quick brown fox jumps over the lazy dog while the curious cat "
        "watches from a sunny windowsill in the early morning light."
    )
    ref_tokens = rng.integers(
        0, tts.cfg.codebook_size, size=(int(5 * fps), tts.cfg.num_codebooks)
    ).astype(np.int32)
    ref = eng.prepare_reference(ref_tokens)
    jax.block_until_ready(ref)
    ids = tts.encode_text(text)
    max_frames = 400

    # ---- prepare_conditioning ------------------------------------------
    def prep_fn():
        p = eng.prepare_conditioning(ids, ref, max_frames=max_frames,
                                     style_strength=1.0)
        jax.block_until_ready(p["cond_ar"])
        return p

    mn, md = t(prep_fn)
    print(f"prepare_conditioning(400): min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)
    prep = prep_fn()

    # ---- AR while_loop at several lengths -------------------------------
    for mf in (100, 400):
        def ar_fn(mf=mf):
            toks, cut = eng.ar_generate_device(
                prep, max_frames=mf, seed=1, top_p=0.9, temperature=1.05,
                anti_loop=True, min_gen_frames=None,
            )
            return toks, cut

        # note: ar uses prep from 400; cond_ar longer than mf is fine
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

    # ---- NAR only (device-resident output) ------------------------------
    tb = min(eng._frame_bucket(tcut), prep["cond_ar"].shape[1])
    import sopro_tpu.models.sopro as M

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

    # ---- vocoder only (device-resident output) ---------------------------
    dec_jit = jax.jit(lambda mp, c: mimi_decode(mp, eng.mimi_cfg, c))

    def voc_fn():
        w = dec_jit(eng.mimi_params, toks_q)
        jax.block_until_ready(w)
        return w

    mn, md = t(voc_fn)
    print(f"mimi_decode({tb}): min {mn*1e3:.1f} ms med {md*1e3:.1f} ms", flush=True)
    wav_dev = voc_fn()

    # ---- readback cost ---------------------------------------------------
    def read_f32():
        return np.asarray(wav_dev)

    mn, md = t(read_f32)
    nbytes = wav_dev.size * 4
    print(f"readback f32 ({nbytes/1e6:.1f} MB): min {mn*1e3:.1f} ms med "
          f"{md*1e3:.1f} ms ({nbytes/1e6/md:.0f} MB/s)", flush=True)

    pcm_jit = jax.jit(lambda w: jnp.round(
        jnp.clip(w.astype(jnp.float32), -1, 1) * 32767.0).astype(jnp.int16))
    pcm_dev = jax.block_until_ready(pcm_jit(wav_dev))

    def read_i16():
        return np.asarray(pcm_dev)

    mn, md = t(read_i16)
    print(f"readback i16 ({pcm_dev.size*2/1e6:.1f} MB): min {mn*1e3:.1f} ms "
          f"med {md*1e3:.1f} ms", flush=True)

    # ---- fused NAR+vocoder (the production path) -------------------------
    def fused_fn():
        return eng.nar_decode_fused(prep["cond_ar"], tokens_dev, tcut, pcm16=True)

    mn, md = t(fused_fn)
    print(f"nar_decode_fused pcm16 (incl readback): min {mn*1e3:.1f} ms med "
          f"{md*1e3:.1f} ms", flush=True)

    def fused_f32():
        return eng.nar_decode_fused(prep["cond_ar"], tokens_dev, tcut, pcm16=False)

    mn, md = t(fused_f32)
    print(f"nar_decode_fused f32  (incl readback): min {mn*1e3:.1f} ms med "
          f"{md*1e3:.1f} ms", flush=True)

    # ---- end-to-end for reference ----------------------------------------
    def e2e():
        return tts.synthesize(text, ref=ref, max_frames=max_frames, seed=2)

    mn, md = t(e2e, n=3)
    print(f"synthesize f32 e2e: min {mn*1e3:.1f} ms med {md*1e3:.1f} ms "
          f"(RTF {md/32.08:.5f})", flush=True)

    def e2e16():
        return tts.synthesize(text, ref=ref, max_frames=max_frames, seed=2,
                              pcm16=True)

    mn, md = t(e2e16, n=3)
    print(f"synthesize pcm16 e2e: min {mn*1e3:.1f} ms med {md*1e3:.1f} ms "
          f"(RTF {md/32.08:.5f})", flush=True)


if __name__ == "__main__":
    main()
