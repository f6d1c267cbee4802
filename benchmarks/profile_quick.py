"""Quick TPU check of the current hot-path numbers (SEANet, mimi_decode,
fused synthesize, streaming TTFA at 400)."""

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
    from sopro_tpu.codec import mimi_jax as MJ
    from sopro_tpu.codec.mimi_config import decoder_plan
    from sopro_tpu.profiling import enable_compilation_cache
    from sopro_tpu.streaming import SoproTTSStreamer, StreamConfig

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    mcfg = eng.mimi_cfg
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

    toks_q = jnp.asarray(
        rng.integers(0, tts.cfg.codebook_size, (1, 401, tts.cfg.num_codebooks))
    ).astype(jnp.int32)

    dec_jit = jax.jit(lambda mp, c: MJ.mimi_decode(mp, mcfg, c))

    def dec_run():
        return jax.block_until_ready(dec_jit(eng.mimi_params, toks_q))

    mn, md = t(dec_run, n=5)
    print(f"mimi_decode(401): min {mn*1e3:.1f} ms med {md*1e3:.1f} ms", flush=True)

    emb = jax.block_until_ready(jax.jit(
        lambda mp, c: MJ.mimi_transformer(
            mp["dec_tf"], mcfg,
            MJ.mimi_convt(mp["upsample"], MJ.rvq_decode(mp["quantizer"], c),
                          __import__("sopro_tpu.codec.mimi_config",
                                     fromlist=["upsample_spec"]).upsample_spec(mcfg)),
            jnp.arange(802)))(eng.mimi_params, toks_q))

    se_jit = jax.jit(lambda mp, e: MJ.seanet_apply(
        mp["decoder"], decoder_plan(mcfg), e))

    def se_run():
        return jax.block_until_ready(se_jit(eng.mimi_params, emb))

    mn, md = t(se_run, n=5)
    print(f"SEANet decoder(802): min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)

    # fused synthesize e2e
    def e2e16():
        return tts.synthesize(text, ref=ref, max_frames=400, seed=2,
                              pcm16=True)

    mn, md = t(e2e16, n=5)
    print(f"synthesize fused pcm16 e2e: min {mn*1e3:.1f} ms med {md*1e3:.1f} "
          f"ms (RTF min {mn/32.08:.5f})", flush=True)

    def e2e32():
        return tts.synthesize(text, ref=ref, max_frames=400, seed=2)

    mn, md = t(e2e32, n=5)
    print(f"synthesize fused f32 e2e: min {mn*1e3:.1f} ms med {md*1e3:.1f} ms "
          f"(RTF min {mn/32.08:.5f})", flush=True)

    # streaming TTFA at production max_frames=400
    streamer = SoproTTSStreamer(tts, StreamConfig(chunk_frames=6))

    def ttfa():
        for _c in streamer.stream(text, ref=ref, max_frames=400,
                                  chunk_frames=6, seed=1):
            break
        return streamer.last_ttfa_s

    mn, md = t(ttfa, n=5)
    print(f"streaming TTFA @400: min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)

    # batch-32 at 150 frames, pcm16
    texts32 = [f"Utterance number {i} spoken by the batched synthesizer."
               for i in range(32)]

    def b32():
        return tts.synthesize_batch(texts32, ref=ref, max_frames=150,
                                    seeds=list(range(32)), pcm16=True)

    mn, md = t(b32, n=3)
    outs = b32()
    audio_s = sum(w.shape[1] for w in outs) / mcfg.sampling_rate
    print(f"batch32 pcm16: min {mn*1e3:.0f} ms med {md*1e3:.0f} ms -> "
          f"{audio_s/mn:.0f}x realtime (min)", flush=True)


if __name__ == "__main__":
    main()
