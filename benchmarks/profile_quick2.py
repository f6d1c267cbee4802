"""Post-polyphase component check: NAR+vocoder fused dispatch cost and
pipelined batch-32 throughput."""

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

    from sopro_tpu import RuntimeConfig, SoproTTS
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    print("backend:", jax.devices()[0].platform, flush=True)

    rng = np.random.default_rng(0)
    ref_tokens = rng.integers(0, tts.cfg.codebook_size,
                              size=(62, tts.cfg.num_codebooks)).astype(np.int32)
    ref = eng.prepare_reference(ref_tokens)
    text = (
        "The quick brown fox jumps over the lazy dog while the curious cat "
        "watches from a sunny windowsill in the early morning light."
    )
    ids = tts.encode_text(text)
    prep = eng.prepare_conditioning(ids, ref, max_frames=400,
                                    style_strength=1.0)
    tokens_dev, cut = eng.ar_generate_device(
        prep, max_frames=400, seed=1, top_p=0.9, temperature=1.05,
        anti_loop=True, min_gen_frames=None,
    )

    def fused16():
        return eng.nar_decode_fused(prep["cond_ar"], tokens_dev, int(cut),
                                    pcm16=True)

    mn, md = t(fused16, n=5)
    print(f"nar_decode_fused pcm16 (dispatch+NAR+voc+readback): min "
          f"{mn*1e3:.1f} ms med {md*1e3:.1f} ms", flush=True)

    texts32 = [f"Utterance number {i} spoken by the batched synthesizer."
               for i in range(32)]

    for group in (32, 16, 8):
        def b32(group=group):
            return tts.synthesize_batch(
                texts32, ref=ref, max_frames=150, seeds=list(range(32)),
                pcm16=True, pipeline_group=group,
            )

        mn, md = t(b32, n=3)
        outs = b32()
        audio_s = sum(w.shape[1] for w in outs) / eng.mimi_cfg.sampling_rate
        print(f"batch32 pcm16 group={group}: min {mn*1e3:.0f} ms med "
              f"{md*1e3:.0f} ms -> {audio_s/mn:.0f}x realtime (min)",
              flush=True)


if __name__ == "__main__":
    main()
