"""`soprotts` command-line interface (reference: src/sopro/cli.py).

Flag set preserved minus the reference's dead stop-head flags (cli.py:40-48,
never read). Additions: `--device {tpu,cpu}` selects the JAX platform,
`--random_init` builds a random-weight stack for offline smoke runs, and
`--stream` exercises the chunked path writing chunks as they arrive.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="soprotts", description="Sopro TTS (TPU-native JAX build)"
    )
    p.add_argument("--repo", default="samuel-vitorino/sopro-v1.5",
                   help="HF repo id or local snapshot dir")
    p.add_argument("--revision", default=None)
    p.add_argument("--cache_dir", default=None)
    p.add_argument("--token", default=None)
    p.add_argument("--text", required=True)
    p.add_argument("--ref_audio", default=None, help="reference audio file")
    p.add_argument("--ref_tokens", default=None,
                   help=".npy file of Mimi tokens [T, Q] (reference: cli.py:94-98)")
    p.add_argument("--out", default="sopro_out.wav")
    p.add_argument("--max_frames", type=int, default=400)
    p.add_argument("--top_p", type=float, default=0.9)
    p.add_argument("--temperature", type=float, default=1.05)
    p.add_argument("--no_anti_loop", action="store_true")
    p.add_argument("--style_strength", type=float, default=None)
    p.add_argument("--ref_seconds", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--device", choices=["tpu", "cpu"], default=None)
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--stream", action="store_true",
                   help="use the chunked streaming path")
    p.add_argument("--long", action="store_true",
                   help="long-form mode: split text into sentence chunks, "
                        "synthesize as one batch, stitch with --gap_ms of "
                        "silence (no 32 s cap)")
    p.add_argument("--gap_ms", type=float, default=120.0)
    p.add_argument("--chunk_frames", type=int, default=6)
    p.add_argument("--random_init", action="store_true",
                   help="random weights instead of a checkpoint (offline dev)")
    p.add_argument("--metrics_json", action="store_true",
                   help="print structured per-utterance metrics as JSON")
    p.add_argument("--trace_dir", default=None,
                   help="write a jax.profiler device trace to this directory")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.stream and args.long:
        print("error: --stream and --long are mutually exclusive",
              file=sys.stderr)
        return 2

    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import contextlib

    import numpy as np

    from sopro_tpu import SoproTTS
    from sopro_tpu.profiling import GenerationMetrics, Timer, device_trace

    def log(msg):
        if not args.quiet:
            print(msg, file=sys.stderr)

    # validate reference args BEFORE the (slow) model build — fail fast
    ref_tokens = None
    if args.ref_tokens:
        ref_tokens = np.load(args.ref_tokens).astype(np.int32)
    if (ref_tokens is None) == (args.ref_audio is None):
        print("error: provide exactly one of --ref_audio / --ref_tokens",
              file=sys.stderr)
        return 2

    timer = Timer()
    with timer.section("load"):
        if args.random_init:
            tts = SoproTTS.from_random(seed=args.seed)
        else:
            tts = SoproTTS.from_pretrained(
                args.repo, revision=args.revision, cache_dir=args.cache_dir,
                token=args.token,
            )
    log(f"model loaded in {timer.sections['load']:.1f}s")

    with timer.section("reference"):
        ref = tts.prepare_reference(
            ref_audio_path=args.ref_audio, ref_tokens_tq=ref_tokens,
            ref_seconds=args.ref_seconds,
        )
    log(f"reference prepared in {timer.sections['reference']:.1f}s")

    kwargs = dict(
        ref=ref,
        max_frames=args.max_frames,
        top_p=args.top_p,
        temperature=args.temperature,
        anti_loop=not args.no_anti_loop,
        style_strength=args.style_strength,
        seed=args.seed,
    )

    sr = 24000
    metrics = GenerationMetrics()
    trace_ctx = (
        device_trace(args.trace_dir) if args.trace_dir
        else contextlib.nullcontext()
    )
    t0 = time.perf_counter()
    with trace_ctx, timer.section("generate"):
        if args.stream:
            chunks = []
            for c in tts.stream(args.text, chunk_frames=args.chunk_frames,
                                **kwargs):
                if metrics.ttfa_s is None:
                    metrics.ttfa_s = time.perf_counter() - t0
                    log(f"TTFA {metrics.ttfa_s * 1000:.0f} ms")
                chunks.append(c)
            wav = (np.concatenate(chunks, axis=1) if chunks
                   else np.zeros((1, 0), np.float32))
        elif args.long:
            wav = tts.synthesize_long(args.text, pcm16=True,
                                      gap_ms=args.gap_ms, **kwargs)
        else:
            # device-side PCM16: the WAV on disk is 16-bit regardless, and the
            # int16 readback halves the device->host transfer
            wav = tts.synthesize(args.text, pcm16=True, **kwargs)

    metrics.wall_s = timer.sections["generate"]
    metrics.audio_s = wav.shape[1] / sr
    metrics.frames = wav.shape[1] // tts.engine.mimi_cfg.hop_length

    tts.save_wav(args.out, wav)
    log(
        f"generated {metrics.audio_s:.2f}s audio in {metrics.wall_s:.2f}s "
        f"(RTF {metrics.rtf:.3f}, {metrics.frames_per_s:.0f} frames/s) "
        f"-> {args.out}"
    )
    log(timer.report())
    if args.metrics_json:
        import json

        print(json.dumps(metrics.to_dict()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
