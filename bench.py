"""Benchmark harness (driver contract): prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"}.

Measures the BASELINE.json metric set on the flagship 135M configuration with
random weights (no checkpoint egress in this environment; compute cost is
weight-independent):

* single-stream non-streaming RTF (wall / generated audio seconds) at the
  max-frames long-form setting (BASELINE configs 1/3),
* streaming TTFA p50 with a precomputed reference (config 2),
* AR decode rate in frames/s.

Baseline to beat (reference on Apple M3 CPU, README.md:9): TTFA 250 ms,
RTF 0.05. vs_baseline reports baseline_RTF / our_RTF (x-fold speedup).
"""

from __future__ import annotations

import json
import statistics
import time

import numpy as np


def main() -> None:
    import os

    import jax

    from sopro_tpu import RuntimeConfig, SoproTTS
    from sopro_tpu.profiling import enable_compilation_cache
    from sopro_tpu.streaming import SoproTTSStreamer, StreamConfig

    enable_compilation_cache()
    # bf16 compute by default: ~15% faster RTF at 41 dB vocoder SNR vs fp32
    # (inaudible); SOPRO_BENCH_DTYPE=float32 reverts.
    dtype = os.environ.get("SOPRO_BENCH_DTYPE", "bfloat16")
    rt = RuntimeConfig(compute_dtype=dtype)

    t_build = time.perf_counter()
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    build_s = time.perf_counter() - t_build

    rng = np.random.default_rng(0)
    sr = int(tts.engine.mimi_cfg.sampling_rate)
    fps = float(tts.cfg.mimi_fps)

    # ~10 s English sentence + 5 s reference (BASELINE config 1 shapes)
    text = (
        "The quick brown fox jumps over the lazy dog while the curious cat "
        "watches from a sunny windowsill in the early morning light."
    )
    ref_tokens = rng.integers(
        0, tts.cfg.codebook_size, size=(int(5 * fps), tts.cfg.num_codebooks)
    ).astype(np.int32)

    max_frames = 400
    t0 = time.perf_counter()
    ref = eng.prepare_reference(ref_tokens)
    jax.block_until_ready(ref)
    prep_ref_s = time.perf_counter() - t0

    # ---- non-streaming synthesize: warm once, then measure ----------------
    # pcm16: 16-bit samples leave the device (the CLI writes 16-bit WAV and
    # the server streams 16-bit PCM regardless — the float path just converts
    # on host); fused single-dispatch is the default at max_frames=400.
    def synth(seed):
        return tts.synthesize(
            text, ref=ref, max_frames=max_frames, seed=seed, anti_loop=True,
            pcm16=True,
        )

    t0 = time.perf_counter()
    wav = synth(0)
    compile_s = time.perf_counter() - t0

    rtfs, frames_rates = [], []
    for i in range(5):
        t0 = time.perf_counter()
        wav = synth(i + 1)
        dt = time.perf_counter() - t0
        audio_s = wav.shape[1] / sr
        rtfs.append(dt / max(audio_s, 1e-9))
        frames_rates.append((audio_s * fps) / dt)
    rtf = statistics.median(rtfs)
    frames_per_s = statistics.median(frames_rates)

    # ---- on-chip pipeline cost (net of the remote link) -------------------
    # This environment attaches the TPU over a tunnel whose dispatch +
    # readback latency dominates single-stream wall times. The rep trick —
    # run the full fused pipeline N times inside ONE dispatch, difference
    # N=1 vs N=9 — isolates pure device time, i.e. what the framework costs
    # on locally-attached hardware.
    onchip_ms = None
    if os.environ.get("SOPRO_BENCH_ONCHIP", "1") != "0":
        import jax.numpy as jnp
        from jax import lax

        from sopro_tpu.config import pick_bucket
        from sopro_tpu.engine import _pad_axis

        ids_row = tts.encode_text(text)
        lb = pick_bucket(len(ids_row), rt.text_buckets)
        ids = jnp.asarray(_pad_axis(np.asarray(ids_row, np.int32), 0, lb))[None]
        mask_np = np.zeros((1, lb), bool)
        mask_np[:, : len(ids_row)] = True
        mask_j = jnp.asarray(mask_np)

        def synth_body(params, mp, slabs, ref_arg, seed_i):
            # the PRODUCTION fused graph, shared with Engine.synthesize_fused
            wav, _t = eng.fused_synth_graph(
                params, mp, slabs, ids, mask_j, ref_arg, jnp.float32(1.0),
                jax.random.PRNGKey(seed_i), jnp.float32(0.9),
                jnp.float32(1.05), jnp.int32(tts.cfg.min_gen_frames),
                max_frames=max_frames, anti_loop=True,
            )
            return jnp.sum(wav[:, ::4096]).astype(jnp.float32)

        # ONE compiled graph with a DYNAMIC rep count (fori_loop over the
        # fused pipeline): halves compile time vs two static-unroll graphs,
        # and lets the N=1 vs N=9 difference amortize tunnel-RTT noise over
        # 8 reps instead of 2 — the round-4 "regression" of this metric
        # (11.0 -> 13.5 ms) was within the old (t3-t1)/2 scheme's noise
        # floor (+-2.5 ms RTT swing => +-1.25 ms per endpoint).
        @jax.jit
        def rep_run(params, mp, slabs, ref_arg, seed0, n):
            # params ride as jit ARGUMENTS (closing over them would bake
            # them into the HLO as constants)
            def it(i, acc):
                return acc + synth_body(params, mp, slabs, ref_arg,
                                        seed0 + i)

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

        def tmin(fn, n=5, warm=1):
            return min(tsamples(fn, n=n, warm=warm))

        REPS = 9
        s1 = tsamples(lambda: rep_run(eng.params, eng.mimi_params,
                                      eng.mimi_slabs, ref, jnp.int32(0),
                                      jnp.int32(1)))
        s9 = tsamples(lambda: rep_run(eng.params, eng.mimi_params,
                                      eng.mimi_slabs, ref, jnp.int32(0),
                                      jnp.int32(REPS)))
        onchip_ms = (min(s9) - min(s1)) / (REPS - 1) * 1000.0
        onchip_ms_med = (
            (statistics.median(s9) - statistics.median(s1))
            / (REPS - 1) * 1000.0
        )
        # relative spread of the samples: how trustworthy is this run
        onchip_spread_pct = 100.0 * (max(s9) - min(s9)) / max(min(s9), 1e-9)

    # ---- on-chip batch-32 aggregate (link-free batch throughput) ----------
    onchip_batch32_x = mfu_batch32_pct = None
    if os.environ.get("SOPRO_BENCH_ONCHIP", "1") != "0":
        import jax.numpy as jnp
        from jax import lax

        from sopro_tpu.config import pick_bucket
        from sopro_tpu.engine import _pad_axis

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
                return acc + batch_body(params, mp, slabs, ref_arg,
                                        seed0 + 100 * i)

            return lax.fori_loop(0, n, it, jnp.float32(0.0))

        BREPS = 5
        bs1 = tsamples(lambda: brep_run(eng.params, eng.mimi_params,
                                        eng.mimi_slabs if use_slabs else None,
                                        ref32, jnp.int32(0), jnp.int32(1)))
        bs5 = tsamples(lambda: brep_run(eng.params, eng.mimi_params,
                                        eng.mimi_slabs if use_slabs else None,
                                        ref32, jnp.int32(0),
                                        jnp.int32(BREPS)))
        bt1, bt5 = min(bs1), min(bs5)
        b_ms = (bt5 - bt1) / (BREPS - 1)
        batch32_spread_pct = 100.0 * (max(bs5) - min(bs5)) / max(bt5, 1e-9)
        audio_s32 = 32 * bf / fps
        onchip_batch32_x = audio_s32 / max(b_ms, 1e-9)

        # achieved FLOP/s of the batch-32 graph against the chip's bf16
        # peak -> MFU (VERDICT r2 #4). XLA's post-compile count misses the
        # Mosaic stages (custom calls count as zero flops) and the XLA AR
        # fallback (while bodies count once, not x trip count), so the
        # numerator restores that work analytically with the same counting
        # conventions — see profiling.ar_loop_flops/seanet_decoder_flops
        # and docs/kernels.md ("Where batch-32 time goes").
        try:
            from sopro_tpu.profiling import (
                ar_loop_flops, nar_heads_flops, seanet_decoder_flops,
            )

            comp = brep_run.lower(
                eng.params, eng.mimi_params,
                eng.mimi_slabs if use_slabs else None, ref32, jnp.int32(0),
                jnp.int32(1),
            ).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            s32 = bf + 1
            ar_total = ar_loop_flops(tts.cfg, 32, lb, s32)
            if eng.resident_eligible(32, lb, s32):
                flops += ar_total  # kernel = custom call: counted as 0
            else:
                # XLA while_loop: body counted once of s32 trips
                flops += ar_total * (s32 - 1) / s32
            if use_slabs:
                flops += seanet_decoder_flops(eng.mimi_cfg, 32, 2 * s32)
            if jax.default_backend() == "tpu":
                # fused heads+argmax kernel (custom call, counted as 0)
                # replaces the head einsum XLA used to count
                flops += nar_heads_flops(tts.cfg, 32, s32)
            kind = jax.devices()[0].device_kind.lower()
            peak = (
                197e12 if "v5 lite" in kind or "v5e" in kind
                else 275e12 if "v6" in kind
                else None
            )
            if flops > 0 and peak:
                mfu_batch32_pct = 100.0 * flops / max(b_ms, 1e-9) / peak
        except Exception:
            pass

    # ---- streaming TTFA ---------------------------------------------------
    streamer = SoproTTSStreamer(tts, StreamConfig(chunk_frames=6))

    # TTFA measured at the production default max_frames=400 (every real
    # call path defaults to 400); the stream stops after the first chunk —
    # TTFA is by definition the time to that chunk.
    def run_stream(seed, max_frames=400, stop_after_first=True):
        n = 0
        for c in streamer.stream(
            text, ref=ref, max_frames=max_frames, chunk_frames=6, seed=seed
        ):
            n += c.shape[1]
            if stop_after_first:
                break
        return streamer.last_ttfa_s

    run_stream(0)  # warm the streaming-path jits
    ttfas = [run_stream(i + 1) * 1000.0 for i in range(5)]
    ttfa_ms = statistics.median(ttfas)

    # ---- batched serving aggregate (BASELINE config 4) --------------------
    # Median of 3 trials is the headline (artifact-honest); best rides as a
    # separate extra because the remote tunnel's bandwidth swings several-x
    # between runs and the best trial is closer to the framework's own cost.
    serve_x = serve_best_x = serve_ttfa_ms = tick_dev = None
    serve_ttfa_split = None
    if os.environ.get("SOPRO_BENCH_SERVE", "1") != "0":
        import threading

        from sopro_tpu.serve.scheduler import ContinuousBatcher

        batcher = ContinuousBatcher(tts, slots=8, chunk_frames=16, pcm16=True)
        batcher.start()
        batcher.warmup(ref=ref)

        def serve_trial(trial):
            done = {}

            def client(i):
                h = batcher.submit(text, ref, seed=100 * trial + i,
                                   max_frames=150)
                done[i] = sum(c.shape[1] for c in h.chunks()) / sr

            t0 = time.perf_counter()
            ths = [threading.Thread(target=client, args=(i,))
                   for i in range(8)]
            for th in ths:
                th.start()
            for th in ths:
                th.join()
            return sum(done.values()) / (time.perf_counter() - t0)

        trials = [serve_trial(t) for t in range(3)]
        serve_x = statistics.median(trials)
        serve_best_x = max(trials)
        # TTFA under 8-way concurrent load (scheduler-tracked, last 100),
        # plus its decomposition (prep | queue | admit->tick | tick->chunk)
        _st = batcher.stats()
        serve_ttfa_ms = _st.get("ttfa_p50_ms")
        serve_ttfa_split = {
            k: _st.get(k)
            for k in ("ttfa_prep_p50_ms", "ttfa_queue_p50_ms",
                      "ttfa_admit_tick_p50_ms", "ttfa_tick_chunk_p50_ms")
        }
        # pure DEVICE cost of one 8-row serving tick (rep trick, net of the
        # tunnel) — the scheduler loop is idle here, all sessions drained
        try:
            tick_dev = batcher.measure_tick_device_ms(ref)
        except Exception:
            tick_dev = None
        batcher.stop()

    # ---- batched offline synthesis (config 4, 32 padded utterances) -------
    batch32_x = batch32_best_x = None
    if os.environ.get("SOPRO_BENCH_BATCH", "1") != "0":
        texts32 = [
            f"Utterance number {i} spoken by the batched synthesizer."
            for i in range(32)
        ]
        tts.synthesize_batch(texts32, ref=ref, max_frames=150,
                             seeds=list(range(32)), pcm16=True)  # warm
        btrials = []
        for trial in range(3):
            t0 = time.perf_counter()
            outs = tts.synthesize_batch(
                texts32, ref=ref, max_frames=150,
                seeds=list(range(100 * (trial + 1), 100 * (trial + 1) + 32)),
                pcm16=True,
            )
            dt = time.perf_counter() - t0
            btrials.append(sum(w.shape[1] for w in outs) / sr / dt)
        batch32_x = statistics.median(btrials)
        batch32_best_x = max(btrials)

    backend = jax.devices()[0].platform
    base_rtf, base_ttfa = 0.05, 250.0
    result = {
        "metric": "single-stream RTF (non-streaming synthesize, 32s "
                  "long-form, fused dispatch, 16-bit PCM out)",
        "value": round(rtf, 5),
        "unit": "RTF",
        "vs_baseline": round(base_rtf / rtf, 2),
        "extras": {
            "backend": backend,
            "compute_dtype": dtype,
            "ttfa_p50_ms": round(ttfa_ms, 1),
            "ttfa_max_frames": 400,
            "ttfa_vs_baseline_x": round(base_ttfa / ttfa_ms, 2),
            "ar_frames_per_s": round(frames_per_s, 1),
            "serve8_aggregate_x_realtime": (
                round(serve_x, 1) if serve_x else None
            ),
            "serve8_aggregate_best_x": (
                round(serve_best_x, 1) if serve_best_x else None
            ),
            "serve8_ttfa_p50_ms": serve_ttfa_ms,
            "serve8_ttfa_split_ms": (
                serve_ttfa_split if serve_x is not None else None
            ),
            "serve8_tick_device_ms": (
                round(tick_dev["tick_device_ms"], 2) if tick_dev else None
            ),
            "serve8_tick_path": tick_dev["path"] if tick_dev else None,
            "serve8_onchip_x_realtime": (
                # 8 rows x chunk_frames of audio per tick / device tick time
                round(
                    (8 * 16 / fps) / (tick_dev["tick_device_ms"] / 1000.0), 1
                )
                if tick_dev and tick_dev["tick_device_ms"] > 0 else None
            ),
            "mfu_batch32_pct": (
                round(mfu_batch32_pct, 2)
                if mfu_batch32_pct is not None else None
            ),
            "batch32_aggregate_x_realtime": (
                round(batch32_x, 1) if batch32_x else None
            ),
            "batch32_aggregate_best_x": (
                round(batch32_best_x, 1) if batch32_best_x else None
            ),
            "onchip_synth_ms": (
                round(onchip_ms, 1) if onchip_ms is not None else None
            ),
            "onchip_synth_ms_med": (
                round(onchip_ms_med, 1) if onchip_ms is not None else None
            ),
            "onchip_synth_spread_pct": (
                round(onchip_spread_pct, 1) if onchip_ms is not None else None
            ),
            "batch32_onchip_spread_pct": (
                round(batch32_spread_pct, 1)
                if onchip_batch32_x is not None else None
            ),
            "onchip_batch32_x_realtime": (
                round(onchip_batch32_x, 1)
                if onchip_batch32_x is not None else None
            ),
            "onchip_rtf": (
                round(onchip_ms / 1000.0 / (wav.shape[1] / sr), 6)
                if onchip_ms is not None else None
            ),
            "audio_s_per_run": round(wav.shape[1] / sr, 2),
            "build_s": round(build_s, 1),
            "prepare_ref_s": round(prep_ref_s, 2),
            "first_run_incl_compile_s": round(compile_s, 1),
        },
    }
    _compare_prev(result)  # stderr only; stdout stays the one JSON line
    print(json.dumps(result))


# metrics compared against the previous round's driver artifact; True =
# higher is better
_GUARDED = {
    "ar_frames_per_s": True,
    "serve8_aggregate_x_realtime": True,
    "serve8_onchip_x_realtime": True,
    "batch32_aggregate_x_realtime": True,
    "onchip_batch32_x_realtime": True,
    "mfu_batch32_pct": True,
    "ttfa_p50_ms": False,
    "serve8_ttfa_p50_ms": False,
    "serve8_tick_device_ms": False,
    "onchip_synth_ms": False,
    "onchip_rtf": False,
}


def _compare_prev(result, threshold_pct: float = 10.0) -> None:
    """Regression guard (VERDICT r4 #1): diff this run's extras against the
    newest BENCH_r*.json in the repo and print any >= threshold move — in
    either direction — to stderr, so a regression is visible at bench time
    instead of one round later."""
    import glob
    import os
    import sys

    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")))
    if not files:
        return
    try:
        with open(files[-1]) as f:
            prev = json.load(f)
        pex = prev.get("parsed", prev).get("extras", {})
        prev_rtf = prev.get("parsed", prev).get("value")
    except Exception as e:  # the guard must never break the bench
        print(f"[bench] no previous-artifact comparison ({e})",
              file=sys.stderr)
        return
    name = os.path.basename(files[-1])
    ex = result["extras"]
    lines = []
    pairs = [("RTF", prev_rtf, result["value"], False)] + [
        (k, pex.get(k), ex.get(k), hi) for k, hi in _GUARDED.items()
    ]
    for k, old, new, hi in pairs:
        if not isinstance(old, (int, float)) or not isinstance(
            new, (int, float)
        ) or old == 0:
            continue
        pct = 100.0 * (new - old) / abs(old)
        worse = pct < 0 if hi else pct > 0
        if abs(pct) >= threshold_pct:
            tag = "REGRESSION" if worse else "improved"
            lines.append(f"{k} {old} -> {new} ({pct:+.1f}%, {tag})")
    if lines:
        print(f"[bench] vs {name}: " + "; ".join(lines), file=sys.stderr)
    else:
        print(f"[bench] vs {name}: all guarded metrics within "
              f"{threshold_pct:.0f}%", file=sys.stderr)


if __name__ == "__main__":
    main()
