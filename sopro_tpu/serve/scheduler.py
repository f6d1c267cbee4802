"""Continuous-batching scheduler: N concurrent TTS sessions on one chip.

Design (no reference counterpart — the reference FIFO-serializes behind
`_gen_lock`, demo/server.py:56): a fixed pool of `slots` batch rows holds
per-session decode state *persistently on device*:

* the AR carry is fully per-row (per-row step counters, RNG keys, EOS
  bookkeeping — models/sopro.py), so sessions of different ages decode in
  the same `lax.scan` tick;
* per-session conditioning and text KV caches live in batched buffers; a
  join scatters one row, a leave just frees the slot;
* every tick advances all rows by `chunk_frames`, then a batched windowed
  NAR pass + a mask-frozen streaming Mimi step vocodes the rows that
  emitted; finished rows are recycled and waiting sessions admitted.

All device work is ONE jitted call per tick regardless of batch occupancy
(AR chunk + NAR window + vocoder fused), and the tick's waveforms + all
host-needed scalars come back in ONE packed device->host transfer — on a
remote-attached device each extra dispatch/readback costs ~20 ms of fixed
latency, which would otherwise dominate the tick.

Two further tunnel optimizations (both measured on a ~30 ms-RTT,
~40 MB/s device link):

* `pcm16=True` packs the tick as int16 (16-bit waveform + int16 scalars),
  halving the per-tick transfer — the SPRO wire protocol ships 16-bit PCM
  anyway, so the servers lose nothing;
* tick N+1 is DISPATCHED before tick N's packed buffer is read back
  (dispatch is async; the carry dependency chains on device), so the
  readback's RTT + transfer time hides under the next tick's compute.
"""

from __future__ import annotations

import functools
import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sopro_tpu.codec.streaming import (
    init_mimi_stream_state,
    mimi_decode_step,
    reset_stream_rows,
)
from sopro_tpu.models import generator as G
from sopro_tpu.models import sopro as M


def _p50(xs: List[float]) -> Optional[float]:
    return round(sorted(xs)[len(xs) // 2], 1) if xs else None


def _ar_chunk_shardmap(mesh, cfg, carry, cond, kvc, settings, cf):
    """Resident AR chunk under a dp mesh: shard_map runs the whole-chunk
    Pallas kernel per shard (B/dp rows per chip, weights/emb replicated) —
    multi-chip serving keeps the VMEM-resident fast tick instead of falling
    back to per-step XLA. Pure dp: no collectives inside the shard."""
    from jax.sharding import PartitionSpec as P

    from sopro_tpu.ops.pallas_ar_loop import ResidentLoopContext

    row, rep = P("dp"), P()
    carry_spec = M.ARCarry(
        t=row, conv_state=[P(None, "dp")],  # packed bufs are [N, B, CTX, D]
        hist=row, streak=row, last=row, key=row, tokens=row,
        first_eos=row, stopped=row,
    )
    ctx_spec = ResidentLoopContext(
        stacked=jax.tree.map(lambda _: rep, kvc.stacked),
        # [A, B*H, L, hd] with B outer in axis 1: dp-sharding axis 1 gives
        # each chip its own rows' heads, contiguously
        kv_k=P(None, "dp"), kv_v=P(None, "dp"), mask=row, emb=rep,
    )

    def run(carry, cond, kvc, top_p, temp, rtp, rtemp, min_gen):
        s = M.ARSettings(
            top_p=top_p, temperature=temp, recovery_top_p=rtp,
            recovery_temp=rtemp, min_gen_frames=min_gen,
            anti_loop=settings.anti_loop, loop_streak=settings.loop_streak,
        )
        return M.ar_generate_chunk(None, cfg, carry, cond, kvc, s, cf)

    return jax.shard_map(
        run, mesh=mesh,
        in_specs=(carry_spec, row, ctx_spec, row, row, row, row, row),
        out_specs=carry_spec,
        check_vma=False,
    )(carry, cond, kvc, settings.top_p, settings.temperature,
      settings.recovery_top_p, settings.recovery_temp,
      settings.min_gen_frames)


def build_resident_ctx(res_static, txt_kv):
    """Pack per-row text-KV caches + stacked weights into the resident
    chunk kernel's context (ops/pallas_ar_loop.ResidentLoopContext).
    Trace-time helper shared by the tick graph and the tick profiler."""
    from sopro_tpu.ops.pallas_ar import HEAD_PAD, pad_kv_heads
    from sopro_tpu.ops.pallas_ar_loop import ResidentLoopContext

    stacked, emb = res_static
    kv_k = jnp.stack([kv["k"] for kv in txt_kv if kv is not None])
    kv_v = jnp.stack([kv["v"] for kv in txt_kv if kv is not None])
    a, b_, h, l, hd = kv_k.shape  # [A, B, H, L, hd]
    if hd != HEAD_PAD:
        kv_k, kv_v = pad_kv_heads(kv_k), pad_kv_heads(kv_v)
    return ResidentLoopContext(
        stacked=stacked,
        kv_k=kv_k.reshape(a, b_ * h, l, HEAD_PAD),
        kv_v=kv_v.reshape(a, b_ * h, l, HEAD_PAD),
        mask=next(kv["mask"] for kv in txt_kv if kv is not None),
        emb=emb,
    )


@dataclass
class SessionHandle:
    """Host-side handle: chunks arrive on `out` ([1, S] np arrays — float32,
    or int16 PCM when the batcher runs with `pcm16=True`),
    terminated by None. `error` is set if the session failed. `cancel()`
    stops the session at the next tick and frees its slot (client
    disconnects must not keep decoding into the void)."""

    sid: int
    out: "queue.Queue[Optional[np.ndarray]]" = field(
        default_factory=lambda: queue.Queue()
    )
    error: Optional[BaseException] = None
    created_s: float = field(default_factory=time.perf_counter)
    # TTFA decomposition (all perf_counter stamps; VERDICT r4 #2):
    # created -> prep_done (host-side request build; conditioning itself
    # runs inside the fused admit graph) -> admitted (fused admit
    # dispatched) -> first_tick (first tick carrying this row dispatched;
    # equals `admitted` on the fused admit+ramp path) -> first_chunk
    # (audio handed to the client)
    prep_done_s: Optional[float] = None
    admitted_s: Optional[float] = None
    first_tick_s: Optional[float] = None
    first_chunk_s: Optional[float] = None
    frames: int = 0
    cancelled: bool = False

    def cancel(self):
        self.cancelled = True

    def chunks(self):
        while True:
            item = self.out.get()
            if item is None:
                if self.error is not None:
                    raise self.error
                return
            yield item


@dataclass
class _Slot:
    handle: SessionHandle
    emitted: int = 0
    max_frames: int = 400
    ramped: bool = False  # a ramp tick has been dispatched for this row
    last_t: int = 0  # decode cursor from the last processed tick (host view)


class ContinuousBatcher:
    def __init__(
        self,
        tts,
        *,
        slots: int = 8,
        chunk_frames: int = 16,
        ramp_frames: int = 4,
        text_bucket: int = 256,
        max_frames: int = 400,
        nar_context_frames: Optional[int] = None,
        mesh=None,
        pcm16: bool = False,
        admit_grace_ms: float = 6.0,
    ):
        """`mesh`: an optional `jax.sharding.Mesh` with a "dp" axis — the
        persistent batched state shards its session axis across the slice,
        so every tick's AR/NAR/vocoder compute data-parallelizes over chips
        (BASELINE config 5: continuous batching on a v5e slice). `slots`
        must divide by the dp size.

        `ramp_frames`: TTFA-under-load ramp. A tick normally advances every
        row by `chunk_frames`; while any live row has not yet shipped its
        FIRST chunk, the scheduler dispatches a short `ramp_frames` tick
        instead, so a joining session's first audio waits one small tick
        rather than a full one (the reference has no analogue — its server
        FIFO-serializes whole generations, demo/server.py:56). Ticks of
        different sizes compose because each tick is self-contained: the
        NAR window and vocoder step derive from the per-row `emitted`
        cursor. Set ramp_frames >= chunk_frames to disable.

        `admit_grace_ms`: burst coalescing. A simultaneous N-way burst into
        an IDLE batcher races the scheduler loop — without a grace the first
        request to land is admitted alone and the other N-1 wait a full
        ramp-tick readback cycle (~1 tunnel RTT) for the next admit, which
        dominated the measured TTFA-under-load queue-wait. While every slot
        is free and the oldest waiting request is younger than the grace,
        admission is deferred so near-simultaneous joins share ONE fused
        admit + ramp tick. A solo join pays at most the grace (ms); joins
        into a busy batcher are unaffected (tick cycles exceed the grace).
        0 disables."""
        self.tts = tts
        self.eng = tts.engine
        self.cfg = tts.cfg
        self.mesh = mesh
        self.pcm16 = bool(pcm16)
        self.B = int(slots)
        self.cf = int(chunk_frames)
        self.ramp = max(1, min(int(ramp_frames), self.cf))
        # hard bound on ramp-induced stream latency per session: ramp ticks
        # are skipped while any established row's decode cursor is more than
        # this many frames ahead of its emissions (backlog added by ramp
        # ticks never drains for live rows — see _dispatch_tick)
        self.ramp_backlog_cap = 2 * self.cf
        self.admit_grace_s = max(0.0, float(admit_grace_ms)) / 1000.0
        # async device->host tick readback (plus its anti-race settle
        # window) only pays off across a real device link; on the CPU
        # backend transfers are free and the settle would throttle ticks
        self._async_copy = jax.default_backend() != "cpu"
        self.L = int(text_bucket)
        self.S = int(max_frames) + 1
        self.max_frames_cap = int(max_frames)
        self.nar_ctx = int(
            nar_context_frames if nar_context_frames is not None
            else tts.cfg.rf_nar()
        )
        self.hop = self.eng.mimi_cfg.hop_length

        cfgm = self.cfg
        b, s, d = self.B, self.S, cfgm.d_model
        self.carry = M.init_ar_carry(cfgm, b, s, jax.random.PRNGKey(0), dtype=self.eng.dtype)
        # stopped=True marks a free slot: frozen by the per-row masking
        self.carry = self.carry._replace(stopped=jnp.ones((b,), bool))

        # Resident tick: when the per-chip slice of the serving batch fits
        # the VMEM budget (B=8 at bucket 256 is ~41 MB), every tick's AR
        # chunk runs inside ONE whole-chunk VMEM-resident pallas_call
        # (ops/pallas_ar_loop.py) instead of cf per-step XLA dispatches.
        # Under a dp mesh the kernel runs per-shard via shard_map (B/dp
        # rows per chip; weights replicated), so multi-chip serving keeps
        # the fast tick.
        rows_per_chip = (
            self.B if mesh is None else self.B // int(mesh.shape["dp"])
        )
        self.use_resident = (
            self.eng.use_pallas_resident
            and self.eng.resident_vmem_bytes(rows_per_chip, self.L, self.S)
            <= self.eng.RESIDENT_VMEM_BUDGET
        )
        self._res_static = None
        if self.use_resident:
            from sopro_tpu.ops.pallas_ar import pack_conv_state, stack_ar_params

            self.carry = self.carry._replace(
                conv_state=[pack_conv_state(self.carry.conv_state)]
            )
            emb = self.eng.params["cb_embed"]["emb"]
            bos = int(cfgm.num_codebooks) * int(cfgm.codebook_size)
            self._res_static = (
                stack_ar_params(self.eng.params["ar"], cfgm),
                jnp.concatenate(
                    [emb[: cfgm.ar_vocab], emb[bos: bos + 1]], axis=0
                ),
            )
        self.cond = jnp.zeros((b, s, d), self.eng.dtype)
        zero_txt = jnp.zeros((b, self.L, d), self.eng.dtype)
        self.txt_kv = G.build_text_kv_caches(
            self.eng.params["ar"], cfgm, zero_txt, jnp.zeros((b, self.L), bool)
        )
        self.row_top_p = jnp.full((b,), 0.9, jnp.float32)
        self.row_temp = jnp.full((b,), 1.05, jnp.float32)
        # per-row anti-loop recovery params; a row with anti_loop disabled
        # sets these EQUAL to its normal params, making the recovery switch
        # a no-op (token-stream-identical to never detecting a loop)
        self.row_rtp = jnp.full((b,), 0.85, jnp.float32)
        self.row_rtemp = jnp.full((b,), 1.2, jnp.float32)
        self.row_min_gen = jnp.full((b,), cfgm.min_gen_frames, jnp.int32)
        self.row_max_frames = jnp.full((b,), self.max_frames_cap, jnp.int32)
        self.emitted = jnp.zeros((b,), jnp.int32)  # frames shipped per row
        self.mimi_state = init_mimi_stream_state(self.eng.mimi_cfg, b, dtype=self.eng.dtype)

        if mesh is not None:
            self._shard_state()

        self._slots: List[Optional[_Slot]] = [None] * b
        self._waiting: "queue.Queue" = queue.Queue()
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.ticks = 0
        self.ramp_ticks = 0
        self.admit_groups = 0  # fused admit dispatches (burst coalescing)
        # aggregate observability counters (surfaced via /v1/stats)
        self.sessions_done = 0
        self.total_audio_s = 0.0
        self._ttfa_ms: List[float] = []  # last 100 sessions
        # TTFA decomposition, same last-100 window (VERDICT r4 #2)
        self._ttfa_prep_ms: List[float] = []
        self._ttfa_queue_ms: List[float] = []  # prep done -> admitted
        self._ttfa_admit_tick_ms: List[float] = []  # admitted -> first tick
        self._ttfa_tick_chunk_ms: List[float] = []  # first tick -> chunk out
        self._dispatch_ms: List[float] = []  # last 100 ticks: jit call wall
        self._read_ms: List[float] = []  # last 100 ticks: packed readback

        self._build_fns()

    def _shard_state(self):
        """Commit the batched state with the session axis over "dp"; GSPMD
        propagates the layout through the tick/NAR/vocoder jits."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        if self.B % int(self.mesh.shape["dp"]) != 0:
            raise ValueError(
                f"slots={self.B} must divide by dp={self.mesh.shape['dp']}"
            )
        row = NamedSharding(self.mesh, P("dp"))
        repl = NamedSharding(self.mesh, P())

        def shard_rows(tree):
            return jax.tree.map(lambda x: jax.device_put(x, row), tree)

        # Packed resident conv buffers are [n_layers, B, CTX, D] — the row
        # axis is 1, so P("dp") on axis 0 would shard LAYERS (crashes when
        # dp does not divide n_layers_ar=6). Mirror the join fn's ndim==4
        # special case.
        lrow = NamedSharding(self.mesh, P(None, "dp"))
        conv_state = [
            jax.device_put(c, lrow if c.ndim == 4 else row)
            for c in self.carry.conv_state
        ]
        self.carry = shard_rows(
            self.carry._replace(conv_state=[])
        )._replace(conv_state=conv_state)
        self.cond = jax.device_put(self.cond, row)
        self.txt_kv = shard_rows(self.txt_kv)
        self.mimi_state = shard_rows(self.mimi_state)
        self.emitted = jax.device_put(self.emitted, row)
        self.row_top_p = jax.device_put(self.row_top_p, row)
        self.row_temp = jax.device_put(self.row_temp, row)
        self.row_rtp = jax.device_put(self.row_rtp, row)
        self.row_rtemp = jax.device_put(self.row_rtemp, row)
        self.row_min_gen = jax.device_put(self.row_min_gen, row)
        self.row_max_frames = jax.device_put(self.row_max_frames, row)
        self.eng.params = jax.device_put(self.eng.params, repl)
        if self.eng.mimi_params is not None:
            self.eng.mimi_params = jax.device_put(self.eng.mimi_params, repl)
        if self._res_static is not None:
            self._res_static = jax.device_put(self._res_static, repl)

    # ------------------------------------------------------------------ jit

    def _build_fns(self):
        eng, cfgm = self.eng, self.cfg
        S, L = self.S, self.L

        def prep(params, ids, mask, ref, strength):
            prep_d = M.prepare_conditioning(
                params, cfgm, ids, mask, ref,
                max_frames=S - 1, style_strength=strength,
            )
            kv = G.build_text_kv_caches(
                params["ar"], cfgm, prep_d["txt_seq"], mask
            )
            return prep_d["cond_ar"], kv

        self._prep = jax.jit(prep)

        def join_multi(params, carry, cond, txt_kv, row_arrays, mimi_state,
                       emitted, jmask, src, ids_b, mask_b, ref_parts,
                       strength_b, seeds_b, scal):
            """Admit a GROUP of sessions in ONE dispatch (burst TTFA,
            VERDICT r3 #2): `jmask` [B] marks slots being replaced, `src`
            [B] indexes the stacked new rows. The group is padded to B
            single-row pieces host-side, so every admit — 1 join or a
            full-burst 8 — shares one compiled shape (per ref bucket).

            The group's CONDITIONING runs here too (round 5): `submit` is
            host-only, and this one graph does batched prep (text encode +
            speaker FiLM + ref x-attn + text-KV build, per-row style
            strength) + per-row key derivation + the carry/cond/KV scatter
            + the vocoder-state reset. On a remote-attached device every
            dispatch costs a ~30 ms round trip, so the admit path's
            dispatch COUNT is the latency: it is exactly one."""
            ref = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *ref_parts
            )
            new_cond, new_kv = prep(
                params, ids_b, mask_b, ref, strength_b[:, None, None]
            )
            # same per-row derivation as init_ar_carry(batch=1), so a solo
            # scheduled session reproduces the streaming driver
            keys = jax.vmap(
                lambda s: jax.random.split(jax.random.PRNGKey(s), 1)[0]
            )(seeds_b)
            def sel(old, new):
                g = jnp.take(new, src, axis=0)
                m = jmask.reshape((-1,) + (1,) * (old.ndim - 1))
                return jnp.where(m, g.astype(old.dtype), old)

            cond = sel(cond, new_cond)
            txt_kv = [
                None if old is None else {
                    "k": sel(old["k"], new["k"]),
                    "v": sel(old["v"], new["v"]),
                    "mask": sel(old["mask"], new["mask"]),
                }
                for old, new in zip(txt_kv, new_kv)
            ]

            def zrow(c):
                # packed resident buffer is [N, B, CTX, D] (axis 1 = rows);
                # XLA per-block buffers are [B, ctx, D]
                m = (jmask[None, :, None, None] if c.ndim == 4
                     else jmask.reshape((-1,) + (1,) * (c.ndim - 1)))
                return jnp.where(m, jnp.zeros_like(c), c)

            carry = M.ARCarry(
                t=jnp.where(jmask, 0, carry.t),
                conv_state=[zrow(c) for c in carry.conv_state],
                hist=jnp.where(jmask[:, None], -1, carry.hist),
                streak=jnp.where(jmask, 0, carry.streak),
                last=jnp.where(jmask, 0, carry.last),
                key=sel(carry.key, keys),
                tokens=jnp.where(jmask[:, None], 0, carry.tokens),
                first_eos=jnp.where(
                    jmask, carry.tokens.shape[1], carry.first_eos
                ),
                stopped=jnp.where(jmask, False, carry.stopped),
            )
            row_arrays = {
                name: jnp.where(
                    jmask, scal[name].astype(row_arrays[name].dtype),
                    row_arrays[name],
                )
                for name in row_arrays
            }
            mimi_state = reset_stream_rows(mimi_state, jmask)
            emitted = jnp.where(jmask, 0, emitted)
            return carry, cond, txt_kv, row_arrays, mimi_state, emitted

        self._join = jax.jit(join_multi)

        def tick(params, mp, carry, cond, txt_kv, row, mimi_state, emitted,
                 res_static=None, voc_slabs=None, *, cf, W):
            """One fused tick: AR chunk for every row (ONE resident
            pallas_call when `res_static` is set, else cf XLA steps),
            windowed NAR over the new frames, streaming vocoder step, and a
            packed [waveforms | scalars] buffer so the host syncs exactly
            once. `cf`/`W` are static: the full tick and the ramp tick are
            two specializations of this one graph."""
            settings = M.ARSettings(
                top_p=row["top_p"],
                temperature=row["temp"],
                recovery_top_p=row["rtp"],
                recovery_temp=row["rtemp"],
                min_gen_frames=row["min_gen"],
                anti_loop=True,
            )
            if res_static is not None:
                kvc = build_resident_ctx(res_static, txt_kv)
                if self.mesh is not None:
                    carry = _ar_chunk_shardmap(
                        self.mesh, cfgm, carry, cond, kvc, settings, cf
                    )
                else:
                    carry = M.ar_generate_chunk(
                        params, cfgm, carry, cond, kvc, settings, cf
                    )
            else:
                carry = M.ar_generate_chunk(
                    params, cfgm, carry, cond, txt_kv, settings, cf
                )
            # per-row max_frames: force-stop rows at their cap
            capped = carry.t >= (row["max_frames"] + 1)
            carry = carry._replace(stopped=carry.stopped | capped)
            valid = jnp.minimum(
                jnp.minimum(carry.first_eos, carry.t), row["max_frames"] + 1
            )
            pending = jnp.maximum(valid - emitted, 0)
            if cf < self.cf:
                # ramp tick: only rows awaiting their FIRST chunk emit.
                # Established rows keep decoding (their t advances) but hold
                # their cf-aligned emission grid — the ramp frames ride as
                # backlog drained by later full ticks — so a join never
                # perturbs a co-resident's chunk boundaries (and therefore
                # never changes its waveform: NAR windows derive from the
                # emission grid).
                n_new = jnp.where(
                    emitted == 0, jnp.minimum(pending, cf), 0
                )
            else:
                n_new = jnp.minimum(pending, cf)

            # windowed NAR: window = frames [emitted+cf-W, emitted+cf),
            # masked to the reference context [emitted - nar_ctx, valid)
            # (src/sopro/streaming.py:81-98)
            cond_pad = jnp.concatenate(
                [jnp.zeros((cond.shape[0], W, cond.shape[-1]), cond.dtype),
                 cond],
                axis=1,
            )
            toks_pad = jnp.concatenate(
                [jnp.zeros((carry.tokens.shape[0], W), carry.tokens.dtype),
                 carry.tokens],
                axis=1,
            )
            start = emitted + cf  # per-row start into padded arrays

            def row_slice(arr, st):
                return jax.lax.dynamic_slice_in_dim(arr, st, W, axis=0)

            win = jax.vmap(row_slice)(cond_pad, start)
            rvq = jax.vmap(row_slice)(toks_pad, start)
            orig = (emitted[:, None] + cf - W) + jnp.arange(W)[None]
            mask = (orig >= 0) & (orig < valid[:, None])
            # head_tail: only the emitted tail needs final-stage heads —
            # the [B, W, 16, V] stage-E logits (~100 MB/tick at B=8)
            # shrink to the cf frames the vocoder consumes
            tokens_w = M.nar_refine(
                params, cfgm, win, rvq, mask=mask, head_tail=cf
            )

            chunk = tokens_w[:, W - cf:]  # frames [emitted, emitted+cf)
            rows_emit = n_new > 0
            wav, mimi_state = mimi_decode_step(
                mp, eng.mimi_cfg, chunk, mimi_state, mask=rows_emit,
                slabs=voc_slabs,
            )
            emitted = emitted + n_new

            info = jnp.stack(
                [carry.t, carry.first_eos, carry.stopped.astype(jnp.int32),
                 n_new]
            )
            if self.pcm16:
                # int16 packing halves the per-tick transfer; every scalar
                # (t, first_eos <= S=401, n_new <= cf) fits in int16
                pcm = jnp.round(
                    jnp.clip(wav.astype(jnp.float32), -1.0, 1.0) * 32767.0
                ).astype(jnp.int16)
                packed = jnp.concatenate(
                    [pcm.ravel(), info.astype(jnp.int16).ravel()]
                )
            else:
                packed = jnp.concatenate(
                    [wav.astype(jnp.float32).ravel(),
                     info.astype(jnp.float32).ravel()]
                )
            return carry, mimi_state, emitted, packed

        tick_jit = jax.jit(tick, static_argnames=("cf", "W"))
        # fused streaming vocoder: Pallas SEANet over [emb_hist ++ chunk]
        # when the codec is kernel-supported. Under a mesh the pallas_call
        # would need its own shard_map wrapping — keep XLA there for now.
        self._voc_slabs = eng.mimi_slabs if self.mesh is None else None
        self._tick = functools.partial(
            tick_jit, voc_slabs=self._voc_slabs,
            cf=self.cf, W=self.cf + self.nar_ctx
        )
        self._tick_ramp = (
            self._tick if self.ramp >= self.cf
            else functools.partial(
                tick_jit, voc_slabs=self._voc_slabs,
                cf=self.ramp, W=self.ramp + self.nar_ctx
            )
        )

        def join_tick(params, mp, carry, cond, txt_kv, row_arrays,
                      mimi_state, emitted, jmask, src, ids_b, mask_b,
                      ref_parts, strength_b, seeds_b, scal,
                      res_static=None, voc_slabs=None, *, cf, W):
            """Fused admit + ramp tick (round 5, TTFA): batched prep, the
            join scatter, AND the joiners' first ramp-sized tick run as
            ONE dispatch, so a burst's first audio needs exactly one
            dispatch + one readback after a host-only submit — instead of
            per-session prep dispatches, join dispatch(es), a separate
            ramp-tick dispatch, and a readback queued behind the next full
            tick's upload. Numerically identical to prep + join_multi
            followed by the ramp specialization of `tick` (it IS that
            composition)."""
            (carry, cond, txt_kv, row_arrays, mimi_state,
             emitted) = join_multi(
                params, carry, cond, txt_kv, row_arrays, mimi_state,
                emitted, jmask, src, ids_b, mask_b, ref_parts, strength_b,
                seeds_b, scal,
            )
            carry, mimi_state, emitted, packed = tick(
                params, mp, carry, cond, txt_kv, row_arrays, mimi_state,
                emitted, res_static, voc_slabs, cf=cf, W=W,
            )
            return (carry, cond, txt_kv, row_arrays, mimi_state, emitted,
                    packed)

        self._join_ramp_tick = (
            None if self.ramp >= self.cf
            else functools.partial(
                jax.jit(join_tick, static_argnames=("cf", "W")),
                voc_slabs=self._voc_slabs,
                cf=self.ramp, W=self.ramp + self.nar_ctx,
            )
        )
    # ------------------------------------------------------------- lifecycle

    def start(self):
        if self._thread is None:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    def stop(self):
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    def warmup(self, ref=None):
        """Compile the join/tick/NAR/vocoder path before serving traffic.
        Pass a `ref` shaped like production references (its bucket size keys
        the conditioning compile); defaults to the 12 s reference bucket."""
        if ref is None:
            ref = self.eng.prepare_reference(
                np.zeros((int(12.0 * self.cfg.mimi_fps), self.cfg.num_codebooks),
                         np.int32)
            )
        # pass 1 with the fused admit+ramp disabled: compiles the plain
        # join + the loop's ramp/full tick graphs (still reachable in
        # production when an established row hits the backlog cap)
        fused, self._join_ramp_tick = self._join_ramp_tick, None
        try:
            h = self.submit("warmup", ref, max_frames=self.cf,
                            min_gen_frames=1)
            for _ in h.chunks():
                pass
        finally:
            self._join_ramp_tick = fused
        if fused is not None:
            # pass 2: compiles the fused admit+ramp graph
            h = self.submit("warmup", ref, max_frames=self.cf,
                            min_gen_frames=1)
            for _ in h.chunks():
                pass

    def bench_state(self, ref, text: str = "benchmark tick"):
        """Synthetic full-occupancy tick inputs (every slot live on `text`):
        (carry, cond, txt_kv, row, mimi_state, emitted). Shared by
        `measure_tick_device_ms` and `benchmarks/profile.py tick`."""
        ids = self.tts.encode_text(text)
        ids_p = np.zeros((1, self.L), np.int32)
        ids_p[0, : len(ids)] = ids
        msk = np.zeros((1, self.L), bool)
        msk[0, : len(ids)] = True
        new_cond, new_kv = self._prep(
            self.eng.params, jnp.asarray(ids_p), jnp.asarray(msk), ref,
            jnp.float32(self.cfg.style_strength),
        )
        b = self.B
        bcast = lambda x: jnp.broadcast_to(x, (b,) + x.shape[1:])
        cond = bcast(new_cond)
        txt_kv = [
            None if kv is None else {k: bcast(v) for k, v in kv.items()}
            for kv in new_kv
        ]
        carry = M.init_ar_carry(
            self.cfg, b, self.S, jax.random.PRNGKey(42), dtype=self.eng.dtype
        )
        if self.use_resident:
            from sopro_tpu.ops.pallas_ar import pack_conv_state

            carry = carry._replace(
                conv_state=[pack_conv_state(carry.conv_state)]
            )
        row = {
            "top_p": self.row_top_p, "temp": self.row_temp,
            "rtp": self.row_rtp, "rtemp": self.row_rtemp,
            "min_gen": self.row_min_gen, "max_frames": self.row_max_frames,
        }
        mimi_state = init_mimi_stream_state(
            self.eng.mimi_cfg, b, dtype=self.eng.dtype
        )
        emitted = jnp.zeros((b,), jnp.int32)
        return carry, cond, txt_kv, row, mimi_state, emitted

    def measure_tick_device_ms(self, ref, text: str = "benchmark tick",
                               reps: int = 3) -> dict:
        """Pure DEVICE cost of one serving tick with every slot active, net
        of the host<->device link: chain the jitted tick graph N times
        inside one dispatch (each iteration advances the carry, so no
        iteration can be elided) and difference N=1 vs N=1+2*reps. Call
        only while the scheduler loop is idle (no live sessions). Returns
        {"tick_device_ms", "path", "rows"}."""
        carry, cond, txt_kv, row, mimi_state, emitted = self.bench_state(
            ref, text
        )
        tick = self._tick

        def runner(n):
            # every array rides as a jit ARGUMENT (closures would bake the
            # weights/KV into the HLO as constants)
            @jax.jit
            def f(params, mp, carry, cond, tkv, row, mimi_state, emitted,
                  res_static):
                def it(i, st):
                    c, ms, em, acc = st
                    c, ms, em, packed = tick(
                        params, mp, c, cond, tkv, row, ms, em, res_static
                    )
                    return c, ms, em, acc + jnp.sum(
                        packed.astype(jnp.float32)
                    )

                _, _, _, acc = jax.lax.fori_loop(
                    0, n, it, (carry, mimi_state, emitted, jnp.float32(0.0))
                )
                return acc

            return f

        import time as _time

        r1 = runner(1)
        rn = runner(1 + 2 * reps)

        def tmin(fn, k=3):
            args = (self.eng.params, self.eng.mimi_params, carry, cond,
                    txt_kv, row, mimi_state, emitted, self._res_static)
            jax.block_until_ready(fn(*args))
            out = []
            for _ in range(k):
                t0 = _time.perf_counter()
                jax.block_until_ready(fn(*args))
                out.append(_time.perf_counter() - t0)
            return min(out)

        t1, tn = tmin(r1), tmin(rn)
        return {
            "tick_device_ms": max(tn - t1, 0.0) / (2 * reps) * 1000.0,
            "path": "resident" if self.use_resident else "xla",
            "rows": self.B,
        }

    # ------------------------------------------------------------- interface

    def submit(
        self,
        text: str,
        ref,
        *,
        top_p: float = 0.9,
        temperature: float = 1.05,
        style_strength: Optional[float] = None,
        max_frames: Optional[int] = None,
        min_gen_frames: Optional[int] = None,
        seed: int = 0,
        anti_loop: bool = True,
    ) -> SessionHandle:
        """Queue a session; returns immediately with a handle whose `chunks()`
        yields waveform chunks as the batch produces them. Raises ValueError
        for text longer than the scheduler's token bucket (no silent
        truncation — callers surface a 400)."""
        ids = self.tts.encode_text(text)
        if len(ids) > self.L:
            raise ValueError(
                f"text encodes to {len(ids)} tokens, over the scheduler "
                f"bucket of {self.L}; shorten the text or raise text_bucket"
            )
        handle = SessionHandle(sid=id(object()))
        # submit is HOST-ONLY (round 5): the group's conditioning runs
        # batched inside the fused admit graph on the scheduler thread, so
        # a burst's requests hit the waiting queue within microseconds of
        # each other (the admit grace can then coalesce them into one
        # dispatch) and nothing here pays a device round trip. Bad text
        # still raises directly to the caller.
        ids_p = np.zeros((1, self.L), np.int32)
        ids_p[0, : len(ids)] = ids
        mask = np.zeros((1, self.L), bool)
        mask[0, : len(ids)] = True
        handle.prep_done_s = time.perf_counter()
        req = {
            "handle": handle,
            "ids": ids_p,
            "mask": mask,
            "ref": ref,
            # ref bucket keys the fused admit graph's compile — a group
            # must share one signature (mixed buckets admit in waves)
            "ref_sig": tuple(
                (tuple(l.shape), str(l.dtype))
                for l in jax.tree.leaves(ref)
            ),
            "strength": float(
                style_strength if style_strength is not None
                else self.cfg.style_strength
            ),
            "top_p": float(top_p),
            "temperature": float(temperature),
            # anti_loop off = recovery params equal normal params: the
            # recovery switch becomes a no-op for this row (the reference
            # skips its loop checks entirely, src/sopro/model.py:274-279;
            # same token stream either way)
            "rtp": 0.85 if anti_loop else float(top_p),
            "rtemp": 1.2 if anti_loop else float(temperature),
            "max_frames": int(
                min(max_frames, self.max_frames_cap) if max_frames
                else self.max_frames_cap
            ),
            "min_gen": int(min_gen_frames or self.cfg.min_gen_frames),
            "seed": int(seed),
            "arrived_s": time.perf_counter(),
        }
        self._waiting.put(req)
        self._wake.set()
        self.start()
        return handle

    # -------------------------------------------------------------- internals

    def _admit(self):
        """Fill free slots from the waiting queue (scheduler thread only).
        All waiting sessions that fit join in ONE fused dispatch — an 8-way
        burst used to chain 16 small executables (join + vocoder reset per
        session), which dominated TTFA under simultaneous load. When ramp
        ticks are enabled and no established row is backlog-capped, that
        one dispatch ALSO runs the joiners' first ramp tick (`join_tick`),
        so the group's first audio is already in flight when this returns.

        Returns (deferred, pending): `deferred` is True if admission was
        put off under the burst-coalescing grace (idle batcher, partial
        group, oldest arrival younger than `admit_grace_s`) — the caller
        should re-poll shortly instead of sleeping the full idle timeout.
        `pending` is a (packed, snapshot, cf) tick from the fused
        admit+ramp dispatch for the caller to read back, or None."""
        while True:
            free = [i for i, s in enumerate(self._slots) if s is None]
            if not free or self._waiting.empty():
                return False, None
            group, requeue = [], []
            while len(group) < len(free) and not self._waiting.empty():
                req = self._waiting.get()
                if req["handle"].cancelled:
                    req["handle"].out.put(None)
                    continue
                if group and req["ref_sig"] != group[0]["ref_sig"]:
                    # the fused admit graph is compiled per ref bucket; a
                    # mixed-bucket burst admits in same-bucket waves
                    requeue.append(req)
                    continue
                group.append(req)
            for req in requeue:
                self._waiting.put(req)
            if not group:
                continue
            if (
                self.admit_grace_s > 0.0
                and len(group) < len(free)
                and len(free) == self.B  # idle: no live rows to perturb
                and time.perf_counter() - min(r["arrived_s"] for r in group)
                < self.admit_grace_s
            ):
                for req in group:
                    self._waiting.put(req)
                return True, None
            slots = free[: len(group)]
            try:
                # pad the group to exactly B single-row pieces (repeat the
                # first) so the piece count — and the fused join graph —
                # are identical for every admit; stacking AND conditioning
                # run inside the jitted join (host numpy / device ref
                # handles only here, zero eager device dispatches)
                pieces = group + [group[0]] * (self.B - len(group))
                ids_b = np.concatenate([r["ids"] for r in pieces], axis=0)
                mask_b = np.concatenate([r["mask"] for r in pieces], axis=0)
                ref_parts = tuple(r["ref"] for r in pieces)
                strength_b = np.asarray(
                    [r["strength"] for r in pieces], np.float32
                )
                seeds_b = np.asarray([r["seed"] for r in pieces], np.int32)
                jmask = np.zeros((self.B,), bool)
                src = np.zeros((self.B,), np.int32)
                for i, slot in enumerate(slots):
                    jmask[slot] = True
                    src[slot] = i
                scal = {
                    "top_p": np.asarray(
                        [r["top_p"] for r in pieces], np.float32),
                    "temp": np.asarray(
                        [r["temperature"] for r in pieces], np.float32),
                    "rtp": np.asarray(
                        [r["rtp"] for r in pieces], np.float32),
                    "rtemp": np.asarray(
                        [r["rtemp"] for r in pieces], np.float32),
                    "min_gen": np.asarray(
                        [r["min_gen"] for r in pieces], np.int32),
                    "max_frames": np.asarray(
                        [r["max_frames"] for r in pieces], np.int32),
                }
                row = {
                    "top_p": self.row_top_p, "temp": self.row_temp,
                    "rtp": self.row_rtp, "rtemp": self.row_rtemp,
                    "min_gen": self.row_min_gen,
                    "max_frames": self.row_max_frames,
                }
                # fused admit+ramp: one dispatch both joins the group and
                # runs its first ramp tick — unless ramp ticks are off, or
                # an established row sits at the backlog cap (then the
                # plain join runs and the loop's tick logic decides)
                use_fused = (
                    self._join_ramp_tick is not None
                    and all(
                        s.last_t - s.emitted <= self.ramp_backlog_cap
                        for s in self._slots
                        if s is not None and s.emitted > 0
                    )
                )
                packed = None
                if use_fused:
                    (self.carry, self.cond, self.txt_kv, row,
                     self.mimi_state, self.emitted,
                     packed) = self._join_ramp_tick(
                        self.eng.params, self.eng.mimi_params,
                        self.carry, self.cond, self.txt_kv, row,
                        self.mimi_state, self.emitted,
                        jmask, src, ids_b, mask_b, ref_parts, strength_b,
                        seeds_b, scal, self._res_static,
                    )
                    if self._async_copy:
                        try:
                            packed.copy_to_host_async()
                        except (AttributeError, RuntimeError):
                            pass
                else:
                    (self.carry, self.cond, self.txt_kv, row,
                     self.mimi_state, self.emitted) = self._join(
                        self.eng.params,
                        self.carry, self.cond, self.txt_kv, row,
                        self.mimi_state, self.emitted,
                        jmask, src, ids_b, mask_b, ref_parts, strength_b,
                        seeds_b, scal,
                    )
                self.row_top_p = row["top_p"]
                self.row_temp = row["temp"]
                self.row_rtp = row["rtp"]
                self.row_rtemp = row["rtemp"]
                self.row_min_gen = row["min_gen"]
                self.row_max_frames = row["max_frames"]
                now = time.perf_counter()
                self.admit_groups += 1
                for req, slot in zip(group, slots):
                    req["handle"].admitted_s = now
                    self._slots[slot] = _Slot(
                        handle=req["handle"], max_frames=req["max_frames"]
                    )
                if packed is not None:
                    # ramp bookkeeping for the fused tick (mirrors
                    # _dispatch_tick): a ramp tick emits for EVERY row still
                    # at emitted==0, so it is the first tick — and spends
                    # the ramp — of all of them, not just this group
                    for s in self._slots:
                        if s is None:
                            continue
                        if s.emitted == 0:
                            s.ramped = True
                        if s.handle.first_tick_s is None:
                            s.handle.first_tick_s = now
                    self.ticks += 1
                    self.ramp_ticks += 1
                    return False, (
                        packed, list(self._slots), self.ramp,
                        time.perf_counter() if self._async_copy else None,
                    )
            except BaseException as e:  # deliver the failure to the callers
                for req in group:
                    req["handle"].error = e
                    req["handle"].out.put(None)

    def _run(self):
        # software-pipelined tick loop: tick N+1 is dispatched (async — the
        # carry dependency chains on device) BEFORE tick N's packed buffer is
        # read back, so the readback RTT + transfer hides under tick N+1's
        # device compute
        pending = None  # (packed device buffer, slot snapshot) of last tick
        while not self._stop.is_set():
            with self._lock:
                deferred, admit_pending = self._admit()
                busy = any(s is not None for s in self._slots)
            if not busy and pending is None:
                # grace deferral: re-poll at ~1 ms so the coalesced burst
                # admits as soon as the window closes, not a full idle tick
                self._wake.wait(timeout=0.001 if deferred else 0.05)
                self._wake.clear()
                continue
            try:
                if admit_pending is not None:
                    # the fused admit+ramp tick carries the joiners' FIRST
                    # audio: read it before dispatching anything else so the
                    # readback isn't queued behind the next tick's upload
                    # (one pipeline bubble, ramp ticks only)
                    if pending is not None:
                        self._process_tick(*pending)
                        pending = None
                    self._process_tick(*admit_pending)
                nxt = self._dispatch_tick() if busy else None
                if pending is not None:
                    self._process_tick(*pending)
                pending = nxt
            except BaseException as e:
                # fail all live sessions rather than spinning
                for i, s in enumerate(self._slots):
                    if s is not None:
                        s.handle.error = e
                        s.handle.out.put(None)
                        self._slots[i] = None
                pending = None

    def _dispatch_tick(self):
        # retire cancelled sessions before spending device time on them
        cancelled = [
            i for i, s in enumerate(self._slots)
            if s is not None and s.handle.cancelled
        ]
        if cancelled:
            mask = jnp.asarray(np.isin(np.arange(self.B), cancelled))
            self.carry = self.carry._replace(
                stopped=self.carry.stopped | mask
            )
            for i in cancelled:
                self._slots[i].handle.out.put(None)
                self._slots[i] = None

        row = {
            "top_p": self.row_top_p, "temp": self.row_temp,
            "rtp": self.row_rtp, "rtemp": self.row_rtemp,
            "min_gen": self.row_min_gen, "max_frames": self.row_max_frames,
        }
        # ramp: while any live row is still waiting on its FIRST chunk, run
        # a short tick so its TTFA is one small tick, not a full one. The
        # `ramped` flag (host-side) keeps the pipelined loop from dispatching
        # a second ramp tick before the first one's readback lands.
        # Every ramp tick permanently adds `ramp` frames of stream latency
        # to every ESTABLISHED row (full ticks advance t by cf and emit at
        # most cf, so live backlog never drains) — the backlog cap bounds
        # that to ~2 chunks per session lifetime: once a co-resident's
        # decode cursor runs that far ahead of its emissions, joins fall
        # back to waiting one full tick.
        fresh = [
            s for s in self._slots
            if s is not None and s.emitted == 0 and not s.ramped
        ]
        backlog_ok = all(
            s.last_t - s.emitted <= self.ramp_backlog_cap
            for s in self._slots if s is not None and s.emitted > 0
        )
        use_ramp = (
            self._tick_ramp is not self._tick and bool(fresh) and backlog_ok
        )
        for s in fresh:
            s.ramped = True
        fn = self._tick_ramp if use_ramp else self._tick
        cf_used = self.ramp if use_ramp else self.cf
        t0 = time.perf_counter()
        self.carry, self.mimi_state, self.emitted, packed = fn(
            self.eng.params, self.eng.mimi_params, self.carry, self.cond,
            self.txt_kv, row, self.mimi_state, self.emitted,
            self._res_static,
        )
        now = time.perf_counter()
        self._dispatch_ms.append((now - t0) * 1000.0)
        del self._dispatch_ms[:-100]
        if self._async_copy:
            try:
                # start the device->host copy NOW: by the time the pipelined
                # loop blocks on np.asarray (after dispatching the NEXT
                # tick) the transfer has been running since this tick's
                # device work finished, instead of paying a full link RTT +
                # transfer then. CAUTION: np.asarray racing a just-started
                # async copy can stall for minutes on the tunneled backend —
                # _process_tick enforces a small settle window from this
                # timestamp before reading.
                packed.copy_to_host_async()
            except (AttributeError, RuntimeError):
                pass  # backend without async host copies: asarray pays it
        for s in self._slots:
            if s is not None and s.handle.first_tick_s is None:
                s.handle.first_tick_s = now
        self.ticks += 1
        if use_ramp:
            self.ramp_ticks += 1
        return (packed, list(self._slots), cf_used,
                time.perf_counter() if self._async_copy else None)

    def _process_tick(self, packed, snap, cf_used, disp_s=None):
        """Read back a dispatched tick's packed buffer and route its chunks.
        `snap` is the slot list at dispatch time — a slot freed/refilled in
        the meantime must not receive this tick's rows. `cf_used` is the
        chunk size of THAT tick (full or ramp). `disp_s` is the dispatch
        timestamp whose copy_to_host_async we must not race (the tunneled
        backend stalls for MINUTES if asarray lands while the async copy is
        still being set up; >=12 ms later it's at worst one link RTT)."""
        if disp_s is not None:
            settle = 0.012 - (time.perf_counter() - disp_s)
            if settle > 0:
                time.sleep(settle)
        t0 = time.perf_counter()
        flat = np.asarray(packed)  # the ONE device->host transfer per tick
        self._read_ms.append((time.perf_counter() - t0) * 1000.0)
        del self._read_ms[:-100]
        nwav = self.B * cf_used * self.hop
        wav = flat[:nwav].reshape(self.B, cf_used * self.hop)
        info = flat[nwav:].reshape(4, self.B).astype(np.int64)
        t, first_eos, stopped, n_new = (
            info[0], info[1], info[2].astype(bool), info[3],
        )

        for i, s in enumerate(snap):
            if s is None or self._slots[i] is not s:
                continue
            s.last_t = int(t[i])  # host view of the decode cursor (ramp cap)

        for i, s in enumerate(snap):
            if s is None or s.handle.cancelled or n_new[i] <= 0:
                continue
            s.handle.out.put(wav[i : i + 1, : int(n_new[i]) * self.hop].copy())
            if s.handle.first_chunk_s is None:
                h = s.handle
                now = time.perf_counter()
                h.first_chunk_s = now - h.created_s
                # TTFA split: prep | queue-wait | admit->tick | tick->chunk
                stamps = (h.created_s, h.prep_done_s, h.admitted_s,
                          h.first_tick_s, now)
                if all(x is not None for x in stamps):
                    for lst, a, b in (
                        (self._ttfa_prep_ms, stamps[0], stamps[1]),
                        (self._ttfa_queue_ms, stamps[1], stamps[2]),
                        (self._ttfa_admit_tick_ms, stamps[2], stamps[3]),
                        (self._ttfa_tick_chunk_ms, stamps[3], stamps[4]),
                    ):
                        lst.append(max(b - a, 0.0) * 1000.0)
                        del lst[:-100]
            s.emitted += int(n_new[i])
            s.handle.frames = s.emitted

        # retire finished rows (only if the slot still holds this session)
        for i, s in enumerate(snap):
            if s is None or self._slots[i] is not s:
                continue
            done = bool(stopped[i]) or int(t[i]) >= self.S
            valid = int(min(first_eos[i], t[i], s.max_frames + 1))
            if done and s.emitted >= valid:
                s.handle.out.put(None)
                self.sessions_done += 1
                self.total_audio_s += (
                    s.emitted * self.hop / self.eng.mimi_cfg.sampling_rate
                )
                if s.handle.first_chunk_s is not None:
                    self._ttfa_ms.append(s.handle.first_chunk_s * 1000.0)
                    del self._ttfa_ms[:-100]
                self._slots[i] = None

    def stats(self) -> Dict[str, Any]:
        """Aggregate serving metrics (SURVEY.md §5 observability)."""
        live = sum(1 for s in self._slots if s is not None)
        return {
            "slots": self.B,
            "max_frames_cap": self.max_frames_cap,
            "active_sessions": live,
            "waiting": self._waiting.qsize(),
            "ticks": self.ticks,
            "ramp_ticks": self.ramp_ticks,
            "admit_groups": self.admit_groups,
            "chunk_frames": self.cf,
            "ramp_frames": self.ramp,
            "sessions_done": self.sessions_done,
            "total_audio_s": round(self.total_audio_s, 2),
            "ttfa_p50_ms": _p50(self._ttfa_ms),
            # where the first chunk's latency went (p50 over last 100):
            # submit->prep dispatched | prep->admitted | admitted->first
            # tick dispatched | first tick->chunk delivered
            "ttfa_prep_p50_ms": _p50(self._ttfa_prep_ms),
            "ttfa_queue_p50_ms": _p50(self._ttfa_queue_ms),
            "ttfa_admit_tick_p50_ms": _p50(self._ttfa_admit_tick_ms),
            "ttfa_tick_chunk_p50_ms": _p50(self._ttfa_tick_chunk_ms),
            "tick_dispatch_ms_p50": _p50(self._dispatch_ms),
            "tick_read_ms_p50": _p50(self._read_ms),
        }
