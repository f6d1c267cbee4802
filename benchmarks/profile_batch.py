"""Clean in-session breakdown of the batch-32 offline path: AR-only,
AR+NAR, and full pipeline, each with a forced readback (block_until_ready is
not a reliable fence on the remote backend)."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, n=3, warm=1):
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
    from sopro_tpu.config import pick_bucket
    from sopro_tpu.models import generator as G
    import sopro_tpu.models.sopro as M
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    cfg = tts.cfg
    print("backend:", jax.devices()[0].platform, flush=True)

    rng = np.random.default_rng(0)
    ref = eng.prepare_reference(
        rng.integers(0, cfg.codebook_size, (62, cfg.num_codebooks)).astype(np.int32))
    texts = [f"Utterance number {i} spoken by the batched synthesizer."
             for i in range(32)]
    ids_rows = [tts.encode_text(x) for x in texts]
    bsz, mf = 32, 150
    s = mf + 1
    lb = pick_bucket(max(len(r) for r in ids_rows), rt.text_buckets)
    ids = np.zeros((bsz, lb), np.int32)
    mask = np.zeros((bsz, lb), bool)
    for i, r in enumerate(ids_rows):
        ids[i, : len(r)] = r
        mask[i, : len(r)] = True
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    def tile(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 1:
            return jnp.broadcast_to(x, (bsz,) + x.shape[1:])
        return x

    ref_b = jax.tree.map(tile, ref)
    keys = jnp.stack([jax.random.PRNGKey(i) for i in range(bsz)])
    keys = jax.vmap(lambda k: jax.random.split(k, 1)[0])(keys)
    settings = M.ARSettings(
        top_p=jnp.float32(0.9), temperature=jnp.float32(1.05),
        recovery_top_p=jnp.float32(0.85), recovery_temp=jnp.float32(1.2),
        min_gen_frames=jnp.int32(12), anti_loop=True,
    )

    def prep_and_ar(params, ids, mask, ref, keys):
        prep = M.prepare_conditioning(params, cfg, ids, mask, ref,
                                      max_frames=mf, style_strength=1.0)
        kv = G.build_text_kv_caches(params["ar"], cfg, prep["txt_seq"], mask)
        carry = M.init_ar_carry(cfg, bsz, s, keys[0], eng.dtype)
        carry = carry._replace(key=keys)
        carry = jax.lax.while_loop(
            lambda c: jnp.any(M.ar_row_active(c, s)),
            lambda c: M.ar_single_step(params, cfg, c, prep["cond_ar"], kv,
                                       settings),
            carry,
        )
        return prep, carry

    # ---- AR only ----------------------------------------------------------
    ar_jit = jax.jit(lambda p, i, m, r, k: prep_and_ar(p, i, m, r, k)[1].tokens)

    def ar_run():
        return np.asarray(ar_jit(eng.params, ids, mask, ref_b, keys))

    mn, md = t(ar_run)
    print(f"B32 prep+AR(150) + tokens readback: min {mn*1e3:.0f} ms med "
          f"{md*1e3:.0f} ms", flush=True)

    # ---- AR + NAR ---------------------------------------------------------
    def upto_nar(p, i, m, r, k):
        prep, carry = prep_and_ar(p, i, m, r, k)
        lengths = jnp.minimum(carry.first_eos, carry.t)
        fmask = jnp.arange(s)[None, :] < lengths[:, None]
        return M.nar_refine(p, cfg, prep["cond_ar"], carry.tokens, mask=fmask)

    nar_jit = jax.jit(upto_nar)

    def nar_run():
        return np.asarray(nar_jit(eng.params, ids, mask, ref_b, keys))

    mn, md = t(nar_run)
    print(f"B32 +NAR + tokens[B,S,Q] readback: min {mn*1e3:.0f} ms med "
          f"{md*1e3:.0f} ms", flush=True)

    # ---- full (pcm16) -----------------------------------------------------
    def full(p, mp, i, m, r, k):
        prep, carry = prep_and_ar(p, i, m, r, k)
        lengths = jnp.minimum(carry.first_eos, carry.t)
        fmask = jnp.arange(s)[None, :] < lengths[:, None]
        toks = M.nar_refine(p, cfg, prep["cond_ar"], carry.tokens, mask=fmask)
        wav = mimi_decode(mp, eng.mimi_cfg, toks)
        pcm = jnp.round(jnp.clip(wav.astype(jnp.float32), -1, 1) * 32767.0
                        ).astype(jnp.int16)
        return jnp.concatenate([pcm, lengths[:, None].astype(jnp.int16)], axis=1)

    full_jit = jax.jit(full)

    def full_run():
        return np.asarray(full_jit(eng.params, eng.mimi_params, ids, mask,
                                   ref_b, keys))

    mn, md = t(full_run)
    audio_s = bsz * s * eng.mimi_cfg.hop_length / eng.mimi_cfg.sampling_rate
    print(f"B32 full pcm16 + wav readback: min {mn*1e3:.0f} ms med "
          f"{md*1e3:.0f} ms -> {audio_s/mn:.0f}x realtime (min)", flush=True)

    # ---- vocoder-output-only readback size check --------------------------
    out = full_run()
    print("packed shape:", out.shape, out.dtype,
          f"{out.nbytes/1e6:.1f} MB", flush=True)

    # ---- B=1 component costs with scalar fences ----------------------------
    # (a scalar readback is a reliable fence; subtract the fence cost below)
    fence_jit = jax.jit(lambda x, c: jnp.sum(x) + c)
    z = jax.device_put(jnp.zeros((8,), jnp.float32))
    i = [0]

    def fence_cost():
        i[0] += 1
        return np.asarray(fence_jit(z, float(i[0])))

    mn_f, _ = t(fence_cost, n=7)
    print(f"scalar fence cost: {mn_f*1e3:.1f} ms", flush=True)

    from sopro_tpu.codec import mimi_jax as MJ
    from sopro_tpu.codec.mimi_config import decoder_plan, upsample_spec

    mcfg = eng.mimi_cfg
    toks1 = jnp.asarray(
        rng.integers(0, cfg.codebook_size, (1, 401, cfg.num_codebooks))
    ).astype(jnp.int32)



    # NOTE: + float() makes each call unique to defeat any result caching
    dec_s2 = jax.jit(
        lambda mp, c, k: jnp.sum(MJ.mimi_decode(mp, mcfg, c).astype(jnp.float32)) + k)

    def dec_run():
        i[0] += 1
        return np.asarray(dec_s2(eng.mimi_params, toks1, float(i[0])))

    mn, md = t(dec_run, n=5)
    print(f"B1 mimi_decode(401) fenced: min {(mn)*1e3:.1f} ms "
          f"(-fence = {(mn-mn_f)*1e3:.1f} ms)", flush=True)

    fr = jax.jit(lambda mp, c, k: jnp.sum(MJ.mimi_transformer(
        mp["dec_tf"], mcfg,
        MJ.mimi_convt(mp["upsample"], MJ.rvq_decode(mp["quantizer"], c),
                      upsample_spec(mcfg)),
        jnp.arange(802)).astype(jnp.float32)) + k)

    def fr_run():
        i[0] += 1
        return np.asarray(fr(eng.mimi_params, toks1, float(i[0])))

    mn, md = t(fr_run, n=5)
    print(f"B1 mimi front fenced: min {mn*1e3:.1f} ms "
          f"(-fence = {(mn-mn_f)*1e3:.1f} ms)", flush=True)

    emb1 = jax.block_until_ready(jax.jit(lambda mp, c: MJ.mimi_transformer(
        mp["dec_tf"], mcfg,
        MJ.mimi_convt(mp["upsample"], MJ.rvq_decode(mp["quantizer"], c),
                      upsample_spec(mcfg)),
        jnp.arange(802)))(eng.mimi_params, toks1))
    se = jax.jit(lambda mp, e, k: jnp.sum(MJ.seanet_apply(
        mp["decoder"], decoder_plan(mcfg), e).astype(jnp.float32)) + k)

    def se_run():
        i[0] += 1
        return np.asarray(se(eng.mimi_params, emb1, float(i[0])))

    mn, md = t(se_run, n=5)
    print(f"B1 SEANet fenced: min {mn*1e3:.1f} ms "
          f"(-fence = {(mn-mn_f)*1e3:.1f} ms)", flush=True)

    cond1 = eng.prepare_conditioning(ids_rows[0], ref, max_frames=400,
                                     style_strength=1.0)["cond_ar"]
    rvq1 = jnp.asarray(rng.integers(0, cfg.codebook_size, (1, 401)), jnp.int32)
    nr = jax.jit(lambda p, c, r, k: jnp.sum(M.nar_refine(
        p, cfg, c, r, mask=jnp.ones((1, 401), bool)).astype(jnp.float32)) + k)

    def nr_run():
        i[0] += 1
        return np.asarray(nr(eng.params, cond1, rvq1, float(i[0])))

    mn, md = t(nr_run, n=5)
    print(f"B1 nar_refine(401) fenced: min {mn*1e3:.1f} ms "
          f"(-fence = {(mn-mn_f)*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
