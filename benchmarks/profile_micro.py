"""Micro-profile of tunnel dispatch + readback costs and NAR/vocoder
internals (run on the TPU tunnel)."""

from __future__ import annotations

import time

import numpy as np


def t(fn, n=7, warm=2):
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

    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    print("backend:", jax.devices()[0].platform, flush=True)

    # ---- dispatch + readback round trip ----------------------------------
    add = jax.jit(lambda x, s: x + s)
    x1 = jax.device_put(jnp.zeros((1,), jnp.float32))

    i = [0]

    def cycle_scalar():
        i[0] += 1
        return np.asarray(add(x1, float(i[0])))  # fresh result buffer each time

    mn, md = t(cycle_scalar, n=9)
    print(f"dispatch+readback scalar: min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)

    def dispatch_only():
        i[0] += 1
        return jax.block_until_ready(add(x1, float(i[0])))

    mn, md = t(dispatch_only, n=9)
    print(f"dispatch only (block_until_ready): min {mn*1e3:.1f} ms med "
          f"{md*1e3:.1f} ms", flush=True)

    for size in (1.5e6, 3e6):
        n = int(size // 4)
        big = jax.jit(lambda x, s: x + s)
        xb = jax.device_put(jnp.zeros((n,), jnp.float32))

        def cycle_big():
            i[0] += 1
            return np.asarray(big(xb, float(i[0])))

        mn, md = t(cycle_big, n=7)
        print(f"dispatch+readback {size/1e6:.1f} MB: min {mn*1e3:.1f} ms med "
              f"{md*1e3:.1f} ms", flush=True)

    # ---- while_loop step cost vs scan, isolated ---------------------------
    from sopro_tpu import RuntimeConfig, SoproTTS
    from sopro_tpu.models import generator as G
    import sopro_tpu.models.sopro as M

    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    cfg = tts.cfg

    rng = np.random.default_rng(0)
    ref_tokens = rng.integers(0, cfg.codebook_size,
                              size=(62, cfg.num_codebooks)).astype(np.int32)
    ref = eng.prepare_reference(ref_tokens)
    ids = tts.encode_text("profile " * 12)
    prep = eng.prepare_conditioning(ids, ref, max_frames=400,
                                    style_strength=1.0)
    jax.block_until_ready(prep["cond_ar"])

    # bare generator forward N times in a scan (no sampling): step cost floor
    kvs_fn = jax.jit(lambda p, txt, m: G.build_text_kv_caches(p["ar"], cfg, txt, m))
    kvs = jax.block_until_ready(
        kvs_fn(eng.params, prep["txt_seq"], prep["text_mask"]))

    def bare_scan(params, x0, conv0, kvs, n):
        def body(c, _):
            x, conv = c
            logits, conv = G.ar_step(params["ar"], cfg, x, conv, kvs)
            x = x + 1e-6 * logits[:, : cfg.d_model].astype(x.dtype)
            return (x, conv), ()

        (xf, _), _ = jax.lax.scan(body, (x0, conv0), None, length=n)
        return xf

    conv0 = G.init_ar_conv_state(cfg, 1, eng.dtype)
    x0 = jnp.zeros((1, cfg.d_model), eng.dtype)
    for n in (100, 400):
        f = jax.jit(lambda p, x, c, kv, n=n: bare_scan(p, x, c, kv, n))

        def run():
            return np.asarray(f(eng.params, x0, conv0, kvs))

        mn, md = t(run, n=5)
        print(f"bare generator scan x{n}: min {mn*1e3:.1f} ms med {md*1e3:.1f} "
              f"ms -> {mn/n*1e6:.0f} us/step (min)", flush=True)

    # full AR step (with sampling) in a scan of n steps
    settings = M.ARSettings(
        top_p=jnp.float32(0.9), temperature=jnp.float32(1.05),
        recovery_top_p=jnp.float32(0.85), recovery_temp=jnp.float32(1.2),
        min_gen_frames=jnp.int32(12), anti_loop=True,
    )

    for n in (100, 400):
        def full_scan(params, cond, kvs, key, n=n):
            carry = M.init_ar_carry(cfg, 1, 401, key, eng.dtype)
            carry = M.ar_generate_chunk(params, cfg, carry, cond, kvs,
                                        settings, n)
            return carry.tokens

        f = jax.jit(full_scan)

        def run():
            return np.asarray(
                f(eng.params, prep["cond_ar"], kvs, jax.random.PRNGKey(0)))

        mn, md = t(run, n=5)
        print(f"full AR scan x{n} (incl tokens readback): min {mn*1e3:.1f} ms "
              f"med {md*1e3:.1f} ms -> {mn/n*1e6:.0f} us/step", flush=True)

    # ---- NAR / vocoder internals ------------------------------------------
    from sopro_tpu.codec.mimi_jax import mimi_decode
    import sopro_tpu.models.nar as NN
    from sopro_tpu.ops.embeddings import cb_sum_embed_subset

    s_len = int(prep["cond_ar"].shape[1])  # 401
    tokens = jnp.asarray(
        rng.integers(0, cfg.codebook_size, (1, s_len)).astype(np.int32))
    cond = prep["cond_ar"]
    mask = jnp.ones((1, s_len), bool)

    nar_jit = jax.jit(lambda p, c, r, m: M.nar_refine(p, cfg, c, r, mask=m))

    def nar_run():
        return jax.block_until_ready(nar_jit(eng.params, cond, tokens, mask))

    mn, md = t(nar_run, n=5)
    print(f"nar_refine({s_len}) full: min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)

    # one stage only
    spec = M.cb_spec(cfg)
    def one_stage(p, c, r):
        prev = cb_sum_embed_subset(
            p["cb_embed"], spec, r[..., None], [0],
            cb_weights=p["nar_prev_cb_weights"])
        return NN.nar_forward_stage(p["nar"], cfg, "B", c, prev)

    st_jit = jax.jit(one_stage)

    def st_run():
        return jax.block_until_ready(st_jit(eng.params, cond, tokens))

    mn, md = t(st_run, n=5)
    print(f"nar single stage B ({s_len}): min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)

    # vocoder pieces
    toks_q = jnp.asarray(
        rng.integers(0, cfg.codebook_size, (1, s_len, cfg.num_codebooks))
    ).astype(jnp.int32)
    dec_jit = jax.jit(lambda mp, c: mimi_decode(mp, eng.mimi_cfg, c))

    def dec_run():
        return jax.block_until_ready(dec_jit(eng.mimi_params, toks_q))

    mn, md = t(dec_run, n=5)
    print(f"mimi_decode(s): min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)

    from sopro_tpu.codec import mimi_jax as MJ
    from sopro_tpu.codec.mimi_config import decoder_plan, upsample_spec

    mcfg = eng.mimi_cfg

    # dequant + upsample + transformer only (cut before SEANet)
    def front(mp, codes):
        emb = MJ.rvq_decode(mp["quantizer"], codes)
        emb = MJ.mimi_convt(mp["upsample"], emb, upsample_spec(mcfg))
        return MJ.mimi_transformer(
            mp["dec_tf"], mcfg, emb, jnp.arange(emb.shape[1])
        )

    fr_jit = jax.jit(front)

    def fr_run():
        return jax.block_until_ready(fr_jit(eng.mimi_params, toks_q))

    mn, md = t(fr_run, n=5)
    print(f"mimi front (dequant+up+transformer): min {mn*1e3:.1f} ms "
          f"med {md*1e3:.1f} ms", flush=True)

    emb_dev = jax.block_until_ready(fr_jit(eng.mimi_params, toks_q))

    se_jit = jax.jit(lambda mp, e: MJ.seanet_apply(
        mp["decoder"], decoder_plan(mcfg), e))

    def se_run():
        return jax.block_until_ready(se_jit(eng.mimi_params, emb_dev))

    mn, md = t(se_run, n=5)
    print(f"mimi SEANet decoder: min {mn*1e3:.1f} ms med {md*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
