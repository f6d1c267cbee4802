"""Micro-probe inside the batch-32 Mimi-decode XLA stages: rvq gather,
upsample convt, per-layer attention vs MLP of the dec transformer.
Rep-trick timing; run on the live TPU."""

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
    from sopro_tpu.codec.mimi_jax import (
        mimi_convt, rvq_decode, sliding_causal_bias, rope_cos_sin,
        transformer_layer, upsample_spec, _layernorm, _split_heads,
        _merge_heads, apply_rope,
    )
    from sopro_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    rt = RuntimeConfig(compute_dtype="bfloat16")
    tts = SoproTTS.from_random(seed=0, runtime=rt)
    eng = tts.engine
    mcfg = eng.mimi_cfg
    rng = np.random.default_rng(0)

    B, T = 32, 151
    T2 = 2 * T
    codes = jnp.asarray(
        rng.integers(0, tts.cfg.codebook_size, (B, T, tts.cfg.num_codebooks)),
        jnp.int32,
    )
    emb = jnp.asarray(rng.standard_normal((B, T, mcfg.hidden_size)), eng.dtype)
    emb2 = jnp.asarray(
        rng.standard_normal((B, T2, mcfg.hidden_size)), eng.dtype
    )
    pos = jnp.arange(T2)
    mp = eng.mimi_params

    def rep(body, reps):
        @jax.jit
        def run(mp, x0):
            return lax.fori_loop(0, reps, lambda i, x: body(mp, x, i), x0)

        return run

    def timed(fn, *args, n=5, warm=2):
        for _ in range(warm):
            jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    import math

    cos, sin = rope_cos_sin(pos, mcfg.head_dim, mcfg.rope_theta)
    bias = sliding_causal_bias(pos, pos, mcfg.sliding_window)

    def rvq_body(mp, x, i):
        e = rvq_decode(mp["quantizer"], (codes + i) % 2048)
        return x + 1e-6 * jnp.mean(e)

    def up_body(mp, x, i):
        e = mimi_convt(mp["upsample"], x + 0.0 * i, upsample_spec(mcfg))
        return x + 1e-6 * jnp.mean(e) * jnp.ones_like(x)

    def layer_body(mp, x, i):
        y = transformer_layer(
            mp["dec_tf"]["layers"][0], mcfg, x + 0.0 * i, cos, sin, bias
        )
        return x + 1e-6 * y

    def attn_only(mp, x, i):
        lp = mp["dec_tf"]["layers"][0]
        h = _layernorm(lp["ln1"], x + 0.0 * i, mcfg.norm_eps)
        q = _split_heads(h @ lp["q"]["w"], mcfg.num_attention_heads)
        q = apply_rope(q, cos, sin)
        k = _split_heads(h @ lp["k"]["w"], mcfg.num_key_value_heads)
        v = _split_heads(h @ lp["v"]["w"], mcfg.num_key_value_heads)
        k = apply_rope(k, cos, sin)
        scale = 1.0 / math.sqrt(mcfg.head_dim)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        logits = logits + bias[None, None]
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhqk,bhkd->bhqd", w, v.astype(x.dtype))
        a = _merge_heads(a) @ lp["o"]["w"]
        return x + 1e-6 * a

    def mlp_only(mp, x, i):
        lp = mp["dec_tf"]["layers"][0]
        h = _layernorm(lp["ln2"], x + 0.0 * i, mcfg.norm_eps)
        h = jax.nn.gelu(h @ lp["fc1"]["w"], approximate=False) @ lp["fc2"]["w"]
        return x + 1e-6 * h

    for name, body, x0 in (
        ("rvq_decode", rvq_body, jnp.zeros((), eng.dtype)),
        ("upsample_convt", up_body, emb),
        ("tf_layer(x1)", layer_body, emb2),
        ("tf_attn_only(x1)", attn_only, emb2),
        ("tf_mlp_only(x1)", mlp_only, emb2),
    ):
        r1, r5 = rep(body, 1), rep(body, 9)
        t1 = timed(r1, mp, x0)
        t5 = timed(r5, mp, x0)
        per = (t5 - t1) / 8.0
        print(f"{name:18s} on-chip {per * 1e3:7.3f} ms "
              f"(n1 {t1 * 1e3:6.1f}, n9 {t5 * 1e3:6.1f})", flush=True)


if __name__ == "__main__":
    main()
