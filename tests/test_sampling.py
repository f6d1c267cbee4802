"""On-device sampler parity with the reference's host sampler
(reference: src/sopro/sampling.py) on deterministic cases, plus AR decode
loop invariants (full while_loop vs chunked scan)."""

import jax
import jax.numpy as jnp
import numpy as np

from sopro_tpu import sampling as S
from sopro_tpu.config import SoproTTSConfig
from sopro_tpu.models import sopro as M

from tests import torch_ref as TR
from tests.test_model_parity import CFG


def _hist_buf(hist_list, batch=1):
    buf = S.init_history(batch)
    for tok in hist_list:
        buf = S.push_history(buf, jnp.asarray([tok] * batch))
    return buf


def test_repeated_tail_parity(rng):
    TR.import_ref()
    from sopro.sampling import repeated_tail as ref_rt

    for trial in range(200):
        n = int(rng.integers(0, 40))
        hist = [int(x) for x in rng.integers(0, 5, size=n)]
        buf = _hist_buf(hist)
        ours = bool(S.repeated_tail(buf, jnp.int32(n))[0])
        assert ours == ref_rt(hist, max_n=16), (trial, hist)


def test_sampler_deterministic_cases():
    """Cases where the reference sampler is deterministic (single survivor or
    degenerate fallback); ours must return the identical token."""
    TR.import_ref()
    import torch
    from sopro.sampling import sample_token as ref_sample

    V = 64
    key = jax.random.PRNGKey(0)

    cases = []
    # one dominant logit -> nucleus keeps only it
    x = np.full((1, 1, V), -10.0, np.float32)
    x[0, 0, 7] = 10.0
    cases.append((x, [], 0.5, 1.0))
    # NaNs scrubbed; one finite value wins
    x = np.full((1, 1, V), np.nan, np.float32)
    x[0, 0, 3] = 5.0
    cases.append((x, [], 0.9, 1.0))
    # repetition penalty drops a token below the nucleus: two close logits,
    # the bigger one in history gets penalized below the other
    x = np.full((1, 1, V), -10.0, np.float32)
    x[0, 0, 5] = 4.0
    x[0, 0, 9] = 3.9
    cases.append((x, [5], 0.3, 1.0))

    for x, hist, top_p, temp in cases:
        ref_tok = ref_sample(
            torch.from_numpy(x), history=list(hist), top_p=top_p,
            temperature=temp, top_k=50, repetition_penalty=1.1,
        )
        buf = _hist_buf(hist)
        tok = S.sample_token(
            key, jnp.asarray(x[:, 0]), buf, jnp.int32(len(hist)),
            S.SamplerSettings(
                top_p=jnp.float32(top_p), temperature=jnp.float32(temp)
            ),
        )
        assert int(tok[0]) == int(ref_tok), (ref_tok, tok, x[0, 0, :12])


def test_sampler_distribution_matches_reference(rng):
    """For random logits/history, our post-processed categorical distribution
    must equal the reference's final sampling distribution."""
    TR.import_ref()
    import torch
    import torch.nn.functional as F

    V = 40
    for trial in range(20):
        logits = rng.standard_normal((V,)).astype(np.float32) * 3
        hist = [int(t) for t in rng.integers(0, V, size=int(rng.integers(0, 60)))]
        top_p, temp, top_k, pen = 0.8, 1.05, 10, 1.1

        # reference pipeline, stopping right before torch.multinomial
        x = torch.from_numpy(logits.copy()).view(1, 1, -1)
        x = torch.nan_to_num(x, nan=-1e9, posinf=1e9, neginf=-1e9)
        x = x / temp
        ctx = hist[-50:]
        if len(ctx) > 0:
            ids = torch.tensor(sorted(set(ctx)), dtype=torch.long)
            vals = x[0, 0, ids]
            vals = torch.where(vals < 0, vals * pen, vals / pen)
            x[0, 0, ids] = vals
        probs = torch.softmax(x, dim=-1).view(1, -1)
        val, idx = torch.topk(probs, top_k, dim=-1)
        newp = torch.zeros_like(probs)
        newp.scatter_(1, idx, val)
        probs = newp / newp.sum(dim=-1, keepdim=True)
        sp, si = torch.sort(probs, descending=True, dim=-1)
        cum = torch.cumsum(sp, dim=-1)
        remove = cum > top_p
        remove[..., 1:] = remove[..., :-1].clone()
        remove[..., 0] = False
        sp = sp.masked_fill(remove, 0.0)
        sp = sp / sp.sum(dim=-1, keepdim=True)
        ref_dist = np.zeros(V, np.float32)
        ref_dist[TR.t2n(si[0])] = TR.t2n(sp[0])

        # ours: distribution over `idx` with renormalized kept vals
        buf = _hist_buf(hist)
        x2 = jnp.asarray(logits)[None] / temp
        t = jnp.int32(len(hist))
        n_valid = min(len(hist), 50)
        present = np.zeros(V, bool)
        for tok in hist[-50:][:n_valid] if n_valid else []:
            present[tok] = True
        xp = np.asarray(x2[0])
        xp = np.where(present, np.where(xp < 0, xp * pen, xp / pen), xp)
        p = jax.nn.softmax(jnp.asarray(xp))
        vals, ids2 = jax.lax.top_k(p, top_k)
        vals = vals / vals.sum()
        cum_prev = jnp.cumsum(vals) - vals
        vals = jnp.where(cum_prev > top_p, 0.0, vals)
        vals = vals / vals.sum()
        our_dist = np.zeros(V, np.float32)
        our_dist[np.asarray(ids2)] = np.asarray(vals)

        np.testing.assert_allclose(our_dist, ref_dist, rtol=1e-4, atol=1e-5)


def test_ar_generate_full_vs_chunked():
    """The chunked scan driver must produce the identical token stream as the
    full while_loop given the same RNG key."""
    cfg = SoproTTSConfig(**CFG)
    key = jax.random.PRNGKey(11)
    params = M.init_sopro_model(key, cfg, text_vocab_size=50)

    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 9), 0, 50)
    mask = jnp.ones((1, 9), bool)
    ref_toks = jax.random.randint(jax.random.PRNGKey(2), (1, 15, 8), 0, 32)
    pref = M.prepare_reference(params, cfg, ref_toks)
    prep = M.prepare_conditioning(
        params, cfg, ids, mask, pref, max_frames=cfg.max_frames, style_strength=1.0
    )
    settings = M.default_ar_settings(min_gen_frames=cfg.min_gen_frames)
    max_steps = cfg.max_frames + 1
    dkey = jax.random.PRNGKey(99)

    full = M.ar_generate(
        params, cfg, prep["cond_ar"], prep["txt_seq"], mask, dkey, settings, max_steps
    )

    from sopro_tpu.models import generator as G

    kvs = G.build_text_kv_caches(params["ar"], cfg, prep["txt_seq"], mask)
    carry = M.init_ar_carry(cfg, 1, max_steps, dkey)
    for _ in range(0, max_steps, 4):
        carry = M.ar_generate_chunk(
            params, cfg, carry, prep["cond_ar"], kvs, settings, 4
        )

    t_full = int(full.t[0])
    np.testing.assert_array_equal(
        np.asarray(full.tokens[:, :t_full]), np.asarray(carry.tokens[:, :t_full])
    )
    assert int(full.first_eos[0]) == int(carry.first_eos[0])
    # tokens within range, EOS bookkeeping consistent
    toks = np.asarray(full.tokens[0, :t_full])
    assert toks.min() >= 0 and toks.max() <= cfg.eos_id
