"""Numerical parity of model components vs the torch reference
(reference: src/sopro/model.py, nn/text.py, nn/speaker.py, nn/ref.py,
nn/generator.py, nn/nar.py) on a small random-weight configuration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopro_tpu.config import SoproTTSConfig
from sopro_tpu.models import generator as G
from sopro_tpu.models import nar as N
from sopro_tpu.models import sopro as M
from sopro_tpu.models import speaker as SPK
from sopro_tpu.models import text as TXT

from tests import torch_ref as TR

CFG = dict(
    num_codebooks=8,
    codebook_size=32,
    max_frames=20,
    d_model=64,
    n_layers_text=1,
    dropout=0.0,
    pos_emb_max=64,
    max_text_len=32,
    n_layers_ar=2,
    ar_kernel=5,
    ar_dilation_cycle=(1, 2),
    ar_text_attn_freq=2,
    min_gen_frames=3,
    n_layers_nar=2,
    nar_head_dim=32,
    nar_kernel_size=5,
    nar_dilation_cycle=(1, 2),
    stage_B=(2, 3),
    stage_C=(4, 5),
    stage_D=(6, 7),
    stage_E=(8, 8),
    sv_student_dim=16,
    ref_enc_layers=1,
    ref_xattn_heads=2,
    ref_xattn_layers=2,
)


class _FakeTok:
    vocab_size = 50


@pytest.fixture(scope="module")
def ref_model():
    TR.import_ref()
    import torch
    from sopro.config import SoproTTSConfig as RefCfg
    from sopro.model import SoproTTSModel

    torch.manual_seed(7)
    rcfg = RefCfg(**CFG)
    m = SoproTTSModel(rcfg, _FakeTok()).eval()
    return m


@pytest.fixture(scope="module")
def jcfg():
    return SoproTTSConfig(**CFG)


@pytest.fixture(scope="module")
def jparams(ref_model):
    return TR.conv_sopro_model(ref_model)


def test_text_encoder_parity(ref_model, jcfg, jparams, rng):
    import torch

    L = 13
    ids = rng.integers(0, 50, size=(1, L))
    mask = np.ones((1, L), bool)
    with torch.no_grad():
        seq_ref, pool_ref = ref_model.text_enc(
            torch.from_numpy(ids), torch.from_numpy(mask)
        )
    seq, pool = TXT.text_encoder(
        jparams["text_enc"], jcfg, jnp.asarray(ids), jnp.asarray(mask)
    )
    np.testing.assert_allclose(np.asarray(seq), TR.t2n(seq_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pool), TR.t2n(pool_ref), rtol=1e-4, atol=1e-5)

    # padded-bucket invariance: padding + mask must not change valid outputs
    Lp = 32
    ids_p = np.zeros((1, Lp), np.int64)
    ids_p[:, :L] = ids
    mask_p = np.zeros((1, Lp), bool)
    mask_p[:, :L] = True
    seq_p, pool_p = TXT.text_encoder(
        jparams["text_enc"], jcfg, jnp.asarray(ids_p), jnp.asarray(mask_p)
    )
    np.testing.assert_allclose(
        np.asarray(seq_p[:, :L]), np.asarray(seq), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(pool_p), np.asarray(pool), rtol=1e-4, atol=1e-5)


def test_token2sv_parity(ref_model, jcfg, jparams, rng):
    import torch

    T = 17
    toks = rng.integers(0, 32, size=(1, T, 8))
    with torch.no_grad():
        sv_ref = ref_model.token2sv(
            torch.from_numpy(toks), lengths=torch.tensor([T])
        )
    sv = SPK.token2sv(jparams["token2sv"], jnp.asarray(toks), jcfg.codebook_size)
    np.testing.assert_allclose(np.asarray(sv), TR.t2n(sv_ref), rtol=1e-4, atol=1e-5)

    # padded-bucket invariance
    Tp = 32
    toks_p = np.zeros((1, Tp, 8), np.int64)
    toks_p[:, :T] = toks
    mask = np.zeros((1, Tp), bool)
    mask[:, :T] = True
    sv_p = SPK.token2sv(
        jparams["token2sv"], jnp.asarray(toks_p), jcfg.codebook_size,
        mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(np.asarray(sv_p), np.asarray(sv), rtol=1e-4, atol=1e-5)


def test_prepare_reference_parity(ref_model, jcfg, jparams, rng):
    import torch

    T = 15
    toks = rng.integers(0, 32, size=(T, 8))
    with torch.no_grad():
        pr = ref_model.prepare_reference(
            torch.from_numpy(toks), device=torch.device("cpu")
        )
    ours = M.prepare_reference(jparams, jcfg, jnp.asarray(toks)[None])
    np.testing.assert_allclose(
        np.asarray(ours.sv_ref), TR.t2n(pr.sv_ref), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours.ref_seq), TR.t2n(pr.ref_seq), rtol=1e-4, atol=1e-5
    )


def test_prepare_conditioning_parity(ref_model, jcfg, jparams, rng):
    import torch

    T, L = 15, 9
    toks = rng.integers(0, 32, size=(T, 8))
    ids = rng.integers(0, 50, size=(L,))
    with torch.no_grad():
        pr = ref_model.prepare_reference(
            torch.from_numpy(toks), device=torch.device("cpu")
        )
        prep = ref_model.prepare_conditioning(
            torch.from_numpy(ids), pr,
            max_frames=jcfg.max_frames, device=torch.device("cpu"),
            style_strength=1.2,
        )
    ours_ref = M.prepare_reference(jparams, jcfg, jnp.asarray(toks)[None])
    prep_j = M.prepare_conditioning(
        jparams, jcfg, jnp.asarray(ids)[None],
        jnp.ones((1, L), bool), ours_ref,
        max_frames=jcfg.max_frames, style_strength=1.2,
    )
    np.testing.assert_allclose(
        np.asarray(prep_j["cond_ar"]), TR.t2n(prep["cond_ar"]), rtol=1e-4, atol=1e-5
    )


def test_ar_step_sequence_parity(ref_model, jcfg, jparams, rng):
    """Drive both AR steppers with the same forced token sequence and compare
    per-step logits (removes sampling stochasticity)."""
    import torch

    T, L = 12, 9
    toks = rng.integers(0, 32, size=(15, 8))
    ids = rng.integers(0, 50, size=(L,))
    forced = rng.integers(0, 32, size=(T,))

    with torch.no_grad():
        pr = ref_model.prepare_reference(
            torch.from_numpy(toks), device=torch.device("cpu")
        )
        prep = ref_model.prepare_conditioning(
            torch.from_numpy(ids), pr,
            max_frames=jcfg.max_frames, device=torch.device("cpu"),
            style_strength=1.0,
        )
        state = ref_model.ar.init_stream_state(
            1, torch.device("cpu"), torch.float32,
            text_emb=prep["txt_seq"], text_mask=prep["text_mask"],
        )
        ref_logits = []
        for t in range(T):
            if t == 0:
                prev = ref_model.cb_embed.emb(
                    torch.full((1, 1), ref_model.cb_embed.bos_id, dtype=torch.long)
                )
            else:
                prev = ref_model.cb_embed.embed_tokens(
                    torch.tensor([[forced[t - 1]]]), cb_index=0
                )
            x_t = prep["cond_ar"][:, t : t + 1] + prev
            lg, state = ref_model.ar.step(
                x_t, state, text_emb=prep["txt_seq"], text_mask=prep["text_mask"]
            )
            ref_logits.append(TR.t2n(lg)[:, 0])

    ours_ref = M.prepare_reference(jparams, jcfg, jnp.asarray(toks)[None])
    prep_j = M.prepare_conditioning(
        jparams, jcfg, jnp.asarray(ids)[None], jnp.ones((1, L), bool), ours_ref,
        max_frames=jcfg.max_frames, style_strength=1.0,
    )
    kvs = G.build_text_kv_caches(
        jparams["ar"], jcfg, prep_j["txt_seq"], jnp.ones((1, L), bool)
    )
    spec = M.cb_spec(jcfg)
    conv_state = G.init_ar_conv_state(jcfg, 1)
    for t in range(T):
        row = spec.bos_id if t == 0 else int(forced[t - 1])
        prev = jparams["cb_embed"]["emb"][row][None]
        x_t = prep_j["cond_ar"][:, t] + prev
        lg, conv_state = G.ar_step(jparams["ar"], jcfg, x_t, conv_state, kvs)
        np.testing.assert_allclose(
            np.asarray(lg), ref_logits[t], rtol=1e-3, atol=1e-4
        )


def test_nar_refine_parity(ref_model, jcfg, jparams, rng):
    import torch

    T = 14
    cond = rng.standard_normal((1, T, jcfg.d_model)).astype(np.float32)
    rvq1 = rng.integers(0, 32, size=(1, T))
    with torch.no_grad():
        out_ref = ref_model.nar_refine(
            torch.from_numpy(cond), torch.from_numpy(rvq1)
        )
    out = M.nar_refine(jparams, jcfg, jnp.asarray(cond), jnp.asarray(rvq1))
    np.testing.assert_array_equal(np.asarray(out), TR.t2n(out_ref))

    # padded-bucket invariance
    Tp = 24
    cond_p = np.zeros((1, Tp, jcfg.d_model), np.float32)
    cond_p[:, :T] = cond
    rvq1_p = np.zeros((1, Tp), np.int64)
    rvq1_p[:, :T] = rvq1
    mask = np.zeros((1, Tp), bool)
    mask[:, :T] = True
    out_p = M.nar_refine(
        jparams, jcfg, jnp.asarray(cond_p), jnp.asarray(rvq1_p), mask=jnp.asarray(mask)
    )
    np.testing.assert_array_equal(np.asarray(out_p[:, :T]), np.asarray(out))


def test_nar_refine_head_tail(jcfg, jparams, rng):
    """head_tail=k evaluates the final stage's heads only on the last k
    frames (the slice the streaming/serving tick emits). Those frames'
    tokens must equal the full computation's — the trunk still sees the
    whole window, only the head einsum is sliced."""
    T, k = 14, 4
    cond = jnp.asarray(
        rng.standard_normal((2, T, jcfg.d_model)).astype(np.float32)
    )
    rvq1 = jnp.asarray(rng.integers(0, 32, size=(2, T)))
    full = np.asarray(M.nar_refine(jparams, jcfg, cond, rvq1))
    tail = np.asarray(
        M.nar_refine(jparams, jcfg, cond, rvq1, head_tail=k)
    )
    np.testing.assert_array_equal(tail[:, -k:], full[:, -k:])
    # pre-final-stage codebooks are still refined over the whole window
    final = jcfg.stage_indices()[jcfg.stage_order()[-1]]
    pre = [i for i in range(jcfg.num_codebooks) if i not in final]
    np.testing.assert_array_equal(tail[:, :, pre], full[:, :, pre])
