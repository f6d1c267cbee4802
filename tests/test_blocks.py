"""Numerical parity of primitive blocks vs the torch reference
(reference: src/sopro/nn/blocks.py), plus step-vs-full streaming parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sopro_tpu.ops import blocks as B

from tests import torch_ref as TR


def _torch():
    import torch

    torch.manual_seed(0)
    return torch


@pytest.mark.parametrize("causal,dilation", [(False, 1), (True, 1), (True, 4), (False, 2)])
def test_dwconv_parity(causal, dilation, rng):
    torch = _torch()
    sopro = TR.import_ref()
    from sopro.nn.blocks import DepthwiseConv1d

    d, k, T, Bsz = 16, 7, 33, 2
    m = DepthwiseConv1d(d, kernel_size=k, causal=causal, dilation=dilation).eval()
    x = rng.standard_normal((Bsz, T, d)).astype(np.float32)
    with torch.no_grad():
        y_ref = TR.t2n(m(torch.from_numpy(x)))

    p = TR.conv_dwconv(m)
    y = B.dwconv1d(p, jnp.asarray(x), kernel_size=k, dilation=dilation, causal=causal)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-5)


def test_dwconv_step_matches_full(rng):
    """Streaming single-step conv equals the full-sequence causal conv."""
    d, k, dil, T = 8, 13, 4, 60
    key = jax.random.PRNGKey(1)
    p = B.init_dwconv1d(key, d, k)
    x = jnp.asarray(rng.standard_normal((1, T, d)).astype(np.float32))
    y_full = B.dwconv1d(p, x, kernel_size=k, dilation=dil, causal=True)

    buf = B.init_dwconv_state(1, d, k, dil)
    ys = []
    for t in range(T):
        y, buf = B.dwconv1d_step(p, x[:, t], buf, kernel_size=k, dilation=dil)
        ys.append(y)
    y_step = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(
        np.asarray(y_step), np.asarray(y_full), rtol=1e-5, atol=1e-5
    )


def test_rmsnorm_glu_parity(rng):
    torch = _torch()
    TR.import_ref()
    from sopro.nn.blocks import GLU, RMSNorm

    d = 24
    x = rng.standard_normal((3, 7, d)).astype(np.float32)
    mn = RMSNorm(d).eval()
    with torch.no_grad():
        mn.weight.mul_(1.3)
        y_ref = TR.t2n(mn(torch.from_numpy(x)))
    y = B.rmsnorm(TR.conv_rmsnorm(mn), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-6)

    mg = GLU(d).eval()
    with torch.no_grad():
        y_ref = TR.t2n(mg(torch.from_numpy(x)))
    y = B.glu(TR.conv_glu(mg), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_ssmlite_parity(causal, rng):
    torch = _torch()
    TR.import_ref()
    from sopro.nn.blocks import SSMLiteBlock

    d, k, dil = 16, 11 if not causal else 13, 2
    m = SSMLiteBlock(d, dropout=0.0, causal=causal, kernel_size=k, dilation=dil).eval()
    x = rng.standard_normal((2, 21, d)).astype(np.float32)
    with torch.no_grad():
        y_ref = TR.t2n(m(torch.from_numpy(x)))
    y = B.ssmlite(
        TR.conv_ssmlite(m), jnp.asarray(x), kernel_size=k, dilation=dil, causal=causal
    )
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)


def test_ssmlite_step_vs_reference_step(rng):
    """Our scan-carry step matches the reference's ring-buffer forward_step."""
    torch = _torch()
    TR.import_ref()
    from sopro.nn.blocks import SSMLiteBlock

    d, k, dil, T = 12, 13, 4, 30
    m = SSMLiteBlock(d, dropout=0.0, causal=True, kernel_size=k, dilation=dil).eval()
    p = TR.conv_ssmlite(m)
    x = rng.standard_normal((1, T, d)).astype(np.float32)

    state = m.init_state(1, torch.device("cpu"), torch.float32)
    buf = B.init_ssmlite_state(1, d, k, dil)
    with torch.no_grad():
        for t in range(T):
            y_ref, state = m.forward_step(torch.from_numpy(x[:, t : t + 1]), state)
            y, buf = B.ssmlite_step(p, jnp.asarray(x[:, t]), buf, kernel_size=k, dilation=dil)
            np.testing.assert_allclose(
                np.asarray(y), TR.t2n(y_ref)[:, 0], rtol=1e-4, atol=1e-5
            )


def test_attn_pool_parity(rng):
    torch = _torch()
    TR.import_ref()
    from sopro.nn.blocks import AttentiveStatsPool

    d = 16
    m = AttentiveStatsPool(d).eval()
    x = rng.standard_normal((2, 19, d)).astype(np.float32)
    lengths = np.array([19, 11])
    with torch.no_grad():
        y_ref = TR.t2n(m(torch.from_numpy(x), lengths=torch.from_numpy(lengths)))
    mask = jnp.arange(19)[None, :] < jnp.asarray(lengths)[:, None]
    y = B.attentive_stats_pool(TR.conv_attnpool(m), jnp.asarray(x), mask=mask)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-5)


def test_padded_ssmlite_equals_exact_length(rng):
    """Masked padded runs must equal exact-length runs (bucketing invariant)."""
    d, k, T, Tp = 16, 7, 21, 32
    key = jax.random.PRNGKey(3)
    p = B.init_ssmlite(key, d, kernel_size=k)
    x = jnp.asarray(rng.standard_normal((2, T, d)).astype(np.float32))
    xp = jnp.pad(x, ((0, 0), (0, Tp - T), (0, 0)))
    mask = jnp.arange(Tp)[None, :] < T

    y = B.ssmlite(p, x, kernel_size=k, dilation=1, causal=False)
    yp = B.ssmlite(p, xp, kernel_size=k, dilation=1, causal=False, mask=mask)
    np.testing.assert_allclose(
        np.asarray(yp[:, :T]), np.asarray(y), rtol=1e-5, atol=1e-6
    )
