"""Folded-plan Taylor cascade (kernels/mlsa_cascade.py) vs the
stage-by-stage zerodf_fft loop — same math, framing/transform/blend
folded into static matmul plans."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsptk_tpu.kernels import mxu_fft
from diffsptk_tpu.kernels.mlsa_cascade import taylor_cascade_folded
from diffsptk_tpu.ops.zerodf import zerodf_fft

RNG = np.random.default_rng(7)


def _stages_reference(x, c, weights, a, P, advance, nfft):
    c_spec = mxu_fft.rfft(c, nfft)
    y = x * a[0]
    for i in range(1, a.shape[0]):
        x = zerodf_fft(x, c, P, advance=advance, b_spec=c_spec,
                       nfft=nfft) * weights[i]
        y = y + x * a[i]
    return y


@pytest.mark.parametrize("B,N,P,M,S,advance",
                         [(2, 6, 16, 39, 4, 0),
                          (1, 5, 16, 30, 3, 5),
                          (3, 4, 32, 63, 6, 0),
                          (1, 30, 80, 199, 5, 0),
                          (1, 30, 80, 199, 5, 100)])
def test_folded_matches_stages(B, N, P, M, S, advance):
    nfft = 1 << int(np.ceil(np.log2(2 * P + M + 1)))
    T = N * P
    x = jnp.asarray(RNG.standard_normal((B, T)).astype(np.float32))
    c = jnp.asarray(
        (RNG.standard_normal((B, N, M + 1))
         * (0.8 ** np.arange(M + 1)) * 0.3).astype(np.float32))
    weights = jnp.asarray(
        (1.0 / np.cumprod([1.0] + list(range(1, S + 1)))).astype(np.float32))
    a = jnp.asarray(np.ones(S + 1, np.float32))
    want = np.asarray(_stages_reference(x, c, weights, a, P, advance, nfft))
    got = np.asarray(taylor_cascade_folded(x, c, weights, a, P, advance,
                                           nfft))
    np.testing.assert_allclose(got, want, rtol=1e-5,
                               atol=1e-5 * float(np.abs(want).max()))


def test_lane_aligned_nfft_matches_pow2():
    """The folded cascade computes a linear convolution, so any
    transform length >= 2P+M+1 gives the same output; the lane-aligned
    length (K = 128k, e.g. 510 for the flagship geometry) must match
    the power-of-two plan."""
    from diffsptk_tpu.kernels.mlsa_cascade import lane_aligned_nfft

    assert lane_aligned_nfft(360) == 510      # flagship: K = 256
    assert lane_aligned_nfft(185) == 254      # K = 128
    assert lane_aligned_nfft(510) == 510
    assert lane_aligned_nfft(511) == 766

    B, N, P, M, S, advance = 2, 8, 80, 199, 4, 0
    T = N * P
    x = jnp.asarray(RNG.standard_normal((B, T)).astype(np.float32))
    c = jnp.asarray(
        (RNG.standard_normal((B, N, M + 1))
         * (0.8 ** np.arange(M + 1)) * 0.3).astype(np.float32))
    weights = jnp.asarray(
        (1.0 / np.cumprod([1.0] + list(range(1, S + 1)))).astype(np.float32))
    a = jnp.asarray(np.ones(S + 1, np.float32))
    want = np.asarray(_stages_reference(x, c, weights, a, P, advance, 512))
    got = np.asarray(taylor_cascade_folded(x, c, weights, a, P, advance,
                                           lane_aligned_nfft(2 * P + M + 1)))
    np.testing.assert_allclose(got, want, rtol=1e-5,
                               atol=1e-5 * float(np.abs(want).max()))


def test_folded_float64_exact():
    """float64 run keeps float64 plan constants."""
    B, N, P, M, S, advance = 1, 5, 16, 30, 3, 0
    nfft = 128
    T = N * P
    x = jnp.asarray(RNG.standard_normal((B, T)))
    c = jnp.asarray(RNG.standard_normal((B, N, M + 1)) * 0.1)
    weights = jnp.asarray(1.0 / np.arange(1.0, S + 2.0))
    a = jnp.asarray(np.ones(S + 1))
    assert x.dtype == jnp.float64
    want = np.asarray(_stages_reference(x, c, weights, a, P, advance, nfft))
    got = np.asarray(taylor_cascade_folded(x, c, weights, a, P, advance,
                                           nfft))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_folded_chunked_grad():
    """Gradients flow through the tap-chunked path (M+1 > P engages it
    on the lane-aligned transform) and match the stage-by-stage
    reference's gradients."""
    B, N, P, M, S, advance = 2, 6, 16, 39, 3, 0
    from diffsptk_tpu.kernels.mlsa_cascade import lane_aligned_nfft
    nfft = 512    # > lane_aligned_nfft(3P) = 254, so chunking engages
    assert lane_aligned_nfft(3 * P) < nfft
    T = N * P
    x = jnp.asarray(RNG.standard_normal((B, T)).astype(np.float32))
    c = jnp.asarray(
        (RNG.standard_normal((B, N, M + 1))
         * (0.8 ** np.arange(M + 1)) * 0.3).astype(np.float32))
    weights = jnp.asarray(
        (1.0 / np.cumprod([1.0] + list(range(1, S + 1)))).astype(np.float32))
    a = jnp.asarray(np.ones(S + 1, np.float32))

    def loss(fn):
        return lambda xx, cc: jnp.sum(fn(xx, cc) ** 2)

    gx, gc = jax.grad(loss(lambda xx, cc: taylor_cascade_folded(
        xx, cc, weights, a, P, advance, nfft)), argnums=(0, 1))(x, c)
    gx_ref, gc_ref = jax.grad(loss(lambda xx, cc: _stages_reference(
        xx, cc, weights, a, P, advance, nfft)), argnums=(0, 1))(x, c)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4,
                               atol=1e-4 * float(jnp.max(jnp.abs(gx_ref))))
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gc_ref),
                               rtol=1e-4,
                               atol=1e-4 * float(jnp.max(jnp.abs(gc_ref))))


def test_mlsa_folded_default_and_grad():
    """MLSA defaults to the folded cascade on the long-filter path and
    carries gradients through it."""
    from diffsptk_tpu.ops.mglsadf import PseudoMGLSADigitalFilter

    B, T, P, Mc = 2, 320, 16, 7
    N = T // P
    x = jnp.asarray(RNG.standard_normal((B, T)).astype(np.float32))
    mc = jnp.asarray(
        (RNG.standard_normal((B, N, Mc + 1)) * 0.2).astype(np.float32))

    def mk(cascade):
        return PseudoMGLSADigitalFilter(
            Mc, P, alpha=0.42, mode="multi-stage", taylor_order=4,
            cep_order=59, cascade=cascade)

    assert mk("folded").mglsadf.cascade == "folded"
    y0 = mk("stages")(x, mc)
    y1 = mk("folded")(x, mc)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5,
                               atol=1e-5 * float(jnp.max(jnp.abs(y0))))
    g = jax.grad(lambda e: jnp.sum(mk("folded")(e, mc) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g))) and float(
        jnp.max(jnp.abs(g))) > 0
