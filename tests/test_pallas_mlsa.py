"""Fused (VMEM-resident) Taylor-cascade kernel vs the folded-plan XLA
formulation (kernels/pallas_mlsa.py; interpreter mode — the real-TPU
path is covered by the bench A/B)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsptk_tpu.kernels import mxu_fft
from diffsptk_tpu.kernels.mlsa_cascade import taylor_cascade_folded
from diffsptk_tpu.kernels.pallas_mlsa import (
    _cascade_pallas,
    _pad128,
    taylor_cascade,
)

RNG = np.random.default_rng(21)


def _case(B, N, P, M, S):
    T = N * P
    x = RNG.standard_normal((B, T)).astype(np.float32)
    base = RNG.standard_normal((B, 1, M + 1)) * (0.8 ** np.arange(M + 1))
    wob = 1 + 0.05 * RNG.standard_normal((B, N, M + 1))
    c = (base * wob).astype(np.float32) * 0.3
    weights = (1.0 / np.cumprod([1.0] + list(range(1, S + 1)))) \
        .astype(np.float32)
    a = np.ones(S + 1, np.float32)
    return jnp.asarray(x), jnp.asarray(c), jnp.asarray(weights), \
        jnp.asarray(a)


@pytest.mark.parametrize("B,N,P,M,S,advance",
                         [(2, 6, 16, 39, 4, 0),
                          (1, 5, 16, 30, 3, 5),
                          (3, 4, 32, 63, 6, 0)])
def test_fused_matches_folded(B, N, P, M, S, advance):
    nfft = 1 << int(np.ceil(np.log2(2 * P + M + 1)))
    x, c, weights, a = _case(B, N, P, M, S)
    K = nfft // 2 + 1
    Kp = _pad128(K)
    cspec = np.fft.rfft(np.asarray(c), n=nfft)
    pad = [(0, 0), (0, 0), (0, Kp - K)]
    cre = jnp.asarray(np.pad(cspec.real.astype(np.float32), pad))
    cim = jnp.asarray(np.pad(cspec.imag.astype(np.float32), pad))
    got = np.asarray(_cascade_pallas(
        x.reshape(B, N, P), cre, cim, weights, a, P, M, advance, nfft,
        interpret=True)).reshape(B, N * P)
    want = np.asarray(taylor_cascade_folded(x, c, weights, a, P, advance,
                                            nfft))
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=2e-4 * float(np.abs(want).max()))


@pytest.mark.parametrize("B,N,P,M,S,advance,precision",
                         [(4, 6, 16, 39, 4, 0, "HIGHEST"),
                          (2, 5, 16, 30, 3, 5, "HIGHEST"),
                          (3, 4, 32, 95, 4, 0, "HIGHEST"),
                          (4, 6, 16, 39, 4, 0, "HIGH")])
def test_chunked_fused_matches_folded(B, N, P, M, S, advance, precision):
    """Tap-chunked grouped kernel (the flagship-geometry path) vs the
    folded XLA formulation, interpreter mode."""
    from diffsptk_tpu.kernels.mlsa_cascade import lane_aligned_nfft
    from diffsptk_tpu.kernels.pallas_mlsa import _cascade_pallas_chunked

    nfft = lane_aligned_nfft(3 * P)
    x, c, weights, a = _case(B, N, P, M, S)
    got = np.asarray(_cascade_pallas_chunked(
        x.reshape(B, N, P), c, weights, a, P, advance, nfft,
        interpret=True, precision=precision)).reshape(B, N * P)
    want = np.asarray(taylor_cascade_folded(x, c, weights, a, P, advance,
                                            nfft))
    tol = 2e-4 if precision == "HIGH" else 1e-5
    np.testing.assert_allclose(got, want, rtol=tol,
                               atol=tol * float(np.abs(want).max()))


def test_taylor_cascade_entry_and_grad():
    """The public entry falls back to the folded XLA path off-TPU and
    carries gradients."""
    B, N, P, M, S, advance = 2, 5, 16, 30, 3, 0
    nfft = 128
    x, c, weights, a = _case(B, N, P, M, S)
    y = taylor_cascade(x, c, weights, a, P, advance, nfft)
    want = taylor_cascade_folded(x, c, weights, a, P, advance, nfft)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    g = jax.grad(lambda e: jnp.sum(
        taylor_cascade(e, c, weights, a, P, advance, nfft) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g))) and float(
        jnp.max(jnp.abs(g))) > 0


def test_mlsa_fused_wiring():
    """MLSA(cascade="fused") goes through taylor_cascade and matches the
    stages path (off-TPU it reduces to the folded XLA formulation)."""
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

    y0 = mk("stages")(x, mc)
    y1 = mk("fused")(x, mc)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-5,
                               atol=1e-5 * float(jnp.max(jnp.abs(y0))))
