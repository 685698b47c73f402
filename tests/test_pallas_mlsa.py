"""Fused Taylor-cascade kernel vs the stage-by-stage XLA formulation
(kernels/pallas_mlsa.py; interpreter mode — the real-TPU path is covered
by the smoke matrix/bench)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from diffsptk_tpu.kernels.pallas_mlsa import (
    _cascade_pallas,
    _cascade_xla,
    _dft_plan,
)

RNG = np.random.default_rng(21)


def _case(B, N, P, M, S, advance, nfft):
    T = N * P
    x = RNG.standard_normal((B, T)).astype(np.float32)
    # decaying cepstrum-like coefficients, slowly varying over frames
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
def test_fused_matches_xla(B, N, P, M, S, advance):
    nfft = 1 << int(np.ceil(np.log2(2 * P + M + 1)))
    x, c, weights, a = _case(B, N, P, M, S, advance, nfft)
    cspec = jnp.fft.rfft(c, n=nfft).astype(jnp.complex64)
    got = np.asarray(_cascade_pallas(x, cspec, weights, a, P, M, advance,
                                     nfft, interpret=True))
    want = np.asarray(_cascade_xla(x, c, weights, a, P, advance, nfft))
    np.testing.assert_allclose(got, want, rtol=2e-4,
                               atol=2e-4 * float(np.abs(want).max()))


def test_inverse_slice_matrix_matches_irfft():
    """The sliced inverse-DFT matrix reproduces irfft rows M..M+2P-1."""
    nfft, M, P = 128, 39, 16
    K = nfft // 2 + 1
    _, _, G_re, G_im = _dft_plan(nfft, M, P)
    Y = (RNG.standard_normal((5, K))
         + 1j * RNG.standard_normal((5, K))).astype(np.complex64)
    want = np.fft.irfft(Y, n=nfft)[:, M:M + 2 * P]
    # The plan matrices are zero-padded to 128-multiple (Kp, Qp) for
    # the TPU lane-tiling constraint; the live block is [:K, :2P].
    Yp = np.zeros((5, G_re.shape[0]), np.complex64)
    Yp[:, :K] = Y
    got = (np.real(Yp) @ G_re + np.imag(Yp) @ G_im)[:, :2 * P]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert G_re.shape[0] % 128 == 0 and G_re.shape[1] % 128 == 0


def test_mlsa_fused_wiring():
    """MLSA(cascade="fused") equals the stage-by-stage path and carries
    gradients (CPU: the fused op falls back to the XLA formulation, so
    this pins the wiring + custom-vjp plumbing)."""
    import jax

    import diffsptk_tpu

    P, Mc = 16, 4
    x = jnp.asarray(RNG.standard_normal(8 * P).astype(np.float32))
    mc = jnp.asarray((RNG.standard_normal((8, Mc + 1)) * 0.2)
                     .astype(np.float32))
    mk = lambda **kw: diffsptk_tpu.MLSA(Mc, frame_period=P, alpha=0.42,
                                        taylor_order=6, cep_order=39,
                                        **kw)
    y0 = mk()(x, mc)
    y1 = mk(cascade="fused")(x, mc)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)
    g = jax.grad(lambda e: jnp.sum(mk(cascade="fused")(e, mc) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all() and np.any(np.asarray(g) != 0)
