import jax.numpy as jnp
import numpy as np
import pytest

import diffsptk_tpu
import diffsptk_tpu.functional as F
from tests import utils as U
from tests.oracle import reference

RNG = np.random.default_rng(0)


def _stable_lpc(M, batch=()):
    k = RNG.uniform(-0.7, 0.7, batch + (M + 1,))
    k[..., 0] = 1.0 + RNG.uniform(0, 1, batch)
    return np.asarray(F.par2lpc(jnp.asarray(k)))


@pytest.mark.parametrize("M", [1, 2, 5, 8])
@pytest.mark.parametrize("fmt", ["radian", "cycle", "khz", "hz"])
def test_lpc2lsp(M, fmt):
    a = _stable_lpc(M, (3,))
    ours = diffsptk_tpu.LinearPredictiveCoefficientsToLineSpectralPairs(
        M, out_format=fmt, sample_rate=16000)
    ref = reference.LinearPredictiveCoefficientsToLineSpectralPairs(
        M, out_format=fmt, sample_rate=16000)
    U.check_parity(ours, ref, a, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("M", [1, 2, 5, 8])
def test_lsp2lpc_roundtrip(M):
    a = _stable_lpc(M, (3,))
    w = diffsptk_tpu.LinearPredictiveCoefficientsToLineSpectralPairs(M)(
        jnp.asarray(a))
    back = diffsptk_tpu.LineSpectralPairsToLinearPredictiveCoefficients(M)(w)
    U.assert_close(np.asarray(back), a, rtol=1e-6, atol=1e-8)
    ref = reference.LineSpectralPairsToLinearPredictiveCoefficients(M)
    U.check_parity(
        diffsptk_tpu.LineSpectralPairsToLinearPredictiveCoefficients(M),
        ref, np.asarray(w))


@pytest.mark.parametrize("M", [4, 7])
def test_lsp2sp(M):
    a = _stable_lpc(M, (2,))
    w = np.asarray(
        diffsptk_tpu.LinearPredictiveCoefficientsToLineSpectralPairs(M)(
            jnp.asarray(a)))
    for fmt in ["db", "log-magnitude", "magnitude", "power"]:
        ours = diffsptk_tpu.LineSpectralPairsToSpectrum(M, 32,
                                                        out_format=fmt)
        ref = reference.LineSpectralPairsToSpectrum(M, 32, out_format=fmt)
        U.check_parity(ours, ref, w, rtol=1e-5, atol=1e-7)


def test_lpccheck():
    a = np.array([[1.2, 1.5, -0.9, 0.8], [1.0, 0.1, -0.2, 0.05]])
    ours = diffsptk_tpu.LinearPredictiveCoefficientsStabilityCheck(
        3, margin=0.01, warn_type="ignore")
    ref = reference.LinearPredictiveCoefficientsStabilityCheck(
        3, margin=0.01, warn_type="ignore")
    U.check_parity(ours, ref, a)


def test_lspcheck():
    M = 5
    a = _stable_lpc(M, (2,))
    w = np.asarray(
        diffsptk_tpu.LinearPredictiveCoefficientsToLineSpectralPairs(M)(
            jnp.asarray(a)))
    w_bad = w.copy()
    w_bad[..., 2] = w_bad[..., 1]  # violate spacing
    ours = diffsptk_tpu.LineSpectralPairsStabilityCheck(
        M, rate=0.1, n_iter=2, warn_type="ignore")
    ref = reference.LineSpectralPairsStabilityCheck(
        M, rate=0.1, n_iter=2, warn_type="ignore")
    U.check_parity(ours, ref, w_bad)


def test_root_pol():
    a = RNG.standard_normal((3, 6))
    a[..., 0] = 1.0
    ours = diffsptk_tpu.PolynomialToRoots(5)
    ref = reference.PolynomialToRoots(5)
    import torch

    def canon(r):
        r = np.round(r, 9)
        idx = np.lexsort((r.imag, r.real), axis=-1)
        return np.take_along_axis(r, idx, axis=-1)

    r_ours = canon(np.asarray(ours(jnp.asarray(a))))
    with torch.no_grad():
        r_ref = canon(ref(U.to_torch(a)).numpy())
    np.testing.assert_allclose(r_ours, r_ref, rtol=1e-6, atol=1e-8)


def test_pol_root_roundtrip():
    a = RNG.standard_normal((2, 5))
    a[..., 0] = 1.0
    roots = diffsptk_tpu.PolynomialToRoots(4)(jnp.asarray(a))
    back = diffsptk_tpu.RootsToPolynomial(4)(roots)
    U.assert_close(np.asarray(back).real, a, rtol=1e-8, atol=1e-8)
