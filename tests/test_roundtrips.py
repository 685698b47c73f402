"""Systematic inverse-pair round trips: every (op, inverse) family the
API exposes must reconstruct its input across a small config grid
(consolidates what the reference checks per-module, e.g.
tests/test_idct.py, test_ignorm.py, test_is2par.py ...)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

import diffsptk_tpu as d

RNG = np.random.default_rng(17)


def _vec(shape, scale=1.0):
    return jnp.asarray(RNG.standard_normal(shape) * scale)


def _recover(make_fwd, make_inv, x, rtol=1e-8, atol=1e-8):
    y = make_fwd(x)
    z = make_inv(y)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), rtol=rtol,
                               atol=atol)


@pytest.mark.parametrize("L", [16, 32])
@pytest.mark.parametrize("t", [1, 2, 3, 4])
def test_dct_family(L, t):
    x = _vec((5, L))
    _recover(d.DCT(L, dct_type=t), d.IDCT(L, dct_type=t), x)
    _recover(d.DST(L, dst_type=t), d.IDST(L, dst_type=t), x)
    _recover(d.DHT(L, dht_type=t), d.IDHT(L, dht_type=t), x)


@pytest.mark.parametrize("L", [16, 64])
def test_wht(L):
    x = _vec((4, L))
    _recover(d.WHT(L), d.IWHT(L), x)


@pytest.mark.parametrize("window", ["sine", "vorbis", "kbd"])
@pytest.mark.parametrize("L", [16, 64])
def test_mdct_family(window, L, T=256):
    x = _vec(T)
    y = d.MDCT(L, window=window)(x)
    z = d.IMDCT(L, window=window)(y, out_length=T)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-8)
    y = d.MDST(L, window=window)(x)
    z = d.IMDST(L, window=window)(y, out_length=T)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-8)


@pytest.mark.parametrize("L", [16, 32])
def test_fftr(L):
    x = _vec((3, L))
    y = d.RealValuedFastFourierTransform(L)(x)
    z = d.RealValuedInverseFastFourierTransform(L, L)(y)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-8)


@pytest.mark.parametrize("alpha,theta", [(0.42, 0.0), (0.1, 0.2),
                                         (-0.35, 1.0)])
def test_freqt2(alpha, theta, M=8):
    # a 6M intermediate order makes the warped-expansion truncation
    # negligible (the warp spreads energy over all orders)
    c = _vec((4, M + 1), 0.3)
    y = d.SecondOrderAllPassFrequencyTransform(
        M, 6 * M, alpha=alpha, theta=theta)(c)
    z = d.SecondOrderAllPassInverseFrequencyTransform(
        6 * M, M, alpha=alpha, theta=theta)(y)
    np.testing.assert_allclose(np.asarray(z), np.asarray(c), atol=1e-8)


@pytest.mark.parametrize("alpha", [0.0, 0.42, -0.3])
def test_mc2b_b2mc(alpha, M=9):
    mc = _vec((4, M + 1), 0.3)
    _recover(d.MelCepstrumToMLSADigitalFilterCoefficients(M, alpha),
             d.MLSADigitalFilterCoefficientsToMelCepstrum(M, alpha), mc)


@pytest.mark.parametrize("gamma", [-1.0, -0.5, 0.0, 0.7])
def test_gnorm_ignorm(gamma, M=9):
    c = _vec((4, M + 1), 0.2)
    _recover(d.GeneralizedCepstrumGainNormalization(M, gamma),
             d.GeneralizedCepstrumInverseGainNormalization(M, gamma), c,
             rtol=1e-7)


def test_pnorm_ipnorm(M=9):
    c = _vec((4, M + 1), 0.2)
    _recover(d.MelCepstrumPowerNormalization(M),
             d.MelCepstrumInversePowerNormalization(M), c, rtol=1e-7)


@pytest.mark.parametrize("abs_max", [1.0, 3.0])
def test_companding(abs_max):
    x = jnp.asarray(RNG.uniform(-abs_max, abs_max, 200))
    _recover(d.ALawCompression(abs_max), d.ALawExpansion(abs_max), x,
             rtol=1e-6, atol=1e-7)
    _recover(d.MuLawCompression(abs_max), d.MuLawExpansion(abs_max), x,
             rtol=1e-6, atol=1e-7)


def test_parcor_representations(M=9):
    k = jnp.asarray(RNG.uniform(-0.9, 0.9, (4, M + 1)) * 0.5)
    _recover(d.ParcorCoefficientsToInverseSine(M),
             d.InverseSineToParcorCoefficients(M), k, rtol=1e-7)
    _recover(d.ParcorCoefficientsToLogAreaRatio(M),
             d.LogAreaRatioToParcorCoefficients(M), k, rtol=1e-7)


def test_lpc_representations(M=8, L=64):
    x = _vec((4, L))
    a = d.LPC(L, M)(x)
    k = d.LinearPredictiveCoefficientsToParcorCoefficients(M)(a)
    a2 = d.ParcorCoefficientsToLinearPredictiveCoefficients(M)(k)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a), rtol=1e-6,
                               atol=1e-9)
    w = d.LinearPredictiveCoefficientsToLineSpectralPairs(M)(a)
    a3 = d.LineSpectralPairsToLinearPredictiveCoefficients(M)(w)
    np.testing.assert_allclose(np.asarray(a3), np.asarray(a), rtol=1e-4,
                               atol=1e-6)


def test_csm(M=9):
    # autocorrelation of a stable random signal -> composite sinusoidal
    # model and back (reference: tests/test_acr2csm.py)
    x = _vec((64,))
    r = d.Autocorrelation(64, M)(x)
    c = d.AutocorrelationToCompositeSinusoidalModelCoefficients(M)(r)
    r2 = d.CompositeSinusoidalModelCoefficientsToAutocorrelation(M)(c)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), rtol=1e-5,
                               atol=1e-8)


def test_cep_impulse_response(M=9):
    c = _vec((4, M + 1), 0.15)      # small c: the 64-tap IR fully decays
    h = d.CepstrumToMinimumPhaseImpulseResponse(M, 64)(c)
    c2 = d.MinimumPhaseImpulseResponseToCepstrum(64, M)(h)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c), rtol=1e-6,
                               atol=1e-8)


def test_ndps(M=9, L=32):
    # the NDPS weights cepstral index k by k, so c0 is structurally
    # unrecoverable (comes back 0); compare the recoverable orders
    c = _vec((4, M + 1), 0.2)
    n = d.CepstrumToNegativeDerivativeOfPhaseSpectrum(M, L)(c)
    c2 = d.NegativeDerivativeOfPhaseSpectrumToCepstrum(L, M)(n)
    np.testing.assert_allclose(np.asarray(c2[..., 1:]),
                               np.asarray(c[..., 1:]), rtol=1e-6,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(c2[..., 0]), 0.0, atol=1e-12)


def test_levdur_rlevdur(M=8, L=64):
    x = _vec((4, L))
    r = d.Autocorrelation(L, M)(x)
    a = d.LevinsonDurbin(M)(r)
    r2 = d.ReverseLevinsonDurbin(M)(a)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r), rtol=1e-6,
                               atol=1e-8)


@pytest.mark.parametrize("center", [True, False])
def test_frame_unframe(center, T=120):
    x = _vec(T)
    y = d.Frame(30, 10, center=center)(x)
    z = d.Unframe(30, 10, center=center)(y, out_length=T)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-8)


def test_stft_istft(T=512):
    x = _vec(T)
    cfg = dict(frame_length=64, frame_period=16, fft_length=64)
    Y = d.STFT(**cfg, out_format="complex")(x)
    z = d.ISTFT(**cfg)(Y, out_length=T)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-7)


def test_mgc2mgc_involution(M=8):
    # exact through a 6M-order intermediate (same truncation argument
    # as freqt2); covers the alpha warp + gamma generalization jointly
    mc = _vec((4, M + 1), 0.2)
    fwd = d.MelGeneralizedCepstrumToMelGeneralizedCepstrum(
        M, 6 * M, in_alpha=0.42, out_alpha=0.1, in_gamma=0.0,
        out_gamma=-0.5)
    bwd = d.MelGeneralizedCepstrumToMelGeneralizedCepstrum(
        6 * M, M, in_alpha=0.1, out_alpha=0.42, in_gamma=-0.5,
        out_gamma=0.0)
    z = bwd(fwd(mc))
    np.testing.assert_allclose(np.asarray(z), np.asarray(mc), rtol=1e-8,
                               atol=1e-10)
