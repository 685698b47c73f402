import numpy as np
import pytest

import diffsptk_tpu
import diffsptk_tpu.functional as F
from tests import utils as U
from tests.oracle import reference

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("t", [1, 2, 3, 4])
def test_dct_idct(t):
    x = RNG.standard_normal(8)
    U.check_parity(diffsptk_tpu.DCT(8, dct_type=t),
                   reference.DCT(8, dct_type=t), x)
    U.check_parity(diffsptk_tpu.IDCT(8, dct_type=t),
                   reference.IDCT(8, dct_type=t), x)
    # round trip
    y = F.idct(F.dct(U.to_jax(x), dct_type=t), dct_type=t)
    U.assert_close(y, x, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("t", [1, 2, 3, 4])
def test_dst_idst(t):
    x = RNG.standard_normal(8)
    U.check_parity(diffsptk_tpu.DST(8, dst_type=t),
                   reference.DST(8, dst_type=t), x)
    U.check_parity(diffsptk_tpu.IDST(8, dst_type=t),
                   reference.IDST(8, dst_type=t), x)


@pytest.mark.parametrize("t", [1, 2, 3, 4])
def test_dht_idht(t):
    x = RNG.standard_normal(8)
    U.check_parity(diffsptk_tpu.DHT(8, dht_type=t),
                   reference.DHT(8, dht_type=t), x)
    U.check_parity(diffsptk_tpu.IDHT(8, dht_type=t),
                   reference.IDHT(8, dht_type=t), x)


@pytest.mark.parametrize("t", ["sequency", "natural", "dyadic"])
def test_wht(t):
    x = RNG.standard_normal(16)
    U.check_parity(diffsptk_tpu.WHT(16, wht_type=t),
                   reference.WalshHadamardTransform(16, wht_type=t), x)
    y = F.wht(F.wht(U.to_jax(x), wht_type=t), wht_type=t)
    U.assert_close(y, x, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("alpha", [0.0, 0.42, -0.35])
@pytest.mark.parametrize("orders", [(4, 4), (4, 9), (9, 4)])
def test_freqt(alpha, orders):
    m1, m2 = orders
    c = RNG.standard_normal(m1 + 1)
    U.check_parity(diffsptk_tpu.FrequencyTransform(m1, m2, alpha),
                   reference.FrequencyTransform(m1, m2, alpha), c)


@pytest.mark.parametrize("alpha", [0.0, 0.42])
def test_mc2b_b2mc(alpha):
    mc = RNG.standard_normal(9)
    ours = diffsptk_tpu.MelCepstrumToMLSADigitalFilterCoefficients(8, alpha)
    ref = reference.MelCepstrumToMLSADigitalFilterCoefficients(8, alpha)
    U.check_parity(ours, ref, mc)
    b = np.asarray(ours(U.to_jax(mc)))
    back = F.b2mc(U.to_jax(b), alpha=alpha)
    U.assert_close(back, mc, rtol=1e-8, atol=1e-10)
    U.check_parity(
        diffsptk_tpu.MLSADigitalFilterCoefficientsToMelCepstrum(8, alpha),
        reference.MLSADigitalFilterCoefficientsToMelCepstrum(8, alpha), b)


@pytest.mark.parametrize("gamma", [0.0, -0.5, 1.0])
def test_gnorm_ignorm(gamma):
    x = RNG.standard_normal(9) * 0.2
    x[0] = abs(x[0]) + 1.0
    U.check_parity(
        diffsptk_tpu.GeneralizedCepstrumGainNormalization(8, gamma),
        reference.GeneralizedCepstrumGainNormalization(8, gamma), x)
    y = np.asarray(F.gnorm(U.to_jax(x), gamma=gamma))
    U.check_parity(
        diffsptk_tpu.GeneralizedCepstrumInverseGainNormalization(8, gamma),
        reference.GeneralizedCepstrumInverseGainNormalization(8, gamma), y)
    back = F.ignorm(F.gnorm(U.to_jax(x), gamma=gamma), gamma=gamma)
    U.assert_close(back, x, rtol=1e-8, atol=1e-10)


def test_companding():
    x = RNG.uniform(-1, 1, 100)
    U.check_parity(diffsptk_tpu.ALawCompression(1, 87.6),
                   reference.ALawCompression(1, 87.6), x)
    U.check_parity(diffsptk_tpu.MuLawCompression(1, 255),
                   reference.MuLawCompression(1, 255), x)
    y = np.asarray(F.alaw(U.to_jax(x)))
    U.check_parity(diffsptk_tpu.ALawExpansion(1, 87.6),
                   reference.ALawExpansion(1, 87.6), y)
    U.assert_close(F.ialaw(U.to_jax(y)), x, rtol=1e-8, atol=1e-10)
    z = np.asarray(F.ulaw(U.to_jax(x)))
    U.check_parity(diffsptk_tpu.MuLawExpansion(1, 255),
                   reference.MuLawExpansion(1, 255), z)
    U.assert_close(F.iulaw(U.to_jax(z)), x, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("quantizer", ["mid-rise", "mid-tread"])
def test_quantize(quantizer):
    x = RNG.uniform(-1, 1, 100)
    U.check_parity(diffsptk_tpu.UniformQuantization(1, 6, quantizer),
                   reference.UniformQuantization(1, 6, quantizer), x)
    y = np.asarray(F.quantize(U.to_jax(x), 1, 6, quantizer))
    U.check_parity(diffsptk_tpu.InverseUniformQuantization(1, 6, quantizer),
                   reference.InverseUniformQuantization(1, 6, quantizer), y)
    xq = F.dequantize(F.quantize(U.to_jax(x), 1, 6, quantizer), 1, 6,
                      quantizer)
    assert np.max(np.abs(np.asarray(xq) - x)) < 2 / 2 ** 6


def test_parcor_chain():
    # start from valid reflection coefficients (|k| < 1) -> stable LPC
    k = np.array([1.5, 0.5, -0.3, 0.2, -0.1])
    a = np.asarray(F.par2lpc(U.to_jax(k)))
    U.check_parity(
        diffsptk_tpu.LinearPredictiveCoefficientsToParcorCoefficients(4),
        reference.LinearPredictiveCoefficientsToParcorCoefficients(4), a)
    U.assert_close(F.lpc2par(U.to_jax(a)), k, rtol=1e-8, atol=1e-10)
    U.check_parity(
        diffsptk_tpu.ParcorCoefficientsToLinearPredictiveCoefficients(4),
        reference.ParcorCoefficientsToLinearPredictiveCoefficients(4), k)
    U.assert_close(F.par2lpc(U.to_jax(k)), a, rtol=1e-8, atol=1e-10)
    # is / lar round trips + parity
    U.check_parity(diffsptk_tpu.ParcorCoefficientsToInverseSine(4),
                   reference.ParcorCoefficientsToInverseSine(4), k)
    U.check_parity(diffsptk_tpu.ParcorCoefficientsToLogAreaRatio(4),
                   reference.ParcorCoefficientsToLogAreaRatio(4), k)
    U.assert_close(F.is2par(F.par2is(U.to_jax(k))), k, rtol=1e-6, atol=1e-8)
    U.assert_close(F.lar2par(F.par2lar(U.to_jax(k))), k, rtol=1e-8,
                   atol=1e-10)
    s = np.asarray(F.par2is(U.to_jax(k)))
    g = np.asarray(F.par2lar(U.to_jax(k)))
    U.check_parity(diffsptk_tpu.InverseSineToParcorCoefficients(4),
                   reference.InverseSineToParcorCoefficients(4), s)
    U.check_parity(diffsptk_tpu.LogAreaRatioToParcorCoefficients(4),
                   reference.LogAreaRatioToParcorCoefficients(4), g)


def test_norm0():
    a = np.array([2.0, 0.5, -0.3, 0.2])
    U.check_parity(
        diffsptk_tpu.AllPoleToAllZeroDigitalFilterCoefficients(3),
        reference.AllPoleToAllZeroDigitalFilterCoefficients(3), a)
    U.assert_close(F.norm0(F.norm0(U.to_jax(a))), a, rtol=1e-10, atol=1e-12)


def test_differentiability():
    U.check_differentiability(diffsptk_tpu.DCT(8), (8,))
    U.check_differentiability(diffsptk_tpu.FrequencyTransform(7, 9, 0.42),
                              (8,))
    U.check_differentiability(
        lambda x: F.gnorm(x, gamma=-0.5),
        (9,), key=3)
