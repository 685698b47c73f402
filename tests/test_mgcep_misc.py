import numpy as np
import pytest

import diffsptk_tpu
import diffsptk_tpu.functional as F
from tests import utils as U
from tests.oracle import reference

RNG = np.random.default_rng(0)


def _spec(n=1024, fl=400, fp=80, fft=512):
    x = RNG.standard_normal(n)
    return np.asarray(F.stft(U.to_jax(x), frame_length=fl, frame_period=fp,
                             fft_length=fft, eps=0, relative_floor=-60))


@pytest.mark.parametrize("gamma,n_iter", [(-1.0, 0), (-0.5, 3), (-0.25, 2)])
def test_mgcep(gamma, n_iter):
    sp = _spec()
    kw = dict(fft_length=512, cep_order=12, alpha=0.42, gamma=gamma,
              n_iter=n_iter)
    ours = diffsptk_tpu.MelGeneralizedCepstralAnalysis(**kw)
    ref = reference.MelGeneralizedCepstralAnalysis(**kw)
    U.check_parity(ours, ref, sp, rtol=1e-5, atol=1e-7)


def test_mgcep_gamma0_delegates():
    sp = _spec()
    kw = dict(fft_length=512, cep_order=12, alpha=0.42, gamma=0, n_iter=2)
    ours = diffsptk_tpu.MelGeneralizedCepstralAnalysis(**kw)
    ref = reference.MelGeneralizedCepstralAnalysis(**kw)
    U.check_parity(ours, ref, sp, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("alpha,theta", [(0.0, 0.1), (0.42, 0.0),
                                         (0.3, 0.5)])
def test_freqt2_ifreqt2(alpha, theta):
    c = RNG.standard_normal(9) * 0.3
    ours = diffsptk_tpu.SecondOrderAllPassFrequencyTransform(
        8, 12, alpha, theta)
    ref = reference.SecondOrderAllPassFrequencyTransform(8, 12, alpha, theta)
    U.check_parity(ours, ref, c)
    c2 = np.asarray(ours(U.to_jax(c)))
    ours_i = diffsptk_tpu.SecondOrderAllPassInverseFrequencyTransform(
        12, 8, alpha, theta)
    ref_i = reference.SecondOrderAllPassInverseFrequencyTransform(
        12, 8, alpha, theta)
    U.check_parity(ours_i, ref_i, c2)


def test_smcep():
    sp = _spec()
    kw = dict(fft_length=512, cep_order=10, alpha=0.3, theta=0.2, n_iter=2)
    ours = diffsptk_tpu.SecondOrderAllPassMelCepstralAnalysis(**kw)
    ref = reference.SecondOrderAllPassMelCepstralAnalysis(**kw)
    U.check_parity(ours, ref, sp, rtol=1e-5, atol=1e-7)


def test_pnorm_ipnorm():
    mc = RNG.standard_normal(9) * 0.3
    ours = diffsptk_tpu.MelCepstrumPowerNormalization(8, alpha=0.42)
    ref = reference.MelCepstrumPowerNormalization(8, alpha=0.42)
    U.check_parity(ours, ref, mc)
    y = np.asarray(ours(U.to_jax(mc)))
    ours_i = diffsptk_tpu.MelCepstrumInversePowerNormalization(8)
    ref_i = reference.MelCepstrumInversePowerNormalization(8)
    U.check_parity(ours_i, ref_i, y)
    U.assert_close(np.asarray(ours_i(U.to_jax(y))), mc, rtol=1e-10,
                   atol=1e-12)


def test_mcpf():
    mc = RNG.standard_normal(9) * 0.3
    kw = dict(alpha=0.42, beta=0.2, onset=2, ir_length=128)
    ours = diffsptk_tpu.MelCepstrumPostfiltering(8, **kw)
    ref = reference.MelCepstrumPostfiltering(8, **kw)
    U.check_parity(ours, ref, mc)


@pytest.mark.parametrize("fast,mod_type", [(True, "scale"),
                                           (False, "scale"),
                                           (False, "clip")])
def test_mlsacheck(fast, mod_type):
    mc = RNG.standard_normal((4, 9)) * 2.0  # likely unstable
    kw = dict(alpha=0.42, pade_order=4, strict=True, fast=fast,
              n_fft=256, warn_type="ignore", mod_type=mod_type)
    ours = diffsptk_tpu.MLSADigitalFilterStabilityCheck(8, **kw)
    ref = reference.MLSADigitalFilterStabilityCheck(8, **kw)
    U.check_parity(ours, ref, mc)
