import jax.numpy as jnp
import numpy as np
import pytest

import diffsptk_tpu
import diffsptk_tpu.functional as F
from tests import utils as U
from tests.oracle import reference

RNG = np.random.default_rng(0)


def test_fftcep():
    x = RNG.standard_normal(64)
    sp = np.asarray(F.stft(U.to_jax(x), frame_length=32, frame_period=32,
                           fft_length=64, eps=0))
    ours = diffsptk_tpu.CepstralAnalysis(64, 12, n_iter=3)
    ref = reference.CepstralAnalysis(fft_length=64, cep_order=12, n_iter=3)
    U.check_parity(ours, ref, sp)


def test_c2acr():
    c = RNG.standard_normal(9) * 0.3
    U.check_parity(diffsptk_tpu.CepstrumToAutocorrelation(8, 6, 128),
                   reference.CepstrumToAutocorrelation(8, 6, 128), c)


def test_c2mpir_mpir2c():
    c = RNG.standard_normal(9) * 0.3
    U.check_parity(diffsptk_tpu.CepstrumToMinimumPhaseImpulseResponse(8, 16),
                   reference.CepstrumToMinimumPhaseImpulseResponse(8, 16), c)
    h = np.asarray(
        diffsptk_tpu.CepstrumToMinimumPhaseImpulseResponse(8, 40, 512)(
            U.to_jax(c)))
    U.check_parity(
        diffsptk_tpu.MinimumPhaseImpulseResponseToCepstrum(40, 8, n_fft=512),
        reference.MinimumPhaseImpulseResponseToCepstrum(40, 8, n_fft=512), h)


def test_ndps():
    c = RNG.standard_normal(9) * 0.3
    U.check_parity(
        diffsptk_tpu.CepstrumToNegativeDerivativeOfPhaseSpectrum(8, 32),
        reference.CepstrumToNegativeDerivativeOfPhaseSpectrum(8, 32), c)
    n = np.asarray(
        diffsptk_tpu.CepstrumToNegativeDerivativeOfPhaseSpectrum(8, 32)(
            U.to_jax(c)))
    U.check_parity(
        diffsptk_tpu.NegativeDerivativeOfPhaseSpectrumToCepstrum(32, 8),
        reference.NegativeDerivativeOfPhaseSpectrumToCepstrum(32, 8), n)


def test_cdist():
    c1 = RNG.standard_normal((4, 9))
    c2 = RNG.standard_normal((4, 9))
    for red in ("none", "sum", "mean", "batchmean"):
        ours = diffsptk_tpu.CepstralDistance(full=True, reduction=red)
        ref = reference.CepstralDistance(full=True, reduction=red)
        U.check_parity(lambda a, b: ours(a, b), lambda a, b: ref(a, b),
                       c1, c2)


@pytest.mark.parametrize("cfg", [
    dict(in_alpha=0.42, out_alpha=0.0),
    dict(in_alpha=0.0, out_alpha=0.35, in_gamma=0.0, out_gamma=-0.5),
    dict(in_gamma=-1.0, out_gamma=0.0),
    dict(in_alpha=0.42, out_alpha=-0.1, in_gamma=-0.25, out_gamma=-1.0),
    dict(in_gamma=-0.5, out_gamma=-0.5, in_norm=True, out_norm=False,
         in_mul=True),
    dict(in_alpha=0.3, out_alpha=0.3, in_gamma=-0.5, out_gamma=-0.5,
         out_mul=True),
])
def test_mgc2mgc(cfg):
    mc = RNG.standard_normal(9) * 0.2
    mc[0] = 1.0 if cfg.get("in_mul") else 0.5
    ours = diffsptk_tpu.MelGeneralizedCepstrumToMelGeneralizedCepstrum(
        8, 10, **cfg)
    ref = reference.MelGeneralizedCepstrumToMelGeneralizedCepstrum(
        8, 10, **cfg)
    U.check_parity(ours, ref, mc)


@pytest.mark.parametrize("fmt", ["db", "log-magnitude", "magnitude", "power",
                                 "cycle", "radian", "degree", "complex"])
def test_mgc2sp(fmt):
    mc = RNG.standard_normal(9) * 0.2
    ours = diffsptk_tpu.MelGeneralizedCepstrumToSpectrum(
        8, 64, alpha=0.42, out_format=fmt)
    ref = reference.MelGeneralizedCepstrumToSpectrum(
        8, 64, alpha=0.42, out_format=fmt)
    U.check_parity(ours, ref, mc)


@pytest.mark.parametrize("n_iter", [0, 4])
@pytest.mark.parametrize("alpha", [0.0, 0.42])
def test_mcep(n_iter, alpha):
    x = RNG.standard_normal(2 * 512)
    sp = np.asarray(F.stft(U.to_jax(x), frame_length=400, frame_period=80,
                           fft_length=512, eps=0))
    ours = diffsptk_tpu.MelCepstralAnalysis(
        fft_length=512, cep_order=24, alpha=alpha, n_iter=n_iter)
    ref = reference.MelCepstralAnalysis(
        fft_length=512, cep_order=24, alpha=alpha, n_iter=n_iter)
    U.check_parity(ours, ref, sp, rtol=1e-5, atol=1e-6)
