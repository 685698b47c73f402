import numpy as np
import pytest

import diffsptk_tpu
import diffsptk_tpu.functional as F
from tests import utils as U
from tests.oracle import reference

RNG = np.random.default_rng(0)


def _power_spec(x, fft=64, fl=32):
    return np.asarray(F.stft(U.to_jax(x), frame_length=fl, frame_period=fl,
                             fft_length=fft, eps=1e-8))


@pytest.mark.parametrize("scale", ["htk", "mel", "inverted-mel", "bark",
                                   "linear"])
def test_fbank(scale):
    sp = _power_spec(RNG.standard_normal(128))
    kw = dict(fft_length=64, n_channel=8, sample_rate=16000, scale=scale)
    U.check_parity(diffsptk_tpu.FBANK(**kw, out_format="yE"),
                   reference.FBANK(**kw, out_format="yE"), sp)


def test_fbank_erb():
    sp = _power_spec(RNG.standard_normal(128))
    kw = dict(fft_length=64, n_channel=8, sample_rate=16000, f_min=70,
              erb_factor=1.0)
    U.check_parity(diffsptk_tpu.FBANK(**kw), reference.FBANK(**kw), sp)


def test_ifbank():
    sp = _power_spec(RNG.standard_normal(128))
    kw = dict(fft_length=64, n_channel=20, sample_rate=16000)
    y = np.asarray(diffsptk_tpu.FBANK(**kw)(U.to_jax(sp)))
    U.check_parity(diffsptk_tpu.IFBANK(**kw),
                   reference.IFBANK(**kw), y)


@pytest.mark.parametrize("fmt", ["y", "yE", "yc", "ycE"])
def test_mfcc(fmt):
    sp = _power_spec(RNG.standard_normal(256))
    kw = dict(fft_length=64, mfcc_order=6, n_channel=10, sample_rate=16000,
              lifter=22, out_format=fmt)
    U.check_parity(diffsptk_tpu.MFCC(**kw), reference.MFCC(**kw), sp)


def test_plp():
    sp = _power_spec(RNG.standard_normal(256))
    kw = dict(fft_length=64, plp_order=6, n_channel=10, sample_rate=16000,
              lifter=22, out_format="ycE")
    U.check_parity(diffsptk_tpu.PLP(**kw), reference.PLP(**kw), sp)


@pytest.mark.parametrize("window", ["sine", "vorbis", "kbd", "rectangular"])
def test_mdct_imdct(window):
    x = RNG.standard_normal(64)
    ours = diffsptk_tpu.MDCT(16, window=window)
    ref = reference.MDCT(16, window=window)
    U.check_parity(ours, ref, x)
    y = ours(U.to_jax(x))
    back = diffsptk_tpu.IMDCT(16, window=window)(y)
    U.assert_close(np.asarray(back)[: 64], x, rtol=1e-8, atol=1e-9)
    refi = reference.IMDCT(16, window=window)
    U.check_parity(lambda z: diffsptk_tpu.IMDCT(16, window=window)(z),
                   lambda z: refi(z), np.asarray(y))


def test_mdst():
    x = RNG.standard_normal(64)
    U.check_parity(diffsptk_tpu.MDST(16), reference.MDST(16), x)
    y = diffsptk_tpu.MDST(16)(U.to_jax(x))
    back = diffsptk_tpu.IMDST(16)(y)
    U.assert_close(np.asarray(back)[:64], x, rtol=1e-8, atol=1e-9)


def test_hilbert():
    x = RNG.standard_normal(32)
    ours = diffsptk_tpu.HilbertTransform(32)
    ref = reference.HilbertTransform(32)
    U.check_parity(ours, ref, x)


def test_griffin_lim(data_wav):
    x = np.asarray(data_wav)[:4800]
    kw = dict(frame_length=400, frame_period=80, fft_length=512)
    sp = F.stft(U.to_jax(x), **kw, eps=0, out_format="power",
                window="hanning", norm="none")
    gl = diffsptk_tpu.GriffinLim(**kw, n_iter=30, init_phase="zeros",
                                 window="hanning", norm="none")
    y = np.asarray(gl(sp, out_length=4800))
    # spectral convergence: reconstructed magnitude close to target
    sp_y = np.asarray(F.stft(U.to_jax(y), **kw, eps=0, out_format="power",
                             window="hanning", norm="none"))
    num = np.linalg.norm(np.sqrt(sp_y) - np.sqrt(np.asarray(sp)))
    den = np.linalg.norm(np.sqrt(np.asarray(sp)))
    assert num / den < 0.15, num / den
