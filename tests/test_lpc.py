import jax.numpy as jnp
import numpy as np
import pytest

import diffsptk_tpu
import diffsptk_tpu.functional as F
from tests import utils as U
from tests.oracle import reference

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("fmt", ["naive", "normalized", "biased", "unbiased"])
def test_acorr(fmt):
    x = RNG.standard_normal(30)
    U.check_parity(diffsptk_tpu.Autocorrelation(30, 8, fmt),
                   reference.Autocorrelation(30, 8, out_format=fmt), x)


def test_levdur():
    x = RNG.standard_normal(64)
    r = np.asarray(F.acorr(U.to_jax(x), 8))
    U.check_parity(diffsptk_tpu.LevinsonDurbin(8),
                   reference.LevinsonDurbin(8), r)


def test_rlevdur_roundtrip():
    x = RNG.standard_normal(64)
    r = F.acorr(U.to_jax(x), 6)
    a = F.levdur(r)
    U.check_parity(diffsptk_tpu.ReverseLevinsonDurbin(6, n_fft=1024),
                   reference.ReverseLevinsonDurbin(6, n_fft=1024),
                   np.asarray(a))
    r2 = F.rlevdur(a, n_fft=4096)
    U.assert_close(np.asarray(r2), np.asarray(r), rtol=1e-4, atol=1e-6)


def test_lpc():
    x = RNG.standard_normal(80)
    U.check_parity(diffsptk_tpu.LPC(80, 12),
                   reference.LPC(80, 12), x)


def test_linear_intpl():
    x = RNG.standard_normal((5, 3))
    U.check_parity(diffsptk_tpu.LinearInterpolation(4),
                   reference.LinearInterpolation(4), x)
    x1 = RNG.standard_normal(5)
    U.check_parity(diffsptk_tpu.LinearInterpolation(4),
                   reference.LinearInterpolation(4), x1)
    x3 = RNG.standard_normal((2, 5, 3))
    U.check_parity(diffsptk_tpu.LinearInterpolation(4),
                   reference.LinearInterpolation(4), x3)


@pytest.mark.parametrize("ignore_gain", [False, True])
def test_poledf(ignore_gain):
    T, P, M = 80, 10, 4
    x = RNG.standard_normal((2, T))
    k = RNG.uniform(-0.5, 0.5, (2, T // P, M + 1))
    k[..., 0] = 1.0 + RNG.uniform(0, 1, (2, T // P))
    a = np.stack([np.asarray(F.par2lpc(U.to_jax(kk))) for kk in k])
    U.check_parity(
        diffsptk_tpu.AllPoleDigitalFilter(M, P, ignore_gain=ignore_gain),
        reference.AllPoleDigitalFilter(M, P, ignore_gain=ignore_gain),
        x, a)


@pytest.mark.parametrize("ignore_gain", [False, True])
def test_zerodf(ignore_gain):
    T, P, M = 80, 10, 4
    x = RNG.standard_normal((2, T))
    b = RNG.standard_normal((2, T // P, M + 1))
    U.check_parity(
        diffsptk_tpu.AllZeroDigitalFilter(M, P, ignore_gain=ignore_gain),
        reference.AllZeroDigitalFilter(M, P, ignore_gain=ignore_gain),
        x, b)


def test_dfs_fir():
    x = RNG.standard_normal(50)
    b = [0.5, -0.3, 0.2]
    U.check_parity(diffsptk_tpu.IIR(b=b), reference.IIR(b=b), x)


def test_dfs_iir():
    x = RNG.standard_normal(50)
    b = [1.0, 0.5]
    a = [1.0, -0.6, 0.08]
    U.check_parity(diffsptk_tpu.IIR(b=b, a=a), reference.IIR(b=b, a=a), x)
    # truncated impulse-response mode
    U.check_parity(diffsptk_tpu.IIR(b=b, a=a, ir_length=64),
                   reference.IIR(b=b, a=a, ir_length=64), x,
                   rtol=1e-5, atol=1e-7)


def test_df2():
    x = RNG.standard_normal(50)
    kw = dict(pole_frequency=100, pole_bandwidth=200, zero_frequency=1000,
              zero_bandwidth=50)
    U.check_parity(diffsptk_tpu.SecondOrderDigitalFilter(16000, **kw),
                   reference.SecondOrderDigitalFilter(16000, **kw), x)


def test_first_order_recurrence_complex():
    from diffsptk_tpu.kernels import first_order_recurrence
    T = 64
    p = (RNG.uniform(-0.6, 0.6, T) + 1j * RNG.uniform(-0.6, 0.6, T))
    x = RNG.standard_normal(T) + 1j * RNG.standard_normal(T)
    y = np.asarray(first_order_recurrence(jnp.asarray(x), jnp.asarray(p)))
    ref = np.zeros(T, complex)
    acc = 0
    for t in range(T):
        acc = p[t] * acc + x[t]
        ref[t] = acc
    np.testing.assert_allclose(y, ref, rtol=1e-10, atol=1e-12)


def test_chunked_lpc_close_to_exact():
    from diffsptk_tpu.kernels.recurrence import (
        chunked_sample_wise_lpc, sample_wise_lpc)
    T, M = 512, 4
    x = RNG.standard_normal((2, T))
    k = RNG.uniform(-0.5, 0.5, (2, T, M + 1))
    k[..., 0] = 1.0
    a = np.stack([np.asarray(F.par2lpc(U.to_jax(kk))) for kk in k])[..., 1:]
    y_exact = np.asarray(sample_wise_lpc(jnp.asarray(x), jnp.asarray(a)))
    y_chunk = np.asarray(chunked_sample_wise_lpc(
        jnp.asarray(x), jnp.asarray(a), chunk_length=128, warmup_length=64))
    err = np.abs(y_exact - y_chunk).max() / np.abs(y_exact).max()
    assert err < 1e-6, err


def test_lpc_analysis_synthesis_snr(data_wav):
    """BASELINE config #2: frame -> LPC -> zerodf(inverse) -> poledf."""
    x = U.to_jax(np.asarray(data_wav))[:8000]
    fl, fp, M = 400, 80, 24
    frames = F.frame(x, fl, fp)
    w = F.window(frames, window="blackman")
    a = F.lpc(w, M)
    # inverse filter with norm0-converted coefficients, then resynthesize
    b = F.norm0(a)
    T = (x.shape[0] // fp) * fp
    e = F.zerodf(x[:T], b, fp)
    y = F.poledf(e, a, fp)
    err = np.asarray(y) - np.asarray(x[:T])
    snr = 10 * np.log10(float(np.sum(np.asarray(x[:T]) ** 2) /
                              np.sum(err ** 2)))
    assert snr > 40.0, snr
