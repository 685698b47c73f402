import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffsptk_tpu
import diffsptk_tpu.functional as F
from tests import utils as U
from tests.oracle import reference


@pytest.mark.parametrize("out_format", ["db", "log-magnitude", "magnitude",
                                        "power", "complex"])
def test_stft_parity(out_format):
    x = np.random.default_rng(0).standard_normal(800)
    kw = dict(frame_length=400, frame_period=80, fft_length=512)
    ref = reference.STFT(**kw, out_format=out_format, eps=1e-9)
    ours = diffsptk_tpu.STFT(**kw, out_format=out_format, eps=1e-9)
    U.check_parity(ours, ref, x)


def test_stft_functional():
    x = np.random.default_rng(1).standard_normal(400)
    y = F.stft(U.to_jax(x), frame_length=100, frame_period=40, fft_length=128)
    ref = reference.STFT(100, 40, 128)(U.to_torch(x))
    U.assert_close(y, ref)


@pytest.mark.parametrize("fl,fp,fft", [(400, 80, 512), (128, 32, 128),
                                       (100, 50, 128)])
def test_istft_roundtrip(fl, fp, fft):
    x = np.random.default_rng(2).standard_normal(1600)
    kw = dict(frame_length=fl, frame_period=fp, fft_length=fft)
    Y = diffsptk_tpu.STFT(**kw, out_format="complex")(U.to_jax(x))
    y = diffsptk_tpu.ISTFT(**kw)(Y, out_length=1600)
    # the final frame_period samples lack full window coverage (same
    # boundary behavior as the reference)
    U.assert_close(np.asarray(y)[:-fp], x[:-fp], rtol=1e-8, atol=1e-8)


def test_istft_parity():
    x = np.random.default_rng(3).standard_normal(1600)
    kw = dict(frame_length=400, frame_period=80, fft_length=512)
    Yj = diffsptk_tpu.STFT(**kw, out_format="complex")(U.to_jax(x))
    Yt = reference.STFT(**kw, out_format="complex")(U.to_torch(x))
    yj = diffsptk_tpu.ISTFT(**kw)(Yj, out_length=1600)
    yt = reference.ISTFT(**kw)(Yt, out_length=1600)
    U.assert_close(yj, yt)


def test_spec_parity():
    x = np.random.default_rng(4).standard_normal(32)
    ref = reference.Spectrum(64, eps=1e-8, relative_floor=-40,
                             out_format="db")
    ours = diffsptk_tpu.Spectrum(64, eps=1e-8, relative_floor=-40,
                                 out_format="db")
    U.check_parity(lambda b: ours(b), lambda b: ref(b), x)


def test_fftr_parity():
    x = np.random.default_rng(5).standard_normal(30)
    for fmt in ["complex", "real", "imaginary", "amplitude", "power"]:
        ref = reference.RealValuedFastFourierTransform(64, out_format=fmt)
        ours = diffsptk_tpu.FFTR(64, out_format=fmt)
        U.check_parity(ours, ref, x)


def test_fftr_learnable_matches_fft():
    x = np.random.default_rng(6).standard_normal(64)
    y_fft = diffsptk_tpu.FFTR(64)(U.to_jax(x))
    y_dft = diffsptk_tpu.FFTR(64, learnable=True)(U.to_jax(x))
    U.assert_close(y_dft, np.asarray(y_fft), rtol=1e-8, atol=1e-8)


def test_ifftr_parity():
    x = np.random.default_rng(7).standard_normal(64)
    X = np.fft.rfft(x)
    ref = reference.RealValuedInverseFastFourierTransform(64, out_length=40)
    ours = diffsptk_tpu.IFFTR(64, out_length=40)
    yt = ref(U.to_torch(X, dtype=None))
    yj = ours(jnp.asarray(X))
    U.assert_close(yj, yt)


def test_stft_differentiable():
    U.check_differentiability(
        diffsptk_tpu.STFT(40, 10, 64, eps=1e-6), (200,))


def test_stft_jit_and_sharded():
    x = np.random.default_rng(8).standard_normal(4 * 1600).reshape(4, 1600)
    op = diffsptk_tpu.STFT(400, 80, 512)
    y_eager = op(jnp.asarray(x))
    y_jit = jax.jit(op)(jnp.asarray(x))
    U.assert_close(y_jit, np.asarray(y_eager), rtol=1e-10, atol=1e-12)
    # batch-sharded over 4 virtual devices must equal single-device
    U.check_sharded_equivalence(op, jnp.asarray(x), axis=0, n_shards=4)
