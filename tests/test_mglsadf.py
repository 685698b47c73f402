import jax.numpy as jnp
import numpy as np
import pytest
import torch

import diffsptk_tpu
import diffsptk_tpu.functional as F
from tests import utils as U
from tests.oracle import reference

RNG = np.random.default_rng(0)


def _analyze(x, fl=400, fp=80, fft=512, M=24, alpha=0.42, n_iter=4):
    sp = F.stft(U.to_jax(x), frame_length=fl, frame_period=fp,
                fft_length=fft, eps=0, relative_floor=-80)
    mc = diffsptk_tpu.MelCepstralAnalysis(
        fft_length=fft, cep_order=M, alpha=alpha, n_iter=n_iter)(sp)
    return np.asarray(mc)


MODES = ["multi-stage", "single-stage", "freq-domain", "pade-approx"]


@pytest.mark.parametrize("mode", MODES)
def test_parity_vs_reference(mode, data_wav):
    x = np.asarray(data_wav)[:4000]
    M, fp, alpha = 16, 80, 0.42
    mc = _analyze(x, M=M, alpha=alpha)
    T = mc.shape[0] * fp
    kwargs = {}
    if mode == "multi-stage":
        kwargs = dict(taylor_order=10, cep_order=100)
    elif mode == "single-stage":
        kwargs = dict(ir_length=400, n_fft=1024)
    elif mode == "pade-approx":
        kwargs = dict(pade_order=5, cep_order=100)
    ours = diffsptk_tpu.MLSA(M, fp, alpha=alpha, mode=mode, **kwargs)
    ref = reference.MLSA(M, frame_period=fp, alpha=alpha, mode=mode,
                         **kwargs)
    y_ours = np.asarray(ours(U.to_jax(x[:T]), U.to_jax(mc)))
    with torch.no_grad():
        y_ref = ref(U.to_torch(x[:T]), U.to_torch(mc)).numpy()
    # the Taylor cascade amplifies f32 rounding near zero crossings;
    # the signal-scale bound is what float supports
    atol = 1e-4 if U.DEFAULT_DTYPE == "float" else 1e-6
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=atol)


@pytest.mark.parametrize("phase", ["minimum", "maximum", "zero"])
def test_phases_match_reference(phase, data_wav):
    x = np.asarray(data_wav)[:2400]
    M, fp, alpha = 8, 80, 0.42
    mc = _analyze(x, M=M, alpha=alpha)
    T = mc.shape[0] * fp
    kwargs = dict(taylor_order=8, cep_order=60)
    ours = diffsptk_tpu.MLSA(M, fp, alpha=alpha, phase=phase, **kwargs)
    ref = reference.MLSA(M, frame_period=fp, alpha=alpha, phase=phase,
                         **kwargs)
    y_ours = np.asarray(ours(U.to_jax(x[:T]), U.to_jax(mc)))
    with torch.no_grad():
        y_ref = ref(U.to_torch(x[:T]), U.to_torch(mc)).numpy()
    # the Taylor cascade amplifies f32 rounding near zero crossings;
    # the signal-scale bound is what float supports
    atol = 1e-4 if U.DEFAULT_DTYPE == "float" else 1e-6
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=atol)


def test_mixed_phase(data_wav):
    x = np.asarray(data_wav)[:2400]
    M, fp, alpha = 8, 80, 0.42
    mc = _analyze(x, M=M, alpha=alpha)
    # build a mixed-phase cepstrum [c_-N..c_-1, c_0..c_M]
    mc_mixed = np.concatenate([0.1 * mc[..., 1:][..., ::-1], mc], axis=-1)
    T = mc.shape[0] * fp
    kwargs = dict(taylor_order=8, cep_order=(30, 30))
    ours = diffsptk_tpu.MLSA((M, M), fp, alpha=alpha, phase="mixed",
                             **kwargs)
    ref = reference.MLSA((M, M), frame_period=fp, alpha=alpha, phase="mixed",
                         **kwargs)
    y_ours = np.asarray(ours(U.to_jax(x[:T]), U.to_jax(mc_mixed)))
    with torch.no_grad():
        y_ref = ref(U.to_torch(x[:T]), U.to_torch(mc_mixed)).numpy()
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=1e-6)


def test_analysis_synthesis_correlation(data_wav):
    """Headline chain: STFT -> mcep -> MLSA round trip on real speech
    (reference correlation bound r > 0.98, tests/test_mglsadf.py:91)."""
    x = np.asarray(data_wav)
    M, fp, alpha = 24, 80, 0.42
    mc = _analyze(x, M=M, alpha=alpha, n_iter=10)
    T = mc.shape[0] * fp
    imlsa = diffsptk_tpu.IMLSA(M, fp, alpha=alpha, taylor_order=20,
                               cep_order=199)
    mlsa = diffsptk_tpu.MLSA(M, fp, alpha=alpha, taylor_order=20,
                             cep_order=199)
    e = imlsa(U.to_jax(x[:T]), U.to_jax(mc))
    y = np.asarray(mlsa(e, U.to_jax(mc)))
    r = np.corrcoef(y, x[:T])[0, 1]
    assert r > 0.98, r


def test_imlsa_parity(data_wav):
    x = np.asarray(data_wav)[:2400]
    M, fp, alpha = 8, 80, 0.42
    mc = _analyze(x, M=M, alpha=alpha)
    T = mc.shape[0] * fp
    ours = diffsptk_tpu.IMLSA(M, fp, alpha=alpha, taylor_order=8,
                              cep_order=60)
    ref = reference.IMLSA(M, frame_period=fp, alpha=alpha, taylor_order=8,
                          cep_order=60)
    y_ours = np.asarray(ours(U.to_jax(x[:T]), U.to_jax(mc)))
    with torch.no_grad():
        y_ref = ref(U.to_torch(x[:T]), U.to_torch(mc)).numpy()
    # the Taylor cascade amplifies f32 rounding near zero crossings;
    # the signal-scale bound is what float supports
    atol = 1e-4 if U.DEFAULT_DTYPE == "float" else 1e-6
    np.testing.assert_allclose(y_ours, y_ref, rtol=1e-4, atol=atol)


def test_pade_chunked_close():
    x = RNG.standard_normal(1024)
    mc = 0.1 * RNG.standard_normal((1024 // 64, 9))
    exact = diffsptk_tpu.MLSA(8, 64, alpha=0.42, mode="pade-approx",
                              cep_order=60)
    chunked = diffsptk_tpu.MLSA(8, 64, alpha=0.42, mode="pade-approx",
                                cep_order=60, chunk_length=256,
                                warmup_length=128)
    y1 = np.asarray(exact(U.to_jax(x), U.to_jax(mc)))
    y2 = np.asarray(chunked(U.to_jax(x), U.to_jax(mc)))
    err = np.abs(y1 - y2).max() / np.abs(y1).max()
    assert err < 1e-5, err
