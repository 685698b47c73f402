import jax.numpy as jnp
import numpy as np
import pytest
import torch

import diffsptk_tpu
from tests import utils as U
from tests.oracle import reference

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("n_band,order", [(2, 10), (4, 32), (8, 63)])
def test_pqmf_parity(n_band, order):
    x = RNG.standard_normal(128)
    ours = diffsptk_tpu.PQMF(n_band, order)
    ref = reference.PQMF(n_band, order)
    y_ours = np.asarray(ours(U.to_jax(x)))
    with torch.no_grad():
        y_ref = ref(U.to_torch(x)).numpy()
    U.assert_close(y_ours, y_ref, rtol=1e-6, atol=1e-8)


def test_pqmf_reconstruction():
    x = RNG.standard_normal(512)
    pqmf = diffsptk_tpu.PQMF(4, 47)
    ipqmf = diffsptk_tpu.IPQMF(4, 47)
    y = ipqmf(pqmf(U.to_jax(x)), keepdim=False)
    e = np.asarray(y)[0][50:-50] - x[50:-50]
    snr = 10 * np.log10(np.sum(x[50:-50] ** 2) / np.sum(e ** 2))
    assert snr > 30, snr
    # parity of synthesis too
    ref = reference.IPQMF(4, 47)
    sub = np.asarray(pqmf(U.to_jax(x)))
    with torch.no_grad():
        y_ref = ref(U.to_torch(sub)).numpy()
    U.assert_close(np.asarray(ipqmf(U.to_jax(sub))), y_ref,
                               rtol=1e-6, atol=1e-8)


def test_oband_parity():
    x = RNG.standard_normal(256)
    ours = diffsptk_tpu.FractionalOctaveBandAnalysis(16000, filter_order=400)
    ref = reference.FractionalOctaveBandAnalysis(16000, filter_order=400)
    y_ours = np.asarray(ours(U.to_jax(x)))
    with torch.no_grad():
        y_ref = ref(U.to_torch(x)).numpy()
    U.assert_close(y_ours, y_ref, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("exact", [False, True])
def test_gammatone_parity(exact):
    x = RNG.standard_normal(400)
    ours = diffsptk_tpu.GammatoneFilterBankAnalysis(16000, exact=exact)
    ref = reference.GammatoneFilterBankAnalysis(16000, exact=exact)
    y_ours = np.asarray(ours(U.to_jax(x)))
    with torch.no_grad():
        y_ref = ref(U.to_torch(x)).numpy()
    U.assert_close(y_ours, y_ref, rtol=1e-6, atol=1e-8)


def test_gammatone_reconstruction():
    x = np.zeros(1600)
    x[0] = 1.0
    f = diffsptk_tpu.GammatoneFilterBankAnalysis(16000)
    g = diffsptk_tpu.GammatoneFilterBankSynthesis(16000)
    y = np.asarray(g(f(U.to_jax(x)), keepdim=False))[0]
    ref_f = reference.GammatoneFilterBankAnalysis(16000)
    ref_g = reference.GammatoneFilterBankSynthesis(16000)
    with torch.no_grad():
        y_ref = ref_g(ref_f(U.to_torch(x))).squeeze().numpy()
    U.assert_close(y, y_ref, rtol=1e-5, atol=1e-7)


def test_chroma_parity():
    import diffsptk_tpu.functional as F
    x = RNG.standard_normal(512)
    sp = np.asarray(F.stft(U.to_jax(x), frame_length=128, frame_period=128,
                           fft_length=256, eps=1e-8))
    kw = dict(fft_length=256, n_channel=12, sample_rate=16000)
    ours = diffsptk_tpu.ChromaFilterBankAnalysis(**kw)
    ref = reference.ChromaFilterBankAnalysis(**kw)
    U.check_parity(ours, ref, sp)


def test_cqt_tone_peak():
    # CQT of a pure tone must peak at the right bin
    sr, fp = 16000, 256
    f_min, bpo, K = 32.7, 12, 72
    tone = 440.0
    t = np.arange(4 * fp * 16) / sr
    x = np.sin(2 * np.pi * tone * t)
    cqt = diffsptk_tpu.CQT(fp, sr, f_min=f_min, n_bin=K,
                           n_bin_per_octave=bpo)
    C = np.abs(np.asarray(cqt(U.to_jax(x))))
    mid = C[C.shape[0] // 2]
    peak_bin = int(np.argmax(mid))
    expected = int(round(bpo * np.log2(tone / f_min)))
    assert abs(peak_bin - expected) <= 1, (peak_bin, expected)


def test_cqt_icqt_roundtrip():
    sr, fp = 16000, 256
    t = np.arange(8192) / sr
    x = (np.sin(2 * np.pi * 220 * t) + 0.5 * np.sin(2 * np.pi * 330 * t))
    x *= np.hanning(len(x))
    cqt = diffsptk_tpu.CQT(fp, sr, n_bin=84)
    icqt = diffsptk_tpu.ICQT(fp, sr, n_bin=84)
    C = cqt(U.to_jax(x))
    y = np.asarray(icqt(C, out_length=len(x)))
    r = np.corrcoef(y, x)[0, 1]
    assert r > 0.98, r


def test_cqt_forced_fft_plan_parity():
    """Octaves padded into the shared FFT plan must keep the reference's
    normalization: frame_period=96 forces padding for the upper octaves
    (regression: the padded basis was rescaled by force/natural ~ 2x)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096)
    ours = np.abs(np.asarray(
        diffsptk_tpu.CQT(96, 16000, n_bin=84)(U.to_jax(x))))
    with torch.no_grad():
        ref = reference.CQT(96, 16000, n_bin=84)(U.to_torch(x)) \
            .abs().numpy()
    ratio = ours.mean(axis=0) / np.maximum(ref.mean(axis=0), 1e-12)
    per_octave = np.array([ratio[i * 12:(i + 1) * 12].mean()
                           for i in range(7)])
    np.testing.assert_allclose(per_octave, 1.0, atol=0.02)
