"""Cross-cutting API contracts, mirroring the reference's sweeps
(tests/utils.py:40-51 U.choice; check_various_shape :268-284):

* class path == functional path on identical inputs,
* 1D/2D/3D views of the same data agree.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import diffsptk_tpu as d
from diffsptk_tpu import functional as F
from tests import utils as U

RNG = np.random.default_rng(7)
X = RNG.standard_normal(1600)
FRAMES = RNG.standard_normal((6, 32))
VEC = RNG.standard_normal((6, 9))
SPEC = np.abs(np.fft.rfft(FRAMES, n=64)) ** 2 + 1e-6

# (name, class builder, functional call, input)
CASES = [
    ("frame", lambda: d.Frame(32, 16), lambda x: F.frame(x, 32, 16), X),
    ("window", lambda: d.Window(32), lambda x: F.window(x), FRAMES),
    ("stft",
     lambda: d.STFT(32, 16, 64),
     lambda x: F.stft(x, frame_length=32, frame_period=16, fft_length=64),
     X),
    ("dct", lambda: d.DCT(32), F.dct, FRAMES),
    ("wht", lambda: d.WHT(32), F.wht, FRAMES),
    ("mdct", lambda: d.MDCT(32), lambda x: F.mdct(x, frame_length=32), X),
    ("acorr", lambda: d.Autocorrelation(32, 8),
     lambda x: F.acorr(x, acr_order=8), FRAMES),
    ("lpc", lambda: d.LPC(32, 8), lambda x: F.lpc(x, lpc_order=8), FRAMES),
    ("mcep",
     lambda: d.MelCepstralAnalysis(fft_length=64, cep_order=8, alpha=0.42,
                                   n_iter=2),
     lambda s: F.mcep(s, cep_order=8, alpha=0.42, n_iter=2), SPEC),
    ("freqt", lambda: d.FrequencyTransform(8, 8, 0.42),
     lambda c: F.freqt(c, out_order=8, alpha=0.42), VEC),
    ("mc2b", lambda: d.MelCepstrumToMLSADigitalFilterCoefficients(
        8, alpha=0.42), lambda c: F.mc2b(c, alpha=0.42), VEC),
    ("gnorm", lambda: d.GeneralizedCepstrumGainNormalization(8, gamma=-0.5),
     lambda c: F.gnorm(c, gamma=-0.5), VEC),
    ("fbank",
     lambda: d.FBANK(fft_length=64, n_channel=8, sample_rate=16000),
     lambda s: F.fbank(s, n_channel=8, sample_rate=16000), SPEC),
    ("alaw", lambda: d.ALawCompression(), F.alaw, X),
    ("ulaw", lambda: d.MuLawCompression(), F.ulaw, X),
    ("quantize", lambda: d.UniformQuantization(), F.quantize, X),
    ("delta", lambda: d.Delta([[-0.5, 0.0, 0.5]]),
     lambda v: F.delta(v, seed=[[-0.5, 0.0, 0.5]]), VEC),
    ("entropy", lambda: d.Entropy(),
     lambda p: F.entropy(p),
     np.abs(VEC[:, :8]) / np.abs(VEC[:, :8]).sum(-1, keepdims=True)),
    ("zcross", lambda: d.ZeroCrossingAnalysis(32),
     lambda x: F.zcross(x, frame_length=32), X),
    ("levdur", lambda: d.LevinsonDurbin(8), F.levdur,
     None),  # filled below
]


def _levdur_input():
    r = np.asarray(F.acorr(jnp.asarray(FRAMES), acr_order=8))
    return r


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_class_equals_functional(case):
    name, mk_class, fn, x = case
    if x is None:
        x = _levdur_input()
    xj = jnp.asarray(x)
    op = mk_class()
    got_cls = op(xj)
    got_fn = fn(xj)
    if isinstance(got_cls, tuple):
        got_cls, got_fn = got_cls[0], got_fn[0]
    U.assert_close(np.asarray(got_cls), np.asarray(got_fn),
                   rtol=1e-12, atol=1e-12,
                   msg=f"class vs functional mismatch for {name}")


SHAPE_CASES = [
    ("stft", lambda x: F.stft(x, frame_length=32, frame_period=16,
                              fft_length=64), X),
    ("mdct", lambda x: F.mdct(x, frame_length=32), X),
    ("alaw", F.alaw, X),
    ("frame", lambda x: F.frame(x, 32, 16), X),
    ("dct", F.dct, FRAMES[0]),
    ("zcross", lambda x: F.zcross(x, frame_length=32), X),
]


@pytest.mark.parametrize("case", SHAPE_CASES, ids=[c[0] for c in SHAPE_CASES])
def test_shape_contract(case):
    name, fn, x = case
    U.check_various_shape(fn, np.asarray(x))
