import jax.numpy as jnp
import numpy as np
import pytest
import torch

import diffsptk_tpu
from tests import utils as U
from tests.oracle import reference

RNG = np.random.default_rng(0)
SR = 16000
FP = 80
FFT = 1024


def _f0_track(n_frames, f0=120.0, voiced=None):
    f0s = np.full(n_frames, f0)
    if voiced is not None:
        f0s[~voiced] = 0.0
    return f0s


@pytest.mark.parametrize("voiced_region", ["pulse", "sinusoidal", "sawtooth",
                                           "inverted-sawtooth", "triangle",
                                           "square", "harmonic-pulse"])
def test_excite_voiced(voiced_region):
    p = np.array([40.0, 40.0, 42.0, 42.0, 44.0, 44.0])
    ours = diffsptk_tpu.ExcitationGeneration(
        16, voiced_region=voiced_region, unvoiced_region="zeros")
    ref = reference.ExcitationGeneration(
        16, voiced_region=voiced_region, unvoiced_region="zeros")
    # float mode: the f32 phase accumulation associates differently on
    # the two sides (~3e-4 relative on sin/cos of the running phase)
    tol = dict(rtol=2e-3, atol=1e-5) if U.DEFAULT_DTYPE == "float" else {}
    U.check_parity(ours, ref, p, **tol)


def test_excite_mixed_voicing():
    # periods chosen so the accumulated phase never lands EXACTLY on an
    # integer at a voicing boundary: that tie is resolved arbitrarily by
    # f64 rounding in any implementation (docs/roadmap.md "phase-wrap
    # ties"), and p=40 with 32-sample regions used to flip a pulse by
    # one sample depending on XLA fusion state
    p = np.array([41.0, 41.0, 0.0, 0.0, 53.0, 53.0])
    ours = diffsptk_tpu.ExcitationGeneration(16, unvoiced_region="zeros")
    ref = reference.ExcitationGeneration(16, unvoiced_region="zeros")
    U.check_parity(ours, ref, p)


def test_cheaptrick_parity(data_wav):
    x = np.asarray(data_wav)[:4800]
    n_frames = len(x) // FP
    f0 = _f0_track(n_frames, 120.0)
    ours = diffsptk_tpu.PitchAdaptiveSpectralAnalysis(FP, SR, FFT)
    ref = reference.PitchAdaptiveSpectralAnalysis(FP, SR, FFT)
    sp_ours = np.asarray(ours(U.to_jax(x), U.to_jax(f0)))
    with torch.no_grad():
        sp_ref = ref(U.to_torch(x), U.to_torch(f0)).numpy()
    if U.DEFAULT_DTYPE == "float":
        # at f32 both sides sit ~6 dB from the f64 truth in low-power
        # bins (cancellation-prone chain; f64 parity is exact) — compare
        # normalized per frame (see test_enum_grid._envelope_close_f32)
        rel = np.abs(sp_ours - sp_ref) / sp_ref.max(axis=-1, keepdims=True)
        assert np.percentile(rel, 99) < 0.1, np.percentile(rel, 99)
        r = np.corrcoef(sp_ours.ravel(), sp_ref.ravel())[0, 1]
        assert r > 0.99, r
    else:
        np.testing.assert_allclose(sp_ours, sp_ref, rtol=1e-4, atol=1e-7)


@pytest.mark.parametrize("algorithm", ["tandem", "d4c"])
def test_aperiodicity_parity(algorithm, data_wav):
    x = np.asarray(data_wav)[:4800]
    n_frames = len(x) // FP
    f0 = _f0_track(n_frames, 120.0)
    ours = diffsptk_tpu.Aperiodicity(FP, SR, FFT, algorithm=algorithm)
    ref = reference.Aperiodicity(FP, SR, FFT, algorithm=algorithm)
    ap_ours = np.asarray(ours(U.to_jax(x), U.to_jax(f0)))
    with torch.no_grad():
        ap_ref = ref(U.to_torch(x), U.to_torch(f0)).numpy()
    if algorithm == "tandem":
        np.testing.assert_allclose(ap_ours, ap_ref, rtol=1e-4, atol=1e-5)
    else:
        # D4C dithers the windowed waveform with 1e-6 noise by design
        # (ap.py:563); RNG differs, so allow a small absolute band.  In
        # float mode the coarse aperiodicity's tail bins are f32
        # cancellation noise on BOTH sides (log of a tiny top-k
        # residual): bound the bulk and the correlation instead
        # (measured p95 0.043, corr 0.995).
        if U.DEFAULT_DTYPE == "float":
            d = np.abs(ap_ours - ap_ref)
            assert np.percentile(d, 95) < 0.1, np.percentile(d, 95)
            r = np.corrcoef(ap_ours.ravel(), ap_ref.ravel())[0, 1]
            assert r > 0.99, r
        else:
            np.testing.assert_allclose(ap_ours, ap_ref, atol=2e-2)
            r = np.corrcoef(ap_ours.ravel(), ap_ref.ravel())[0, 1]
            assert r > 0.999, r


def test_world_synth_periodic_close_to_reference():
    # fully voiced, tiny aperiodicity -> noise contribution negligible,
    # so ours and the reference should match closely despite RNG.
    # f0 is chosen so no phase wrap lands exactly on a sample boundary
    # (120 Hz puts every 3rd pulse on an exact tie at period 400/3,
    # where f64-rounding noise resolves the wrap sample arbitrarily in
    # ANY implementation).
    n_frames = 30
    f0 = _f0_track(n_frames, 123.4)
    D = FFT // 2 + 1
    sp = np.exp(-np.linspace(0, 6, D))[None, :].repeat(n_frames, 0) * 1e-2
    ap = np.full((n_frames, D), 0.001)
    ours = diffsptk_tpu.WorldSynthesis(FP, SR, FFT)
    ref = reference.WorldSynthesis(FP, SR, FFT)
    y_ours = np.asarray(ours(U.to_jax(f0), U.to_jax(ap), U.to_jax(sp)))
    with torch.no_grad():
        y_ref = ref(U.to_torch(f0), U.to_torch(ap), U.to_torch(sp)).numpy()
    r = np.corrcoef(y_ours, y_ref)[0, 1]
    assert r > 0.999, r


def test_yin_pitch_on_sine():
    t = np.arange(SR) / SR
    freq = 150.0
    x = np.sin(2 * np.pi * freq * t)
    pitch = diffsptk_tpu.Pitch(FP, SR, algorithm="yin", out_format="f0")
    f0 = np.asarray(pitch(U.to_jax(x)))
    mid = f0[10:-10]
    assert np.all(mid > 0)
    assert np.max(np.abs(mid - freq)) < 2.0, mid


def test_yin_unvoiced_on_noise():
    x = RNG.standard_normal(SR // 2) * 0.1
    pitch = diffsptk_tpu.Pitch(FP, SR, algorithm="yin", out_format="f0")
    f0 = np.asarray(pitch(U.to_jax(x)))
    assert np.mean(f0 == 0) > 0.6  # mostly unvoiced


@pytest.fixture(scope="module")
def world_inputs(data_wav):
    """(x, f0, sp, ap) for data.wav: YIN f0 + CheapTrick + D4C."""
    x = np.asarray(data_wav)
    n_frames = len(x) // FP
    pitch = diffsptk_tpu.Pitch(FP, SR, algorithm="yin", out_format="f0")
    f0 = pitch(U.to_jax(x))[:n_frames]
    sp = diffsptk_tpu.PitchAdaptiveSpectralAnalysis(FP, SR, FFT)(
        U.to_jax(x), f0)
    ap = diffsptk_tpu.Aperiodicity(FP, SR, FFT, algorithm="d4c")(
        U.to_jax(x), f0)
    return x, f0, sp, ap


def test_world_synth_waveform_parity(world_inputs):
    """Full-speech waveform parity vs the PyTorch reference, mirroring the
    reference's own acceptance bar corr > 0.95 vs SPTK
    (/root/reference/tests/test_world_synth.py:46).

    Both syntheses consume the same per-pulse noise matrix (the reference
    draws one torch.randn_like of shape (n_pulses, L); our slot table is
    the same rows padded to Pmax), isolating the synthesis math from RNG
    realization.  The f64 path places every voiced pulse on the same
    sample as the reference's f64 phase cumsum (int64 2^52 fixed point);
    only exact phase-wrap ties in the default-f0 unvoiced region can
    land one sample apart, which decorrelates those noise-only spans.
    """
    import torch as _torch

    x, f0, sp, ap = world_inputs
    noise = np.random.default_rng(7).standard_normal((4000, FFT))

    class FixedNoiseSynth(diffsptk_tpu.WorldSynthesis):
        def _slot_noise(self, time_index, span, batch_offset, length,
                        dtype):
            B, Pmax = time_index.shape
            return jnp.asarray(noise[:Pmax, :length], dtype)[None].repeat(
                B, 0)

    def fixed_randn_like(t):
        n, L = t.shape
        return _torch.from_numpy(noise[:n, :L].copy()).to(t.dtype)

    y_ours = np.asarray(FixedNoiseSynth(FP, SR, FFT)(
        f0, ap, sp, out_length=len(x)))
    orig = _torch.randn_like
    _torch.randn_like = fixed_randn_like
    try:
        with _torch.no_grad():
            y_ref = reference.WorldSynthesis(FP, SR, FFT)(
                U.to_torch(np.asarray(f0)), U.to_torch(np.asarray(ap)),
                U.to_torch(np.asarray(sp)), out_length=len(x)).numpy()
    finally:
        _torch.randn_like = orig

    r = np.corrcoef(y_ours, y_ref)[0, 1]
    assert r > 0.95, r

    # voiced samples (periodic-dominated) agree much more tightly
    n_frames = len(x) // FP
    f_min = SR / FFT + 1
    cvuv = (np.where(np.asarray(f0) < f_min, 0.0, np.asarray(f0))
            > 0).astype(np.float64)
    t = np.arange(n_frames * FP)
    i0 = np.minimum(t // FP, n_frames - 1)
    i1 = np.minimum(i0 + 1, n_frames - 1)
    wt = (t % FP) / FP
    vuv = (cvuv[i0] * (1 - wt) + cvuv[i1] * wt) > 0.5
    rv = np.corrcoef(y_ours[vuv], y_ref[vuv])[0, 1]
    assert rv > 0.98, rv


def test_world_chain_roundtrip(world_inputs):
    """Config #4: f0 (YIN) + CheapTrick + D4C -> WorldSynthesis; check the
    result resembles the input (correlation of envelopes)."""
    x, f0, sp, ap = world_inputs
    y = diffsptk_tpu.WorldSynthesis(FP, SR, FFT)(f0, ap, sp,
                                                 out_length=len(x))
    y = np.asarray(y)
    assert np.all(np.isfinite(y))
    # compare smoothed energy envelopes
    import diffsptk_tpu.functional as F
    ex = np.asarray(F.stft(U.to_jax(x), frame_length=400, frame_period=80,
                           fft_length=512)).sum(-1)
    ey = np.asarray(F.stft(U.to_jax(y), frame_length=400, frame_period=80,
                           fft_length=512)).sum(-1)
    r = np.corrcoef(np.log(ex + 1e-8), np.log(ey + 1e-8))[0, 1]
    assert r > 0.8, r


def test_straight_envelope(data_wav):
    """STRAIGHT envelope: shape/finiteness + agreement with CheapTrick
    (no pylstraight in this image; the reference itself only checks
    rtol=1e-1 against it — tests/test_pitch_spec.py:62-96)."""
    import jax

    x = np.asarray(data_wav)
    L = 2048
    n_frames = len(x) // FP
    voiced = np.zeros(n_frames, bool)
    voiced[40:180] = True
    f0 = _f0_track(n_frames, 120.0, voiced)

    straight = diffsptk_tpu.PitchAdaptiveSpectralAnalysis(
        FP, SR, L, algorithm="straight", out_format="db")
    sp = np.asarray(straight(U.to_jax(x), U.to_jax(f0)))
    assert sp.shape == (n_frames, L // 2 + 1)
    assert np.isfinite(sp).all()

    cheap = diffsptk_tpu.PitchAdaptiveSpectralAnalysis(
        FP, SR, L, algorithm="cheap-trick", out_format="db")
    spc = np.asarray(cheap(U.to_jax(x), U.to_jax(f0)))
    a = sp[voiced].ravel()
    b = spc[voiced].ravel()
    r = np.corrcoef(a, b)[0, 1]
    assert r > 0.97, r
    assert abs(a.mean() - b.mean()) < 3.0  # dB level agreement

    # Gradients flow through the waveform, not through F0.
    g = jax.grad(lambda xx: jnp.sum(straight(xx, U.to_jax(f0))))(U.to_jax(x))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
    gf = jax.grad(lambda ff: jnp.sum(straight(U.to_jax(x), ff)))(
        U.to_jax(f0 + 0.1))
    assert float(jnp.abs(gf).max()) == 0
