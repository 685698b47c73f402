"""STRAIGHT spectral-envelope extraction
(reference: diffsptk/modules/pitch_spec.py:324-572).

Kawahara's pitch-adaptive time-frequency smoothing [Kawahara et al. 1999].
All design-time constants (Butterworth band splits, pitch-synchronous
Gaussian-Bartlett window seed, smoothing/compensation coefficients) are
built host-side in float64; the per-frame pipeline is pure XLA (FFTs,
gathers, elementwise) so it jits onto the MXU/VPU.

The reference obtains the over-smoothing compensation coefficients ``ovc``
from ``pylstraight.core.sp.optimumsmoothing`` (pitch_spec.py:413).  That
package is not a dependency here; ``optimum_smoothing`` below re-derives
the coefficients from first principles — a least-squares fit that minimizes
the combined time-frequency ripple of the smoothed pulse-train spectrogram,
which is exactly the criterion Kawahara's paper states.  Pass ``ovc=``
explicitly to reproduce another implementation bit-for-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import to_device_array
from ..kernels.recurrence import lfilter
from .world_common import frames_matching_f0

TAU = 2 * np.pi


@functools.lru_cache(maxsize=None)
def optimum_smoothing_system(eta: float = 1.0, pc: float = 0.6):
    """The (A, b) least-squares system behind ``optimum_smoothing``.

    Exposed so tests can verify first-order optimality of the solved
    coefficients and the quality of the envelope reconstruction
    (tests/test_straight_ovc.py) — the re-derivation replaces
    pylstraight.core.sp.optimumsmoothing (reference pitch_spec.py:413),
    which is not importable in this image."""
    return _ovc_system(eta, pc)


@functools.lru_cache(maxsize=None)
def optimum_smoothing(eta: float = 1.0, pc: float = 0.6) -> tuple:
    """Optimum smoothing-compensation coefficients (length 4).

    The STRAIGHT second stage reconstructs the spectral envelope from a
    harmonically sampled, window-blurred spectrum by smoothing with a
    mixture of triangular kernels displaced by 0..3 harmonics.  The
    displaced terms compensate the over-smoothing (analysis-window blur +
    piecewise-linear interpolation); Kawahara et al. 1999 define the
    mixture as the least-squares-optimal envelope reconstructor.

    This derives the coefficients by direct simulation in normalized units
    (f0 = 1): synthesize harmonic signals with random smooth non-flat
    envelopes, run the exact analysis pipeline (eta-stretched
    Gaussian-Bartlett window pair, power ``pc`` compression, sinc(3q)^2
    pre-smoother) over all window phases, and solve the linear
    least-squares problem for the kernel mixture that best recovers the
    true compressed envelope.  Non-flat envelopes are essential: for a
    flat envelope the displaced triangles partition unity and the problem
    is degenerate in everything but the coefficient sum.
    """
    A, b = _ovc_system(eta, pc)
    ovc, *_ = np.linalg.lstsq(A, b, rcond=None)
    return tuple(float(v) for v in ovc)


@functools.lru_cache(maxsize=None)
def _ovc_system(eta: float, pc: float):
    rng = np.random.RandomState(0)
    df = 1.0 / 32.0                 # frequency resolution (f0 units)
    F = 16.0                        # frequency extent
    K = 6                           # pulses each side of the window
    R = 16                          # window phases per period
    n_env = 12                      # random envelopes

    # Window seed: Gaussian (temporal stretch eta) (*) Bartlett
    # (the wPSGSeed of pitch_spec.py:382-391), continuous normalized time.
    tfine = np.arange(-K, K + 1e-12, 1.0 / 256.0)
    gauss = np.exp(-np.pi * (tfine / eta) ** 2)
    bart = np.maximum(0.0, 1.0 - np.abs(tfine))
    seed = np.convolve(gauss, bart, mode="same")
    seed /= seed.max()

    t0 = np.arange(R) / R
    k = np.arange(-K, K + 1)
    tk = k[None, :] - t0[:, None]                # (R, 2K+1) pulse times
    we = np.interp(tk, tfine, seed, left=0.0, right=0.0)
    we = we / np.sqrt((we**2).sum(-1, keepdims=True))
    wd = 0.36 * we * np.sin(np.pi * tk)

    f = np.arange(0.0, F, df)                    # (Nf,)
    # Harmonic amplitudes a_h (h = 1..H) from a smooth log-envelope; the
    # windowed analysis sees  X(f,t0) = sum_h a_h w(h-th?) ... computed as
    # sum over pulses is only valid for flat envelopes, so build from the
    # harmonic model: x(t) = sum_h a_h cos(2 pi h t).
    H = int(F) + K
    hh = np.arange(1, H + 1)
    tri = np.maximum(0.0, 1.0 - np.abs(f[:, None] - hh[None, :]))

    def tri_kernel(width):
        n = int(round(width / df))
        kern = 1.0 - np.abs(np.arange(-n, n + 1)) / n
        return kern / kern.sum()

    def conv_f(z, kern):
        pad = len(kern) // 2
        zp = np.pad(z, [(0, 0), (pad, pad)], mode="edge")
        return np.stack([np.convolve(zp[i], kern, mode="valid")
                         for i in range(z.shape[0])])

    k3 = tri_kernel(3.0)
    k1 = tri_kernel(1.0)
    shift = int(round(1.0 / df))
    lo, hi = int(5.0 / df), int(11.0 / df)       # interior band, edge-safe

    rows, tgts = [], []
    for _ in range(n_env):
        # Smooth positive envelope: random low-order cosine log-envelope.
        nc = 3
        coef = rng.randn(nc) * 0.8
        loga = sum(c * np.cos(2 * np.pi * (i + 1) * hh / (2.2 * H))
                   for i, c in enumerate(coef))
        a = np.exp(loga)
        env_f = np.exp(sum(c * np.cos(2 * np.pi * (i + 1) * f / (2.2 * H))
                           for i, c in enumerate(coef)))

        # Windowed spectra over all phases: X(f, t0) =
        # sum_h a_h/2 [W(f-h) e^{i phi} + W(f+h) e^{-i phi}] with the
        # window's FT evaluated by direct sums over its samples.
        dt = 1.0 / 64.0
        ts = np.arange(-K, K + dt / 2, dt)       # (Nt,)
        # Fixed frame-centered window pair; the signal phase varies.
        wet = np.interp(ts, tfine, seed, left=0, right=0)
        wet = wet / np.sqrt((wet**2).sum() * dt)
        wdt = 0.36 * wet * np.sin(np.pi * ts)
        # signal segments at each phase offset: x(ts + t0)
        sigs = np.stack([(a[None, :] * np.cos(2 * np.pi * hh[None, :]
                                              * (ts + o)[:, None])).sum(-1)
                         for o in t0])           # (R, Nt)
        ph = np.exp(-2j * np.pi * f[None, :] * ts[:, None])   # (Nt, Nf)
        Xe = (wet * sigs) @ ph * dt
        Xd = (wdt * sigs) @ ph * dt
        pw = (np.abs(Xe) ** 2 + np.abs(Xd) ** 2) ** (pc / 2)

        spw2 = conv_f(pw, k3)
        r = pw / np.maximum(spw2, 1e-30)
        C = conv_f(r, k1)
        cols = [C[:, lo:hi]]
        for j in (1, 2, 3):
            cols.append(C[:, lo - j * shift:hi - j * shift]
                        + C[:, lo + j * shift:hi + j * shift])
        rows.append(np.stack([c.ravel() for c in cols], axis=1))
        target = (env_f[None, lo:hi] ** pc
                  / np.maximum(spw2[:, lo:hi], 1e-30))
        tgts.append(target.ravel())

    return np.concatenate(rows, axis=0), np.concatenate(tgts, axis=0)


def _butter_highpass_sos(order: int, fc: float, sample_rate: float):
    """Butterworth highpass as second-order sections.  The reference runs
    the order-6 filter in one direct form, which is why it requires
    float64 (pitch_spec.py:461-462); cascaded biquads are stable in
    float32, so this build runs on the TPU's native dtype."""
    from scipy import signal
    return signal.butter(order, fc / sample_rate * 2, btype="highpass",
                         output="sos")


def _sosfilt(sos: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    for section in sos:
        x = lfilter(section[:3], section[3:], x)
    return x


def _log_2cosh(z: jnp.ndarray) -> jnp.ndarray:
    """log(2 cosh(z)) without overflow: |z| + log1p(exp(-2|z|))."""
    az = jnp.abs(z)
    return az + jnp.log1p(jnp.exp(-2.0 * az))


def _fftfilt(b: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Overlap-free FFT convolution keeping the first ``x.shape[-1]``
    samples (MATLAB fftfilt semantics; pitch_spec.py:450-458)."""
    nb = b.shape[-1]
    nx = x.shape[-1]
    n = 1 << int(np.ceil(np.log2(max(nb + nx - 1, 1))))
    B = jnp.fft.rfft(b, n=n)
    X = jnp.fft.rfft(x, n=n)
    return jnp.fft.irfft(X * B, n=n)[..., :nx]


def _interp1_uniform(x0: float, step: float, y: jnp.ndarray,
                     xq: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation on a uniform grid with linear extrapolation
    (MATLAB's '*linear'); y is 1-D design data, xq is batched."""
    z = (xq - x0) / step
    idx = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, y.shape[-1] - 2)
    frac = z - idx
    return y[idx] * (1.0 - frac) + y[idx + 1] * frac


class SpectrumExtractionBySTRAIGHT:
    """STRAIGHT spectral envelope (pitch_spec.py:324-572); returns the
    log power spectrum.  Gradients flow through the waveform, not F0.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> t = jnp.arange(3199.0) / 16000   # T % P != 0 (see Pitch framing)
    >>> x = jnp.sin(2 * jnp.pi * 220 * t)
    >>> f0 = diffsptk_tpu.Pitch(80, 16000, algorithm="yin",
    ...                         out_format="f0", f_min=80, f_max=400)(x)
    >>> ps = diffsptk_tpu.PitchAdaptiveSpectralAnalysis(
    ...     80, 16000, 2048, algorithm="straight")
    >>> ps(x, f0).shape
    (40, 1025)
    """

    def __init__(self, frame_period: int, sample_rate: int, fft_length: int,
                 *, default_f0: float = 160, spectral_exponent: float = 0.6,
                 compensation_factor: float = 0.2, ovc=None,
                 dtype=None) -> None:
        self.frame_period = frame_period
        self.sample_rate = sample_rate
        self.fft_length = fft_length
        self.default_f0 = default_f0
        self.pc = spectral_exponent
        self.mag = compensation_factor

        # Band-split highpass filters: 70 / 300 / 3000 Hz, order 6
        # (pitch_spec.py:351-353), as float32-stable biquad cascades.
        self.sos = [_butter_highpass_sos(6, fc, sample_rate)
                    for fc in (70.0, 300.0, 3000.0)]

        frame_length = sample_rate * 80 // 1000
        if fft_length < frame_length:
            raise ValueError(f"fft_length must be at least {frame_length}.")
        self.frame_length = frame_length

        # Pitch-synchronous Gaussian-Bartlett window seed
        # (pitch_spec.py:377-392).
        tt = (np.arange(frame_length) + (1 - frame_length / 2)) / sample_rate
        self.fNominal = 40.0
        eta = 1.0
        wGaussian = np.exp(-np.pi * (tt * self.fNominal / eta) ** 2)
        wBartlett = 1.0 - np.abs(tt * self.fNominal)
        support = wBartlett[wBartlett > 0]
        wPSGSeed = np.convolve(np.concatenate([wGaussian,
                                               np.zeros(frame_length)]),
                               support)[: 2 * frame_length]
        max_loc = int(np.argmax(wPSGSeed))
        wPSGSeed = wPSGSeed / wPSGSeed[max_loc]
        # Uniform nominal-time grid for '*linear' interpolation.
        self.tN0 = (0 - max_loc) / sample_rate
        self.tNstep = 1.0 / sample_rate
        self.wPSGSeed = to_device_array(wPSGSeed, dtype)
        self.tt = to_device_array(tt, dtype)

        one_sided = fft_length // 2 + 1
        remaining = fft_length - one_sided
        ttm = np.concatenate([np.arange(one_sided),
                              np.arange(remaining) - remaining]) / sample_rate
        ttm[0] = 1e-5 / sample_rate
        self.ttm = to_device_array(ttm, dtype)

        ramp = np.arange(fft_length)
        lft = 1.0 / (1.0 + np.exp(-(np.abs(ramp - fft_length // 2)
                                    - fft_length / 30) / 2))
        self.lft = to_device_array(lft, dtype)

        self.ovc = np.asarray(optimum_smoothing(eta, self.pc)
                              if ovc is None else ovc, np.float64)

        # Unvoiced power-tracking smoother (pitch_spec.py:420-432).
        ncw = round(2 * sample_rate / 1000)
        h3 = np.convolve(np.hanning(ncw // 2 + 2)[1:-1],
                         np.exp(-1400 / sample_rate
                                * np.arange(2 * ncw + 1)))
        self.h3 = to_device_array(h3, dtype)

        ipwm = 7
        ipl = round(ipwm / (frame_period / sample_rate * 1000))
        ww = np.hanning(ipl * 2 + 3)[1:-1]
        self.ww = to_device_array(ww / ww.sum(), dtype)

        hh = np.array([[1, 1, 1, 1],
                       [0, 1 / 2, 2 / 3, 3 / 4],
                       [0, 0, 1 / 3, 2 / 4],
                       [0, 0, 0, 1 / 4]])
        bb = np.linalg.solve(hh, self.ovc)
        cc = np.array([1.0, 4.0, 9.0, 16.0])
        tq = np.arange(one_sided) / sample_rate
        pb2 = (np.pi / eta**2 + np.pi**2 / 3 * np.sum(bb * cc)) * tq**2
        self.pb2 = to_device_array(pb2, dtype)

    def __call__(self, x: jnp.ndarray, f0: jnp.ndarray) -> jnp.ndarray:
        eps = 1e-8
        L = self.fft_length
        one_sided = L // 2 + 1
        sr = self.sample_rate

        xamp = jnp.std(x, axis=-1, keepdims=True)
        scaleconst = 2200.0
        x = jnp.where(xamp < eps, x, x * (scaleconst / (xamp + eps)))
        xh = jnp.stack([_sosfilt(sos, x) for sos in self.sos], axis=-2)

        f0 = jax.lax.stop_gradient(f0)[..., None]
        f0raw = f0
        unvoiced = f0 == 0
        f0 = jnp.where(unvoiced, self.default_f0, f0)
        nframe = f0.shape[-2]

        # row count follows the f0 track (see
        # world_common.frames_matching_f0); Frame would emit
        # (T-1)//P+1 rows, one short when P | T
        tx = frames_matching_f0(xh[..., 0, :], nframe,
                                self.frame_length, self.frame_period,
                                mode="constant", zmean=True)
        ttf = self.tt * f0                                  # (..., N, Lf)

        def safe_div(a, b):
            return a / (b + eps)

        wxe = _interp1_uniform(self.tN0, self.tNstep, self.wPSGSeed,
                               ttf / self.fNominal)
        wxe = safe_div(wxe, jnp.linalg.norm(wxe, axis=-1, keepdims=True))
        wxd = 0.36 * wxe * jnp.sin(jnp.pi * ttf)

        pw = (jnp.abs(jnp.fft.rfft(tx * wxe, n=L)) ** 2
              + jnp.abs(jnp.fft.rfft(tx * wxd, n=L)) ** 2)
        pw = jnp.clip(pw, min=eps) ** (self.pc / 2)

        # Low-band symmetrization below half the fundamental
        # (pitch_spec.py:495-507), static-shape masked form.
        ramp1 = jnp.arange(one_sided, dtype=pw.dtype)
        f0pr = f0 * (L / sr) + 1
        f0p2 = jnp.floor((f0pr + 1) / 2)
        pwxq = f0pr - ramp1                                  # (..., N, K)
        zq = jnp.clip(pwxq - 1.0, 0.0, one_sided - 1.0)
        iq = jnp.clip(jnp.floor(zq).astype(jnp.int32), 0, one_sided - 2)
        fq = zq - iq
        tmppw = (jnp.take_along_axis(pw, iq, axis=-1) * (1 - fq)
                 + jnp.take_along_axis(pw, iq + 1, axis=-1) * fq)
        pw = jnp.where(ramp1 < f0p2, tmppw, pw)

        # Two-stage pitch-adaptive smoothing (pitch_spec.py:509-526).
        ttmf = self.ttm * f0                                 # (..., N, L)
        ww2t = jnp.sinc(3 * ttmf) ** 2
        spw2 = jnp.fft.ihfft(ww2t * jnp.fft.hfft(pw) * self.lft).real
        wwt = jnp.sinc(ttmf) ** 2
        wwt = wwt * (self.ovc[0]
                     + self.ovc[1] * 2 * jnp.cos(TAU * ttmf)
                     + self.ovc[2] * 2 * jnp.cos(2 * TAU * ttmf))
        spw = safe_div(
            jnp.fft.ihfft(wwt * jnp.fft.hfft(safe_div(pw, spw2))
                          * self.lft).real,
            wwt[..., :1])
        spw = jnp.clip(spw, -100.0, 100.0)
        n2sgram = spw2 * (0.175 * _log_2cosh(4 / 1.4 * spw) + 0.5 * spw)
        n2sgram = jnp.clip(n2sgram, min=eps) ** (2 / self.pc)

        # Unvoiced-frame power tracking (pitch_spec.py:528-559).
        h3n = self.h3.shape[-1]
        pwcs = _fftfilt(self.h3,
                        jnp.pad(jnp.abs(xh[..., 1:, :]) ** 2,
                                [(0, 0)] * (xh.ndim - 1) + [(0, 4 * h3n)]))
        end = self.frame_period * nframe
        pwcs = pwcs[..., :end:self.frame_period]
        lbb = round(300 / sr * L) - 1
        numer = jnp.concatenate(
            [jnp.sum(n2sgram[..., lbb:], axis=(-1, -2), keepdims=True),
             jnp.sum(n2sgram, axis=(-1, -2), keepdims=True)], axis=-2)
        denom = jnp.sum(pwcs, axis=-1, keepdims=True)
        pwcs = pwcs * safe_div(numer, denom)
        pwch = pwcs[..., 1, :]

        wwn = self.ww.shape[-1]
        begin = wwn // 2
        apwt = _fftfilt(self.ww, jnp.pad(
            pwch, [(0, 0)] * (pwch.ndim - 1) + [(0, wwn)]))
        apwt = apwt[..., begin:begin + nframe]
        mmaa = jnp.max(apwt, axis=-1, keepdims=True)
        apwt = jnp.where(apwt <= 0, mmaa, apwt)

        dpwt = _fftfilt(self.ww, jnp.pad(
            jnp.diff(pwch, axis=-1) ** 2,
            [(0, 0)] * (pwch.ndim - 1) + [(0, wwn + 1)]))
        # FFT convolution of nonnegative data can round to tiny negatives
        # at float32; the true value is >= 0, so clamp before the sqrt.
        dpwt = jnp.sqrt(jnp.maximum(dpwt[..., begin:begin + nframe], 0.0)
                        + eps)
        rr = jnp.maximum(safe_div(dpwt, apwt), 0.0)
        lmbd = jax.nn.sigmoid((jnp.sqrt(rr) - 0.75) * 20)

        pwc = (lmbd * safe_div(pwcs[..., 0, :], jnp.sum(n2sgram, axis=-1))
               + (1 - lmbd))
        n2sgram = jnp.where(unvoiced, n2sgram * pwc[..., None], n2sgram)
        n2sgram = jnp.sqrt(jnp.abs(n2sgram + eps))

        # Spectral recovery from over-smoothing (pitch_spec.py:562-567).
        if 0 < self.mag:
            ccs2 = (jnp.fft.hfft(n2sgram)[..., :one_sided]
                    * jnp.clip(1 + self.mag * self.pb2 * f0raw**2, max=20.0))
            n2sgram3 = jnp.fft.hfft(ccs2, norm="forward")[..., :one_sided]
            n2sgram = (jnp.abs(n2sgram3) + n2sgram3) / 2 + 0.1

        xamp = xamp[..., None]
        n3sgram = jnp.where(xamp < eps, n2sgram,
                            n2sgram * (xamp / scaleconst))
        return 2 * jnp.log(jnp.abs(n3sgram + eps))
