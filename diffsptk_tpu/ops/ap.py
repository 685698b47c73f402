"""Band aperiodicity extraction: TANDEM-STRAIGHT and D4C
(reference: diffsptk/modules/ap.py:30-670).

TANDEM: per-band QMF decimation (lax.conv, stride 2), f0-dependent
window extraction through the Pallas gather kernel
(kernels/pallas_gather.py), and a 6-tap least-squares periodic fit via
batched batch-minor Cholesky solves.  D4C: static/coarse aperiodicity
from windowed waveforms + log-linear interpolation to fft_length/2+1
bins (a static one-hot matmul).  Static shapes throughout (XLA
requirement).  No gradient flows through F0.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseNonFunctionalOp, to_device_array
from ..kernels.pallas_gather import gather_windows
from ..utils.linalg import spd_solve
from .spec import Spectrum
from .window import design_window
from .world_common import (
    dc_correction,
    get_windowed_waveform,
    linear_smoothing,
)


def _qmf_high() -> np.ndarray:
    h = np.zeros(41)
    vals = [+0.00041447996898231424, +0.00078125051417292477,
            -0.0010917236836275842, -0.0019867925675967589,
            +0.0020903896961562292, +0.0040940570272849346,
            -0.0034025808529816698, -0.0074961541272056016,
            +0.0049722633399330637, +0.012738791249119802,
            -0.0066960326895749113, -0.020694051570247052,
            +0.0084324365650413451, +0.033074383758700532,
            -0.010018936738799522, -0.054231361405808247,
            +0.011293988915051487, +0.10020081367388213,
            -0.012120546202484579, -0.31630021039095702,
            +0.51240682580627639]
    h[:21] = vals
    h[21:] = h[19::-1]
    return h


def _qmf_low() -> np.ndarray:
    h = np.zeros(37)
    vals = [-0.00065488170077483048, +0.00007561994958159384,
            +0.0020408456937895227, -0.00074680535322030437,
            -0.0043502235688264931, +0.0025966428382642732,
            +0.0076396022827566962, -0.0064904118901497852,
            -0.011765804538954506, +0.013649908479276255,
            +0.01636866479016021, -0.026075976030529347,
            -0.020910294856659444, +0.048260725032316647,
            +0.024767846611048111, -0.096178467583360641,
            -0.027359756709866623, +0.31488052161630042,
            +0.52827343594055032]
    h[:19] = vals
    h[19:] = h[17::-1]
    return h


def _conv_stride2(x: jnp.ndarray, h: jnp.ndarray,
                  _block: int = 128) -> jnp.ndarray:
    """Reflection-padded cross-correlation with stride 2 over (B, T).

    Computed as a framed matmul: each block of 128 decimated outputs is
    the (2*128 + k - 1)-sample input span times a banded constant
    matrix W[i, f] = h[i - 2f].  A 1-channel conv1d pads to 1/128th of
    an MXU tile on TPU; this form runs the same FIR at full MXU width
    (~7x more MACs, two orders of magnitude more throughput).
    """
    k = h.shape[0]
    pad = k // 2
    T = x.shape[-1]
    M = (T + 2 * pad - k) // 2 + 1            # ceil(T/2) for odd k
    F = _block
    S = 2 * F + k - 1
    Mb = -(-M // F)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
                 mode="reflect")
    xp = jnp.pad(xp, [(0, 0)] * (x.ndim - 1)
                 + [(0, (Mb + 1) * 2 * F - xp.shape[-1])])
    z1 = xp[..., :Mb * 2 * F].reshape(*x.shape[:-1], Mb, 2 * F)
    z2 = xp[..., 2 * F:(Mb + 1) * 2 * F].reshape(
        *x.shape[:-1], Mb, 2 * F)[..., :k - 1]
    frames = jnp.concatenate([z1, z2], axis=-1)          # (..., Mb, S)
    i = np.arange(S)[:, None] - 2 * np.arange(F)[None, :]
    W = np.where((0 <= i) & (i < k), np.asarray(h, np.float64)[
        np.clip(i, 0, k - 1)], 0.0)
    W = jnp.asarray(W, x.dtype)
    y = (frames @ W).reshape(*x.shape[:-1], Mb * F)
    return y[..., :M]


def _tandem_pad(tmp_fs: float, segment_length: int) -> int:
    """Edge padding covering the worst-case window overhang.

    After the f0 <= 32 -> default replacement, pitch = tmp_fs / f0 is
    bounded by tmp_fs / 32; window starts overhang the band signal by at
    most 1.5 * pitch + segment_length + a few samples on either side.
    """
    return int(1.5 * tmp_fs / 32) + segment_length + 8


def _make_interp(coarse_axis: np.ndarray, fft_length: int,
                 sample_rate: int):
    """Static interpolation design: one-hot selection matrix + weights.

    The coarse->fine mapping is data-independent, so the per-bin
    segment lookup is a (n_seg, n_bins) one-hot matmul — XLA lowers a
    take_along_axis with these (static) indices to a scalarized gather
    that costs ~10ms on the 513-bin WORLD grids.
    """
    freq_axis = np.arange(fft_length // 2 + 1) * (sample_rate / fft_length)
    idx = np.searchsorted(coarse_axis, freq_axis) - 1
    idx = np.clip(idx, 0, len(coarse_axis) - 2)
    x0 = coarse_axis[:-1]
    dx = coarse_axis[1:] - x0
    weights = (freq_axis - np.take(x0, idx)) / np.take(dx, idx)
    select = np.zeros((len(coarse_axis) - 1, len(freq_axis)))
    select[idx, np.arange(len(freq_axis))] = 1.0
    return select, weights


class AperiodicityExtractionByTANDEM:
    """TANDEM-STRAIGHT band aperiodicity."""

    def __init__(self, frame_period: int, sample_rate: int,
                 fft_length: int | None = None, *,
                 window_length_ms: float = 30, eps: float = 1e-5,
                 dtype=None) -> None:
        if window_length_ms <= 0:
            raise ValueError("window_length_ms must be positive.")
        if eps <= 0:
            raise ValueError("eps must be positive.")
        self.frame_period = frame_period
        self.sample_rate = sample_rate
        self.n_band = int(np.log2(sample_rate / 600))
        self.default_f0 = 150

        self.cutoff_list = [sample_rate / 2 ** i
                            for i in range(2, self.n_band + 1)]
        self.cutoff_list.append(self.cutoff_list[-1])

        self.has_interp = fft_length is not None
        if self.has_interp:
            coarse_axis = [sample_rate / 2 ** i
                           for i in range(self.n_band, 0, -1)]
            coarse_axis.insert(0, 0)
            select, weights = _make_interp(
                np.asarray(coarse_axis, np.float64), fft_length,
                sample_rate)
            self.interp_select = to_device_array(select, dtype)
            self.interp_weights = to_device_array(weights, dtype)

        self.segment_length = [int(c * window_length_ms / 500 + 1.5)
                               for c in self.cutoff_list]
        self.ramp = jnp.arange(-1, self.segment_length[0] + 1)
        self.eye = to_device_array(np.eye(6) * eps, dtype)
        self.hHP = to_device_array(_qmf_high(), dtype)
        self.hLP = to_device_array(_qmf_low(), dtype)
        window = np.zeros((self.n_band, self.segment_length[0]))
        for i, s in enumerate(self.segment_length):
            window[i, :s] = np.hanning(s + 2)[1:-1]
        self.window = to_device_array(window, dtype)
        self.window_sqrt = jnp.sqrt(self.window)

    def _interp_bap(self, bap: list[jnp.ndarray]) -> jnp.ndarray:
        bap.append(bap[-1])
        ap = jnp.stack(bap[::-1], axis=-1)                      # (B, N, D)
        if self.has_interp:
            y = jnp.log(ap)
            y0 = y[..., :-1]
            dy = y[..., 1:] - y0
            yi = ((dy @ self.interp_select) * self.interp_weights
                  + y0 @ self.interp_select)
            ap = jnp.exp(yi)
        return ap

    def _merged_bands(self, x: jnp.ndarray, f0: jnp.ndarray,
                      time_axis: jnp.ndarray) -> jnp.ndarray:
        """All-band fast path: the four bands' window extractions, 6-tap
        least-squares fits, and deviation statistics run as ONE gather,
        ONE batched solve, and one reduction set (band as a batch axis;
        each band's segment length J_i is carried by its zero-padded
        window row, with the std counts corrected per band).  Exactly
        the per-band loop's math; sharded callers (band_fix/carry_fix)
        keep the loop."""
        B, N = f0.shape
        nb = self.n_band
        Jmax = self.segment_length[0]
        Wn = Jmax + 2

        xs = []
        lx = x
        for i in range(nb):
            if i < nb - 1:
                xs.append(_conv_stride2(lx, self.hHP))
                lx = _conv_stride2(lx, self.hLP)
            else:
                xs.append(lx)

        segs, starts_all = [], []
        offset = 0
        for i in range(nb):
            tmp_fs = 2 * self.cutoff_list[i]
            pitch = tmp_fs / f0
            t0 = (pitch + 0.5).astype(jnp.int32)
            index_bias = (pitch * 0.5 + 0.5).astype(jnp.int32)
            curr_pos = (time_axis * tmp_fs + 1.5).astype(jnp.int32)[None, :]
            origin = curr_pos - index_bias                      # (B, N)
            J = self.segment_length[i]
            pad = _tandem_pad(tmp_fs, J)
            xp = jnp.pad(xs[i], ((0, 0), (pad, pad)), mode="edge")
            xp = jnp.pad(xp, ((0, 0), (0, Wn)))    # guard for over-reads
            starts_all.append(jnp.concatenate(
                [origin - t0 - 1, origin + t0 - 1, origin],
                axis=-1) + (pad + offset))                      # (B, 3N)
            segs.append(xp)
            offset += xp.shape[-1]
        buf = jnp.concatenate(segs, axis=-1)
        starts = jnp.concatenate(starts_all, axis=-1)           # (B, nb*3N)
        win = gather_windows(buf, starts, Wn)
        win = win.reshape(B, nb, 3, N, Wn)

        cols = [win[:, :, p, :, s:s + Jmax]
                for p in range(2) for s in range(3)]          # 6x(B,nb,N,J)
        X = win[:, :, 2, :, :Jmax]
        w = self.window[None, :, None, :]                     # (1,nb,1,J)
        wc = [w * c for c in cols]
        ent = {}
        for p in range(6):
            for q in range(p, 6):
                ent[(p, q)] = jnp.sum(wc[p] * cols[q], axis=-1)
        R = jnp.stack(
            [jnp.stack([ent[(min(p, q), max(p, q))] for q in range(6)],
                       axis=-1) for p in range(6)], axis=-2)  # (B,nb,N,6,6)
        rhs = jnp.stack([jnp.sum(wc[p] * X, axis=-1)
                         for p in range(6)], axis=-1)         # (B,nb,N,6)
        a = spd_solve(R + self.eye, rhs)
        Ha = sum(a[..., p:p + 1] * cols[p] for p in range(6))

        wsq = self.window_sqrt[None, :, None, :]
        wx = wsq * X
        wxHa = wsq * (X - Ha)
        counts = jnp.asarray(self.segment_length,
                             f0.dtype)[None, :, None]         # (1, nb, 1)
        jmask = (jnp.arange(Jmax)[None, None, None, :]
                 < counts[..., None]).astype(f0.dtype)        # (1,nb,1,J)

        def _std(v):
            # two-pass std over each band's first J_i entries (the
            # single-pass form cancels catastrophically when the fit
            # residual is tiny)
            m = jnp.sum(v, axis=-1, keepdims=True) / counts[..., None]
            d = (v - m) * jmask
            return jnp.sqrt(jnp.sum(d * d, axis=-1) / (counts - 1))

        bap_b = _std(wxHa) / (_std(wx) + 1e-16)               # (B, nb, N)
        return self._interp_bap([bap_b[:, i] for i in range(nb)])

    def __call__(self, x: jnp.ndarray, f0: jnp.ndarray,
                 n_offset=0, band_bases=None, band_fix=None,
                 carry_fix=None) -> jnp.ndarray:
        """``n_offset``: global index of local frame 0; ``band_bases``:
        per-band origin of ``x``'s local block in global band
        coordinates (both 0 for the unsharded path); ``band_fix``: an
        optional ``(xb, i) -> xb`` hook applied to each band signal
        (sharded callers overwrite halo samples beyond the global signal
        edges with the boundary value, reproducing the elementwise index
        clamp).  All window positions are global-frame-derived, so the
        math is identical across shardings."""
        merged = (band_bases is None and band_fix is None
                  and carry_fix is None)
        if band_bases is None:
            band_bases = [0] * self.n_band
        f0 = jax.lax.stop_gradient(
            jnp.where(f0 <= 32, self.default_f0, f0))
        B, N = f0.shape
        time_axis = (jnp.arange(N) + n_offset).astype(f0.dtype) * (
            self.frame_period / self.sample_rate)
        if merged:
            return self._merged_bands(x, f0, time_axis)

        bap = []
        lx = x
        for i in range(self.n_band):
            if i < self.n_band - 1:
                hx = _conv_stride2(lx, self.hHP)
                lx = _conv_stride2(lx, self.hLP)
                if carry_fix is not None:
                    # sharded callers re-mirror the halo beyond the
                    # global signal edges at every decimation level:
                    # the right-edge mirror center is a half-integer in
                    # decimated coordinates, so a base-level reflect
                    # fill does NOT equal the per-level reflect padding
                    # the unsharded cascade applies
                    hx = carry_fix(hx, i + 1)
                    lx = carry_fix(lx, i + 1)
                xb = hx
            else:
                xb = lx
            if band_fix is not None:
                xb = band_fix(xb, i)

            tmp_fs = 2 * self.cutoff_list[i]
            pitch = tmp_fs / f0
            t0 = (pitch + 0.5).astype(jnp.int32)
            index_bias = (pitch * 0.5 + 0.5).astype(jnp.int32)
            curr_pos = ((time_axis * tmp_fs + 1.5).astype(jnp.int32)
                        - band_bases[i])[None, :]
            origin = curr_pos - index_bias                      # (B, N)

            J = self.segment_length[i]
            # One fused window gather per band (Pallas kernel on TPU).
            # Edge-padding the band signal reproduces the reference's
            # elementwise index clamp (ap.py:310-360) exactly: clamped
            # reads return x[0]/x[-1], which is what replicate-pad
            # windows contain.
            pad = _tandem_pad(tmp_fs, J)
            xp = jnp.pad(xb, ((0, 0), (pad, pad)), mode="edge")
            starts = jnp.concatenate(
                [origin - t0 - 1, origin + t0 - 1, origin],
                axis=-1) + pad                                  # (B, 3N)
            win = gather_windows(xp, starts, J + 2)             # (B, 3N, J+2)

            # Design matrix H = 6 shifted copies of the two gathered
            # windows; never materialized — R = HᵀWH, rhs = HᵀWX, and
            # Ha are lane reductions over J, which the VPU handles at
            # full width (tiny batched (6,J)x(J,6) matmuls waste the
            # MXU on tile padding).
            cols = [win[:, p * N:(p + 1) * N, s:s + J]
                    for p in range(2) for s in range(3)]        # 6x (B,N,J)
            X = win[:, 2 * N:, :J]                              # (B, N, J)
            w = self.window[i, :J]
            wc = [w * c for c in cols]
            ent = {}
            for p in range(6):
                for q in range(p, 6):
                    ent[(p, q)] = jnp.sum(wc[p] * cols[q], axis=-1)
            R = jnp.stack(
                [jnp.stack([ent[(min(p, q), max(p, q))]
                            for q in range(6)], axis=-1)
                 for p in range(6)], axis=-2)                   # (B, N, 6, 6)
            rhs = jnp.stack([jnp.sum(wc[p] * X, axis=-1)
                             for p in range(6)], axis=-1)       # (B, N, 6)
            a = spd_solve(R + self.eye, rhs)                    # (B, N, 6)
            Ha = sum(a[..., p:p + 1] * cols[p] for p in range(6))

            wsqrt = self.window_sqrt[i, :J]
            wx = wsqrt * X
            wxHa = wsqrt * (X - Ha)
            denom = jnp.std(wx, axis=-1, ddof=1)
            numer = jnp.std(wxHa, axis=-1, ddof=1)
            bap.append(numer / (denom + 1e-16))

        return self._interp_bap(bap)


class AperiodicityExtractionByD4C:
    """D4C band aperiodicity (Morise 2016)."""

    def __init__(self, frame_period: int, sample_rate: int,
                 fft_length: int | None = None, *, threshold: float = 0,
                 default_f0: float = 150, f0_ceil: float = 1200.0,
                 dtype=None) -> None:
        if sample_rate < 12000:
            raise ValueError("sample_rate must be at least 12000 Hz.")
        if threshold < 0:
            raise ValueError("threshold must be non-negative.")
        if default_f0 <= 0:
            raise ValueError("default_f0 must be positive.")
        self.frame_period = frame_period
        self.sample_rate = sample_rate
        self.threshold = threshold
        self.default_f0 = default_f0
        self.f0_ceil = max(f0_ceil, default_f0)

        frequency_interval = 3000
        upper_limit = 15000
        floor_f0 = 47
        self.lowest_f0 = 40

        self.fft_length_love = 2 ** (
            1 + int(np.log(3 * sample_rate / self.lowest_f0 + 1)
                    / np.log(2)))
        self.fft_length_d4c = 2 ** (
            1 + int(np.log(4 * sample_rate / floor_f0 + 1) / np.log(2)))

        n_ap = int(min(upper_limit, sample_rate / 2 - frequency_interval)
                   / frequency_interval)
        window_length = (frequency_interval * self.fft_length_d4c
                         // sample_rate * 2 + 1)
        half = window_length // 2
        padded = self.fft_length_d4c // 2 + 1
        win = design_window(window_length, "nuttall", norm="none")
        windows = []
        for i in range(1, n_ap + 1):
            center = frequency_interval * i * self.fft_length_d4c // sample_rate
            left = center - half
            right = center + half + 1
            windows.append(np.pad(win, (left, padded - right)))
        self.windows = to_device_array(np.stack(windows), dtype)
        self.window_length = window_length

        self.has_interp = fft_length is not None
        if self.has_interp:
            coarse_axis = np.arange(n_ap + 2, dtype=np.float64) \
                * frequency_interval
            coarse_axis[-1] = sample_rate / 2
            select, weights = _make_interp(coarse_axis, fft_length,
                                           sample_rate)
            self.interp_select = to_device_array(select, dtype)
            self.interp_weights = to_device_array(weights, dtype)

        self.spec_love = Spectrum(self.fft_length_love)
        self.spec_d4c = Spectrum(self.fft_length_d4c)
        self.ramp = jnp.arange(self.fft_length_d4c)
        rate_d4c = sample_rate / self.fft_length_d4c
        self.max_boundary = int(self.f0_ceil / rate_d4c) + 2

    def __call__(self, x: jnp.ndarray, f0: jnp.ndarray) -> jnp.ndarray:
        eps = 1e-12
        f0 = jax.lax.stop_gradient(
            jnp.where(f0 < self.lowest_f0, self.default_f0, f0))[..., None]
        f0 = jnp.minimum(f0, self.f0_ceil)

        # D4CLoveTrain()
        if 0 < self.threshold:
            waveform = get_windowed_waveform(
                x, f0, 3, 0, self.frame_period, self.sample_rate,
                self.fft_length_love, "blackman", False, 1e-6, self.ramp)
            ps = self.spec_love(waveform)
            rate = self.sample_rate / self.fft_length_love
            b0 = math.ceil(100 / rate) + 1
            b1 = math.ceil(4000 / rate)
            b2 = math.ceil(7900 / rate)
            ps = jnp.cumsum(ps[..., b0:], axis=-1)
            aperiodicity0 = (ps[..., b1 - b0] / ps[..., b2 - b0])[..., None]

        # GetStaticCentroid()
        from ..kernels import mxu_fft

        def get_centroid(bias_ratio):
            waveform = get_windowed_waveform(
                x, f0, 4, bias_ratio, self.frame_period, self.sample_rate,
                self.fft_length_d4c, "blackman", False, 1e-6, self.ramp)
            power = jnp.sum(jnp.square(waveform), axis=-1, keepdims=True)
            waveform = waveform / jnp.sqrt(power)
            # Position ramp inside the window: the reference's
            # cumsum(waveform != 0) counts 1-based positions over the
            # (contiguous) window support; the dither (eps=1e-6) makes
            # every in-window sample nonzero a.s., so the closed form
            # from the window geometry replaces a slow minor-axis cumsum.
            half = jnp.round(2.0 * self.sample_rate / f0)
            bias = jnp.round(bias_ratio * self.sample_rate / f0)
            base = (self.ramp[:self.fft_length_d4c] - bias
                    - self.fft_length_d4c // 2)
            mask = (-half <= base) & (base <= half)
            pos = (base + half + 1) * mask
            s1 = mxu_fft.rfft(waveform, self.fft_length_d4c)
            s2 = mxu_fft.rfft(waveform * pos.astype(waveform.dtype),
                              self.fft_length_d4c)
            return s1.real * s2.real + s1.imag * s2.imag

        static_centroid = get_centroid(-0.25) + get_centroid(0.25)
        static_centroid = dc_correction(static_centroid, f0,
                                        self.sample_rate,
                                        self.fft_length_d4c, self.ramp,
                                        max_bins=self.max_boundary)

        # GetSmoothedPowerSpectrum()
        waveform = get_windowed_waveform(
            x, f0, 4, 0, self.frame_period, self.sample_rate,
            self.fft_length_love, "hanning", False, 1e-6, self.ramp)
        power_spectrum = self.spec_d4c(waveform)
        power_spectrum = dc_correction(power_spectrum, f0, self.sample_rate,
                                       self.fft_length_d4c, self.ramp,
                                       max_bins=self.max_boundary)
        smoothed = linear_smoothing(power_spectrum, f0, self.sample_rate,
                                    self.fft_length_d4c, self.ramp,
                                    self.max_boundary)

        # GetStaticGroupDelay()
        sgd = static_centroid / (smoothed + eps)
        sgd = linear_smoothing(sgd, f0 / 2, self.sample_rate,
                               self.fft_length_d4c, self.ramp,
                               self.max_boundary)
        smoothed_gd = linear_smoothing(sgd, f0, self.sample_rate,
                                       self.fft_length_d4c, self.ramp,
                                       self.max_boundary)
        sgd = sgd - smoothed_gd

        # GetCoarseAperiodicity() — the reference sorts the spectrum and
        # reads a tail cumsum (ap.py:~620); only the top (boundary+1)
        # peak mass is actually needed, and top_k is far cheaper than a
        # full sort on TPU.
        boundary = round(self.fft_length_d4c * 8 / self.window_length)
        ps = self.spec_d4c(sgd[..., None, :] * self.windows)
        total = jnp.sum(ps, axis=-1)
        peaks, _ = jax.lax.top_k(ps, boundary + 1)
        numer = jnp.maximum(total - jnp.sum(peaks, axis=-1), 1e-30)
        coarse = 10 * jnp.log10(numer / total)
        coarse = jnp.clip(coarse + (f0 - 100) / 50, max=-eps)

        # GetAperiodicity()
        y = coarse
        if self.has_interp:
            pad = [(0, 0)] * (y.ndim - 1)
            y = jnp.pad(y, pad + [(1, 0)], constant_values=-60.0)
            y = jnp.pad(y, pad + [(0, 1)], constant_values=-eps)
            y0 = y[..., :-1]
            dy = y[..., 1:] - y0
            y = ((dy @ self.interp_select) * self.interp_weights
                 + y0 @ self.interp_select)
        aperiodicity = 10 ** (y / 20)

        if 0 < self.threshold:
            aperiodicity = jnp.where(aperiodicity0 <= self.threshold,
                                     1 - eps, aperiodicity)
        return aperiodicity


class Aperiodicity(BaseNonFunctionalOp):
    """(waveform (B?, T), f0 in Hz (B?, T/P)) -> aperiodicity
    (B?, T/P, L/2+1) (or band aperiodicity when fft_length is None).

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> t = jnp.arange(3199.0) / 16000   # T % P != 0 (see Pitch framing)
    >>> x = jnp.sin(2 * jnp.pi * 220 * t)
    >>> f0 = diffsptk_tpu.Pitch(80, 16000, algorithm="yin",
    ...                         out_format="f0", f_min=80, f_max=400)(x)
    >>> A = diffsptk_tpu.Aperiodicity(80, 16000, 1024,
    ...                               algorithm="tandem")(x, f0)
    >>> A.shape
    (40, 513)
    """

    def __init__(self, frame_period: int, sample_rate: int,
                 fft_length: int | None = None, algorithm: str = "tandem",
                 out_format: str | int = "a", lower_bound: float = 0.001,
                 upper_bound: float = 0.999, **kwargs) -> None:
        if frame_period <= 0:
            raise ValueError("frame_period must be positive.")
        if sample_rate < 8000:
            raise ValueError("sample_rate must be at least 8000 Hz.")
        if fft_length is not None and fft_length < 16:
            raise ValueError("fft_length must be at least 16.")
        if not 0 <= lower_bound < upper_bound <= 1:
            raise ValueError("Invalid lower_bound and upper_bound.")
        self.lower_bound = lower_bound
        self.upper_bound = upper_bound

        if algorithm == "tandem":
            self.extractor = AperiodicityExtractionByTANDEM(
                frame_period, sample_rate, fft_length, **kwargs)
        elif algorithm == "d4c":
            self.extractor = AperiodicityExtractionByD4C(
                frame_period, sample_rate, fft_length, **kwargs)
        else:
            raise ValueError(f"algorithm {algorithm} is not supported.")

        if out_format in (0, "a"):
            self.convert = lambda ap: ap
        elif out_format in (1, "p"):
            self.convert = lambda ap: 1 - ap
        elif out_format in (2, "a/p"):
            self.convert = lambda ap: ap / (1 - ap)
        elif out_format in (3, "p/a"):
            self.convert = lambda ap: (1 - ap) / ap
        else:
            raise ValueError(f"out_format {out_format} is not supported.")

    def __call__(self, x: jnp.ndarray, f0: jnp.ndarray) -> jnp.ndarray:
        one_d = x.ndim == 1
        if one_d:
            x = x[None]
            f0 = f0[None]
        ap = self.extractor(x, f0)
        ap = jnp.clip(ap, self.lower_bound, self.upper_bound)
        ap = self.convert(ap)
        if one_d:
            ap = ap[0]
        return ap
