"""Pitch-adaptive spectral envelope estimation (CheapTrick)
(reference: diffsptk/modules/pitch_spec.py:30-304).

F0-adaptive Hann window -> power spectrum -> DC correction -> linear
smoothing -> liftering with compensation.  Gradients flow through the
waveform but not F0 (stop_gradient), matching the reference.  STRAIGHT
lives in straight.py (reference: pitch_spec.py:324-572).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseNonFunctionalOp, to_device_array
from .spec import Spectrum
from .world_common import (
    TAU,
    dc_correction,
    get_windowed_waveform,
    linear_smoothing,
)


@functools.lru_cache(maxsize=8)
def _dither_table(n: int, d: int) -> np.ndarray:
    return np.abs(np.random.default_rng(1)
                  .standard_normal((n, d))).astype(np.float32)


class SpectrumExtractionByCheapTrick:
    """CheapTrick spectral envelope (Morise 2015)."""

    def __init__(self, frame_period: int, sample_rate: int, fft_length: int,
                 *, default_f0: float = 500, q1: float = -0.15,
                 eps: float = 0, relative_floor: float | None = None,
                 f0_ceil: float = 1200.0, dtype=None) -> None:
        self.frame_period = frame_period
        self.sample_rate = sample_rate
        self.fft_length = fft_length

        # GetF0FloorForCheapTrick()
        self.f_min = 3 * sample_rate / (fft_length - 3)
        if default_f0 < self.f_min:
            raise ValueError(f"default_f0 must be at least {self.f_min}.")
        min_fft_length = 2 ** (
            1 + int(np.log(3 * sample_rate / self.f_min + 1) / np.log(2)))
        if fft_length < min_fft_length:
            raise ValueError(f"fft_length must be at least {min_fft_length}.")

        self.q1 = q1
        self.default_f0 = default_f0
        self.f0_ceil = max(f0_ceil, default_f0)
        rate = sample_rate / fft_length
        self.max_boundary = int(self.f0_ceil * (2 / 3) / rate) + 2

        self.spec = Spectrum(fft_length, eps=eps,
                             relative_floor=relative_floor,
                             out_format="power")
        self.ramp = to_device_array(np.arange(fft_length), dtype)

    def __call__(self, x: jnp.ndarray, f0: jnp.ndarray,
                 frames: jnp.ndarray | None = None) -> jnp.ndarray:
        f0 = jax.lax.stop_gradient(
            jnp.where(f0 <= self.f_min, self.default_f0, f0))[..., None]
        f0 = jnp.minimum(f0, self.f0_ceil)

        waveform = get_windowed_waveform(
            x, f0, 3, 0, self.frame_period, self.sample_rate,
            self.fft_length, "hanning", True, 1e-12, self.ramp,
            frames=frames)

        power_spectrum = self.spec(waveform)
        dc_bins = int(self.f0_ceil / (self.sample_rate / self.fft_length)) + 2
        power_spectrum = dc_correction(power_spectrum, f0, self.sample_rate,
                                       self.fft_length, self.ramp,
                                       max_bins=dc_bins)
        power_spectrum = linear_smoothing(
            power_spectrum, f0 * (2 / 3), self.sample_rate, self.fft_length,
            self.ramp, self.max_boundary)
        # AddInfinitesimalNoise(); also clamp away the tiny negatives
        # FFT-form smoothing can round to at float32 (the true smoothed
        # power is positive) before the log below.  The dither is
        # eps-scale (~1e-7 relative), so a cached host-side table
        # replaces the ~1M-element on-device threefry draw.
        D = power_spectrum.shape[-1]
        N = power_spectrum.shape[-2]
        tbl = _dither_table(N, D)
        power_spectrum = power_spectrum + (
            jnp.asarray(tbl, power_spectrum.dtype)
            * jnp.finfo(power_spectrum.dtype).eps)
        power_spectrum = jnp.maximum(power_spectrum, 1e-30)

        one_sided = self.fft_length // 2 + 1
        quefrency = self.ramp[:one_sided] / self.sample_rate
        z = f0 * quefrency
        smoothing_lifter = jnp.sinc(z).at[..., 0].set(1.0)
        compensation_lifter = (1 - 2 * self.q1) + 2 * self.q1 * jnp.cos(
            TAU * z)
        from ..kernels import mxu_fft
        L = self.fft_length
        cepstrum = mxu_fft.irfft_real(jnp.log(power_spectrum), L)
        log_power_spectrum = mxu_fft.hfft_real(
            cepstrum * smoothing_lifter * compensation_lifter, L)
        return log_power_spectrum


class PitchAdaptiveSpectralAnalysis(BaseNonFunctionalOp):
    """(waveform (..., T), f0 (..., T/P)) -> envelope (..., T/P, L/2+1).

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> t = jnp.arange(3199.0) / 16000   # T % P != 0 (see Pitch framing)
    >>> x = jnp.sin(2 * jnp.pi * 220 * t)
    >>> f0 = diffsptk_tpu.Pitch(80, 16000, algorithm="yin",
    ...                         out_format="f0", f_min=80, f_max=400)(x)
    >>> diffsptk_tpu.PitchAdaptiveSpectralAnalysis(80, 16000, 1024)(
    ...     x, f0).shape
    (40, 513)
    """

    def __init__(self, frame_period: int, sample_rate: int, fft_length: int,
                 algorithm: str = "cheap-trick",
                 out_format: str | int = "power", **kwargs) -> None:
        if frame_period <= 0:
            raise ValueError("frame_period must be positive.")
        if sample_rate < 8000:
            raise ValueError("sample_rate must be at least 8000 Hz.")
        if fft_length < 1024:
            raise ValueError("fft_length must be at least 1024.")

        if algorithm == "cheap-trick":
            self.extractor = SpectrumExtractionByCheapTrick(
                frame_period, sample_rate, fft_length, **kwargs)
        elif algorithm == "straight":
            from .straight import SpectrumExtractionBySTRAIGHT
            self.extractor = SpectrumExtractionBySTRAIGHT(
                frame_period, sample_rate, fft_length, **kwargs)
        else:
            raise ValueError(f"algorithm {algorithm} is not supported.")

        if out_format in (0, "db"):
            self.formatter = lambda x: x * (10 / math.log(10))
        elif out_format in (1, "log-magnitude"):
            self.formatter = lambda x: 0.5 * x
        elif out_format in (2, "magnitude"):
            self.formatter = lambda x: jnp.exp(0.5 * x)
        elif out_format in (3, "power"):
            self.formatter = lambda x: jnp.exp(x)
        else:
            raise ValueError(f"out_format {out_format} is not supported.")

    def __call__(self, x: jnp.ndarray, f0: jnp.ndarray) -> jnp.ndarray:
        return self.formatter(self.extractor(x, f0))
