"""Stateless functional API (reference: diffsptk/functional.py).

Each wrapper designs fresh state (LRU-cached on host) and forwards; under
``jax.jit`` the design constants fold away, so this path costs the same as
the class path.
"""

from __future__ import annotations

from .ops.fftr import (
    RealValuedFastFourierTransform,
    RealValuedInverseFastFourierTransform,
)
from .ops.frame import Frame
from .ops.spec import Spectrum
from .ops.stft import (
    InverseShortTimeFourierTransform,
    ShortTimeFourierTransform,
)
from .ops.unframe import Unframe
from .ops.window import Window


def frame(x, frame_length=400, frame_period=80, center=True, zmean=False,
          mode="constant"):
    """Perform framing: (..., T) -> (..., T/P, L)."""
    return Frame._func(x, frame_length=frame_length,
                       frame_period=frame_period, center=center,
                       zmean=zmean, mode=mode)


def window(x, out_length=None, *, window="blackman", norm="power",
           symmetric=True):
    """Apply a window function to the framed input."""
    return Window._func(x, in_length=x.shape[-1], out_length=out_length,
                        window=window, norm=norm, symmetric=symmetric)


def unframe(y, out_length=None, *, frame_period=80, center=True,
            window="rectangular", norm="none", symmetric=True):
    """Revert framed waveform by overlap-add."""
    return Unframe._func(y, out_length, frame_length=y.shape[-1],
                         frame_period=frame_period, center=center,
                         window=window, norm=norm, symmetric=symmetric)


def fftr(x, fft_length=None, out_format="complex"):
    """Real-valued FFT."""
    return RealValuedFastFourierTransform._func(
        x, fft_length=fft_length, out_format=out_format)


def ifftr(y, out_length=None):
    """Inverse of fftr."""
    return RealValuedInverseFastFourierTransform._func(
        y, fft_length=2 * (y.shape[-1] - 1), out_length=out_length)


def spec(b=None, a=None, *, fft_length=512, eps=0.0, relative_floor=None,
         out_format="power"):
    """Spectrum from numerator b and/or denominator a."""
    return Spectrum._func(b, a, fft_length=fft_length, eps=eps,
                          relative_floor=relative_floor,
                          out_format=out_format, module=False)


def stft(x, *, frame_length=400, frame_period=80, fft_length=512,
         center=True, zmean=False, mode="constant", window="blackman",
         norm="power", symmetric=True, eps=1e-9, relative_floor=None,
         out_format="power"):
    """Short-time Fourier transform."""
    return ShortTimeFourierTransform._func(
        x, frame_length=frame_length, frame_period=frame_period,
        fft_length=fft_length, center=center, zmean=zmean, mode=mode,
        window=window, norm=norm, symmetric=symmetric, eps=eps,
        relative_floor=relative_floor, out_format=out_format, module=False)


def istft(y, *, out_length=None, frame_length=400, frame_period=80,
          fft_length=512, center=True, window="blackman", norm="power",
          symmetric=True):
    """Inverse short-time Fourier transform."""
    return InverseShortTimeFourierTransform._func(
        y, out_length, frame_length=frame_length, frame_period=frame_period,
        fft_length=fft_length, center=center, window=window, norm=norm,
        symmetric=symmetric, module=False)
