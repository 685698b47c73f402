"""Power/amplitude spectrum (reference: diffsptk/modules/spec.py:95-178).

Computes K·|B|/|A| style spectra from waveform coefficients b and/or filter
denominator a, with eps flooring and optional relative floor in dB.  Rides the
XLA FFT; everything else fuses into it as elementwise VPU work.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import BaseOp, Design, filter_values, get_layer
from ..utils.linalg import remove_gain
from .fftr import RealValuedFastFourierTransform


def _make_formatter(out_format):
    if out_format in (0, "db"):
        return lambda x: 10.0 * jnp.log10(x)
    if out_format in (1, "log-magnitude"):
        return lambda x: 0.5 * jnp.log(x)
    if out_format in (2, "magnitude"):
        return lambda x: jnp.sqrt(x)
    if out_format in (3, "power"):
        return lambda x: x
    raise ValueError(f"out_format {out_format} is not supported.")


class Spectrum(BaseOp):
    """Spectrum of b (numerator) and/or a (denominator), (..., N) ->
    (..., L/2+1).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> sp = diffsptk_tpu.Spectrum(8, eps=0)
    >>> np.round(np.asarray(sp(jnp.asarray([1.0, 0.5, 0.25]))), 4)
    array([3.0625, 2.1964, 0.8125, 0.4286, 0.5625])
    """

    _input_names = ("b", "a")

    def __init__(self, fft_length: int, *, eps: float = 0.0,
                 relative_floor: float | None = None,
                 out_format: str | int = "power", learnable: bool = False,
                 dtype=None) -> None:
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(fft_length: int, eps: float,
               relative_floor: float | None) -> None:
        if fft_length <= 1:
            raise ValueError("fft_length must be greater than 1.")
        if eps < 0:
            raise ValueError("eps must be non-negative.")
        if relative_floor is not None and 0 <= relative_floor:
            raise ValueError("relative_floor must be negative.")

    @staticmethod
    def _design(fft_length: int, eps: float = 0.0,
                relative_floor: float | None = None,
                out_format: str | int = "power", learnable: bool = False,
                module: bool = True) -> Design:
        Spectrum._check(fft_length, eps, relative_floor)
        if relative_floor is not None:
            relative_floor = 10.0 ** (relative_floor / 10.0)
        fftr = get_layer(module, RealValuedFastFourierTransform,
                         dict(fft_length=fft_length, out_format="amplitude",
                              learnable=learnable))
        return Design(
            values={"eps": eps, "relative_floor": relative_floor,
                    "formatter": _make_formatter(out_format)},
            layers={"fftr": fftr})

    @staticmethod
    def _forward(b=None, a=None, *, eps, relative_floor, formatter, fftr):
        if b is not None and a is not None:
            K, a = remove_gain(a, return_gain=True)
            X = K * (fftr(b) / fftr(a))
        elif b is not None:
            X = fftr(b)
        elif a is not None:
            K, a = remove_gain(a, return_gain=True)
            X = K / fftr(a)
        else:
            raise ValueError("Either b or a must be specified.")
        s = jnp.square(X) + eps
        if relative_floor is not None:
            m = jnp.max(s, axis=-1, keepdims=True)
            s = jnp.maximum(s, m * relative_floor)
        return formatter(s)
