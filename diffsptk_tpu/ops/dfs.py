"""Static digital filters (reference: diffsptk/modules/dfs.py, df2.py).

FIR-only filters run as a padded gather-dot; true IIR runs through the
native recurrence kernel.  ``ir_length`` truncates the filter to an FIR
approximation whose impulse response is computed host-side in float64.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, filter_values
from ..kernels.recurrence import _fir, lfilter


def _impulse_response(b: np.ndarray, a: np.ndarray, length: int) -> np.ndarray:
    """Truncated impulse response (host-side, float64).

    SPTK convention (reference dfs.py:119-133): the recursion is seeded with
    a[0] and the feedback taps a[1:] are used unnormalized.
    """
    from scipy.signal import lfilter as sp_lfilter
    x = np.zeros(length)
    x[0] = a[0]
    a_mon = np.concatenate([[1.0], a[1:]])
    return sp_lfilter(b, a_mon, x)


class InfiniteImpulseResponseDigitalFilter(BaseOp):
    """y = (B(z)/A(z)) x with static coefficients.

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> f = diffsptk_tpu.InfiniteImpulseResponseDigitalFilter(
    ...     b=[1.0, -0.5], a=[1.0, -0.9])
    >>> np.round(np.asarray(f(diffsptk_tpu.impulse(4))), 3)
    array([1.   , 0.4  , 0.36 , 0.324, 0.292])
    """

    def __init__(self, b=None, a=None, ir_length: int | None = None,
                 learnable: bool = False, dtype=None) -> None:
        self._setup(
            self._design(**filter_values(locals(), ("learnable", "dtype"))),
            dtype=dtype)
        # Trainable coefficients (reference dfs.py:69-76): only the
        # user-supplied polynomials become parameters.
        if learnable:
            learn = []
            if b is not None and "b" in self.params:
                learn.append("b")
            if a is not None and "a" in self.params:
                learn.append("a")
            self.learnable = tuple(learn)

    @staticmethod
    def _check(ir_length: int | None) -> None:
        if ir_length is not None and ir_length <= 0:
            raise ValueError("ir_length must be positive.")

    @staticmethod
    def _design(b=None, a=None, ir_length: int | None = None) -> Design:
        InfiniteImpulseResponseDigitalFilter._check(ir_length)
        b_ary = np.asarray([1.0] if b is None else b, dtype=np.float64)
        a_ary = np.asarray([1.0] if a is None else a, dtype=np.float64)
        if a is None:
            return Design(values={"iir": False}, arrays={"b": b_ary})
        if ir_length is not None:
            h = _impulse_response(b_ary, a_ary, ir_length)
            return Design(values={"iir": False}, arrays={"b": h})
        return Design(values={"iir": True}, arrays={"b": b_ary, "a": a_ary})

    @staticmethod
    def _forward(x: jnp.ndarray, *, iir: bool, b: jnp.ndarray,
                 a: jnp.ndarray | None = None) -> jnp.ndarray:
        if not iir:
            return _fir(x, b)
        return lfilter(b, a, x)


class SecondOrderDigitalFilter(BaseOp):
    """Biquad defined by pole/zero (frequency, bandwidth) pairs.

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> f = diffsptk_tpu.SecondOrderDigitalFilter(
    ...     16000, pole_frequency=1000, pole_bandwidth=200)
    >>> np.round(np.asarray(f(diffsptk_tpu.impulse(4))), 3)
    array([1.   , 1.777, 2.232, 2.323, 2.063])
    """

    def __init__(self, sample_rate: int, pole_frequency=None,
                 pole_bandwidth=None, zero_frequency=None,
                 zero_bandwidth=None, ir_length: int | None = None,
                 dtype=None) -> None:
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(sample_rate: int, pole_frequency, pole_bandwidth,
               zero_frequency, zero_bandwidth) -> None:
        if sample_rate <= 0:
            raise ValueError("sample_rate must be positive.")
        for f in (pole_frequency, zero_frequency):
            if f is not None and not 0 < f <= sample_rate / 2:
                raise ValueError("frequency must be in (0, sample_rate/2].")
        for bw, f in ((pole_bandwidth, pole_frequency),
                      (zero_bandwidth, zero_frequency)):
            if f is not None and (bw is None or bw <= 0):
                raise ValueError("bandwidth must be positive.")

    @staticmethod
    def _design(sample_rate: int, pole_frequency=None, pole_bandwidth=None,
                zero_frequency=None, zero_bandwidth=None,
                ir_length: int | None = None, module: bool = True) -> Design:
        SecondOrderDigitalFilter._check(
            sample_rate, pole_frequency, pole_bandwidth, zero_frequency,
            zero_bandwidth)

        def coefs(f, bw):
            r = math.exp(-math.pi * bw / sample_rate)
            theta = 2 * math.pi * f / sample_rate
            return [1.0, -2 * r * math.cos(theta), r * r]

        a = coefs(pole_frequency, pole_bandwidth) if pole_frequency else None
        b = coefs(zero_frequency, zero_bandwidth) if zero_frequency else None
        dfs = InfiniteImpulseResponseDigitalFilter(b=b, a=a,
                                                   ir_length=ir_length)
        return Design(layers={"dfs": dfs})

    @staticmethod
    def _forward(x: jnp.ndarray, *, dfs) -> jnp.ndarray:
        return dfs(x)
