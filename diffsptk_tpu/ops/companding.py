"""Companding and uniform quantization
(reference: diffsptk/modules/{alaw,ialaw,ulaw,iulaw,quantize,dequantize}.py).

All elementwise VPU ops.  Quantization uses straight-through estimators
(identity gradients through floor/round) so the pair stays trainable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import BaseOp, Design, filter_values


def _ste(fn, x):
    """Straight-through: forward fn(x), gradient identity."""
    return x + jax.lax.stop_gradient(fn(x) - x)


class ALawCompression(BaseOp):
    """A-law compression (..., T) -> (..., T).

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.ramp(4)
    >>> np.round(np.asarray(diffsptk_tpu.ALawCompression(abs_max=4)(x)), 3)
    array([0.   , 2.987, 3.493, 3.79 , 4.   ])
    """

    def __init__(self, abs_max: float = 1.0, a: float = 87.6) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(abs_max: float, a: float) -> None:
        if abs_max < 0:
            raise ValueError("abs_max must be non-negative.")
        if a < 1:
            raise ValueError("a must be greater than or equal to 1.")

    @staticmethod
    def _design(abs_max: float = 1.0, a: float = 87.6) -> Design:
        ALawCompression._check(abs_max, a)
        return Design(values={"abs_max": abs_max, "a": a,
                              "c": abs_max / (1 + math.log(a))})

    @staticmethod
    def _forward(x, *, abs_max, a, c):
        x_abs = jnp.abs(x) / abs_max
        x1 = a * x_abs
        x2 = 1 + jnp.log(jnp.maximum(x1, 1e-38))
        return c * jnp.sign(x) * jnp.where(x_abs < 1 / a, x1, x2)


class ALawExpansion(BaseOp):
    """Inverse of :class:`ALawCompression` (reference: ialaw.py)."""

    _input_names = ("y",)

    def __init__(self, abs_max: float = 1.0, a: float = 87.6) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(abs_max: float, a: float) -> None:
        ALawCompression._check(abs_max, a)

    @staticmethod
    def _design(abs_max: float = 1.0, a: float = 87.6) -> Design:
        ALawCompression._check(abs_max, a)
        return Design(values={"abs_max": abs_max, "c": abs_max / a,
                              "z": 1 + math.log(a)})

    @staticmethod
    def _forward(y, *, abs_max, c, z):
        y_abs = jnp.abs(y) / abs_max
        y1 = z * y_abs
        y2 = jnp.exp(y1 - 1)
        return c * jnp.sign(y) * jnp.where(y_abs < 1 / z, y1, y2)


class MuLawCompression(BaseOp):
    """mu-law companding y = sign(x) V log(1 + mu|x|/V) / log(1 + mu)
    (reference: ulaw.py)."""

    def __init__(self, abs_max: float = 1.0, mu: int = 255) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(abs_max: float, mu: int) -> None:
        if abs_max < 0:
            raise ValueError("abs_max must be non-negative.")
        if mu < 1:
            raise ValueError("mu must be greater than or equal to 1.")

    @staticmethod
    def _design(abs_max: float = 1.0, mu: int = 255) -> Design:
        MuLawCompression._check(abs_max, mu)
        return Design(values={"abs_max": abs_max, "mu": mu,
                              "c": abs_max / math.log1p(mu)})

    @staticmethod
    def _forward(x, *, abs_max, mu, c):
        x_abs = jnp.abs(x) / abs_max
        return c * jnp.sign(x) * jnp.log1p(mu * x_abs)


class MuLawExpansion(BaseOp):
    """Inverse of :class:`MuLawCompression` (reference: iulaw.py)."""

    _input_names = ("y",)

    def __init__(self, abs_max: float = 1.0, mu: int = 255) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(abs_max: float, mu: int) -> None:
        MuLawCompression._check(abs_max, mu)

    @staticmethod
    def _design(abs_max: float = 1.0, mu: int = 255) -> Design:
        MuLawCompression._check(abs_max, mu)
        return Design(values={"abs_max": abs_max, "mu": mu,
                              "c": abs_max / mu})

    @staticmethod
    def _forward(y, *, abs_max, mu, c):
        y_abs = jnp.abs(y) / abs_max
        return c * jnp.sign(y) * (jnp.power(1 + mu, y_abs) - 1)


class UniformQuantization(BaseOp):
    """Mid-rise/mid-tread quantizer with straight-through gradients."""

    def __init__(self, abs_max: float = 1.0, n_bit: int = 8,
                 quantizer: str | int = "mid-rise") -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(abs_max: float, n_bit: int) -> None:
        if abs_max < 0:
            raise ValueError("abs_max must be non-negative.")
        if n_bit <= 0:
            raise ValueError("n_bit must be positive.")

    @staticmethod
    def _design(abs_max: float = 1.0, n_bit: int = 8,
                quantizer: str | int = "mid-rise") -> Design:
        UniformQuantization._check(abs_max, n_bit)
        if quantizer in (0, "mid-rise"):
            level = 1 << n_bit
            func = lambda x: _ste(jnp.floor, x + level // 2)
        elif quantizer in (1, "mid-tread"):
            level = (1 << n_bit) - 1
            func = lambda x: _ste(jnp.round, x + (level - 1) // 2)
        else:
            raise ValueError(f"quantizer {quantizer} is not supported.")
        return Design(values={"abs_max": abs_max, "level": level,
                              "func": func})

    @staticmethod
    def _forward(x, *, abs_max, level, func):
        y = func(x * (level / (2 * abs_max)))
        return jnp.clip(y, 0, level - 1)


class InverseUniformQuantization(BaseOp):
    """Quantization indices -> values (mid-rise/mid-tread)
    (reference: dequantize.py)."""

    _input_names = ("y",)

    def __init__(self, abs_max: float = 1.0, n_bit: int = 8,
                 quantizer: str | int = "mid-rise") -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(abs_max: float, n_bit: int) -> None:
        UniformQuantization._check(abs_max, n_bit)

    @staticmethod
    def _design(abs_max: float = 1.0, n_bit: int = 8,
                quantizer: str | int = "mid-rise") -> Design:
        UniformQuantization._check(abs_max, n_bit)
        if quantizer in (0, "mid-rise"):
            level = 1 << n_bit
            func = lambda y: y - (level // 2 - 0.5)
        elif quantizer in (1, "mid-tread"):
            level = (1 << n_bit) - 1
            func = lambda y: y - (level // 2)
        else:
            raise ValueError(f"quantizer {quantizer} is not supported.")
        return Design(values={"abs_max": abs_max, "level": level,
                              "func": func})

    @staticmethod
    def _forward(y, *, abs_max, level, func):
        x = func(y) * (2 * abs_max / level)
        return jnp.clip(x, -abs_max, abs_max)
