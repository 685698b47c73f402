"""All-zero (FIR) digital filter with frame-rate coefficients
(reference: diffsptk/modules/zerodf.py:190-240).

TPU-native single mode: gather the (M+1)-sample history for every output
sample (one static gather) and dot it with the per-sample interpolated
coefficients — a dense (..., T, M+1) elementwise-reduce that XLA fuses; no
grouped-conv trick needed on TPU.  ``mode`` is accepted for API parity and
ignored.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, filter_values
from .linear_intpl import linear_interpolate


class AllZeroDigitalFilter(BaseOp):
    """(excitation (..., T), coefficients (..., T/P, M+1)) -> (..., T)."""

    _input_names = ("x", "b")

    def __init__(self, filter_order: int, frame_period: int, *,
                 ignore_gain: bool = False, zeroth_index: int = 0,
                 mode: str = "direct") -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(filter_order: int, frame_period: int,
               zeroth_index: int) -> None:
        if filter_order < 0:
            raise ValueError("filter_order must be non-negative.")
        if frame_period <= 0:
            raise ValueError("frame_period must be positive.")
        if not 0 <= zeroth_index <= filter_order:
            raise ValueError("zeroth_index must be in [0, filter_order].")

    @staticmethod
    def _design(filter_order: int, frame_period: int,
                ignore_gain: bool = False, zeroth_index: int = 0,
                mode: str = "direct") -> Design:
        AllZeroDigitalFilter._check(filter_order, frame_period, zeroth_index)
        padding = (filter_order - zeroth_index, zeroth_index)
        return Design(values={
            "frame_period": frame_period, "ignore_gain": ignore_gain,
            "padding": padding})

    @staticmethod
    def _forward(x: jnp.ndarray, b: jnp.ndarray, *, frame_period: int,
                 ignore_gain: bool, padding: tuple) -> jnp.ndarray:
        check_size(x.shape[-1], b.shape[-2] * frame_period, "sequence length")
        M = b.shape[-1] - 1
        T = x.shape[-1]
        pad = [(0, 0)] * (x.ndim - 1) + [list(padding)]
        xp = jnp.pad(x, pad)
        idx = np.arange(T)[:, None] + np.arange(M + 1)[None, :]
        frames = xp[..., idx]                       # (..., T, M+1)
        h = linear_interpolate(jnp.flip(b, -1), frame_period)
        if ignore_gain:
            h = h / (h[..., :1] if padding[0] == 0 else h[..., -1:])
        return jnp.sum(frames * h, axis=-1)

    def __call__(self, x, b):
        return self.apply(self.params, x, b)
