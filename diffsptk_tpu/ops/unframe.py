"""Overlap-add unframing / WOLA inverse of Frame
(reference: diffsptk/modules/unframe.py:164-211).

TPU-native overlap-add: instead of a scatter (slow on TPU), the frame axis is
decomposed into K = ceil(L/P) period-strided slabs; each slab reshapes densely
to (N*P,) and lands at offset k*P, so the whole fold is K shifted adds of
contiguous blocks — pure VPU work, no scatter, no dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, filter_values
from .window import design_window


def overlap_add(y: jnp.ndarray, frame_period: int) -> jnp.ndarray:
    """Fold frames (..., N, L) into a waveform (..., (N-1)*P + L) by OLA."""
    *batch, N, L = y.shape
    P = frame_period
    K = -(-L // P)  # ceil
    pad_L = K * P
    if pad_L != L:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, pad_L - L)])
    T_out = (N - 1) * P + pad_L
    out = jnp.zeros((*batch, T_out), y.dtype)
    for k in range(K):
        slab = y[..., :, k * P:(k + 1) * P].reshape(*batch, N * P)
        out = out.at[..., k * P:k * P + N * P].add(slab)
    return out[..., : (N - 1) * P + L]


class Unframe(BaseOp):
    """Revert framed waveform (..., N, L) to (..., T) with WOLA
    normalization by the folded squared window.

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> f = diffsptk_tpu.Frame(5, 2)(diffsptk_tpu.ramp(5))
    >>> np.round(np.asarray(
    ...     diffsptk_tpu.Unframe(5, 2)(f, out_length=6)), 3)
    array([0., 1., 2., 3., 4., 5.])
    """

    _input_names = ("y", "out_length")

    def __init__(self, frame_length: int, frame_period: int, *,
                 center: bool = True, window: str = "rectangular",
                 norm: str = "none", symmetric: bool = True,
                 learnable: bool = False, dtype=None) -> None:
        self.in_dim = frame_length
        self._setup(
            self._design(**filter_values(locals(), ("learnable", "dtype"))),
            learnable=learnable, dtype=dtype)

    @staticmethod
    def _check(frame_length: int, frame_period: int) -> None:
        if frame_length <= 0:
            raise ValueError("frame_length must be positive.")
        if frame_length < frame_period:
            raise ValueError("frame_period must be <= frame_length.")

    @staticmethod
    def _design(frame_length: int, frame_period: int, center: bool = True,
                window: str = "rectangular", norm: str = "none",
                symmetric: bool = True, learnable: bool = False) -> Design:
        Unframe._check(frame_length, frame_period)
        w = design_window(frame_length, window, norm, symmetric)
        return Design(
            values={"frame_length": frame_length, "frame_period": frame_period,
                    "center": center},
            arrays={"window": w})

    @staticmethod
    def _forward(y: jnp.ndarray, out_length: int | None = None, *,
                 frame_length: int, frame_period: int, center: bool,
                 window: jnp.ndarray) -> jnp.ndarray:
        if y.ndim < 2:
            raise ValueError("Input must be at least 2D.")
        N = y.shape[-2]
        if out_length is None and center:
            out_length = N * frame_period
        w = jnp.broadcast_to(window, y.shape[-2:])
        x = overlap_add(y * window, frame_period)
        d = overlap_add(w * w, frame_period)
        x = x / (d + 1e-16)
        s = frame_length // 2 if center else 0
        e = None if out_length is None else s + out_length
        return x[..., s:e]

    def __call__(self, y, out_length=None):
        check_size(y.shape[-1], self.in_dim, "length of waveform")
        return self.apply(self.params, y, out_length)
