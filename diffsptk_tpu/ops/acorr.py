"""Autocorrelation (reference: diffsptk/modules/acorr.py).

r = irfft(|rfft(x)|^2) truncated to M+1 — two batched XLA FFTs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, filter_values


class Autocorrelation(BaseOp):
    """Framed waveform (..., L) -> autocorrelation (..., M+1).

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.ramp(3)
    >>> np.round(np.asarray(diffsptk_tpu.Autocorrelation(4, 2)(x)), 1)
    array([14.,  8.,  3.])
    """

    def __init__(self, frame_length: int, acr_order: int,
                 out_format: str | int = "naive") -> None:
        self.in_dim = frame_length
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(frame_length: int, acr_order: int) -> None:
        if frame_length <= 0:
            raise ValueError("frame_length must be positive.")
        if acr_order < 0:
            raise ValueError("acr_order must be non-negative.")
        if frame_length <= acr_order:
            raise ValueError("acr_order must be less than frame_length.")

    @staticmethod
    def _design(frame_length: int, acr_order: int,
                out_format: str | int = "naive") -> Design:
        Autocorrelation._check(frame_length, acr_order)
        if out_format in (0, "naive"):
            formatter = lambda x: x
        elif out_format in (1, "normalized"):
            formatter = lambda x: x / x[..., :1]
        elif out_format in (2, "biased"):
            formatter = lambda x: x / frame_length
        elif out_format in (3, "unbiased"):
            n = np.arange(frame_length, frame_length - acr_order - 1, -1)
            formatter = lambda x: x / jnp.asarray(n, x.dtype)
        else:
            raise ValueError(f"out_format {out_format} is not supported.")
        return Design(values={"acr_order": acr_order, "formatter": formatter})

    @staticmethod
    def _forward(x: jnp.ndarray, *, acr_order: int, formatter) -> jnp.ndarray:
        fft_length = x.shape[-1] + acr_order
        if fft_length % 2 == 1:
            fft_length += 1
        X = jnp.square(jnp.abs(jnp.fft.rfft(x, n=fft_length)))
        r = jnp.fft.irfft(X)[..., : acr_order + 1]
        return formatter(r)

    def __call__(self, x):
        check_size(x.shape[-1], self.in_dim, "frame length")
        return self.apply(self.params, x)
