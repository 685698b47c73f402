"""Linear interpolation: frame rate -> sample rate
(reference: diffsptk/modules/linear_intpl.py:99-110).

Used by poledf/zerodf/mglsadf to upsample per-frame filter coefficients.
TPU-native: a static gather of the two bracketing frames plus one lerp —
no resize kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, filter_values


def linear_interpolate(x: jnp.ndarray, upsampling_factor: int) -> jnp.ndarray:
    """Upsample (..., N, D) -> (..., N*P, D) linearly along the frame axis
    (replicating the final frame); 1-D inputs are treated as (N,)."""
    P = upsampling_factor
    if P == 1:
        return x
    one_d = x.ndim == 1
    if one_d:
        x = x[:, None]
    N = x.shape[-2]
    # pad one replicated frame at the end for the right bracket
    last = x[..., -1:, :]
    xp = jnp.concatenate([x, last], axis=-2)  # (..., N+1, D)
    n = np.arange(N * P)
    i0 = n // P
    w = (n % P).astype(np.float64) / P
    lo = xp[..., i0, :]
    hi = xp[..., i0 + 1, :]
    wj = jnp.asarray(w, x.dtype)[..., None]
    y = lo * (1 - wj) + hi * wj
    if one_d:
        y = y[..., 0]
    return y


class LinearInterpolation(BaseOp):
    """Upsample (..., T, D) -> (..., TxP, D) by linear interpolation
    between adjacent frames (reference: diffsptk/modules/linear_intpl.py).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> li = diffsptk_tpu.LinearInterpolation(3)
    >>> np.round(np.asarray(li(jnp.asarray([0.0, 3.0, 6.0]))), 1)
    array([0., 1., 2., 3., 4., 5., 6., 6., 6.])
    """

    def __init__(self, upsampling_factor: int) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(upsampling_factor: int) -> None:
        if upsampling_factor <= 0:
            raise ValueError("upsampling_factor must be positive.")

    @staticmethod
    def _design(upsampling_factor: int) -> Design:
        LinearInterpolation._check(upsampling_factor)
        return Design(values={"upsampling_factor": upsampling_factor})

    @staticmethod
    def _forward(x: jnp.ndarray, *, upsampling_factor: int) -> jnp.ndarray:
        return linear_interpolate(x, upsampling_factor)
