"""LPC analysis = levdur(acorr(x)) (reference: diffsptk/modules/lpc.py)."""

from __future__ import annotations

import jax.numpy as jnp

from ..core import BaseOp, Design, filter_values, get_layer
from .acorr import Autocorrelation
from .levdur import LevinsonDurbin


class LinearPredictiveCodingAnalysis(BaseOp):
    """Framed waveform (..., L) -> gain + LPC (..., M+1).

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.nrand(31)
    >>> np.round(np.asarray(diffsptk_tpu.LPC(32, 2)(x)), 3)
    array([ 5.527,  0.105, -0.145])
    """

    def __init__(self, frame_length: int, lpc_order: int,
                 eps: float | None = None, dtype=None) -> None:
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check() -> None:
        pass

    @staticmethod
    def _design(frame_length: int, lpc_order: int, eps: float | None = None,
                module: bool = True) -> Design:
        acorr = get_layer(module, Autocorrelation,
                          dict(frame_length=frame_length,
                               acr_order=lpc_order))
        levdur = get_layer(module, LevinsonDurbin,
                           dict(lpc_order=lpc_order, eps=eps))
        return Design(layers={"acorr": acorr, "levdur": levdur})

    @staticmethod
    def _forward(x: jnp.ndarray, *, acorr, levdur) -> jnp.ndarray:
        return levdur(acorr(x))
