"""Mel-cepstrum <-> MLSA filter coefficients
(reference: diffsptk/modules/mc2b.py, b2mc.py).

mc2b:  b(M) = mc(M); b(m) = mc(m) - alpha * b(m+1) — realized as one
triangular-matrix matmul (the recursion unrolls to powers of -alpha).
b2mc:  mc(m) = b(m) + alpha * b(m+1) — a 2-diagonal banded matmul.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, filter_values


def _check_order_alpha(cep_order: int, alpha: float) -> None:
    if cep_order < 0:
        raise ValueError("cep_order must be non-negative.")
    if 1 <= abs(alpha):
        raise ValueError("alpha must be in (-1, 1).")


class MelCepstrumToMLSADigitalFilterCoefficients(BaseOp):
    """Mel-cepstrum (..., M+1) -> MLSA filter coefficients (..., M+1).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> mc = jnp.asarray([1.0, 0.5, 0.25])
    >>> b = diffsptk_tpu.MelCepstrumToMLSADigitalFilterCoefficients(
    ...     2, alpha=0.4)(mc)
    >>> np.round(np.asarray(b), 3)
    array([0.84, 0.4 , 0.25])
    >>> mc2 = diffsptk_tpu.MLSADigitalFilterCoefficientsToMelCepstrum(
    ...     2, alpha=0.4)(b)
    >>> np.round(np.asarray(mc2), 3)
    array([1.  , 0.5 , 0.25])
    """

    _input_names = ("mc",)

    def __init__(self, cep_order: int, alpha: float = 0.0, dtype=None) -> None:
        self.in_dim = cep_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(cep_order: int, alpha: float) -> None:
        _check_order_alpha(cep_order, alpha)

    @staticmethod
    def _design(cep_order: int, alpha: float = 0.0) -> Design:
        _check_order_alpha(cep_order, alpha)
        L = cep_order + 1
        # A[m, k] = (-alpha)^(k-m) for k >= m: upper-triangular band of
        # alternating alpha powers; y = mc @ A.T realizes the recursion.
        i = np.arange(L)
        d = i[None, :] - i[:, None]
        A = np.where(d >= 0, (-alpha) ** np.maximum(d, 0), 0.0)
        return Design(arrays={"A": A.T})

    @staticmethod
    def _forward(mc: jnp.ndarray, *, A: jnp.ndarray) -> jnp.ndarray:
        return jnp.matmul(mc, A)

    def __call__(self, mc):
        check_size(mc.shape[-1], self.in_dim, "dimension of cepstrum")
        return self.apply(self.params, mc)


class MLSADigitalFilterCoefficientsToMelCepstrum(BaseOp):
    """Inverse of :class:`MelCepstrumToMLSADigitalFilterCoefficients`
    (reference: b2mc.py)."""

    _input_names = ("b",)

    def __init__(self, cep_order: int, alpha: float = 0.0, dtype=None) -> None:
        self.in_dim = cep_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(cep_order: int, alpha: float) -> None:
        _check_order_alpha(cep_order, alpha)

    @staticmethod
    def _design(cep_order: int, alpha: float = 0.0) -> Design:
        _check_order_alpha(cep_order, alpha)
        return Design(values={"alpha": alpha})

    @staticmethod
    def _forward(b: jnp.ndarray, *, alpha: float) -> jnp.ndarray:
        tail = alpha * b[..., 1:]
        pad = [(0, 0)] * (b.ndim - 1) + [(0, 1)]
        return b + jnp.pad(tail, pad)

    def __call__(self, b):
        check_size(b.shape[-1], self.in_dim, "dimension of cepstrum")
        return self.apply(self.params, b)
