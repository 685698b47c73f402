"""Generalized-cepstrum gain (de)normalization
(reference: diffsptk/modules/gnorm.py, ignorm.py).

Elementwise: K = (1 + gamma*c0)^(1/gamma) (exp(c0) at gamma=0); the tail is
divided by (1 + gamma*c0).  Fuses into neighbors under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import BaseOp, Design, check_size, filter_values


def get_gamma(gamma: float, c: int | None) -> float:
    """SPTK convention: integer c >= 1 means gamma = -1/c."""
    if c is None or c == 0:
        return gamma
    if c < 1:
        raise ValueError("c must be an integer >= 1.")
    return -1.0 / c


def _check(cep_order: int, gamma: float, c: int | None) -> None:
    if cep_order < 0:
        raise ValueError("cep_order must be non-negative.")
    if 1 < abs(gamma):
        raise ValueError("gamma must be in [-1, 1].")
    if c is not None and c != 0 and c < 1:
        raise ValueError("c must be greater than or equal to 1.")


class GeneralizedCepstrumGainNormalization(BaseOp):
    """Generalized cepstrum (..., M+1) -> gain-normalized (..., M+1).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> c = jnp.asarray([1.0, 0.5, 0.25])
    >>> g = diffsptk_tpu.GeneralizedCepstrumGainNormalization(
    ...     2, gamma=-0.5)(c)
    >>> np.round(np.asarray(g), 3)
    array([4. , 1. , 0.5])
    """

    def __init__(self, cep_order: int, gamma: float = 0.0,
                 c: int | None = None) -> None:
        self.in_dim = cep_order + 1
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(cep_order: int, gamma: float, c: int | None) -> None:
        _check(cep_order, gamma, c)

    @staticmethod
    def _design(cep_order: int, gamma: float = 0.0,
                c: int | None = None) -> Design:
        _check(cep_order, gamma, c)
        return Design(values={"gamma": get_gamma(gamma, c)})

    @staticmethod
    def _forward(x: jnp.ndarray, *, gamma: float) -> jnp.ndarray:
        x0, x1 = x[..., :1], x[..., 1:]
        if gamma == 0:
            K = jnp.exp(x0)
            y = x1
        else:
            z = 1.0 + gamma * x0
            K = jnp.power(z, 1.0 / gamma)
            y = x1 / z
        return jnp.concatenate((K, y), axis=-1)

    def __call__(self, x):
        check_size(x.shape[-1], self.in_dim, "dimension of cepstrum")
        return self.apply(self.params, x)


class GeneralizedCepstrumInverseGainNormalization(BaseOp):
    """Inverse of :class:`GeneralizedCepstrumGainNormalization`
    (reference: ignorm.py)."""

    _input_names = ("y",)

    def __init__(self, cep_order: int, gamma: float = 0.0,
                 c: int | None = None) -> None:
        self.in_dim = cep_order + 1
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(cep_order: int, gamma: float, c: int | None) -> None:
        _check(cep_order, gamma, c)

    @staticmethod
    def _design(cep_order: int, gamma: float = 0.0,
                c: int | None = None) -> Design:
        _check(cep_order, gamma, c)
        return Design(values={"gamma": get_gamma(gamma, c)})

    @staticmethod
    def _forward(y: jnp.ndarray, *, gamma: float) -> jnp.ndarray:
        K, y1 = y[..., :1], y[..., 1:]
        if gamma == 0:
            x0 = jnp.log(K)
            x1 = y1
        else:
            z = jnp.power(K, gamma)
            x0 = (z - 1.0) / gamma
            x1 = y1 * z
        return jnp.concatenate((x0, x1), axis=-1)

    def __call__(self, y):
        check_size(y.shape[-1], self.in_dim, "dimension of cepstrum")
        return self.apply(self.params, y)
