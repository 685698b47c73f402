"""Composite sinusoidal model conversions
(reference: diffsptk/modules/acr2csm.py, csm2acr.py)."""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, filter_values
from ..utils.linalg import hankel, vander
from .rootpol import PolynomialToRoots


class AutocorrelationToCompositeSinusoidalModelCoefficients(BaseOp):
    """r (..., M+1), M odd -> [frequencies, intensities] (..., M+1).

    Examples
    --------
    >>> import jax, numpy as np
    >>> import diffsptk_tpu
    >>> r = diffsptk_tpu.Autocorrelation(16, 5)(
    ...     diffsptk_tpu.nrand(15, key=jax.random.PRNGKey(1)))
    >>> w = diffsptk_tpu.AutocorrelationToCompositeSinusoidalModelCoefficients(5)(r)
    >>> np.round(np.asarray(w), 3)
    array([0.595, 1.506, 2.717, 4.803, 2.7  , 3.316])
    >>> back = diffsptk_tpu.CompositeSinusoidalModelCoefficientsToAutocorrelation(5)(w)
    >>> bool(np.allclose(np.asarray(back), np.asarray(r), atol=1e-6))
    True
    """

    _input_names = ("r",)

    def __init__(self, acr_order: int, dtype=None) -> None:
        self.in_dim = acr_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(acr_order: int) -> None:
        if acr_order <= 0 or acr_order % 2 == 0:
            raise ValueError("acr_order must be a positive odd number.")
        if 30 < acr_order:
            raise ValueError(
                "acr_order must be small due to computational accuracy.")

    @staticmethod
    def _design(acr_order: int) -> Design:
        A = AutocorrelationToCompositeSinusoidalModelCoefficients
        A._check(acr_order)
        N = acr_order + 1
        B = np.zeros((N, N))
        for n in range(N):
            z = 2.0 ** -n
            for k in range(n + 1):
                B[k, n] = math.comb(n, k) * z
        C = np.zeros((N, N))
        for k in range(N):
            bias = k % 2
            center = k // 2
            length = center + 1
            C[bias:bias + 2 * length:2, k] = B[bias + center:
                                               bias + center + length, k]
        C[1:] *= 2
        return Design(arrays={"C": C})

    @staticmethod
    def _forward(r: jnp.ndarray, *, C: jnp.ndarray) -> jnp.ndarray:
        u = jnp.matmul(r, C)
        n = u.shape[-1] // 2
        u1, u2 = u[..., :n], u[..., n:]

        U = hankel(-u)
        p = jnp.linalg.solve(U, u2[..., None])[..., 0]
        coefs = jnp.concatenate(
            [jnp.ones_like(p[..., :1]), jnp.flip(p, -1)], axis=-1)
        x = PolynomialToRoots._forward(coefs, order=n,
                                       formatter=lambda v: v)
        x = -jnp.sort(-x.real, axis=-1)
        w = jnp.arccos(x)

        V = vander(x)
        m = jnp.linalg.solve(V, u1[..., None])[..., 0]
        return jnp.concatenate((w, m), axis=-1)

    def __call__(self, r):
        check_size(r.shape[-1], self.in_dim, "dimension of autocorrelation")
        return self.apply(self.params, r)


class CompositeSinusoidalModelCoefficientsToAutocorrelation(BaseOp):
    """[frequencies, intensities] -> autocorrelation via cosine matmul."""

    _input_names = ("c",)

    def __init__(self, acr_order: int, dtype=None) -> None:
        self.in_dim = acr_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(acr_order: int) -> None:
        AutocorrelationToCompositeSinusoidalModelCoefficients._check(
            acr_order)

    @staticmethod
    def _design(acr_order: int) -> Design:
        CompositeSinusoidalModelCoefficientsToAutocorrelation._check(
            acr_order)
        return Design(arrays={"ramp": np.arange(acr_order + 1,
                                                dtype=np.float64)})

    @staticmethod
    def _forward(c: jnp.ndarray, *, ramp: jnp.ndarray) -> jnp.ndarray:
        n = c.shape[-1] // 2
        w, m = c[..., :n], c[..., n:]
        b = jnp.cos(w[..., None] * ramp)
        return jnp.matmul(m[..., None, :], b)[..., 0, :]

    def __call__(self, c):
        check_size(c.shape[-1], self.in_dim, "dimension of input")
        return self.apply(self.params, c)
