"""Small structured-matrix and complex helpers (jittable JAX).

Equivalents of the reference's tensor helpers
(diffsptk/utils/private.py:184-353), re-expressed with gather-based
construction instead of strided ``unfold`` views: XLA turns the fancy
indexing below into a single gather, which tiles cleanly on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def symmetric_toeplitz(r: jnp.ndarray) -> jnp.ndarray:
    """(..., d) -> (..., d, d) with X[i, j] = r[|i - j|]."""
    d = r.shape[-1]
    i = np.arange(d)
    idx = np.abs(i[:, None] - i[None, :])  # static (d, d) gather indices
    return r[..., idx]


def hankel(x: jnp.ndarray) -> jnp.ndarray:
    """(..., d) -> (..., n, n) with X[i, j] = x[i + j], n = (d+1)//2."""
    d = x.shape[-1]
    n = (d + 1) // 2
    i = np.arange(n)
    idx = i[:, None] + i[None, :]
    return x[..., idx]


def vander(x: jnp.ndarray) -> jnp.ndarray:
    """(..., d) -> (..., d, d) with X[i, j] = x[j] ** i."""
    d = x.shape[-1]
    powers = jnp.arange(d, dtype=x.dtype)
    return x[..., None, :] ** powers[:, None]


def cas(x: jnp.ndarray) -> jnp.ndarray:
    """cos(x) + sin(x), the Hartley kernel."""
    return jnp.sqrt(jnp.asarray(2.0, x.dtype)) * jnp.cos(x - 0.25 * jnp.pi)


def cexp(x: jnp.ndarray) -> jnp.ndarray:
    """Complex exponential: exp(Re x) * e^{i Im x}."""
    return jnp.exp(x.real) * jnp.exp(1j * x.imag)


def clog(x: jnp.ndarray) -> jnp.ndarray:
    """Log magnitude of a complex array."""
    return jnp.log(jnp.abs(x))


def remove_gain(a: jnp.ndarray, value: float = 1.0, return_gain: bool = False):
    """Split LPC coefficients (..., M+1) = [K, a1..aM] into gain and monic
    polynomial [value, a1..aM]."""
    K = a[..., :1]
    a1 = a[..., 1:]
    monic = jnp.concatenate(
        [jnp.full_like(a1[..., :1], value), a1], axis=-1)
    if return_gain:
        return K, monic
    return monic


def plateau(length: int, first: float, middle: float, last: float | None = None,
            dtype=None) -> np.ndarray:
    """Host-side constant: [first, middle, ..., middle(, last)]."""
    x = np.full(length, middle, dtype=dtype or np.float64)
    x[0] = first
    if last is not None:
        x[-1] = last
    return x
