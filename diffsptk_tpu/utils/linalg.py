"""Small structured-matrix and complex helpers (jittable JAX).

Equivalents of the reference's tensor helpers
(diffsptk/utils/private.py:184-353), re-expressed with gather-based
construction instead of strided ``unfold`` views: XLA turns the fancy
indexing below into a single gather, which tiles cleanly on TPU.
"""

from __future__ import annotations

import jax
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


def spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched symmetric-positive-definite solve A x = b.

    A: (..., n, n), b: (..., n).  A masked right-looking Cholesky plus two
    masked substitution sweeps, each a fori_loop of n steps over fully
    batched dense updates — every step is one (..., n) scale and one
    (..., n, n) rank-1 FMA, so the batch dimension saturates the VPU.
    XLA's builtin cholesky/triangular_solve serialize poorly for large
    batches of small systems on TPU (the mcep/mgcep Newton solves are
    ~60k systems of n~25); this form is ~20x faster there.
    """
    n = A.shape[-1]
    rows = jnp.arange(n)

    def chol_step(j, LA):
        L, A = LA
        piv = jax.lax.dynamic_index_in_dim(
            jax.lax.dynamic_index_in_dim(A, j, axis=-1, keepdims=False),
            j, axis=-1, keepdims=False)                   # (...,)
        col = jax.lax.dynamic_index_in_dim(A, j, axis=-1,
                                           keepdims=False)  # (..., n)
        inv = jax.lax.rsqrt(piv)[..., None]
        lcol = col * inv * (rows >= j)                     # L[:, j]
        L = jax.lax.dynamic_update_index_in_dim(L, lcol, j, axis=-1)
        upd = lcol * (rows > j)
        A = A - upd[..., :, None] * upd[..., None, :]
        return L, A

    L, _ = jax.lax.fori_loop(0, n, chol_step,
                             (jnp.zeros_like(A), A))

    diag = jnp.diagonal(L, axis1=-2, axis2=-1)             # (..., n)

    def fwd_step(j, y):
        # y_j = (b_j - L[j, :] . y) / L[j, j]; y starts at 0 so the dot
        # only picks up already-computed entries (L is lower triangular).
        Lrow = jax.lax.dynamic_index_in_dim(L, j, axis=-2,
                                            keepdims=False)  # (..., n)
        acc = jnp.sum(Lrow * y * (rows < j), axis=-1)
        yj = (jax.lax.dynamic_index_in_dim(b, j, axis=-1, keepdims=False)
              - acc) / jax.lax.dynamic_index_in_dim(diag, j, axis=-1,
                                                    keepdims=False)
        return jax.lax.dynamic_update_index_in_dim(y, yj, j, axis=-1)

    y = jax.lax.fori_loop(0, n, fwd_step, jnp.zeros_like(b))

    def bwd_step(i, x):
        j = n - 1 - i
        Lcol = jax.lax.dynamic_index_in_dim(L, j, axis=-1,
                                            keepdims=False)  # L[:, j]
        acc = jnp.sum(Lcol * x * (rows > j), axis=-1)
        xj = (jax.lax.dynamic_index_in_dim(y, j, axis=-1, keepdims=False)
              - acc) / jax.lax.dynamic_index_in_dim(diag, j, axis=-1,
                                                    keepdims=False)
        return jax.lax.dynamic_update_index_in_dim(x, xj, j, axis=-1)

    return jax.lax.fori_loop(0, n, bwd_step, jnp.zeros_like(b))
