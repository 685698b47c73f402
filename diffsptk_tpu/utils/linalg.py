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


# Measured crossover on v5e: batch-minor unroll wins 3x at n=6 but
# loses ~30% to the fori_loop form at n=26 (the unrolled substitution
# sweeps grow O(n^2) dependent scalar-vector ops).
_SPD_UNROLL_MAX = 12


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def _spd_solve_batch_minor(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Small-n SPD solve with the batch on the minor (lane) axis.

    With batch-major layout, an (..., n, n) array pads n up to the
    8x128 register tile, a ~27x memory blowup at n=6 that makes every
    loop step bandwidth-bound on padding.  Transposing to (n, n, batch)
    puts the large batch on lanes, and with n static the Cholesky /
    substitution recurrences unroll into pure full-lane VPU ops.
    """
    n = A.shape[-1]
    batch_shape = A.shape[:-2]
    At = jnp.moveaxis(A.reshape((-1,) + A.shape[-2:]), 0, -1)  # (n, n, BN)
    bt = jnp.moveaxis(b.reshape(-1, n), 0, -1)                 # (n, BN)

    cols = [None] * n          # L[:, j] as (n, BN) rows list
    diag = [None] * n
    rows = jnp.arange(n)
    for j in range(n):
        col = At[:, j]                                         # (n, BN)
        inv = jax.lax.rsqrt(col[j])
        lcol = col * inv * (rows[:, None] >= j)
        cols[j] = lcol
        diag[j] = lcol[j]
        upd = lcol * (rows[:, None] > j)
        At = At - upd[:, None, :] * upd[None, :, :]

    y = [None] * n
    for j in range(n):
        acc = bt[j]
        for k in range(j):
            acc = acc - cols[k][j] * y[k]
        y[j] = acc / diag[j]

    x = [None] * n
    for j in range(n - 1, -1, -1):
        acc = y[j]
        for k in range(j + 1, n):
            acc = acc - cols[j][k] * x[k]
        x[j] = acc / diag[j]

    out = jnp.stack(x, axis=-1)                                # (BN, n)
    return out.reshape(batch_shape + (n,))


def _spd_solve_scalar_unroll(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Tiny-n SPD solve with every matrix entry as its own (...,) array.

    Static scalar-index slices A[..., i, j] keep the batch layout
    untouched (no (..., n, n) <-> (n, n, batch) relayouts — a tiny
    minor-dim transpose costs more on TPU than this whole solve), and
    the n^3/6 Cholesky plus both substitutions unroll into fully fused
    elementwise ops over the batch."""
    n = A.shape[-1]
    a = {}
    for j in range(n):
        for i in range(j, n):
            a[(i, j)] = A[..., i, j]
    L = {}
    dinv = [None] * n
    for j in range(n):
        inv = jax.lax.rsqrt(a[(j, j)])
        dinv[j] = inv
        for i in range(j + 1, n):
            L[(i, j)] = a[(i, j)] * inv
        for k in range(j + 1, n):
            for i in range(k, n):
                a[(i, k)] = a[(i, k)] - L[(i, j)] * L[(k, j)]

    y = [None] * n
    for j in range(n):
        acc = b[..., j]
        for k in range(j):
            acc = acc - L[(j, k)] * y[k]
        y[j] = acc * dinv[j]

    x = [None] * n
    for j in range(n - 1, -1, -1):
        acc = y[j]
        for k in range(j + 1, n):
            acc = acc - L[(k, j)] * x[k]
        x[j] = acc * dinv[j]
    return jnp.stack(x, axis=-1)


def spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched symmetric-positive-definite solve A x = b.

    A: (..., n, n), b: (..., n).  For small n (the mcep/mgcep Newton
    and TANDEM fit systems, n <= ~32) a batch-minor unrolled Cholesky;
    otherwise a masked right-looking Cholesky plus two masked
    substitution sweeps, each a fori_loop of n steps over fully
    batched dense updates — every step is one (..., n) scale and one
    (..., n, n) rank-1 FMA, so the batch dimension saturates the VPU.
    XLA's builtin cholesky/triangular_solve serialize poorly for large
    batches of small systems on TPU (the mcep/mgcep Newton solves are
    ~60k systems of n~25); these forms are ~20x faster there.
    """
    dt = jnp.result_type(A.dtype, b.dtype)
    A = A.astype(dt)
    b = b.astype(dt)
    n = A.shape[-1]
    batch = int(np.prod(A.shape[:-2])) if A.ndim > 2 else 1
    if (A.dtype == jnp.float32 and _SPD_UNROLL_MAX < n <= 64
            and batch >= 2048 and _on_tpu()):
        # Large batches of mid-size systems (the mcep/mgcep Newton
        # solves): VMEM-resident Pallas factor+solve — one HBM read of
        # A instead of ~2n masked-sweep passes.
        from ..kernels.pallas_solve import spd_solve_tpu
        return spd_solve_tpu(A, b)
    if n <= _SPD_UNROLL_MAX and batch >= 8:
        # (A (..., i, j) static scalar-index slicing — the no-relayout
        # alternative — measures 1.3x slower at the TANDEM n=6 shapes:
        # the per-entry slices scalarize; the batch-minor relayout pays
        # for itself.)
        return _spd_solve_batch_minor(A, b)
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
