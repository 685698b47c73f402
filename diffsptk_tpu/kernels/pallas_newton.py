"""Fully-unrolled Toeplitz+Hankel SPD solve for the mcep Newton step
(Pallas TPU kernel).

The mcep Newton iteration (reference: diffsptk/modules/mcep.py:189-224)
solves, per frame, the (M+1)x(M+1) SPD system

    (Toeplitz(rt[:M+1]) + Hankel(rt)) g = b,   A[i, j] = rt[|i-j|] + rt[i+j]

for ~10k frames per step.  Three layers of specialization over the
generic batched solve (kernels/pallas_solve.py):

1. **A never exists.**  The kernel reads the (2M+1,)-entry correlation
   vector and forms each A[i, j] on the fly — HBM traffic drops from
   (B, n, n) to (B, 2n-1), an n/2 reduction, and the host-side
   Toeplitz/Hankel gather construction disappears.
2. **Systems ride full (8, 128) vregs.**  The batch is laid out as
   (rows of 8) x (lanes of 128), so every scalar of the factorization
   is one native vector register holding 1024 systems — no masks, no
   dynamic slices, no relayouts (the costs that held the generic
   kernel ~25x off its roofline on hardware).
3. **The recurrence fully unrolls.**  n is static and small (~25), so
   the n^3/6 Cholesky FMAs and both substitution sweeps emit as
   straight-line vector code; Mosaic schedules/spills as needed.

The backward pass reuses the same kernel: for x = A(rt)^{-1} b,
b_bar = A^{-1} g and rt_bar[k] = -sum_{|i-j|=k or i+j=k} (A^{-1} g)_i x_j,
evaluated with a static one-hot contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE


def _newton_kernel(p_ref, q_ref, b_ref, x_ref, *, n):
    # Lower triangle of A = Toeplitz(p) + Hankel(q), formed in
    # registers from the two generator vectors.
    A = {}
    for i in range(n):
        for j in range(i + 1):
            A[(i, j)] = p_ref[i - j] + q_ref[i + j]

    L = {}
    dinv = [None] * n
    for j in range(n):
        inv = jax.lax.rsqrt(A[(j, j)])
        dinv[j] = inv
        for i in range(j + 1, n):
            L[(i, j)] = A[(i, j)] * inv
        for k in range(j + 1, n):
            for i in range(k, n):
                A[(i, k)] = A[(i, k)] - L[(i, j)] * L[(k, j)]

    y = [None] * n
    for j in range(n):
        acc = b_ref[j]
        for k in range(j):
            acc = acc - L[(j, k)] * y[k]
        y[j] = acc * dinv[j]

    x = [None] * n
    for j in range(n - 1, -1, -1):
        acc = y[j]
        for k in range(j + 1, n):
            acc = acc - L[(k, j)] * x[k]
        x[j] = acc * dinv[j]

    for j in range(n):
        x_ref[j] = x[j]


@functools.partial(jax.jit, static_argnames=("interpret",))
def toephank_solve_lane_major(p_t: jnp.ndarray, q_t: jnp.ndarray,
                              b_t: jnp.ndarray,
                              interpret: bool = False) -> jnp.ndarray:
    """Solve (Toeplitz(p) + Hankel(q)) x = b with systems on lanes.

    p_t: (n, B), q_t: (2n-1, B), b_t: (n, B) -> x_t (n, B), float32.
    The lane-major layout is the kernel's native one; callers that keep
    their whole pipeline lane-major (the mcep Newton loop) avoid the
    four (B, n) <-> (n, B) relayouts per iteration of the row-major
    wrapper.
    """
    n, B = b_t.shape
    if p_t.shape != (n, B) or q_t.shape != (2 * n - 1, B):
        raise ValueError(
            "p_t must be (n, B) and q_t (2n-1, B) with matching B.")
    Bp = -(-B // TILE) * TILE
    if Bp != B:
        # identity padding keeps rsqrt finite in the dead lanes
        pad_p = jnp.zeros((n, Bp - B), p_t.dtype).at[0].set(1.0)
        p_t = jnp.concatenate([p_t, pad_p], axis=-1)
        q_t = jnp.concatenate(
            [q_t, jnp.zeros((2 * n - 1, Bp - B), q_t.dtype)], axis=-1)
        b_t = jnp.concatenate(
            [b_t, jnp.zeros((n, Bp - B), b_t.dtype)], axis=-1)

    p_r = p_t.reshape(n, Bp // LANE, LANE)
    q_r = q_t.reshape(2 * n - 1, Bp // LANE, LANE)
    b_r = b_t.reshape(n, Bp // LANE, LANE)

    kernel = functools.partial(_newton_kernel, n=n)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // TILE,),
        in_specs=[
            pl.BlockSpec((n, SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * n - 1, SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, SUB, LANE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Bp // LANE, LANE), b_t.dtype),
        interpret=interpret,
    )(p_r, q_r, b_r)

    return out.reshape(n, Bp)[:, :B]


@functools.partial(jax.jit, static_argnames=("interpret",))
def toephank_solve_pallas(p: jnp.ndarray, q: jnp.ndarray, b: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """Solve (Toeplitz(p) + Hankel(q)) x = b, batched.

    p: (..., n), q: (..., 2n-1), b: (..., n), all float32.
    """
    n = b.shape[-1]
    if p.shape[-1] != n or q.shape[-1] != 2 * n - 1:
        raise ValueError(
            "p must have n entries and q must have 2n-1 entries.")
    batch_shape = b.shape[:-1]

    p_t = jnp.moveaxis(p.reshape(-1, n), 0, -1)             # (n, B)
    q_t = jnp.moveaxis(q.reshape(-1, 2 * n - 1), 0, -1)     # (2n-1, B)
    b_t = jnp.moveaxis(b.reshape(-1, n), 0, -1)             # (n, B)
    out = toephank_solve_lane_major(p_t, q_t, b_t, interpret=interpret)
    return jnp.moveaxis(out, -1, 0).reshape(batch_shape + (n,))


def newton_solve_pallas(rt: jnp.ndarray, b: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Solve (Toeplitz(rt[:n]) + Hankel(rt)) x = b (the mcep Newton
    structure, where both generators come from one correlation vector)."""
    n = b.shape[-1]
    if rt.shape[-1] != 2 * n - 1:
        raise ValueError("rt must have 2 * b.shape[-1] - 1 entries.")
    return toephank_solve_pallas(rt[..., :n], rt, b, interpret=interpret)


@functools.lru_cache(maxsize=None)
def _structure_onehot(n: int) -> np.ndarray:
    """(n, n, 2n-1) with S[i, j, k] = [|i-j| == k] + [i+j == k]."""
    i = np.arange(n)[:, None, None]
    j = np.arange(n)[None, :, None]
    k = np.arange(2 * n - 1)[None, None, :]
    return ((np.abs(i - j) == k).astype(np.float64)
            + ((i + j) == k).astype(np.float64))


@jax.custom_vjp
def newton_solve(rt: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Differentiable Toeplitz+Hankel SPD solve (Pallas forward)."""
    return newton_solve_pallas(rt, b)


def _newton_fwd(rt, b):
    x = newton_solve_pallas(rt, b)
    return x, (rt, x)


def _newton_bwd(res, g):
    rt, x = res
    n = x.shape[-1]
    z = newton_solve_pallas(rt, g)
    S = jnp.asarray(_structure_onehot(n), x.dtype)
    dA = -z[..., :, None] * x[..., None, :]
    drt = jnp.einsum("...ij,ijk->...k", dA, S,
                     precision=jax.lax.Precision.HIGHEST)
    return drt, z


newton_solve.defvjp(_newton_fwd, _newton_bwd)


@jax.custom_vjp
def newton_solve_t(rt_t: jnp.ndarray, b_t: jnp.ndarray) -> jnp.ndarray:
    """Differentiable lane-major Toeplitz+Hankel SPD solve.

    rt_t (2n-1, B), b_t (n, B) -> x_t (n, B): solves
    (Toeplitz(rt[:n]) + Hankel(rt)) x = b per lane with no relayouts —
    the mcep Newton loop keeps its whole iteration lane-major.
    """
    n = b_t.shape[0]
    return toephank_solve_lane_major(rt_t[:n], rt_t, b_t)


def _newton_t_fwd(rt_t, b_t):
    x = newton_solve_t(rt_t, b_t)
    return x, (rt_t, x)


def _newton_t_bwd(res, g):
    rt_t, x = res
    n = x.shape[0]
    z = toephank_solve_lane_major(rt_t[:n], rt_t, g)
    S = jnp.asarray(_structure_onehot(n), x.dtype)
    dA = -z[:, None, :] * x[None, :, :]                     # (n, n, B)
    drt = jnp.einsum("ijb,ijk->kb", dA, S,
                     precision=jax.lax.Precision.HIGHEST)
    return drt, z


newton_solve_t.defvjp(_newton_t_fwd, _newton_t_bwd)


@functools.lru_cache(maxsize=None)
def _structure_onehots_pq(n: int):
    """Separate (n, n, n) Toeplitz and (n, n, 2n-1) Hankel one-hots."""
    i = np.arange(n)[:, None, None]
    j = np.arange(n)[None, :, None]
    kp = np.arange(n)[None, None, :]
    kq = np.arange(2 * n - 1)[None, None, :]
    Sp = (np.abs(i - j) == kp).astype(np.float64)
    Sq = ((i + j) == kq).astype(np.float64)
    return Sp, Sq


@jax.custom_vjp
def toephank_solve(p: jnp.ndarray, q: jnp.ndarray,
                   b: jnp.ndarray) -> jnp.ndarray:
    """Differentiable (Toeplitz(p) + Hankel(q)) solve (Pallas forward) —
    the mgcep Newton structure, where the Toeplitz and Hankel
    generators differ (ops/mgcep.py:184-186)."""
    return toephank_solve_pallas(p, q, b)


def _toephank_fwd(p, q, b):
    x = toephank_solve_pallas(p, q, b)
    return x, (p, q, x)


def _toephank_bwd(res, g):
    p, q, x = res
    n = x.shape[-1]
    z = toephank_solve_pallas(p, q, g)
    Sp, Sq = _structure_onehots_pq(n)
    dA = -z[..., :, None] * x[..., None, :]
    hi = jax.lax.Precision.HIGHEST
    dp = jnp.einsum("...ij,ijk->...k", dA, jnp.asarray(Sp, x.dtype),
                    precision=hi)
    dq = jnp.einsum("...ij,ijk->...k", dA, jnp.asarray(Sq, x.dtype),
                    precision=hi)
    return dp, dq, z


toephank_solve.defvjp(_toephank_fwd, _toephank_bwd)
