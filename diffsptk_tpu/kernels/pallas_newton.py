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


def _newton_kernel(rt_ref, b_ref, x_ref, *, n):
    # Lower triangle of A = Toeplitz(rt[:n]) + Hankel(rt), formed in
    # registers from the correlation vector.
    A = {}
    for i in range(n):
        for j in range(i + 1):
            A[(i, j)] = rt_ref[i - j] + rt_ref[i + j]

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
def newton_solve_pallas(rt: jnp.ndarray, b: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Solve (Toeplitz(rt[:n]) + Hankel(rt)) x = b, batched.

    rt: (..., 2n-1) float32 correlation vector, b: (..., n) float32.
    """
    n = b.shape[-1]
    if rt.shape[-1] != 2 * n - 1:
        raise ValueError("rt must have 2 * b.shape[-1] - 1 entries.")
    batch_shape = b.shape[:-1]
    B = int(np.prod(batch_shape)) if batch_shape else 1

    rt_t = jnp.moveaxis(rt.reshape(-1, 2 * n - 1), 0, -1)   # (2n-1, B)
    b_t = jnp.moveaxis(b.reshape(-1, n), 0, -1)             # (n, B)
    Bp = -(-B // TILE) * TILE
    if Bp != B:
        # identity padding keeps rsqrt finite in the dead lanes
        pad_rt = jnp.zeros((2 * n - 1, Bp - B), rt.dtype).at[0].set(1.0)
        rt_t = jnp.concatenate([rt_t, pad_rt], axis=-1)
        b_t = jnp.concatenate(
            [b_t, jnp.zeros((n, Bp - B), b.dtype)], axis=-1)

    rt_t = rt_t.reshape(2 * n - 1, Bp // LANE, LANE)
    b_t = b_t.reshape(n, Bp // LANE, LANE)

    kernel = functools.partial(_newton_kernel, n=n)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // TILE,),
        in_specs=[
            pl.BlockSpec((2 * n - 1, SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, SUB, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, SUB, LANE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Bp // LANE, LANE), b.dtype),
        interpret=interpret,
    )(rt_t, b_t)

    out = out.reshape(n, Bp)[:, :B]
    return jnp.moveaxis(out, -1, 0).reshape(batch_shape + (n,))


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
