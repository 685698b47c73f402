"""VMEM-resident batched SPD solve (Pallas TPU kernel).

The mcep/mgcep Newton step solves ~60k independent SPD systems of
n ~ 25 per batch (reference runs one LAPACK LU per frame on CPU/GPU,
diffsptk/modules/mcep.py:189-224).  The pure-XLA masked-Cholesky form
(utils/linalg.py:spd_solve) is HBM-bandwidth-bound: each of the n
factor steps rewrites the whole (batch, n, n) array, ~2 n A-sized HBM
passes in total (~1.3 ms at (7680, 26) on v5e).

This kernel loads a lane-major tile of systems into VMEM once, runs the
complete factorization + both substitution sweeps on-chip, and writes
only the solutions back: HBM traffic drops to ONE read of A + one
(n, batch) write — the factor's 26 sweeps hit VMEM instead of HBM.

Layout: systems are carried as A_T (n, n, batch) / b_T (n, batch) with
the batch on lanes, so every step of the j-loop is a full-width
(n, n, TILE) VPU FMA with consistent tiling (no per-step re-layouts —
the failure mode of the round-1 unrolled attempt).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _solve_kernel(a_ref, b_ref, x_ref, fac_ref, dinv_ref, y_ref):
    n = a_ref.shape[0]

    rows_col = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    rows_2d = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    fac_ref[:] = a_ref[:]

    # In-place right-looking Cholesky: column j of fac becomes L[:, j];
    # the masked rank-1 update touches only the (>j, >j) trailing block.
    def chol(j, _):
        piv = fac_ref[pl.ds(j, 1), pl.ds(j, 1), :]          # (1, 1, T)
        inv = jax.lax.rsqrt(piv)
        col = fac_ref[:, pl.ds(j, 1), :] * inv              # (n, 1, T)
        col = jnp.where(rows_col >= j, col, 0.0)
        fac_ref[:, pl.ds(j, 1), :] = col
        dinv_ref[pl.ds(j, 1), :] = inv[0]
        upd = jnp.where(rows_col > j, col, 0.0)
        fac_ref[:] = fac_ref[:] - upd * jnp.swapaxes(upd, 0, 1)
        return 0

    jax.lax.fori_loop(0, n, chol, 0)

    # Forward: y = L^{-1} b.
    def fwd(j, _):
        lrow = fac_ref[pl.ds(j, 1), :, :][0]                # (n, T)
        acc = jnp.sum(jnp.where(rows_2d < j, lrow * y_ref[:], 0.0),
                      axis=0, keepdims=True)                # (1, T)
        y_ref[pl.ds(j, 1), :] = (
            b_ref[pl.ds(j, 1), :] - acc) * dinv_ref[pl.ds(j, 1), :]
        return 0

    y_ref[:] = jnp.zeros_like(y_ref)
    jax.lax.fori_loop(0, n, fwd, 0)

    # Backward: x = L^{-T} y.
    def bwd(i, _):
        j = n - 1 - i
        lcol = fac_ref[:, pl.ds(j, 1), :][:, 0, :]          # (n, T)
        acc = jnp.sum(jnp.where(rows_2d > j, lcol * x_ref[:], 0.0),
                      axis=0, keepdims=True)
        x_ref[pl.ds(j, 1), :] = (
            y_ref[pl.ds(j, 1), :] - acc) * dinv_ref[pl.ds(j, 1), :]
        return 0

    x_ref[:] = jnp.zeros_like(x_ref)
    jax.lax.fori_loop(0, n, bwd, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def spd_solve_pallas(A: jnp.ndarray, b: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """Batched SPD solve A x = b on TPU via the VMEM-resident kernel.

    A: (..., n, n) float32, b: (..., n) float32.
    """
    n = A.shape[-1]
    batch_shape = A.shape[:-2]
    B = int(np.prod(batch_shape)) if batch_shape else 1

    At = jnp.moveaxis(A.reshape(-1, n, n), 0, -1)           # (n, n, B)
    bt = jnp.moveaxis(b.reshape(-1, n), 0, -1)              # (n, B)
    Bp = -(-B // TILE) * TILE
    if Bp != B:
        # pad with identity systems so rsqrt stays finite
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype)[..., None],
                               (n, n, Bp - B))
        At = jnp.concatenate([At, eye], axis=-1)
        bt = jnp.concatenate(
            [bt, jnp.zeros((n, Bp - B), b.dtype)], axis=-1)

    grid = (Bp // TILE,)
    out = pl.pallas_call(
        _solve_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, Bp), A.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, n, TILE), jnp.float32),
            pltpu.VMEM((n, TILE), jnp.float32),
            pltpu.VMEM((n, TILE), jnp.float32),
        ],
        interpret=interpret,
    )(At, bt)

    return jnp.moveaxis(out[:, :B], -1, 0).reshape(batch_shape + (n,))


@jax.custom_vjp
def spd_solve_tpu(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """spd_solve_pallas with the solve-based VJP (the Newton loops in
    mcep/mgcep are differentiated through): for x = A^-1 b,
    b_bar = A^-1 g and A_bar = -b_bar x^T."""
    return spd_solve_pallas(A, b)


def _spd_fwd(A, b):
    x = spd_solve_pallas(A, b)
    return x, (A, x)


def _spd_bwd(res, g):
    A, x = res
    z = spd_solve_pallas(A, g)
    return -z[..., :, None] * x[..., None, :], z


spd_solve_tpu.defvjp(_spd_fwd, _spd_bwd)
