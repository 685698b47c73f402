"""Pallas first-order scan kernel (kernels/pallas_scan.py).

The CPU suite exercises the kernel in Pallas interpreter mode; the real
TPU path is driven by the on-chip verification (DRC/gammatone/MLSA-pade
run through it when the backend is TPU).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import diffsptk_tpu  # noqa: F401  (backend config via conftest)
from diffsptk_tpu.kernels import pallas_scan


def _ref_scan(p, x):
    y = np.zeros_like(x)
    acc = np.zeros(x.shape[:-1], x.dtype)
    for t in range(x.shape[-1]):
        acc = p[..., t] * acc + x[..., t]
        y[..., t] = acc
    return y


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl
    real_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return real_call(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    monkeypatch.setattr(pallas_scan.pl, "pallas_call", interp_call)
    # the jit wrapper caches; clear so the interpreted version traces
    pallas_scan.pallas_first_order_scan.clear_cache()
    yield
    pallas_scan.pallas_first_order_scan.clear_cache()


@pytest.mark.parametrize("shape", [(3, 500), (1, 2049), (2, 2, 300)])
def test_real_scan_matches_reference(shape):
    rng = np.random.default_rng(0)
    p = (0.9 * rng.uniform(-1, 1, shape)).astype(np.float32)
    x = rng.standard_normal(shape).astype(np.float32)
    y = np.asarray(pallas_scan.pallas_first_order_scan(
        jnp.asarray(p), jnp.asarray(x), chunk=256))
    np.testing.assert_allclose(y, _ref_scan(p, x), rtol=2e-5, atol=2e-5)


def test_complex_scan_matches_reference():
    rng = np.random.default_rng(1)
    shape = (2, 700)
    p = (0.8 * np.exp(1j * rng.uniform(0, 6.28, shape))).astype(np.complex64)
    x = (rng.standard_normal(shape)
         + 1j * rng.standard_normal(shape)).astype(np.complex64)
    y = np.asarray(pallas_scan.pallas_first_order_scan(
        jnp.asarray(p), jnp.asarray(x), chunk=256))
    np.testing.assert_allclose(y, _ref_scan(p, x), rtol=1e-4, atol=1e-4)


def test_vjp_matches_associative_scan():
    rng = np.random.default_rng(2)
    shape = (2, 400)
    p = jnp.asarray((0.9 * rng.uniform(-1, 1, shape)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    def loss_pallas(p, x):
        return jnp.sum(jnp.sin(pallas_scan.scan_diff(p, x)))

    def assoc(x, p):
        def combine(l, r):
            pl_, xl = l
            pr_, xr = r
            return pl_ * pr_, xl * pr_ + xr
        _, y = jax.lax.associative_scan(combine, (p, x), axis=-1)
        return y

    def loss_assoc(p, x):
        return jnp.sum(jnp.sin(assoc(x, p)))

    g1 = jax.grad(loss_pallas, argnums=(0, 1))(p, x)
    g2 = jax.grad(loss_assoc, argnums=(0, 1))(p, x)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_overlap_add_fallback_matches_explicit():
    """pallas_ola's XLA fallback (used off-TPU) matches an explicit
    per-element scatter."""
    from diffsptk_tpu.kernels.pallas_ola import overlap_add

    rng = np.random.default_rng(3)
    B, P, L, T = 2, 37, 64, 800
    resp = jnp.asarray(rng.standard_normal((B, P, L)).astype(np.float32))
    tidx = jnp.asarray(rng.integers(0, T - L, (B, P)).astype(np.int32))
    y = np.asarray(overlap_add(tidx, resp, T))
    ref = np.zeros((B, T), np.float32)
    for b in range(B):
        for p in range(P):
            t = int(tidx[b, p])
            ref[b, t:t + L] += np.asarray(resp[b, p])
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_pallas_spd_solve_interpreter():
    """VMEM-resident SPD solve == numpy solve (interpret mode on CPU);
    VJP matches the differentiable XLA path."""
    import jax
    import jax.numpy as jnp
    from diffsptk_tpu.kernels.pallas_solve import (spd_solve_pallas,
                                                   spd_solve_tpu)
    from diffsptk_tpu.utils.linalg import spd_solve

    rng = np.random.default_rng(3)
    for batch, n in [(7, 26), (600, 13)]:
        M = rng.standard_normal((batch, n, n))
        A = (M @ np.swapaxes(M, -1, -2) + n * np.eye(n)).astype(np.float32)
        b = rng.standard_normal((batch, n)).astype(np.float32)
        x = np.asarray(spd_solve_pallas(jnp.asarray(A), jnp.asarray(b),
                                        interpret=True))
        want = np.linalg.solve(A.astype(np.float64),
                               b[..., None].astype(np.float64))[..., 0]
        rel = np.abs(x - want).max() / np.abs(want).max()
        assert rel < 1e-4, (batch, n, rel)

    # VJP: compare cotangents against the XLA spd_solve path (f32)
    batch, n = 5, 8
    M = rng.standard_normal((batch, n, n))
    A = jnp.asarray((M @ np.swapaxes(M, -1, -2) + n * np.eye(n)),
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)

    def loss_pallas(A, b):
        return jnp.sum(jnp.sin(spd_solve_tpu(A, b)))

    def loss_ref(A, b):
        return jnp.sum(jnp.sin(spd_solve(A, b)))

    # interpret mode: call the underlying pallas fn through the vjp
    import unittest.mock as mock
    from diffsptk_tpu.kernels import pallas_solve as ps
    orig = ps.spd_solve_pallas
    with mock.patch.object(ps, "spd_solve_pallas",
                           lambda A, b: orig(A, b, interpret=True)):
        gA, gb = jax.grad(loss_pallas, argnums=(0, 1))(A, b)
    gA2, gb2 = jax.grad(loss_ref, argnums=(0, 1))(A, b)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb2),
                               rtol=1e-3, atol=1e-4)
    # only the symmetrized A-cotangent is contractual: every caller
    # builds A by symmetric gathers (toeplitz/hankel/HtWH), whose VJP
    # sums the (i, j) and (j, i) contributions
    sym = lambda G: np.asarray(G) + np.swapaxes(np.asarray(G), -1, -2)
    np.testing.assert_allclose(sym(gA), sym(gA2), rtol=1e-3, atol=1e-4)
