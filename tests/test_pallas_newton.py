"""Unrolled Toeplitz+Hankel Newton solve (kernels/pallas_newton.py) —
interpreter-mode correctness; the real-TPU path is exercised by the
flagship bench and smoke matrix."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsptk_tpu.kernels.pallas_newton import (
    _newton_bwd,
    _newton_fwd,
    newton_solve_pallas,
)

RNG = np.random.default_rng(3)


def _dense(rt):
    n = (rt.shape[-1] + 1) // 2
    i = np.arange(n)
    return rt[..., np.abs(i[:, None] - i[None, :])] \
        + rt[..., i[:, None] + i[None, :]]


@pytest.mark.parametrize("n,B", [(25, 300), (6, 17), (33, 64), (1, 5)])
def test_forward_matches_dense_solve(n, B):
    rt = RNG.standard_normal((B, 2 * n - 1)).astype(np.float32) * 0.1
    rt[:, 0] += 4.0 + n * 0.2
    b = RNG.standard_normal((B, n)).astype(np.float32)
    x = np.asarray(newton_solve_pallas(jnp.asarray(rt), jnp.asarray(b),
                                       interpret=True))
    want = np.stack([np.linalg.solve(_dense(rt[k].astype(np.float64)),
                                     b[k].astype(np.float64))
                     for k in range(B)])
    np.testing.assert_allclose(x, want, rtol=2e-4, atol=2e-4)


def test_leading_batch_shape_and_rt_check():
    n, rt_len = 7, 13
    rt = RNG.standard_normal((2, 3, rt_len)).astype(np.float32) * 0.1
    rt[..., 0] += 4.0
    b = RNG.standard_normal((2, 3, n)).astype(np.float32)
    x = newton_solve_pallas(jnp.asarray(rt), jnp.asarray(b), interpret=True)
    assert x.shape == (2, 3, n)
    with pytest.raises(ValueError):
        newton_solve_pallas(jnp.asarray(rt[..., :-1]), jnp.asarray(b),
                            interpret=True)


def test_toephank_distinct_generators():
    """The two-generator form (mgcep structure) matches a dense solve."""
    from diffsptk_tpu.kernels.pallas_newton import toephank_solve_pallas

    n, B = 12, 40
    i = np.arange(n)
    p = RNG.standard_normal((B, n)).astype(np.float32) * 0.1
    p[:, 0] += 5.0
    q = RNG.standard_normal((B, 2 * n - 1)).astype(np.float32) * 0.05
    b = RNG.standard_normal((B, n)).astype(np.float32)
    A = (p[:, np.abs(i[:, None] - i[None, :])]
         + q[:, i[:, None] + i[None, :]]).astype(np.float64)
    x = np.asarray(toephank_solve_pallas(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(b), interpret=True))
    want = np.stack([np.linalg.solve(A[k], b[k].astype(np.float64))
                     for k in range(B)])
    np.testing.assert_allclose(x, want, rtol=2e-4, atol=2e-4)


def test_toephank_vjp_matches_xla_autodiff():
    """The two-generator bwd equals jax.grad through a dense solve."""
    import diffsptk_tpu.kernels.pallas_newton as pn

    n, B = 7, 9
    i = np.arange(n)
    idx_t = np.abs(i[:, None] - i[None, :])
    idx_h = i[:, None] + i[None, :]
    p = RNG.standard_normal((B, n)) * 0.1
    p[:, 0] += 4.0
    q = RNG.standard_normal((B, 2 * n - 1)) * 0.05
    b = RNG.standard_normal((B, n))
    p_d, q_d, b_d = jnp.asarray(p), jnp.asarray(q), jnp.asarray(b)

    def dense_solve(p_, q_, b_):
        A = p_[..., idx_t] + q_[..., idx_h]
        return jnp.squeeze(jnp.linalg.solve(A, b_[..., None]), -1)

    want = jax.grad(lambda pp, qq, bb: jnp.sum(
        jnp.sin(dense_solve(pp, qq, bb))), argnums=(0, 1, 2))(p_d, q_d,
                                                              b_d)
    x = pn.toephank_solve_pallas(p_d, q_d, b_d, interpret=True)
    g = jnp.cos(x)
    orig = pn.toephank_solve_pallas
    pn.toephank_solve_pallas = lambda p_, q_, b_, interpret=False: orig(
        p_, q_, b_, interpret=True)
    try:
        dp, dq, db = pn._toephank_bwd((p_d, q_d, x), g)
    finally:
        pn.toephank_solve_pallas = orig
    for got, exp in zip((dp, dq, db), want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=1e-6, atol=1e-8)


def test_vjp_matches_xla_autodiff():
    """The hand-written bwd (b_bar = A^-1 g, rt_bar via the structure
    one-hot) equals jax.grad through a dense XLA solve."""
    n, B = 9, 12
    i = np.arange(n)
    idx_t = np.abs(i[:, None] - i[None, :])
    idx_h = i[:, None] + i[None, :]
    rt = RNG.standard_normal((B, 2 * n - 1)) * 0.1
    rt[:, 0] += 4.0
    b = RNG.standard_normal((B, n))
    rt_d, b_d = jnp.asarray(rt), jnp.asarray(b)

    def dense_solve(rt_, b_):
        A = rt_[..., idx_t] + rt_[..., idx_h]
        return jnp.squeeze(jnp.linalg.solve(A, b_[..., None]), -1)

    want = jax.grad(lambda r, bb: jnp.sum(jnp.sin(dense_solve(r, bb))),
                    argnums=(0, 1))(rt_d, b_d)

    # drive fwd/bwd through the interpreter-backed pallas solve
    x = newton_solve_pallas(rt_d, b_d, interpret=True)
    g = jnp.cos(x)
    import diffsptk_tpu.kernels.pallas_newton as pn
    orig = pn.newton_solve_pallas
    pn.newton_solve_pallas = lambda rt_, b_, interpret=False: orig(
        rt_, b_, interpret=True)
    try:
        drt, db = _newton_bwd((rt_d, x), g)
    finally:
        pn.newton_solve_pallas = orig
    np.testing.assert_allclose(np.asarray(drt), np.asarray(want[0]),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(db), np.asarray(want[1]),
                               rtol=1e-6, atol=1e-8)
