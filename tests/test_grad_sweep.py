"""Differentiability sweep: gradients flow (finite, defined) through every
op in the smoke matrix.

The reference's raison d'etre is differentiable signal processing — every
module is an nn.Module used inside autograd graphs.  This sweep drives
``jax.grad`` through each case of the smoke matrix (tests/tpu_smoke.py)
and asserts the gradient w.r.t. every floating-point input exists and is
finite.  Ops that are piecewise-constant by definition (quantizers,
counters) legitimately have zero gradients; everything else must be
nonzero somewhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import tpu_smoke

# Host-callback / combinatorial ops: no gradient path by design
# (mirrors the reference, where torch.linalg roots / eig are used
# outside the training graph).
NON_DIFFERENTIABLE = {
    "root_pol",       # Aberth host callback (reference uses torch roots)
    "acr2csm",        # host Toeplitz->Vandermonde solve callback
    "pitch_yin",      # hard voicing decision + integer lag argmin
}

# Piecewise-constant outputs: gradient exists and is exactly zero.
# Currently empty on purpose: quantize routes a straight-through
# estimator through round/floor (as the reference does, quantize.py:24-41
# / ops/companding.py:18); zcross keeps a soft-sign relaxation path;
# histogram is a soft sigmoid-bin histogram; f0eval's error measures are
# smooth in the f0 values.  Every smoke-matrix op must carry gradient.
EXPECTED_ZERO_GRAD: set[str] = set()

_CASES = {name: build for name, build in tpu_smoke.cases()}


@pytest.mark.parametrize("name", sorted(_CASES))
def test_gradient_flows(name):
    if name in NON_DIFFERENTIABLE:
        pytest.skip("no gradient path by design")
    fn, args = _CASES[name]()

    # Differentiate w.r.t. every inexact (float/complex) argument.
    diff_idx = tuple(i for i, a in enumerate(args)
                     if hasattr(a, "dtype") and
                     jnp.issubdtype(a.dtype, jnp.inexact))
    if not diff_idx:
        pytest.skip("no floating-point inputs")

    def loss(*dargs):
        full = list(args)
        for i, v in zip(diff_idx, dargs):
            full[i] = v
        out = fn(*full)
        total = 0.0
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "dtype"):
                leaf = jnp.abs(leaf) if jnp.iscomplexobj(leaf) \
                    else leaf.astype(jnp.float64)
                total = total + jnp.sum(leaf ** 2)
        return total

    grads = jax.grad(loss, argnums=tuple(range(len(diff_idx))))(
        *[args[i] for i in diff_idx])
    nonzero = False
    for g in grads:
        g = np.asarray(g)
        assert np.all(np.isfinite(g)), f"{name}: non-finite gradient"
        nonzero = nonzero or bool(np.any(g != 0))
    if name in EXPECTED_ZERO_GRAD:
        assert not nonzero, (f"{name}: expected piecewise-constant op to "
                             f"have zero gradient — update the list")
    else:
        assert nonzero, f"{name}: gradient is identically zero"
