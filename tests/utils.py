"""Shared check helpers, modeled on the reference's test strategy
(/root/reference/tests/utils.py): parity vs an oracle, shape invariance,
differentiability, learnability — plus sharding-equivalence checks the
reference lacks (SURVEY.md §4)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import torch


#: parity-test dtype, set from the --dtype pytest option (conftest).
#: "double" = the reference CI default; "float" re-runs the same parity
#: checks with float32 inputs at the reference's float tolerances
#: (rtol 1e-4 / atol 1e-6, /root/reference/tests/utils.py:66-72).
DEFAULT_DTYPE = "double"


def set_default_dtype(name: str) -> None:
    global DEFAULT_DTYPE
    if name not in ("double", "float"):
        raise ValueError(name)
    DEFAULT_DTYPE = name


def _float_mode() -> bool:
    return DEFAULT_DTYPE == "float"


def to_torch(x, dtype=None):
    a = np.asarray(x)
    if dtype is None:
        if np.iscomplexobj(a):
            dtype = torch.cfloat if _float_mode() else torch.cdouble
        else:
            dtype = torch.float if _float_mode() else torch.double
    return torch.as_tensor(a, dtype=dtype)


def to_jax(x, dtype=None):
    if isinstance(x, torch.Tensor):
        x = x.detach().cpu().numpy()
    a = np.asarray(x)
    if dtype is None:
        if np.iscomplexobj(a):
            dtype = jnp.complex64 if _float_mode() else jnp.complex128
        else:
            dtype = jnp.float32 if _float_mode() else jnp.float64
    return jnp.asarray(a, dtype)


def assert_close(actual, desired, rtol=1e-5, atol=1e-8, msg=""):
    if _float_mode():
        rtol = max(rtol, 1e-4)
        atol = max(atol, 1e-6)
    actual = np.asarray(actual)
    if isinstance(desired, torch.Tensor):
        desired = desired.detach().cpu().numpy()
    desired = np.asarray(desired)
    assert actual.shape == desired.shape, (
        f"shape mismatch {actual.shape} vs {desired.shape} {msg}")
    np.testing.assert_allclose(actual, desired, rtol=rtol, atol=atol,
                               err_msg=msg)


def check_parity(jax_fn, ref_fn, *inputs, rtol=1e-5, atol=1e-8,
                 jax_inputs=None):
    """Compare our op against the PyTorch reference on float64 inputs.

    ``inputs`` are numpy arrays; ``jax_fn`` gets jnp copies, ``ref_fn`` gets
    torch.double copies.
    """
    if _float_mode():
        # reference float tolerances (tests/utils.py:66-72); never
        # tighter than the caller's double-mode request
        rtol = max(rtol, 1e-4)
        atol = max(atol, 1e-6)
    t_in = [to_torch(x) for x in inputs]
    j_in = [to_jax(x) for x in (jax_inputs if jax_inputs is not None else inputs)]
    with torch.no_grad():
        desired = ref_fn(*t_in)
    actual = jax_fn(*j_in)
    assert_close(actual, desired, rtol=rtol, atol=atol)


def check_various_shape(fn, x, batch_dims=(2,), rtol=1e-6, atol=1e-10):
    """1D/2D/3D views of the same data must agree (broadcast contract)."""
    y1 = np.asarray(fn(jnp.asarray(x)))
    x2 = jnp.broadcast_to(jnp.asarray(x), batch_dims + x.shape)
    y2 = np.asarray(fn(x2))
    for b in np.ndindex(*batch_dims):
        np.testing.assert_allclose(y2[b], y1, rtol=rtol, atol=atol)


def check_differentiability(fn, *shapes, key=0, complex_input=False):
    """Gradients must exist, be finite, and not be identically zero."""
    keys = jax.random.split(jax.random.PRNGKey(key), len(shapes))
    args = [jax.random.normal(k, s, jnp.float64) for k, s in zip(keys, shapes)]

    def loss(*a):
        out = fn(*a)
        if jnp.iscomplexobj(out):
            out = jnp.abs(out)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss, argnums=tuple(range(len(args))))(*args)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g))), "gradient has NaN/Inf"
    assert any(np.any(np.asarray(g) != 0) for g in grads), "gradient is zero"


def check_learnable(op, *input_shapes, key=0):
    """One gradient step must change every trainable parameter."""
    params = op.trainable_params
    assert params, "op has no trainable params"
    keys = jax.random.split(jax.random.PRNGKey(key), len(input_shapes))
    args = [jax.random.normal(k, s, jnp.float64)
            for k, s in zip(keys, input_shapes)]

    def loss(p):
        full = {**op.params, **p}
        out = op.apply(full, *args)
        if jnp.iscomplexobj(out):
            out = jnp.abs(out)
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(params)
    for name, g in grads.items():
        assert np.any(np.asarray(g) != 0), f"param {name} has zero gradient"
        new = params[name] - 1e-3 * g
        assert not np.allclose(np.asarray(new), np.asarray(params[name])), (
            f"param {name} did not change")


def check_sharded_equivalence(fn, x, axis: int = -1, n_shards: int = 4,
                              rtol=1e-6, atol=1e-10):
    """N-device sharded output must match single-device output."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:n_shards])
    mesh = Mesh(devices, ("t",))
    spec = [None] * x.ndim
    spec[axis] = "t"
    sharding = NamedSharding(mesh, P(*spec))
    xs = jax.device_put(x, sharding)
    y_sharded = np.asarray(jax.jit(fn)(xs))
    y_single = np.asarray(fn(x))
    np.testing.assert_allclose(y_sharded, y_single, rtol=rtol, atol=atol)
