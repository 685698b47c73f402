"""Polynomial roots and inverse (reference: diffsptk/modules/root_pol.py,
pol_root.py).

Complex eigendecomposition has no TPU path.  The default root finder is a
batched, fully on-device **Aberth-Ehrlich** simultaneous iteration
(``method='aberth'``): cubically convergent, pure complex elementwise
arithmetic, so it jits on any backend with no host round-trip in the
middle of the graph.  ``method='eig'`` runs the companion-matrix
eigensolve on the host through ``jax.pure_callback`` for bit parity with
LAPACK (unavailable on backends without host callbacks).  The roots of
*static* polynomials — e.g. Padé denominators — are precomputed at design
time and never hit either path.  RootsToPolynomial is a jittable
convolution cascade.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, default_dtype, filter_values


def _np_roots_batched(a: np.ndarray) -> np.ndarray:
    """Roots of each polynomial in the batch via numpy companion eig."""
    shape = a.shape
    flat = a.reshape(-1, shape[-1])
    out = np.empty((flat.shape[0], shape[-1] - 1), dtype=np.complex128)
    for i in range(flat.shape[0]):
        c = flat[i]
        companion = np.zeros((len(c) - 1, len(c) - 1), dtype=c.dtype)
        companion[0, :] = -c[1:] / c[0]
        companion[1:, :-1] = np.eye(len(c) - 2)
        out[i] = np.linalg.eigvals(companion)
    return out.reshape(shape[:-1] + (shape[-1] - 1,))


def aberth_roots(a: jnp.ndarray, n_iter: int = 64) -> jnp.ndarray:
    """Batched Aberth-Ehrlich root finding, fully on-device.

    a: (..., M+1) coefficients in descending powers (real or complex).
    Returns (..., M) complex roots (unordered).  All arithmetic is
    elementwise complex, so this runs jitted on TPU where complex eig
    does not.
    """
    cdtype = jnp.result_type(a.dtype, np.complex64)
    a = a.astype(cdtype)
    M = a.shape[-1] - 1
    monic = a / a[..., :1]

    # Initial guesses: circle of Cauchy-bound radius with irrational
    # angular offset (breaks symmetry for real-coefficient inputs).
    radius = 1.0 + jnp.max(jnp.abs(monic[..., 1:]), axis=-1, keepdims=True)
    k = jnp.arange(M)
    angles = 2 * jnp.pi * (k + 0.376) / M + 0.5
    z = radius.astype(cdtype) * jnp.exp(1j * angles).astype(cdtype)

    powers = jnp.arange(M, -1, -1)
    dcoef = monic[..., :-1] * powers[:-1]

    def horner(c, z):
        # evaluate sum c_k z^(M-k) at z: (..., M) points
        acc = jnp.zeros_like(z) + c[..., :1]
        for i in range(1, c.shape[-1]):
            acc = acc * z + c[..., i:i + 1]
        return acc

    def step(z, _):
        p = horner(monic, z)
        dp = horner(dcoef, z)
        w = p / jnp.where(dp == 0, 1e-30, dp)
        diff = z[..., :, None] - z[..., None, :]
        eye = jnp.eye(M, dtype=bool)
        inv = jnp.where(eye, 0.0, 1.0 / jnp.where(eye, 1.0, diff))
        s = jnp.sum(inv, axis=-1)
        corr = w / (1.0 - w * s)
        return z - corr, None

    z, _ = jax.lax.scan(step, z, None, length=n_iter)
    return z


class PolynomialToRoots(BaseOp):
    """(..., M+1) coefficients (descending powers) -> (..., M) complex
    roots.  Non-differentiable (host callback).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> r = diffsptk_tpu.PolynomialToRoots(2)(
    ...     jnp.asarray([1.0, -3.0, 2.0]))              # (x-1)(x-2)
    >>> np.round(np.sort(np.asarray(r.real)), 3)
    array([1., 2.])
    """

    _input_names = ("a",)

    def __init__(self, order: int, eps: float | None = None,
                 out_format: str | int = "rectangular",
                 method: str = "aberth", dtype=None) -> None:
        self.in_dim = order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))))

    @staticmethod
    def _check(order: int, eps: float | None) -> None:
        if order <= 0:
            raise ValueError("order must be positive.")
        if eps is not None and eps < 0:
            raise ValueError("eps must be non-negative.")

    @staticmethod
    def _design(order: int, eps: float | None = None,
                out_format: str | int = "rectangular",
                method: str = "aberth") -> Design:
        PolynomialToRoots._check(order, eps)
        if method not in ("aberth", "eig"):
            raise ValueError(f"method {method} is not supported.")
        if out_format in (0, "rectangular"):
            formatter = lambda x: x
        elif out_format in (1, "polar"):
            formatter = lambda x: jax.lax.complex(jnp.abs(x), jnp.angle(x))
        else:
            raise ValueError(f"out_format {out_format} is not supported.")
        return Design(values={"order": order, "formatter": formatter,
                              "method": method})

    @staticmethod
    def _forward(a: jnp.ndarray, *, order: int, formatter,
                 method: str = "aberth") -> jnp.ndarray:
        if method == "aberth":
            return formatter(aberth_roots(a))
        cdtype = jnp.result_type(a.dtype, np.complex64)
        out_spec = jax.ShapeDtypeStruct(a.shape[:-1] + (order,), cdtype)

        def host(a_np):
            return _np_roots_batched(np.asarray(a_np,
                                                np.complex128)).astype(cdtype)

        x = jax.pure_callback(host, out_spec, a, vmap_method="broadcast_all")
        return formatter(x)

    def __call__(self, a):
        check_size(a.shape[-1], self.in_dim, "order of polynomial")
        return self.apply(self.params, a)


class RootsToPolynomial(BaseOp):
    """(..., M) roots -> (..., M+1) coefficients via iterated convolution
    with (1 - r_m z^-1).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> p = diffsptk_tpu.RootsToPolynomial(2)(jnp.asarray([1.0, 2.0]))
    >>> np.round(np.asarray(p), 3)
    array([ 1., -3.,  2.])
    """

    _input_names = ("x",)

    def __init__(self, order: int, eps: float | None = None,
                 in_format: str | int = "rectangular") -> None:
        self.in_dim = order
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(order: int, eps: float | None) -> None:
        PolynomialToRoots._check(order, eps)

    @staticmethod
    def _design(order: int | None = None, eps: float | None = None,
                in_format: str | int = "rectangular") -> Design:
        if in_format in (0, "rectangular"):
            formatter = lambda x: x
        elif in_format in (1, "polar"):
            formatter = lambda x: x.real * jnp.exp(1j * x.imag)
        else:
            raise ValueError(f"in_format {in_format} is not supported.")
        return Design(values={"formatter": formatter})

    @staticmethod
    def _forward(x: jnp.ndarray, *, formatter) -> jnp.ndarray:
        x = formatter(x)
        M = x.shape[-1]
        a = jnp.zeros(x.shape[:-1] + (M + 1,), x.dtype).at[..., 0].set(1)
        for m in range(M):
            shifted = a[..., :-1]
            a = a.at[..., 1:].set(a[..., 1:] - x[..., m:m + 1] * shifted)
        return a

    def __call__(self, x):
        check_size(x.shape[-1], self.in_dim, "number of roots")
        return self.apply(self.params, x)


def roots_to_polynomial(x: jnp.ndarray) -> jnp.ndarray:
    """Functional form of RootsToPolynomial (jittable)."""
    return RootsToPolynomial._forward(x, formatter=lambda v: v)
