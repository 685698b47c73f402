"""PARCOR-domain conversions (reference: diffsptk/modules/{lpc2par,par2lpc,
par2is,is2par,par2lar,lar2par,norm0}.py).

Step-up/step-down recursions run as static Python loops over the (small)
order — they unroll into a fixed jitted graph; the elementwise pairs are
single VPU ops.  Index 0 of every vector is the gain K and is passed through
(or transformed) exactly as SPTK does.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import BaseOp, Design, check_size, filter_values
from .gnorm import get_gamma


def _check_order_gamma(order: int, gamma: float, c: int | None) -> None:
    if order < 0:
        raise ValueError("order must be non-negative.")
    if 1 < abs(gamma):
        raise ValueError("gamma must be in [-1, 1].")
    if c is not None and c != 0 and c < 1:
        raise ValueError("c must be greater than or equal to 1.")


class LinearPredictiveCoefficientsToParcorCoefficients(BaseOp):
    """LPC -> PARCOR by the Levinson step-down recursion.

    Examples
    --------
    >>> import jax, numpy as np
    >>> import diffsptk_tpu
    >>> a = diffsptk_tpu.LPC(32, 4)(
    ...     diffsptk_tpu.nrand(31, key=jax.random.PRNGKey(2)))
    >>> k = diffsptk_tpu.LinearPredictiveCoefficientsToParcorCoefficients(4)(a)
    >>> np.round(np.asarray(k), 3)
    array([ 5.076, -0.133, -0.13 ,  0.185, -0.463])
    >>> back = diffsptk_tpu.ParcorCoefficientsToLinearPredictiveCoefficients(4)(k)
    >>> bool(np.allclose(np.asarray(back), np.asarray(a)))
    True
    >>> np.round(np.asarray(                       # PARCOR -> inverse sine
    ...     diffsptk_tpu.ParcorCoefficientsToInverseSine(4)(k)), 3)
    array([ 5.076, -0.085, -0.083,  0.118, -0.306])
    >>> np.round(np.asarray(                       # PARCOR -> log area ratio
    ...     diffsptk_tpu.ParcorCoefficientsToLogAreaRatio(4)(k)), 3)
    array([ 5.076, -0.268, -0.261,  0.374, -1.002])
    """

    _input_names = ("a",)

    def __init__(self, lpc_order: int, gamma: float = 1.0,
                 c: int | None = None) -> None:
        self.in_dim = lpc_order + 1
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(lpc_order: int, gamma: float, c: int | None) -> None:
        _check_order_gamma(lpc_order, gamma, c)

    @staticmethod
    def _design(lpc_order: int, gamma: float = 1.0,
                c: int | None = None) -> Design:
        _check_order_gamma(lpc_order, gamma, c)
        return Design(values={"gamma": get_gamma(gamma, c)})

    @staticmethod
    def _forward(a: jnp.ndarray, *, gamma: float) -> jnp.ndarray:
        M = a.shape[-1] - 1
        K, tail = a[..., :1], a[..., 1:] * gamma
        ks = []
        cur = tail
        for m in reversed(range(M)):
            km = cur[..., m:m + 1]
            ks.append(km)
            if m == 0:
                break
            z = 1 - km * km
            head = cur[..., :-1]
            cur = (head - km * jnp.flip(head, -1)) / z
        ks.append(K)
        return jnp.concatenate(ks[::-1], axis=-1)

    def __call__(self, a):
        check_size(a.shape[-1], self.in_dim, "dimension of LPC")
        return self.apply(self.params, a)


class ParcorCoefficientsToLinearPredictiveCoefficients(BaseOp):
    """PARCOR -> LPC by the Levinson step-up recursion."""

    _input_names = ("k",)

    def __init__(self, lpc_order: int, gamma: float = 1.0,
                 c: int | None = None) -> None:
        self.in_dim = lpc_order + 1
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(lpc_order: int, gamma: float, c: int | None) -> None:
        _check_order_gamma(lpc_order, gamma, c)

    @staticmethod
    def _design(lpc_order: int, gamma: float = 1.0,
                c: int | None = None) -> Design:
        _check_order_gamma(lpc_order, gamma, c)
        return Design(values={"gamma": get_gamma(gamma, c)})

    @staticmethod
    def _forward(k: jnp.ndarray, *, gamma: float) -> jnp.ndarray:
        a = k / gamma
        for m in range(2, k.shape[-1]):
            km = k[..., m:m + 1]
            am = a[..., 1:m]
            a = jnp.concatenate(
                [a[..., :1], am + km * jnp.flip(am, -1), a[..., m:]], axis=-1)
        return a

    def __call__(self, k):
        check_size(k.shape[-1], self.in_dim, "dimension of PARCOR")
        return self.apply(self.params, k)


class _GainPreservingElementwise(BaseOp):
    """Shared: transform the tail, pass the gain through."""

    def __init__(self, par_order: int) -> None:
        self.in_dim = par_order + 1
        if par_order < 0:
            raise ValueError("par_order must be non-negative.")
        self._setup(Design())

    def __call__(self, x):
        check_size(x.shape[-1], self.in_dim, "dimension of input")
        return self.apply(self.params, x)

    @staticmethod
    def _check(par_order: int) -> None:
        if par_order < 0:
            raise ValueError("par_order must be non-negative.")

    @classmethod
    def _design(cls, par_order: int) -> Design:
        cls._check(par_order)
        return Design()


class ParcorCoefficientsToInverseSine(_GainPreservingElementwise):
    """PARCOR -> inverse-sine coefficients (reference: par2is.py)."""

    _input_names = ("k",)

    @staticmethod
    def _forward(k: jnp.ndarray) -> jnp.ndarray:
        K, tail = k[..., :1], k[..., 1:]
        eps = 1e-6
        tail = jnp.clip(tail, -1 + eps, 1 - eps)
        return jnp.concatenate((K, (2 / jnp.pi) * jnp.arcsin(tail)), axis=-1)


class InverseSineToParcorCoefficients(_GainPreservingElementwise):
    """Inverse of :class:`ParcorCoefficientsToInverseSine`
    (reference: is2par.py)."""

    _input_names = ("s",)

    @staticmethod
    def _forward(s: jnp.ndarray) -> jnp.ndarray:
        K, tail = s[..., :1], s[..., 1:]
        return jnp.concatenate((K, jnp.sin((jnp.pi / 2) * tail)), axis=-1)


class ParcorCoefficientsToLogAreaRatio(_GainPreservingElementwise):
    """PARCOR -> log area ratio 2 artanh(k) (reference: par2lar.py)."""

    _input_names = ("k",)

    @staticmethod
    def _forward(k: jnp.ndarray) -> jnp.ndarray:
        K, tail = k[..., :1], k[..., 1:]
        return jnp.concatenate((K, 2.0 * jnp.arctanh(tail)), axis=-1)


class LogAreaRatioToParcorCoefficients(_GainPreservingElementwise):
    """Inverse of :class:`ParcorCoefficientsToLogAreaRatio`
    (reference: lar2par.py)."""

    _input_names = ("g",)

    @staticmethod
    def _forward(g: jnp.ndarray) -> jnp.ndarray:
        K, tail = g[..., :1], g[..., 1:]
        return jnp.concatenate((K, jnp.tanh(0.5 * tail)), axis=-1)


class AllPoleToAllZeroDigitalFilterCoefficients(_GainPreservingElementwise):
    """norm0: b0 = 1/K, b = a/K (self-inverse)."""

    _input_names = ("a",)

    def __init__(self, filter_order: int) -> None:
        super().__init__(filter_order)

    @staticmethod
    def _check(filter_order: int) -> None:
        if filter_order < 0:
            raise ValueError("filter_order must be non-negative.")

    @classmethod
    def _design(cls, filter_order: int) -> Design:
        cls._check(filter_order)
        return Design()

    @staticmethod
    def _forward(a: jnp.ndarray) -> jnp.ndarray:
        K, tail = a[..., :1], a[..., 1:]
        b0 = 1.0 / K
        return jnp.concatenate((b0, tail * b0), axis=-1)


AllZeroToAllPoleDigitalFilterCoefficients = (
    AllPoleToAllZeroDigitalFilterCoefficients)
