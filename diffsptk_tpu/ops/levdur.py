"""Levinson-Durbin and its reverse (reference: diffsptk/modules/levdur.py,
rlevdur.py).

Like the reference, the forward is NOT the scalar recursion: it is a batched
symmetric-Toeplitz solve (levdur.py:114-127) — one (M x M) LU per frame,
which XLA batches across frames; this keeps the MXU busy instead of running
an O(M^2) sequential recursion per frame.  eps*I regularization stabilizes
float32 (levdur.py:109-110).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, default_dtype, filter_values
from ..utils.linalg import remove_gain, spd_solve, symmetric_toeplitz


class LevinsonDurbin(BaseOp):
    """Autocorrelation (..., M+1) -> LPC [K, a1..aM].

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> r = diffsptk_tpu.functional.acorr(diffsptk_tpu.ramp(3), 2)
    >>> np.round(np.asarray(r), 1)
    array([14.,  8.,  3.])
    >>> np.round(np.asarray(diffsptk_tpu.LevinsonDurbin(2)(r)), 3)
    array([ 3.028, -0.667,  0.167])
    """

    _input_names = ("r",)

    def __init__(self, lpc_order: int, eps: float | None = None,
                 dtype=None) -> None:
        self.in_dim = lpc_order + 1
        self._setup(self._design(
            lpc_order, eps, np.dtype(dtype) if dtype else None), dtype=dtype)

    @staticmethod
    def _check(lpc_order: int, eps: float | None) -> None:
        if lpc_order < 0:
            raise ValueError("lpc_order must be non-negative.")
        if eps is not None and eps < 0:
            raise ValueError("eps must be non-negative.")

    @staticmethod
    def _design(lpc_order: int, eps: float | None = None,
                dtype=None) -> Design:
        LevinsonDurbin._check(lpc_order, eps)
        if eps is None:
            compute = np.dtype(dtype) if dtype else np.dtype(default_dtype())
            eps = 1e-5 if compute == np.float32 else 0.0
        return Design(arrays={"eye": np.eye(lpc_order) * eps})

    @staticmethod
    def _forward(r: jnp.ndarray, *, eye: jnp.ndarray) -> jnp.ndarray:
        r0, r1 = r[..., :1], r[..., 1:]
        R = symmetric_toeplitz(r[..., :-1]) + eye
        # autocorrelation matrix is SPD: batched masked Cholesky
        a = spd_solve(R, -r1)
        K = jnp.sqrt(jnp.sum(r1 * a, axis=-1, keepdims=True) + r0)
        return jnp.concatenate((K, a), axis=-1)

    def __call__(self, r):
        check_size(r.shape[-1], self.in_dim, "dimension of autocorrelation")
        return self.apply(self.params, r)


class ReverseLevinsonDurbin(BaseOp):
    """LPC -> autocorrelation via r = irfft((K/|A|)^2)."""

    _input_names = ("a",)

    def __init__(self, lpc_order: int, n_fft: int = 512, dtype=None) -> None:
        self.in_dim = lpc_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(lpc_order: int, n_fft: int) -> None:
        if lpc_order < 0:
            raise ValueError("lpc_order must be non-negative.")
        if n_fft <= lpc_order:
            raise ValueError("n_fft must exceed lpc_order.")

    @staticmethod
    def _design(lpc_order: int, n_fft: int = 512) -> Design:
        ReverseLevinsonDurbin._check(lpc_order, n_fft)
        omega = np.linspace(0, np.pi, n_fft)
        m = np.arange(lpc_order + 1)
        phase = np.exp(-1j * omega[None, :] * m[:, None])  # (M+1, n_fft)
        return Design(arrays={"phase_factors": phase})

    @staticmethod
    def _forward(a: jnp.ndarray, *, phase_factors: jnp.ndarray) -> jnp.ndarray:
        M = a.shape[-1] - 1
        K, monic = remove_gain(a, return_gain=True)
        A = jnp.sum(monic[..., None] * phase_factors, axis=-2)
        r = jnp.fft.irfft(jnp.square(K / jnp.abs(A)))[..., : M + 1]
        return r

    def __call__(self, a):
        check_size(a.shape[-1], self.in_dim, "dimension of LPC")
        return self.apply(self.params, a)
