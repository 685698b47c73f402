"""Mel-cepstral analysis — the headline Newton solver
(reference: diffsptk/modules/mcep.py:189-288).

Per iteration: 2 batched FFTs + 3 warp matmuls + one batched
(M+1)x(M+1) Toeplitz+Hankel solve per frame.  The loop has a fixed trip
count, so the whole solver jits into a single fused TPU graph: frames batch
onto the MXU for the matmuls and XLA batches the small LU factorizations.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, filter_values
from ..utils.linalg import hankel, spd_solve, symmetric_toeplitz
from .freqt import FrequencyTransform, design_freqt


def _use_newton_kernel(arr: jnp.ndarray, n: int | None = None) -> bool:
    """Gate for the unrolled Pallas Toeplitz+Hankel solve: TPU, f32,
    small order, and a batch large enough to fill the register tiles.

    ``arr`` supplies dtype and batch shape (leading dims); ``n`` is the
    system order (defaults to the mgcep convention (last_dim+1)//2)."""
    import jax

    if n is None:
        n = (arr.shape[-1] + 1) // 2
    batch = int(np.prod(arr.shape[:-1])) if arr.ndim > 1 else 1
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    return bool(on_tpu and arr.dtype == jnp.float32 and n <= 33
                and batch >= 2048)


def design_coef_freqt(in_order: int, out_order: int,
                      alpha: float) -> np.ndarray:
    """The residual-correlation warp matrix used inside the Newton step
    (reference: mcep.py:269-288); same recurrence as freqt but seeded with
    (-alpha)^i in the 0th column."""
    L1, L2 = in_order + 1, out_order + 1
    A = np.zeros((L2, L1))
    A[:, 0] = (-alpha) ** np.arange(L2)
    for i in range(1, L2):
        for j in range(1, L1):
            A[i, j] = A[i - 1, j - 1] + alpha * (A[i, j - 1] - A[i - 1, j])
    return A.T


class CoefficientsFrequencyTransform(BaseOp):
    """Frequency transform on plain cepstra (freqt matrix applied to
    (..., M1+1)) used inside the mcep Newton loop (reference: freqt.py)."""

    _input_names = ("c",)

    def __init__(self, in_order: int, out_order: int,
                 alpha: float = 0, dtype=None) -> None:
        self.in_dim = in_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(in_order: int, out_order: int, alpha: float) -> None:
        FrequencyTransform._check(in_order, out_order, alpha)

    @staticmethod
    def _design(in_order: int, out_order: int, alpha: float = 0) -> Design:
        CoefficientsFrequencyTransform._check(in_order, out_order, alpha)
        return Design(arrays={"A": design_coef_freqt(in_order, out_order,
                                                     alpha)})

    @staticmethod
    def _forward(c: jnp.ndarray, *, A: jnp.ndarray) -> jnp.ndarray:
        return jnp.matmul(c, A)

    def __call__(self, c):
        check_size(c.shape[-1], self.in_dim, "dimension of cepstrum")
        return self.apply(self.params, c)


class MelCepstralAnalysis(BaseOp):
    """Power spectrum (..., L/2+1) -> mel-cepstrum (..., M+1).

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> sp = diffsptk_tpu.Spectrum(16, eps=0)(diffsptk_tpu.nrand(15))
    >>> mcep = diffsptk_tpu.MelCepstralAnalysis(
    ...     fft_length=16, cep_order=3, alpha=0.1, n_iter=2)
    >>> np.round(np.asarray(mcep(sp)), 3)
    array([ 1.055, -0.339,  0.362,  0.626])
    """

    def __init__(self, *, fft_length: int, cep_order: int,
                 alpha: float = 0, n_iter: int = 0, dtype=None) -> None:
        self.in_dim = fft_length // 2 + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(fft_length: int, cep_order: int, alpha: float,
               n_iter: int) -> None:
        if fft_length <= 1:
            raise ValueError("fft_length must be greater than 1.")
        if cep_order < 0:
            raise ValueError("cep_order must be non-negative.")
        if fft_length < 2 * cep_order:
            raise ValueError("cep_order must be <= fft_length // 2.")
        if 1 <= abs(alpha):
            raise ValueError("alpha must be in (-1, 1).")
        if n_iter < 0:
            raise ValueError("n_iter must be non-negative.")

    @staticmethod
    def _design(fft_length: int, cep_order: int, alpha: float = 0,
                n_iter: int = 0, module: bool = True) -> Design:
        MelCepstralAnalysis._check(fft_length, cep_order, alpha, n_iter)
        H = fft_length // 2
        M = cep_order
        # The Newton iteration's two transform chains each compose into
        # one matmul (host-side, float64):
        #   D  = Re(rfft(ifreqt(mc), L))      -> mc @ P1,  P1 (M+1, H+1)
        #   rt = rfreqt(irfft_real(d, L))     -> d  @ P2,  P2 (H+1, 2M+1)
        # replacing two (H+1)x(H+1) cosine matmuls per iteration with
        # (M+1)- and (2M+1)-column ones (reference: mcep.py:209-216).
        t = np.arange(H + 1)
        k = np.arange(H + 1)
        ang = 2.0 * np.pi * np.outer(t, k) / fft_length
        C1 = np.cos(ang)                                    # (H+1, H+1)
        w = np.full(H + 1, 2.0)
        w[0] = 1.0
        w[H] = 1.0
        Ci = (w[:, None] * np.cos(ang)) / fft_length        # (H+1, H+1)
        A_if = design_freqt(cep_order, H, -alpha)           # (M+1, H+1)
        A_rt = design_coef_freqt(H, 2 * M, alpha)           # (H+1, 2M+1)
        P1 = A_if @ C1
        P2 = Ci @ A_rt
        # Seed chain irfft(log X)[..., :H+1] * scale -> freqt as ONE
        # composed matmul (the XLA TPU irfft alone costs ~0.4 ms at the
        # flagship batch).
        scale = np.ones(H + 1)
        scale[0] = 0.5
        scale[H] = 0.5
        A_seed = design_freqt(H, cep_order, alpha)          # (H+1, M+1)
        P0 = (Ci * scale[None, :]) @ A_seed
        alpha_vector = (-alpha) ** np.arange(cep_order + 1)
        return Design(
            values={"fft_length": fft_length, "n_iter": n_iter},
            arrays={"alpha_vector": alpha_vector, "P0": P0, "P1": P1,
                    "P2": P2})

    @staticmethod
    def _forward(x: jnp.ndarray, *, fft_length: int, n_iter: int,
                 P0: jnp.ndarray, P1: jnp.ndarray, P2: jnp.ndarray,
                 alpha_vector: jnp.ndarray) -> jnp.ndarray:
        import jax

        M = alpha_vector.shape[-1] - 1
        H = fft_length // 2
        n = M + 1
        hi = jax.lax.Precision.HIGHEST

        log_x = jnp.log(x)
        mc = jnp.matmul(log_x, P0, precision=hi)
        if n_iter == 0:
            return mc

        if _use_newton_kernel(x, n):
            # TPU: the whole Newton iteration runs lane-major (frames on
            # lanes) so the composed transform matmuls feed the
            # register-tile Pallas solve with no relayouts; the
            # (batch, n, n) Hessian never exists.
            from ..kernels.pallas_newton import newton_solve_t
            batch = x.shape[:-1]
            mc_t = mc.reshape(-1, n).T                      # (n, B)
            lx_t = log_x.reshape(-1, H + 1).T               # (H+1, B)
            P1_t = P1.T                                     # (H+1, M+1)
            P2_t = P2.T                                     # (2M+1, H+1)
            av = alpha_vector[:, None]
            for _ in range(n_iter):
                D = jnp.matmul(P1_t, mc_t, precision=hi)    # (H+1, B)
                d = jnp.exp(lx_t - D - D)
                rt_t = jnp.matmul(P2_t, d, precision=hi)    # (2M+1, B)
                ra_t = rt_t[:n] - av
                mc_t = mc_t + newton_solve_t(rt_t, ra_t)
            return mc_t.T.reshape(batch + (n,))

        for _ in range(n_iter):
            D = jnp.matmul(mc, P1, precision=hi)
            d = jnp.exp(log_x - D - D)
            rt = jnp.matmul(d, P2, precision=hi)
            r = rt[..., :n]
            ra = r - alpha_vector
            R = symmetric_toeplitz(r)
            Q = hankel(rt)
            # Newton Hessian is SPD; the batched masked-Cholesky
            # solver is ~25x faster than XLA LU for many small
            # systems.
            mc = mc + spd_solve(R + Q, ra)

        return mc

    def __call__(self, x):
        check_size(x.shape[-1], self.in_dim, "dimension of spectrum")
        return self.apply(self.params, x)
