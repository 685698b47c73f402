"""Mel-generalized cepstral analysis (gamma != 0 Newton solver)
(reference: diffsptk/modules/mgcep.py:60-332).

Same shape as mcep's Newton loop with a b-domain change of variables and
extra P/Q/R transform matrices; gamma == 0 delegates to MelCepstralAnalysis.
All matrices are host-designed; the fixed-trip loop jits into one graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseNonFunctionalOp, check_size, to_device_array
from ..utils.linalg import hankel, spd_solve, symmetric_toeplitz
from .gnorm import (
    GeneralizedCepstrumGainNormalization,
    GeneralizedCepstrumInverseGainNormalization,
    get_gamma,
)
from .mc2b import (
    MelCepstrumToMLSADigitalFilterCoefficients,
    MLSADigitalFilterCoefficientsToMelCepstrum,
)
from .mcep import MelCepstralAnalysis
from .mgc2mgc import MelGeneralizedCepstrumToMelGeneralizedCepstrum


def design_mgcep_cfreqt(in_order: int, out_order: int,
                        alpha: float) -> np.ndarray:
    """The b-domain warp matrix (reference mgcep.py:252-283): seeded with
    A[0,0]=1, A[1,1:]=alpha^(j-1)*beta."""
    beta = 1.0 - alpha * alpha
    L1, L2 = in_order + 1, out_order + 1
    A = np.zeros((L2, L1))
    A[0, 0] = 1.0
    if L2 > 1 and L1 > 1:
        A[1, 1:] = alpha ** np.arange(L1 - 1) * beta
    for i in range(2, L2):
        for j in range(1, L1):
            A[i, j] = A[i - 1, j - 1] + alpha * (A[i, j - 1] - A[i - 1, j])
    return A.T


def design_ptrans(order: int, alpha: float) -> np.ndarray:
    A = np.eye(order + 1)
    for i in range(order):
        A[i, i + 1] = alpha
    A[0, 0] -= alpha * alpha
    A[0, 1] += alpha
    A[-1, -1] += alpha
    return A.T


def design_qtrans(order: int, alpha: float) -> np.ndarray:
    A = np.eye(order + 1)
    for i in range(1, order + 1):
        A[i, i - 1] = alpha
    A[1, 0] = 0.0
    A[1, 1] += alpha
    return A.T


class MelGeneralizedCepstralAnalysis(BaseNonFunctionalOp):
    """Power spectrum (..., L/2+1) -> mel-generalized cepstrum (..., M+1).

    Examples
    --------
    >>> import jax, numpy as np
    >>> import diffsptk_tpu
    >>> sp = diffsptk_tpu.Spectrum(64)(
    ...     diffsptk_tpu.nrand(63, key=jax.random.PRNGKey(0)))
    >>> mg = diffsptk_tpu.MelGeneralizedCepstralAnalysis(
    ...     fft_length=64, cep_order=4, alpha=0.42, gamma=-0.5)(sp)
    >>> np.round(np.asarray(mg), 3)
    array([ 1.281, -0.032,  0.026,  0.072,  0.061])
    """

    def __init__(self, *, fft_length: int, cep_order: int, alpha: float = 0,
                 gamma: float = 0, c: int | None = None, n_iter: int = 0,
                 dtype=None) -> None:
        gamma = get_gamma(gamma, c)
        if fft_length <= 1:
            raise ValueError("fft_length must be greater than 1.")
        if cep_order < 0:
            raise ValueError("cep_order must be non-negative.")
        if fft_length < 2 * cep_order:
            raise ValueError("cep_order must be <= fft_length // 2.")
        if 1 <= abs(alpha):
            raise ValueError("alpha must be in (-1, 1).")
        if gamma < -1 or 0 < gamma:
            raise ValueError("gamma must be in [-1, 0].")
        if n_iter < 0:
            raise ValueError("n_iter must be non-negative.")

        self.fft_length = fft_length
        self.cep_order = cep_order
        self.gamma = gamma
        self.n_iter = n_iter

        if gamma == 0:
            self.mcep = MelCepstralAnalysis(
                fft_length=fft_length, cep_order=cep_order, alpha=alpha,
                n_iter=n_iter, dtype=dtype)
            return

        M, L = cep_order, fft_length
        self.cfreqt = to_device_array(design_mgcep_cfreqt(M, L - 1, -alpha),
                                      dtype)
        self.pfreqt = to_device_array(design_mgcep_cfreqt(L - 1, 2 * M,
                                                          alpha), dtype)
        self.rfreqt = to_device_array(design_mgcep_cfreqt(L - 1, M, alpha),
                                      dtype)
        self.ptrans = to_device_array(design_ptrans(2 * M, alpha), dtype)
        self.qtrans = to_device_array(design_qtrans(2 * M, alpha), dtype)

        ign = GeneralizedCepstrumInverseGainNormalization(M, -1)
        b2mc_ = MLSADigitalFilterCoefficientsToMelCepstrum(M, alpha)
        g2g = MelGeneralizedCepstrumToMelGeneralizedCepstrum(
            M, M, in_gamma=-1, out_gamma=gamma)
        mc2b_ = MelCepstrumToMLSADigitalFilterCoefficients(M, alpha)
        gn = GeneralizedCepstrumGainNormalization(M, gamma)

        def b2b(b):
            return gn(mc2b_(g2g(b2mc_(ign(b)))))

        gn2 = GeneralizedCepstrumInverseGainNormalization(M, gamma)

        def b2mc(b):
            return b2mc_(gn2(b))

        self.b2b = b2b
        self.b2mc = b2mc

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.gamma == 0:
            return self.mcep(x)

        M = self.cep_order
        H = self.fft_length // 2
        check_size(x.shape[-1], H + 1, "dimension of spectrum")

        def newton(gamma, b1):
            def epsilon(r, b):
                return r[..., 0] + gamma * jnp.sum(r[..., 1:] * b, axis=-1)

            b = jnp.concatenate(
                (jnp.zeros_like(b1[..., :1]), b1), axis=-1)
            from ..kernels import mxu_fft
            c = b @ self.cfreqt
            C = mxu_fft.rfft(c, self.fft_length)

            if gamma == -1:
                p_re = x
                p = (jnp.fft.irfft(p_re) @ self.pfreqt)
                q = p
                r = p[..., : M + 1]
            else:
                X = 1 + gamma * C.real
                Y = gamma * C.imag
                XX, YY = X * X, Y * Y
                D = XX + YY
                E = jnp.power(D, -1 / gamma)
                pw = x * E / D
                qw = pw / D
                p = jnp.fft.irfft(pw) @ self.pfreqt
                q = (mxu_fft.irfft(
                    jax.lax.complex(qw * (XX - YY), qw * 2 * X * Y),
                    self.fft_length) @ self.pfreqt)
                r = (mxu_fft.irfft(jax.lax.complex(pw * X, pw * Y),
                                   self.fft_length) @ self.rfreqt)

            p = p @ self.ptrans
            q = q @ self.qtrans

            if gamma != -1:
                eps = epsilon(r, b1)

            pt = p[..., :M]
            qt = q[..., 2:] * (1 + gamma)
            rt = r[..., 1:]

            from .mcep import _use_newton_kernel
            if _use_newton_kernel(qt):
                # TPU: unrolled register-tile Pallas kernel forming
                # A[i, j] = pt[|i-j|] + qt[i+j] in registers
                # (kernels/pallas_newton.py).
                from ..kernels.pallas_newton import toephank_solve
                gradient = toephank_solve(pt, qt, rt)
            else:
                R = symmetric_toeplitz(pt)
                Q = hankel(qt)
                gradient = spd_solve(R + Q, rt)
            b1 = b1 + gradient

            if gamma == -1:
                eps = epsilon(r, b1)
            b0 = jnp.sqrt(eps)[..., None]
            return b0, b1

        b1 = jnp.zeros(x.shape[:-1] + (M,), x.dtype)
        b0, b1 = newton(-1, b1)

        if self.gamma != -1:
            b = jnp.concatenate((b0, b1), axis=-1)
            b = self.b2b(b)
            b1 = b[..., 1:]
            for _ in range(self.n_iter):
                b0, b1 = newton(self.gamma, b1)

        b = jnp.concatenate((b0, b1), axis=-1)
        return self.b2mc(b)
