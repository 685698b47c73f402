"""Mel-generalized cepstrum converter — the universal converter of the
cepstrum stack (reference: diffsptk/modules/mgc2mgc.py:140-439).

The (alpha, gamma, norm, mul) source/target combination compiles at design
time into a fixed chain of stages: gamma (de)multiplication, gain
(de)normalization, all-pass warping (freqt matmul), and the gnorm-domain
gc2gc FFT composition exp/log trick.  The chain is a list of pure closures,
so the whole converter jits into one fused graph.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import BaseOp, Design, check_size, filter_values
from ..utils.linalg import cexp, clog
from .freqt import FrequencyTransform
from .gnorm import (
    GeneralizedCepstrumGainNormalization,
    GeneralizedCepstrumInverseGainNormalization,
)


def gc2gc(c1: jnp.ndarray, out_order: int, in_gamma: float,
          out_gamma: float, n_fft: int = 512) -> jnp.ndarray:
    """Generalized-cepstrum power change in the gain-normalized domain:
    C2 = s^{-1}_gamma2(s_gamma1(C1)) evaluated on an n_fft grid."""
    pad = [(0, 0)] * (c1.ndim - 1) + [(1, 0)]
    c01 = jnp.pad(c1[..., 1:], pad)
    C1 = jnp.fft.fft(c01, n=n_fft)

    if in_gamma == 0:
        sC1 = cexp(C1)
    else:
        C1 = C1 * in_gamma + 1.0
        r = jnp.abs(C1) ** (1.0 / in_gamma)
        theta = jnp.angle(C1) / in_gamma
        sC1 = r * jnp.exp(1j * theta)

    if out_gamma == 0:
        C2 = clog(sC1)
    else:
        r = jnp.abs(sC1) ** out_gamma
        theta = jnp.angle(sC1) * out_gamma
        C2 = (r * jnp.cos(theta) - 1.0) / out_gamma

    c02 = jnp.fft.ifft(C2).real[..., : out_order + 1]
    return jnp.concatenate((c1[..., :1], 2 * c02[..., 1:]), axis=-1)


def _gamma_div(gamma):
    def fn(c):
        return jnp.concatenate((c[..., :1], c[..., 1:] / gamma), axis=-1)
    return fn


def _gamma_mul(gamma):
    def fn(c):
        return jnp.concatenate((c[..., :1], c[..., 1:] * gamma), axis=-1)
    return fn


def _zeroth_gamma_div(gamma):
    def fn(c):
        return jnp.concatenate(((c[..., :1] - 1) / gamma, c[..., 1:]),
                               axis=-1)
    return fn


def _zeroth_gamma_mul(gamma):
    def fn(c):
        return jnp.concatenate((c[..., :1] * gamma + 1, c[..., 1:]), axis=-1)
    return fn


def _gnorm(gamma):
    def fn(c):
        return GeneralizedCepstrumGainNormalization._forward(c, gamma=gamma)
    return fn


def _ignorm(gamma):
    def fn(c):
        return GeneralizedCepstrumInverseGainNormalization._forward(
            c, gamma=gamma)
    return fn


class MelGeneralizedCepstrumToMelGeneralizedCepstrum(BaseOp):
    """(..., M1+1) mel-generalized cepstrum -> (..., M2+1).

    Examples
    --------
    >>> import jax, numpy as np
    >>> import diffsptk_tpu
    >>> sp = diffsptk_tpu.Spectrum(64)(
    ...     diffsptk_tpu.nrand(63, key=jax.random.PRNGKey(0)))
    >>> mc = diffsptk_tpu.MelCepstralAnalysis(
    ...     fft_length=64, cep_order=4, alpha=0.42)(sp)
    >>> cv = diffsptk_tpu.MelGeneralizedCepstrumToMelGeneralizedCepstrum(
    ...     4, 6, in_alpha=0.42, out_alpha=0.1, in_gamma=0, out_gamma=-0.5)
    >>> np.round(np.asarray(cv(mc)), 2)
    array([ 1.2 , -0.08,  0.03,  0.  ,  0.04,  0.06,  0.06])
    """

    _input_names = ("mc",)

    def __init__(self, in_order: int, out_order: int, in_alpha: float = 0,
                 out_alpha: float = 0, in_gamma: float = 0,
                 out_gamma: float = 0, in_norm: bool = False,
                 out_norm: bool = False, in_mul: bool = False,
                 out_mul: bool = False, n_fft: int = 512,
                 dtype=None) -> None:
        self.in_dim = in_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(in_order, out_order, in_alpha, out_alpha, in_gamma, out_gamma,
               in_mul, n_fft) -> None:
        if in_order < 0 or out_order < 0:
            raise ValueError("order must be non-negative.")
        if 1 <= abs(in_alpha) or 1 <= abs(out_alpha):
            raise ValueError("alpha must be in (-1, 1).")
        if 1 < abs(in_gamma) or 1 < abs(out_gamma):
            raise ValueError("gamma must be in [-1, 1].")
        if n_fft <= max(in_order, out_order) + 1:
            raise ValueError("n_fft must be much larger than cepstrum order.")
        if in_gamma == 0 and in_mul:
            raise ValueError("Invalid combination of in_gamma and in_mul.")

    @staticmethod
    def _design(in_order: int, out_order: int, in_alpha: float = 0,
                out_alpha: float = 0, in_gamma: float = 0,
                out_gamma: float = 0, in_norm: bool = False,
                out_norm: bool = False, in_mul: bool = False,
                out_mul: bool = False, n_fft: int = 512) -> Design:
        M = MelGeneralizedCepstrumToMelGeneralizedCepstrum
        M._check(in_order, out_order, in_alpha, out_alpha, in_gamma,
                 out_gamma, in_mul, n_fft)

        seq = []
        if not in_norm and in_mul:
            seq.append(_zeroth_gamma_div(in_gamma))

        alpha = (out_alpha - in_alpha) / (1 - in_alpha * out_alpha)
        if alpha == 0:
            if in_order == out_order and in_gamma == out_gamma:
                if not in_mul and out_mul:
                    seq.append(_gamma_mul(in_gamma))
                if not in_norm and out_norm:
                    seq.append(_gnorm(in_gamma))
                if in_norm and not out_norm:
                    seq.append(_ignorm(out_gamma))
                if in_mul and not out_mul:
                    seq.append(_gamma_div(out_gamma))
            else:
                if in_mul:
                    seq.append(_gamma_div(in_gamma))
                if not in_norm:
                    seq.append(_gnorm(in_gamma))
                seq.append(lambda c: gc2gc(c, out_order, in_gamma,
                                           out_gamma, n_fft))
                if not out_norm:
                    seq.append(_ignorm(out_gamma))
                if out_mul:
                    seq.append(_gamma_mul(out_gamma))
        else:
            if in_mul:
                seq.append(_gamma_div(in_gamma))
            if in_norm:
                seq.append(_ignorm(in_gamma))
            freqt = FrequencyTransform(in_order, out_order, alpha)
            seq.append(freqt)
            if out_norm or in_gamma != out_gamma:
                seq.append(_gnorm(in_gamma))
            if in_gamma != out_gamma:
                seq.append(lambda c: gc2gc(c, out_order, in_gamma,
                                           out_gamma, n_fft))
            if not out_norm and in_gamma != out_gamma:
                seq.append(_ignorm(out_gamma))
            if out_mul:
                seq.append(_gamma_mul(out_gamma))

        if not out_norm and out_mul:
            seq.append(_zeroth_gamma_mul(out_gamma))

        def apply_seq(x):
            for layer in seq:
                x = layer(x)
            return x

        return Design(layers={"seq": apply_seq})

    @staticmethod
    def _forward(mc: jnp.ndarray, *, seq) -> jnp.ndarray:
        return seq(mc)

    def __call__(self, mc):
        check_size(mc.shape[-1], self.in_dim, "dimension of cepstrum")
        return self.apply(self.params, mc)
