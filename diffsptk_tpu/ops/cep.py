"""Cepstrum conversions and FFT-cepstrum analysis
(reference: diffsptk/modules/{fftcep,c2acr,c2mpir,mpir2c,c2ndps,ndps2c,
cdist}.py).

All are batched FFT chains; the fftcep aliasing-correction loop is a
fixed-trip-count Python loop that unrolls into one fused jitted graph.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, filter_values
from ..utils.linalg import cexp, clog


class CepstralAnalysis(BaseOp):
    """Power spectrum (..., L/2+1) -> cepstrum (..., M+1) with iterative
    aliasing correction (fftcep).

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> sp = diffsptk_tpu.Spectrum(16, eps=0)(diffsptk_tpu.ramp(19))
    >>> np.round(np.asarray(diffsptk_tpu.CepstralAnalysis(16, 3)(sp)), 3)
    array([2.725, 0.906, 0.408, 0.244])
    """

    def __init__(self, fft_length: int, cep_order: int, *,
                 accel: float = 0.0, n_iter: int = 0) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(fft_length: int, cep_order: int, accel: float,
               n_iter: int) -> None:
        if fft_length <= 1:
            raise ValueError("fft_length must be greater than 1.")
        if cep_order < 0:
            raise ValueError("cep_order must be non-negative.")
        if fft_length < 2 * cep_order:
            raise ValueError("cep_order must be <= fft_length // 2.")
        if accel < 0:
            raise ValueError("accel must be non-negative.")
        if n_iter < 0:
            raise ValueError("n_iter must be non-negative.")

    @staticmethod
    def _design(fft_length: int, cep_order: int, accel: float = 0.0,
                n_iter: int = 0) -> Design:
        CepstralAnalysis._check(fft_length, cep_order, accel, n_iter)
        return Design(values={"cep_order": cep_order, "accel": accel,
                              "n_iter": n_iter})

    @staticmethod
    def _forward(x: jnp.ndarray, *, cep_order: int, accel: float,
                 n_iter: int) -> jnp.ndarray:
        N = cep_order + 1
        H = x.shape[-1]
        e = jnp.fft.irfft(jnp.log(x))
        v = e[..., :N]
        pad_n = [(0, 0)] * (x.ndim - 1) + [(N, 0)]
        e = jnp.pad(e[..., N:H], pad_n)
        for _ in range(n_iter):
            e = jnp.fft.hfft(e)
            e = jnp.where(e < 0, 0.0, e)
            e = jnp.fft.ihfft(e).real
            t = e[..., :N] * (1 + accel)
            v = v + t
            e = e - jnp.pad(t, [(0, 0)] * (x.ndim - 1) + [(0, H - N)])
        scale = np.ones(N)
        scale[0] = 0.5
        if H == N:
            scale[N - 1] = 0.5
        return v * jnp.asarray(scale, v.dtype)


class CepstrumToAutocorrelation(BaseOp):
    """c (..., M+1) -> autocorrelation (..., M2+1): hfft(exp(2 Re rfft(c))).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> c = jnp.asarray([1.0, 0.5, 0.25, 0.125])
    >>> np.round(np.asarray(
    ...     diffsptk_tpu.CepstrumToAutocorrelation(3, 3, n_fft=16)(c)), 3)
    array([10.982,  6.171,  4.301,  2.745])
    """

    _input_names = ("c",)

    def __init__(self, cep_order: int, acr_order: int,
                 n_fft: int = 512) -> None:
        self.in_dim = cep_order + 1
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(cep_order: int, acr_order: int, n_fft: int) -> None:
        if cep_order < 0:
            raise ValueError("cep_order must be non-negative.")
        if acr_order < 0:
            raise ValueError("acr_order must be non-negative.")
        if n_fft < max(cep_order + 1, acr_order + 1):
            raise ValueError("n_fft must be large enough.")

    @staticmethod
    def _design(cep_order: int, acr_order: int, n_fft: int = 512) -> Design:
        CepstrumToAutocorrelation._check(cep_order, acr_order, n_fft)
        return Design(values={"acr_order": acr_order, "n_fft": n_fft})

    @staticmethod
    def _forward(c: jnp.ndarray, *, acr_order: int, n_fft: int) -> jnp.ndarray:
        x = jnp.fft.rfft(c, n=n_fft).real
        x = jnp.exp(2 * x)
        return jnp.fft.hfft(x, norm="forward")[..., : acr_order + 1]

    def __call__(self, c):
        check_size(c.shape[-1], self.in_dim, "dimension of cepstrum")
        return self.apply(self.params, c)


class CepstrumToMinimumPhaseImpulseResponse(BaseOp):
    """c -> h = Re ifft(cexp(fft(c))).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> c = jnp.asarray([1.0, 0.5, 0.25, 0.125])
    >>> np.round(np.asarray(
    ...     diffsptk_tpu.CepstrumToMinimumPhaseImpulseResponse(
    ...         3, 6, n_fft=16)(c)), 3)
    array([2.718, 1.359, 1.019, 0.736, 0.347, 0.185])
    """

    _input_names = ("c",)

    def __init__(self, cep_order: int, ir_length: int,
                 n_fft: int = 512) -> None:
        self.in_dim = cep_order + 1
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(cep_order: int, ir_length: int, n_fft: int) -> None:
        if cep_order < 0:
            raise ValueError("cep_order must be non-negative.")
        if ir_length <= 0:
            raise ValueError("ir_length must be positive.")
        if n_fft < max(cep_order + 1, ir_length):
            raise ValueError("n_fft must be large value.")

    @staticmethod
    def _design(cep_order: int, ir_length: int, n_fft: int = 512) -> Design:
        CepstrumToMinimumPhaseImpulseResponse._check(cep_order, ir_length,
                                                     n_fft)
        return Design(values={"ir_length": ir_length, "n_fft": n_fft})

    @staticmethod
    def _forward(c: jnp.ndarray, *, ir_length: int, n_fft: int) -> jnp.ndarray:
        C = jnp.fft.fft(c, n=n_fft)
        return jnp.fft.ifft(cexp(C)).real[..., :ir_length]

    def __call__(self, c):
        check_size(c.shape[-1], self.in_dim, "dimension of cepstrum")
        return self.apply(self.params, c)


class MinimumPhaseImpulseResponseToCepstrum(BaseOp):
    """h -> c = Re ifft(log|fft(h)|), doubled above quefrency 0.

    Inverse of :class:`CepstrumToMinimumPhaseImpulseResponse`:

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> c = jnp.asarray([1.0, 0.5, 0.25, 0.125])
    >>> h = diffsptk_tpu.CepstrumToMinimumPhaseImpulseResponse(
    ...     3, 16, n_fft=16)(c)
    >>> np.round(np.asarray(
    ...     diffsptk_tpu.MinimumPhaseImpulseResponseToCepstrum(
    ...         16, 3, n_fft=16)(h)), 3)
    array([1.   , 0.5  , 0.25 , 0.125])
    """

    _input_names = ("h",)

    def __init__(self, ir_length: int, cep_order: int,
                 n_fft: int = 512) -> None:
        self.in_dim = ir_length
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(ir_length: int, cep_order: int, n_fft: int) -> None:
        CepstrumToMinimumPhaseImpulseResponse._check(cep_order, ir_length,
                                                     n_fft)

    @staticmethod
    def _design(ir_length: int, cep_order: int, n_fft: int = 512) -> Design:
        MinimumPhaseImpulseResponseToCepstrum._check(ir_length, cep_order,
                                                     n_fft)
        return Design(values={"cep_order": cep_order, "n_fft": n_fft})

    @staticmethod
    def _forward(h: jnp.ndarray, *, cep_order: int, n_fft: int) -> jnp.ndarray:
        H = jnp.fft.fft(h, n=n_fft)
        c = jnp.fft.ifft(clog(H)).real[..., : cep_order + 1]
        scale = np.full(cep_order + 1, 2.0)
        scale[0] = 1.0
        return c * jnp.asarray(scale, c.dtype)

    def __call__(self, h):
        check_size(h.shape[-1], self.in_dim, "length of impulse response")
        return self.apply(self.params, h)


class CepstrumToNegativeDerivativeOfPhaseSpectrum(BaseOp):
    """c -> NDPS via ramp-weighted hfft."""

    _input_names = ("c",)

    def __init__(self, cep_order: int, fft_length: int) -> None:
        self.in_dim = cep_order + 1
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(cep_order: int, fft_length: int) -> None:
        if cep_order < 0:
            raise ValueError("cep_order must be non-negative.")
        if fft_length // 2 < cep_order:
            raise ValueError("cep_order must be <= fft_length // 2.")
        if fft_length <= 1:
            raise ValueError("fft_length must be greater than 1.")

    @staticmethod
    def _design(cep_order: int, fft_length: int) -> Design:
        CepstrumToNegativeDerivativeOfPhaseSpectrum._check(cep_order,
                                                           fft_length)
        half = fft_length // 2
        ramp = np.arange(cep_order + 1) * 0.5
        if cep_order == half:
            ramp[-1] *= 2.0
        return Design(values={"fft_length": fft_length},
                      arrays={"ramp": ramp})

    @staticmethod
    def _forward(c: jnp.ndarray, *, fft_length: int,
                 ramp: jnp.ndarray) -> jnp.ndarray:
        v = c * ramp
        return jnp.fft.hfft(v, n=fft_length)[..., : fft_length // 2 + 1]

    def __call__(self, c):
        check_size(c.shape[-1], self.in_dim, "dimension of cepstrum")
        return self.apply(self.params, c)


class NegativeDerivativeOfPhaseSpectrumToCepstrum(BaseOp):
    """NDPS -> c via hfft and inverse ramp."""

    _input_names = ("n",)

    def __init__(self, fft_length: int, cep_order: int) -> None:
        self.in_dim = fft_length // 2 + 1
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(fft_length: int, cep_order: int) -> None:
        CepstrumToNegativeDerivativeOfPhaseSpectrum._check(cep_order,
                                                           fft_length)

    @staticmethod
    def _design(fft_length: int, cep_order: int) -> Design:
        NegativeDerivativeOfPhaseSpectrumToCepstrum._check(fft_length,
                                                           cep_order)
        half = fft_length // 2
        ramp = np.arange(cep_order + 1, dtype=np.float64) * half
        if cep_order == half:
            ramp[-1] *= 2.0
        ramp[1:] = 1.0 / ramp[1:]
        return Design(values={"cep_order": cep_order}, arrays={"ramp": ramp})

    @staticmethod
    def _forward(n: jnp.ndarray, *, cep_order: int,
                 ramp: jnp.ndarray) -> jnp.ndarray:
        c = jnp.fft.hfft(n)[..., : cep_order + 1]
        return c * ramp

    def __call__(self, n):
        check_size(n.shape[-1], self.in_dim, "dimension of spectrum")
        return self.apply(self.params, n)


class CepstralDistance(BaseOp):
    """Cepstral distance ||c1[1:] - c2[1:]|| with mean/sum reductions."""

    _input_names = ("c1", "c2")

    def __init__(self, full: bool = False, reduction: str = "mean") -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(reduction: str) -> None:
        if reduction not in ("none", "sum", "mean", "batchmean"):
            raise ValueError(f"reduction {reduction} is not supported.")

    @staticmethod
    def _design(full: bool = False, reduction: str = "mean") -> Design:
        CepstralDistance._check(reduction)
        const = 10 * math.sqrt(2) / math.log(10) if full else 1.0
        return Design(values={"const": const, "reduction": reduction})

    @staticmethod
    def _forward(c1: jnp.ndarray, c2: jnp.ndarray, *, const: float,
                 reduction: str) -> jnp.ndarray:
        distance = jnp.linalg.norm(c1[..., 1:] - c2[..., 1:], axis=-1)
        if reduction == "none":
            pass
        elif reduction == "sum":
            distance = jnp.sum(distance)
        elif reduction == "mean":
            distance = jnp.mean(distance) / ((c1.shape[-1] - 1) ** 0.5)
        elif reduction == "batchmean":
            distance = jnp.mean(distance)
        return const * distance

    def __call__(self, c1, c2):
        return self.apply(self.params, c1, c2)
