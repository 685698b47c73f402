"""Gammatone filterbank analysis/synthesis (Hohmann 2002; Herzke 2007)
(reference: diffsptk/modules/gammatone.py, igammatone.py).

TPU-native factorization: the order-gamma complex all-pole (1 - a z^-1)^g
is applied as g cascaded one-pole complex recurrences, each an exact
log-depth associative scan — no sequential sample loop.  Synthesis design
(delays, phase factors, gain fixpoint) runs host-side in numpy complex128.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core import BaseNonFunctionalOp, check_size, to_device_array
from ..kernels.recurrence import first_order_recurrence

TAU = 2 * np.pi
_ERB_L = 24.7
_ERB_Q = 9.265


def _hz_to_erb(hz):
    return _ERB_Q * np.log1p(hz / (_ERB_L * _ERB_Q))


def _erb_to_hz(erb):
    return (_ERB_L * _ERB_Q) * np.expm1(erb / _ERB_Q)


def design_gammatone(sample_rate: int, f_min: float = 70,
                     f_ref: float = 1000, f_max: float = 6700,
                     filter_order: int = 4, bandwidth_factor: float = 1,
                     density: float = 1, exact: bool = False):
    """Host-side design.  Returns dict with complex pole per band `a_tilde`,
    gains K, FIR numerator b (or None), center frequencies."""
    if not (0 <= f_min <= f_ref <= f_max <= sample_rate / 2):
        raise ValueError("Invalid frequency range.")
    if filter_order <= 0:
        raise ValueError("filter_order must be positive.")
    if bandwidth_factor <= 0:
        raise ValueError("bandwidth_factor must be positive.")
    if density <= 0:
        raise ValueError("density must be positive.")

    erb_min = _hz_to_erb(f_min)
    erb_ref = _hz_to_erb(f_ref)
    erb_max = _hz_to_erb(f_max)
    erb_begin = erb_ref - np.floor((erb_ref - erb_min) * density) / density
    cf_erb = np.arange(erb_begin, erb_max + 1e-6, 1 / density)
    cf_hz = _erb_to_hz(cf_erb)

    erb_audio = (_ERB_L + cf_hz / _ERB_Q) * bandwidth_factor
    gamma = filter_order
    a_gamma = (np.pi * math.factorial(2 * gamma - 2)
               * 2.0 ** -(2 * gamma - 2) / math.factorial(gamma - 1) ** 2)
    bw = erb_audio / a_gamma
    lam = np.exp(-TAU * bw / sample_rate)
    beta = TAU * cf_hz / sample_rate
    z = np.exp(1j * beta)
    a_tilde = lam * z

    # Optional exact-mode FIR numerator (Eulerian-number coefficients).
    b = None
    if exact and filter_order >= 2:
        ramp = np.arange(1, filter_order + 1)
        c = np.zeros(filter_order)
        c[0] = 1
        for i in range(2, filter_order):
            t1 = c * ramp
            t2 = -np.roll(t1, 1)
            t3 = i * np.roll(c, 1)
            c = t1 + t2 + t3
        b = np.zeros((len(a_tilde), filter_order), dtype=np.complex128)
        b[:, 1:] = c[:-1] * a_tilde[:, None] ** ramp[:-1]

    # Gain so the response is 0 dB at the center frequency.
    if exact:
        K = 2 / np.abs(np.diag(_H_np(z, a_tilde, gamma, b, None)))
    else:
        K = 2 * (1 - np.abs(a_tilde)) ** gamma
    K = np.where((beta == 0) | (beta == np.pi), 0.5 * K, K)
    return dict(a_tilde=a_tilde, K=K, b=b, gamma=gamma,
                center_frequencies=cf_hz)


def _H_np(z, a_tilde, gamma, b, K):
    """Frequency response at complex z: (C, K_bands)."""
    if b is not None:
        # denominator coefficients via binomial expansion
        a = np.zeros((len(a_tilde), gamma), dtype=np.complex128)
        for i in range(1, gamma + 1):
            a[:, i - 1] = math.comb(gamma, i) * (-a_tilde) ** i
        ramp = np.arange(gamma + 1)
        zs = z[:, None] ** -ramp
        numer = zs[:, :-1] @ b.T
        denom = 1 + zs[:, 1:] @ a.T
        F = numer / denom
    else:
        F = (1 + (-a_tilde)[None, :] / z[:, None]) ** -gamma
    if K is not None:
        F = K[None, :] * F
    return F


def _impulse_response_np(design, length):
    """Host-side band impulse responses (K_bands, length)."""
    from scipy.signal import lfilter
    a_tilde, K, b, gamma = (design["a_tilde"], design["K"], design["b"],
                            design["gamma"])
    x = np.zeros(length)
    x[0] = 1.0
    out = []
    for kk in range(len(a_tilde)):
        y = K[kk] * x.astype(np.complex128)
        for _ in range(gamma):
            y = lfilter([1.0], [1.0, -a_tilde[kk]], y)
        if b is not None:
            y = lfilter(b[kk], [1.0], y)
        out.append(y)
    return np.stack(out)


class GammatoneFilterBankAnalysis(BaseNonFunctionalOp):
    """Waveform -> complex subbands (B, K, T).

    Examples
    --------
    >>> import jax
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.nrand(127, key=jax.random.PRNGKey(0))
    >>> y = diffsptk_tpu.GammatoneFilterBankAnalysis(16000)(x)
    >>> y.shape        # 30 ERB bands, complex subbands
    (1, 30, 128)
    """

    def __init__(self, sample_rate: int, *, f_min: float = 70,
                 f_ref: float = 1000, f_max: float = 6700,
                 filter_order: int = 4, bandwidth_factor: float = 1,
                 density: float = 1, exact: bool = False) -> None:
        d = design_gammatone(sample_rate, f_min, f_ref, f_max, filter_order,
                             bandwidth_factor, density, exact)
        self.design = d
        self.gamma = d["gamma"]
        self.exact = exact
        # complex design constants stay host-side (see core.to_device_array)
        self.a_tilde = to_device_array(d["a_tilde"])
        self.K = to_device_array(d["K"])
        self.b = None if d["b"] is None else to_device_array(d["b"])
        self.center_frequencies = d["center_frequencies"]

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 1:
            x = x[None]
        elif x.ndim == 3:
            x = x[:, 0, :]
        if x.ndim != 2:
            raise ValueError("Input must be 1D, 2D, or 3D tensor.")
        y = self.K[None, :, None] * x[:, None, :].astype(self.a_tilde.dtype)
        pole = self.a_tilde[None, :, None]
        for _ in range(self.gamma):
            y = first_order_recurrence(y, jnp.broadcast_to(pole, y.shape))
        if self.exact and self.b is not None:
            taps = self.b                                 # (K, gamma)
            acc = taps[None, :, 0:1] * y
            shifted = y
            for k in range(1, taps.shape[-1]):
                pad = [(0, 0), (0, 0), (1, 0)]
                shifted = jnp.pad(shifted[..., :-1], pad)
                acc = acc + taps[None, :, k:k + 1] * shifted
            y = acc
        return y


class GammatoneFilterBankSynthesis(BaseNonFunctionalOp):
    """Complex subbands -> waveform via per-band delay + phase adjust +
    gain-weighted sum.

    Examples
    --------
    >>> import jax
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.nrand(127, key=jax.random.PRNGKey(0))
    >>> y = diffsptk_tpu.GammatoneFilterBankAnalysis(16000)(x)
    >>> diffsptk_tpu.GammatoneFilterBankSynthesis(16000)(y).shape
    (1, 1, 128)
    """

    def __init__(self, sample_rate: int, *, desired_delay: float = 4,
                 f_min: float = 70, f_ref: float = 1000,
                 f_max: float = 6700, filter_order: int = 4,
                 bandwidth_factor: float = 1, density: float = 1,
                 exact: bool = False, n_iter: int = 100,
                 eps: float = 1e-8, dtype=None) -> None:
        self.delay = round(desired_delay * sample_rate / 1000)
        if self.delay < 1:
            raise ValueError("Please increase the desired delay.")
        if n_iter <= 0:
            raise ValueError("The number of iterations must be positive.")
        if eps < 0:
            raise ValueError("The tolerance must be non-negative.")

        d = design_gammatone(sample_rate, f_min, f_ref, f_max, filter_order,
                             bandwidth_factor, density, exact)
        ir = _impulse_response_np(d, self.delay + 2)
        max_idx = np.argmax(np.abs(ir[:, :-1]), axis=-1)
        rows = np.arange(ir.shape[0])
        slopes = ir[rows, max_idx + 1] - ir[rows, max_idx - 1]
        slopes = slopes / np.abs(slopes)
        phase_factors = 1j / slopes
        delay_samples = self.delay - max_idx

        cf = d["center_frequencies"]
        z = np.exp(1j * TAU * cf / sample_rate)
        Hp = _H_np(z, d["a_tilde"], d["gamma"], d["b"], d["K"])
        Hn = _H_np(np.conj(z), d["a_tilde"], d["gamma"], d["b"], d["K"])
        pos = Hp * phase_factors[None, :] * (z[:, None] **
                                             -delay_samples[None, :])
        neg = Hn * phase_factors[None, :] * (np.conj(z)[:, None] **
                                             -delay_samples[None, :])
        combined = 0.5 * (pos + np.conj(neg))
        gains = np.ones(combined.shape[-1], dtype=np.complex128)
        for _ in range(n_iter):
            prev = gains
            gains = gains / np.abs(combined @ gains)
            if np.mean(np.abs(prev - gains)) < eps:
                break

        self.phase_factors = to_device_array(phase_factors[:, None])
        # host-side ints: gather indices must be trace-time constants
        self.delay_samples = np.asarray(delay_samples[:, None], np.int32)
        self.max_delay = int(delay_samples.max())
        self.gains = to_device_array(gains.real[:, None], dtype)

    def __call__(self, y: jnp.ndarray, keepdim: bool = True,
                 compensate_delay: bool = True) -> jnp.ndarray:
        if y.ndim == 2:
            y = y[None]
        if y.ndim != 3:
            raise ValueError("Input must be 3D tensor.")
        B, K, T = y.shape
        check_size(K, self.phase_factors.shape[0], "number of filters")

        phi = self.phase_factors
        y_prime = y.real * phi.real - y.imag * phi.imag

        max_delay = self.max_delay
        padded = jnp.pad(y_prime, [(0, 0), (0, 0), (max_delay, 0)])
        indices = (np.arange(T)[None, :] + max_delay
                   - self.delay_samples).astype(np.int32)   # (K, T) const
        delayed = jnp.take_along_axis(
            padded, jnp.broadcast_to(jnp.asarray(indices)[None], (B, K, T)),
            axis=-1)

        x = jnp.sum(delayed * self.gains, axis=1, keepdims=keepdim)
        if compensate_delay:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, self.delay)]
            x = jnp.pad(x[..., self.delay:], pad)
        return x
