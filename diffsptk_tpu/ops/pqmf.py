"""Pseudo-QMF cosine-modulated filterbank and fractional-octave-band
analysis (reference: diffsptk/modules/{pqmf,ipqmf,oband}.py).

Prototype design (Kaiser window + iterative cutoff search) runs host-side
in numpy; application is one grouped convolution (lax.conv) — an MXU-friendly
dense contraction over the filter taps.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseNonFunctionalOp, to_device_array

TAU = 2 * np.pi


def _next_power_of_two(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def make_filter_banks(n_band: int, filter_order: int, mode: str = "analysis",
                      alpha: float = 100, n_iter: int = 100,
                      step_size: float = 1e-2, decay: float = 0.5,
                      eps: float = 1e-6):
    """Cosine-modulated filterbank coefficients (K, M+1); the prototype
    lowpass cutoff is tuned by a sign-descent iteration so |H(pi/2K)|^2 is
    0.5 (Nguyen 1994; Cruz-Roldan 2002)."""
    if n_band <= 0:
        raise ValueError("n_band must be positive.")
    if filter_order <= 1:
        raise ValueError("filter_order must be >= 2.")
    if n_iter <= 0:
        raise ValueError("n_iter must be positive.")
    if alpha <= 0:
        raise ValueError("alpha must be positive.")
    if step_size <= 0:
        raise ValueError("step_size must be positive.")
    if decay <= 0:
        raise ValueError("decay must be positive.")
    if eps < 0:
        raise ValueError("eps must be non-negative.")

    def alpha_to_beta(a):
        if a <= 21:
            return 0.0
        if a <= 50:
            return 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21)
        return 0.1102 * (a - 8.7)

    w = np.kaiser(filter_order + 1, alpha_to_beta(alpha))
    x = np.arange(filter_order + 1) - 0.5 * filter_order
    fft_length = _next_power_of_two(filter_order + 1)
    index = fft_length // (4 * n_band)

    omega = np.pi / (2 * n_band)
    best = np.inf
    is_converged = False
    prototype = None
    for _ in range(n_iter):
        with np.errstate(invalid="ignore"):
            h = np.sin(omega * x) / (np.pi * x)
        if filter_order % 2 == 0:
            h[filter_order // 2] = omega / np.pi
        prototype = h * w
        H = np.fft.rfft(prototype, n=fft_length)
        error = np.square(np.abs(H[index])) - 0.5
        abs_error = np.abs(error)
        if abs_error < eps:
            is_converged = True
            break
        if abs_error < best:
            best = abs_error
            omega -= np.sign(error) * step_size
        else:
            step_size *= decay
            omega -= np.sign(error) * step_size

    sign = 1 if mode == "analysis" else -1
    if mode not in ("analysis", "synthesis"):
        raise ValueError("analysis or synthesis is expected.")

    filters = []
    for k in range(n_band):
        a = ((2 * k + 1) * np.pi / (2 * n_band)) * x
        b = (-1) ** k * (np.pi / 4) * sign
        filters.append(2 * prototype * np.cos(a + b))
    return np.asarray(filters), is_converged


def _pad_signal(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Zero-pad left, replicate-pad right (the reference's delay padding)."""
    cfg = [(0, 0)] * (x.ndim - 1)
    x = jnp.pad(x, cfg + [(left, 0)])
    if right > 0:
        x = jnp.pad(x, cfg + [(0, right)], mode="edge")
    return x


def _grouped_conv(x: jnp.ndarray, filters: jnp.ndarray) -> jnp.ndarray:
    """(B, C, Tp) x (K, C, M+1) -> (B, K, T) cross-correlation.

    Design-time (non-learnable) filters route through the folded-plan
    FIR matmuls (kernels/fir.py): XLA's conv pads the tiny channel dims
    to the 128-lane tile and runs ~100x off roofline on TPU.  Learnable
    (traced) filters keep the conv form.
    """
    dt = jnp.result_type(x.dtype, filters.dtype)
    if not isinstance(filters, jax.core.Tracer):
        from ..kernels.fir import fir_correlate
        h = np.asarray(filters)                     # (K, C, taps)
        out = None
        for c in range(h.shape[1]):
            part = fir_correlate(x[..., c, :].astype(dt), h[:, c, :])
            out = part if out is None else out + part
        return out
    return jax.lax.conv_general_dilated(
        x.astype(dt), filters.astype(dt), window_strides=(1,),
        padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"))


class PseudoQuadratureMirrorFilterBankAnalysis(BaseNonFunctionalOp):
    """Waveform -> (B, K, T) subband waveforms.

    Examples
    --------
    >>> import jax
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.nrand(255, key=jax.random.PRNGKey(0))
    >>> diffsptk_tpu.PQMF(4, 47)(x).shape
    (1, 4, 256)
    """

    def __init__(self, n_band: int, filter_order: int, alpha: float = 100,
                 learnable: bool = False, dtype=None, **kwargs) -> None:
        filters, is_converged = make_filter_banks(
            n_band, filter_order, mode="analysis", alpha=alpha, **kwargs)
        if not is_converged:
            warnings.warn("Failed to find PQMF coefficients.")
        filters = np.expand_dims(filters, 1)[:, :, ::-1]
        self.filters = to_device_array(np.ascontiguousarray(filters), dtype)
        self.learnable = ("filters",) if learnable else ()
        if filter_order % 2 == 0:
            self.delay = (filter_order // 2, filter_order // 2)
        else:
            self.delay = ((filter_order + 1) // 2, (filter_order - 1) // 2)

    @property
    def params(self):
        return {"filters": self.filters}

    def __call__(self, x: jnp.ndarray, filters=None) -> jnp.ndarray:
        filters = self.filters if filters is None else filters
        if x.ndim == 1:
            x = x[None, None, :]
        elif x.ndim == 2:
            x = x[:, None, :]
        if x.ndim != 3:
            raise ValueError("Input must be 1D, 2D, or 3D tensor.")
        xp = _pad_signal(x, *self.delay)
        return _grouped_conv(xp, filters)


class PseudoQuadratureMirrorFilterBankSynthesis(BaseNonFunctionalOp):
    """(B, K, T) subbands -> (B, 1, T) waveform.

    Examples
    --------
    >>> import jax
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.nrand(255, key=jax.random.PRNGKey(0))
    >>> y = diffsptk_tpu.PQMF(4, 47)(x)
    >>> diffsptk_tpu.IPQMF(4, 47)(y).shape
    (1, 1, 256)
    """

    def __init__(self, n_band: int, filter_order: int, alpha: float = 100,
                 learnable: bool = False, dtype=None, **kwargs) -> None:
        filters, is_converged = make_filter_banks(
            n_band, filter_order, mode="synthesis", alpha=alpha, **kwargs)
        if not is_converged:
            warnings.warn("Failed to find PQMF coefficients.")
        filters = np.expand_dims(filters, 0)[:, :, ::-1]
        self.filters = to_device_array(np.ascontiguousarray(filters), dtype)
        self.learnable = ("filters",) if learnable else ()
        if filter_order % 2 == 0:
            self.delay = (filter_order // 2, filter_order // 2)
        else:
            self.delay = ((filter_order - 1) // 2, (filter_order + 1) // 2)

    @property
    def params(self):
        return {"filters": self.filters}

    def __call__(self, y: jnp.ndarray, keepdim: bool = True,
                 filters=None) -> jnp.ndarray:
        filters = self.filters if filters is None else filters
        if y.ndim == 2:
            y = y[None]
        if y.ndim != 3:
            raise ValueError("Input must be 3D tensor.")
        yp = _pad_signal(y, *self.delay)
        x = _grouped_conv(yp, filters)
        if not keepdim:
            x = x[:, 0, :]
        return x


class FractionalOctaveBandAnalysis(BaseNonFunctionalOp):
    """1/b-octave linear-phase FIR bank (Antoni 2010).

    Examples
    --------
    >>> import jax
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.nrand(255, key=jax.random.PRNGKey(0))
    >>> diffsptk_tpu.FractionalOctaveBandAnalysis(16000)(x).shape
    (1, 9, 256)
    """

    def __init__(self, sample_rate: int, *, f_min: float = 40,
                 f_ref: float = 1000, f_max: float = 8000,
                 filter_order: int = 1000, n_fract: int = 1,
                 overlap: float = 1, dtype=None) -> None:
        if not (0 <= f_min <= f_ref <= f_max <= sample_rate / 2):
            raise ValueError("Invalid frequency range.")
        if filter_order <= 2:
            raise ValueError("filter_order must be greater than 2.")
        if n_fract <= 0:
            raise ValueError("n_fract must be positive.")
        if not 0 <= overlap <= 1:
            raise ValueError("overlap must be in [0, 1].")

        b = n_fract
        G = 10 ** (3 / 10)

        def freq_index(f):
            if b % 2 == 0:
                return int(np.round(2 * b * np.log(f / f_ref)
                                    / np.log(G) - 1) / 2)
            return int(np.round(b * np.log(f / f_ref) / np.log(G)))

        def center_freq(x):
            if b % 2 == 0:
                return f_ref * G ** ((2 * x + 1) / (2 * b))
            return f_ref * G ** (x / b)

        x = np.arange(freq_index(f_min), freq_index(f_max) + 1)
        f_m = center_freq(x)
        f_m = f_m[f_m < sample_rate / 2]
        f_l = f_m * G ** (-1 / (2 * b))
        f_u = f_m * G ** (1 / (2 * b))

        c = (filter_order + 1) / sample_rate
        k_m = np.round(c * f_m).astype(int)
        k_l = np.round(c * f_l).astype(int)
        k_u = np.round(c * f_u).astype(int)
        g = np.round(overlap / 2 * (k_u - k_m)).astype(int)

        magnitude = np.ones((len(f_m), (filter_order + 1) // 2 + 1))
        for j in range(1, len(f_m)):
            i = j - 1
            sl = slice(k_l[j] - g[j], k_l[j] + g[j])
            magnitude[i, sl.stop:] = 0
            magnitude[j, :sl.start] = 0
            if 0 < g[j]:
                z = np.pi / 2 * (np.arange(2 * g[j]) / (2 * g[j]))
                magnitude[i, sl] = np.cos(z) ** 2
                magnitude[j, sl] = np.sin(z) ** 2

        freq = np.fft.rfftfreq(filter_order + 1)
        linear_phase = np.exp(-1j * TAU * filter_order / 2 * freq)
        h = np.fft.irfft(magnitude * linear_phase)
        h = h * np.hanning(h.shape[1])
        self.filters = to_device_array(h[:, None, :], dtype)
        self.delay = ((filter_order + 1) // 2, (filter_order - 1) // 2)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 1:
            x = x[None, None, :]
        elif x.ndim == 2:
            x = x[:, None, :]
        if x.ndim != 3:
            raise ValueError("Input must be 1D, 2D, or 3D tensor.")
        xp = _pad_signal(x, *self.delay)
        # like the reference, cross-correlate with the unflipped filters
        return _grouped_conv(xp, self.filters)