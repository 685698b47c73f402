"""All-zero (FIR) digital filter with frame-rate coefficients
(reference: diffsptk/modules/zerodf.py:190-240).

Two TPU-native paths, selected automatically:

* direct — gather the (M+1)-sample history for every output sample and
  dot it with per-sample interpolated coefficients: dense
  (..., T, M+1) work; best for short filters.
* fft    — frame-blocked overlap-save: because the coefficients are a
  per-frame linear interpolation, y(t) in frame n is exactly
  (1-l)*conv(x, b_n) + l*conv(x, b_{n+1}), so each frame needs two
  fixed-kernel convolutions evaluated on a 2P-sample span.  One batched
  rfft of the (2P+M)-sample contexts, a complex multiply against the
  per-frame coefficient spectra, and one irfft replace the
  (..., T, M+1) materialization — this is the reference's 'efficient'
  grouped-conv decomposition (zerodf.py:207-240) recast as batched FFTs,
  which is the HBM-friendly form on TPU.  ~60x less memory traffic for
  the MLSA cascade's 200-tap filters.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, filter_values
from .linear_intpl import linear_interpolate


def _next_pow2(n: int) -> int:
    return 1 << (int(n) - 1).bit_length()


def zerodf_fft(x: jnp.ndarray, b: jnp.ndarray, frame_period: int,
               advance: int = 0, b_spec: jnp.ndarray | None = None,
               nfft: int | None = None) -> jnp.ndarray:
    """Frame-blocked FFT evaluation of the time-varying FIR
    y[t] = sum_k btilde[t, k] x[t - k + advance], where btilde linearly
    interpolates frame coefficients (replicated final frame).

    ``b_spec`` optionally supplies rfft(b, nfft) so a filter cascade that
    reuses the same coefficients (the MLSA Taylor stages) pays the
    coefficient FFT once.
    """
    P = frame_period
    M = b.shape[-1] - 1
    z = advance
    N = b.shape[-2]
    T = x.shape[-1]
    L = 2 * P + M
    if nfft is None:
        nfft = _next_pow2(L + 1)
    pad = [(0, 0)] * (x.ndim - 1) + [(P + M - z, z)]
    xp = jnp.pad(x, pad)
    idx = np.arange(N)[:, None] * P + np.arange(L)[None, :]
    ctx = xp[..., idx]                                   # (..., N, 2P+M)
    from ..kernels import mxu_fft
    X = mxu_fft.rfft(ctx, nfft)
    if b_spec is None:
        b_spec = mxu_fft.rfft(b, nfft)
    U = mxu_fft.irfft(X * b_spec, nfft)[..., M:M + 2 * P]
    lo = U[..., P:]                                      # b_n on frame n
    hi = jnp.concatenate([U[..., 1:, :P], U[..., -1:, P:]], axis=-2)
    lam = jnp.asarray(np.arange(P) / P, x.dtype)
    y = lo * (1 - lam) + hi * lam
    return y.reshape(*x.shape[:-1], T)


class AllZeroDigitalFilter(BaseOp):
    """(excitation (..., T), coefficients (..., T/P, M+1)) -> (..., T).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> b = jnp.tile(jnp.asarray([1.0, 0.5]), (4, 1))
    >>> y = diffsptk_tpu.AllZeroDigitalFilter(1, 1)(
    ...     diffsptk_tpu.impulse(3), b)
    >>> np.round(np.asarray(y), 3)                        # 1 + 0.5 z^-1
    array([1. , 0.5, 0. , 0. ])
    """

    _input_names = ("x", "b")

    def __init__(self, filter_order: int, frame_period: int, *,
                 ignore_gain: bool = False, zeroth_index: int = 0,
                 mode: str = "direct") -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(filter_order: int, frame_period: int,
               zeroth_index: int) -> None:
        if filter_order < 0:
            raise ValueError("filter_order must be non-negative.")
        if frame_period <= 0:
            raise ValueError("frame_period must be positive.")
        if not 0 <= zeroth_index <= filter_order:
            raise ValueError("zeroth_index must be in [0, filter_order].")

    @staticmethod
    def _design(filter_order: int, frame_period: int,
                ignore_gain: bool = False, zeroth_index: int = 0,
                mode: str = "direct") -> Design:
        AllZeroDigitalFilter._check(filter_order, frame_period, zeroth_index)
        padding = (filter_order - zeroth_index, zeroth_index)
        return Design(values={
            "frame_period": frame_period, "ignore_gain": ignore_gain,
            "padding": padding})

    @staticmethod
    def _forward(x: jnp.ndarray, b: jnp.ndarray, *, frame_period: int,
                 ignore_gain: bool, padding: tuple) -> jnp.ndarray:
        check_size(x.shape[-1], b.shape[-2] * frame_period, "sequence length")
        M = b.shape[-1] - 1
        if not ignore_gain and M + 1 > 32:
            # long filters: frame-blocked FFT path (per-sample gain
            # normalization of ignore_gain is not lerp-decomposable).
            return zerodf_fft(x, b, frame_period, advance=padding[1])
        T = x.shape[-1]
        pad = [(0, 0)] * (x.ndim - 1) + [list(padding)]
        xp = jnp.pad(x, pad)
        idx = np.arange(T)[:, None] + np.arange(M + 1)[None, :]
        frames = xp[..., idx]                       # (..., T, M+1)
        h = linear_interpolate(jnp.flip(b, -1), frame_period)
        if ignore_gain:
            h = h / (h[..., :1] if padding[0] == 0 else h[..., -1:])
        return jnp.sum(frames * h, axis=-1)

    def __call__(self, x, b):
        return self.apply(self.params, x, b)
