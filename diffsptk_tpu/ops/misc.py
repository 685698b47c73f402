"""Miscellaneous ops: decimation/interpolation/delay, metrics (entropy,
histogram, SNR, RMSE, flux, zero-crossing), group delay, phase, Yingram,
median filter, magic-number interpolation
(reference: diffsptk/modules/{decimate,interpolate,delay,entropy,histogram,
snr,rmse,flux,zcross,grpdelay,phase,yingram,medfilt,magic_intpl}.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, filter_values
from ..utils.linalg import remove_gain


class Decimation(BaseOp):
    """Pick every P-th sample starting at S along dim
    (reference: decimate.py)."""

    def __init__(self, period: int, start: int = 0, dim: int = -1) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(period: int, start: int) -> None:
        if period <= 0:
            raise ValueError("period must be positive.")
        if start < 0:
            raise ValueError("start must be non-negative.")

    @staticmethod
    def _design(period: int, start: int = 0, dim: int = -1) -> Design:
        Decimation._check(period, start)
        return Design(values={"period": period, "start": start, "dim": dim})

    @staticmethod
    def _forward(x: jnp.ndarray, *, period: int, start: int,
                 dim: int) -> jnp.ndarray:
        dim = dim % x.ndim
        sl = [slice(None)] * x.ndim
        sl[dim] = slice(start, None, period)
        return x[tuple(sl)]


class Interpolation(BaseOp):
    """Zero-stuffing upsampler (inverse of Decimation)."""

    def __init__(self, period: int, start: int = 0, dim: int = -1) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(period: int, start: int) -> None:
        Decimation._check(period, start)

    @staticmethod
    def _design(period: int, start: int = 0, dim: int = -1) -> Design:
        Decimation._check(period, start)
        return Design(values={"period": period, "start": start, "dim": dim})

    @staticmethod
    def _forward(x: jnp.ndarray, *, period: int, start: int,
                 dim: int) -> jnp.ndarray:
        dim = dim % x.ndim
        T = x.shape[dim] * period + start
        shape = list(x.shape)
        shape[dim] = T
        y = jnp.zeros(shape, x.dtype)
        idx = jnp.arange(start, T, period)
        return y.at[(slice(None),) * dim + (idx,)].set(x)


class Delay(BaseOp):
    """Integer shift with zero fill; negative start advances
    (reference: delay.py)."""

    def __init__(self, start: int, keeplen: bool = False,
                 dim: int = -1) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check() -> None:
        pass

    @staticmethod
    def _design(start: int, keeplen: bool = False, dim: int = -1) -> Design:
        return Design(values={"start": start, "keeplen": keeplen,
                              "dim": dim})

    @staticmethod
    def _forward(x: jnp.ndarray, *, start: int, keeplen: bool,
                 dim: int) -> jnp.ndarray:
        if start == 0:
            return x
        dim = dim % x.ndim
        pad = [(0, 0)] * x.ndim
        sl = [slice(None)] * x.ndim
        if 0 < start:
            pad[dim] = (start, 0)
            y = jnp.pad(x, pad)
            if keeplen:
                sl[dim] = slice(0, x.shape[dim])
                y = y[tuple(sl)]
        else:
            sl[dim] = slice(-start, None)
            y = x[tuple(sl)]
            if keeplen:
                pad[dim] = (0, -start)
                y = jnp.pad(y, pad)
        return y


class Entropy(BaseOp):
    """Probabilities (..., K) -> entropy (...,).

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> float(diffsptk_tpu.Entropy(out_format="bit")(jnp.ones(4) / 4))
    2.0
    """

    _input_names = ("p",)

    def __init__(self, out_format: str | int = "nat") -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check() -> None:
        pass

    @staticmethod
    def _design(out_format: str | int = "nat") -> Design:
        if out_format in (0, "bit"):
            c = math.log2(math.e)
        elif out_format in (1, "nat"):
            c = 1.0
        elif out_format in (2, "dit"):
            c = math.log10(math.e)
        else:
            raise ValueError(f"out_format {out_format} is not supported.")
        return Design(values={"c": c})

    @staticmethod
    def _forward(p: jnp.ndarray, *, c: float) -> jnp.ndarray:
        entr = jnp.where(p > 0, -p * jnp.log(jnp.where(p > 0, p, 1.0)),
                         jnp.where(p == 0, 0.0, -jnp.inf))
        return c * jnp.sum(entr, axis=-1)


class Histogram(BaseOp):
    """Differentiable soft histogram via sigmoid bins."""

    def __init__(self, n_bin: int = 10, lower_bound: float = 0.0,
                 upper_bound: float = 1.0, norm: bool = False,
                 softness: float = 1e-3, dtype=None) -> None:
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(n_bin: int, lower_bound: float, upper_bound: float,
               softness: float) -> None:
        if n_bin <= 0:
            raise ValueError("n_bin must be positive.")
        if upper_bound <= lower_bound:
            raise ValueError("upper_bound must exceed lower_bound.")
        if softness <= 0:
            raise ValueError("softness must be positive.")

    @staticmethod
    def _design(n_bin: int = 10, lower_bound: float = 0.0,
                upper_bound: float = 1.0, norm: bool = False,
                softness: float = 1e-3) -> Design:
        Histogram._check(n_bin, lower_bound, upper_bound, softness)
        width = (upper_bound - lower_bound) / n_bin
        centers = np.arange(n_bin) * width + lower_bound + 0.5 * width
        return Design(values={"norm": norm, "softness": softness},
                      arrays={"centers": centers})

    @staticmethod
    def _forward(x: jnp.ndarray, *, norm: bool, softness: float,
                 centers: jnp.ndarray) -> jnp.ndarray:
        y = x[..., None, :] - centers[..., None]
        g = 0.5 * (centers[1] - centers[0])
        h = (jax.nn.sigmoid((y + g) / softness)
             - jax.nn.sigmoid((y - g) / softness))
        h = jnp.sum(h, axis=-1)
        if norm:
            h = h / jnp.sum(h, axis=-1, keepdims=True)
        return h


class SignalToNoiseRatio(BaseOp):
    """SNR / segmental SNR in dB (reference: snr.py)."""

    _input_names = ("s", "sn")

    def __init__(self, frame_length: int | None = None, full: bool = False,
                 reduction: str = "mean", eps: float = 1e-8) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(frame_length: int | None, eps: float) -> None:
        if frame_length is not None and frame_length <= 0:
            raise ValueError("frame_length must be positive.")
        if eps < 0:
            raise ValueError("eps must be non-negative.")

    @staticmethod
    def _design(frame_length: int | None = None, full: bool = False,
                reduction: str = "mean", eps: float = 1e-8) -> Design:
        SignalToNoiseRatio._check(frame_length, eps)
        return Design(values={"frame_length": frame_length,
                              "reduction": reduction, "eps": eps,
                              "const": 10.0 if full else 1.0})

    @staticmethod
    def _forward(s: jnp.ndarray, sn: jnp.ndarray, *, frame_length, reduction,
                 eps, const) -> jnp.ndarray:
        if frame_length is not None:
            n = s.shape[-1] // frame_length
            s = s[..., :n * frame_length].reshape(
                *s.shape[:-1], n, frame_length)
            sn = sn[..., :n * frame_length].reshape(
                *sn.shape[:-1], n, frame_length)
        s2 = jnp.sum(jnp.square(s), axis=-1)
        n2 = jnp.sum(jnp.square(sn - s), axis=-1)
        snr = jnp.log10((s2 + eps) / (n2 + eps))
        if reduction == "none":
            pass
        elif reduction == "sum":
            snr = jnp.sum(snr)
        elif reduction == "mean":
            snr = jnp.mean(snr)
        else:
            raise ValueError(f"reduction {reduction} is not supported.")
        return const * snr

    def __call__(self, s, sn):
        return self.apply(self.params, s, sn)


class RootMeanSquareError(BaseOp):
    """RMSE with mean/sum/none reductions (reference: rmse.py)."""

    _input_names = ("x", "y")

    def __init__(self, reduction: str = "mean") -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check() -> None:
        pass

    @staticmethod
    def _design(reduction: str = "mean") -> Design:
        return Design(values={"reduction": reduction})

    @staticmethod
    def _forward(x: jnp.ndarray, y: jnp.ndarray, *,
                 reduction: str) -> jnp.ndarray:
        error = jnp.linalg.norm(x - y, axis=-1) / (x.shape[-1] ** 0.5)
        if reduction == "none":
            pass
        elif reduction == "sum":
            error = jnp.sum(error)
        elif reduction == "mean":
            error = jnp.mean(error)
        else:
            raise ValueError(f"reduction {reduction} is not supported.")
        return error

    def __call__(self, x, y):
        return self.apply(self.params, x, y)


class Flux(BaseOp):
    """Spectral flux between consecutive frames under a lag
    (reference: flux.py)."""

    _input_names = ("x", "y")

    def __init__(self, lag: int = 1, norm: int | float = 2,
                 reduction: str = "mean") -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check() -> None:
        pass

    @staticmethod
    def _design(lag: int = 1, norm: int | float = 2,
                reduction: str = "mean") -> Design:
        return Design(values={"lag": lag, "norm": norm,
                              "reduction": reduction})

    @staticmethod
    def _forward(x: jnp.ndarray, y: jnp.ndarray | None = None, *, lag: int,
                 norm, reduction: str) -> jnp.ndarray:
        if y is None:
            y = x
        if x.ndim == 1:
            x = x[..., None]
            y = y[..., None]
        if 0 < lag:
            diff = x[..., lag:, :] - y[..., :-lag, :]
        elif lag < 0:
            diff = y[..., -lag:, :] - x[..., :lag, :]
        else:
            diff = x - y
        flux = jnp.linalg.norm(diff, ord=norm, axis=-1)
        if reduction == "none":
            pass
        elif reduction == "sum":
            flux = jnp.sum(flux)
        elif reduction == "mean":
            flux = jnp.mean(flux) / (x.shape[-1] ** (1 / norm))
        elif reduction == "batchmean":
            flux = jnp.mean(flux)
        else:
            raise ValueError(f"reduction {reduction} is not supported.")
        return flux

    def __call__(self, x, y=None):
        return self.apply(self.params, x, y)


class ZeroCrossingAnalysis(BaseOp):
    """Zero-crossing count per frame; soft sign relaxation keeps a
    gradient path (reference: zcross.py)."""

    def __init__(self, frame_length: int, norm: bool = False,
                 softness: float = 1e-3) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(frame_length: int, softness: float) -> None:
        if frame_length <= 0:
            raise ValueError("frame_length must be positive.")
        if softness <= 0:
            raise ValueError("softness must be positive.")

    @staticmethod
    def _design(frame_length: int, norm: bool = False,
                softness: float = 1e-3) -> Design:
        ZeroCrossingAnalysis._check(frame_length, softness)
        return Design(values={"frame_length": frame_length, "norm": norm,
                              "softness": softness})

    @staticmethod
    def _forward(x: jnp.ndarray, *, frame_length: int, norm: bool,
                 softness: float) -> jnp.ndarray:
        x = jnp.tanh(x / softness)
        # replicate one sample on the left, frame with period = length + 1
        x = jnp.concatenate([x[..., :1], x], axis=-1)
        n = (x.shape[-1] - 1) // frame_length
        idx = (np.arange(n)[:, None] * frame_length
               + np.arange(frame_length + 1)[None, :])
        frames = x[..., idx]
        z = 0.5 * jnp.sum(jnp.abs(jnp.diff(frames, axis=-1)), axis=-1)
        if norm:
            z = z / frame_length
        return z


class GroupDelay(BaseOp):
    """Modified group delay from b and/or a."""

    _input_names = ("b", "a")

    def __init__(self, fft_length: int, alpha: float = 1.0,
                 gamma: float = 1.0, dtype=None) -> None:
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(fft_length: int, alpha: float, gamma: float) -> None:
        if fft_length <= 1:
            raise ValueError("fft_length must be greater than 1.")
        if alpha <= 0:
            raise ValueError("alpha must be positive.")
        if gamma <= 0:
            raise ValueError("gamma must be positive.")

    @staticmethod
    def _design(fft_length: int, alpha: float = 1.0,
                gamma: float = 1.0) -> Design:
        GroupDelay._check(fft_length, alpha, gamma)
        return Design(values={"fft_length": fft_length, "alpha": alpha,
                              "gamma": gamma},
                      arrays={"ramp": np.arange(fft_length)})

    @staticmethod
    def _forward(b: jnp.ndarray | None = None, a: jnp.ndarray | None = None,
                 *, fft_length: int, alpha: float, gamma: float,
                 ramp: jnp.ndarray) -> jnp.ndarray:
        if b is None and a is None:
            raise ValueError("Either b or a must be specified.")
        if a is None:
            order = 0
        else:
            a = remove_gain(a)
            order = a.shape[-1] - 1
        if b is None:
            c = jnp.flip(a, -1)
        elif a is None:
            c = b
        else:
            # full convolution b * a (flipped): correlate padded b with a
            K = b.shape[-1] + order
            pad = [(0, 0)] * (b.ndim - 1) + [(order, order)]
            b1 = jnp.pad(b, pad)
            idx = np.arange(K)[:, None] + np.arange(order + 1)[None, :]
            b2 = b1[..., idx]
            c = jnp.sum(b2 * a[..., None, :], axis=-1)

        data_length = c.shape[-1]
        if fft_length < data_length:
            raise RuntimeError("Please increase FFT length.")
        d = c * ramp[:data_length]
        C = jnp.fft.rfft(c, n=fft_length)
        D = jnp.fft.rfft(d, n=fft_length)
        numer = C.real * D.real + C.imag * D.imag
        denom = C.real * C.real + C.imag * C.imag
        if gamma != 1:
            denom = jnp.power(denom, gamma)
        g = numer / denom - order
        if alpha != 1:
            g = jnp.sign(g) * jnp.power(jnp.abs(g), alpha)
        return g

    def __call__(self, b=None, a=None):
        return self.apply(self.params, b, a)


class Phase(BaseOp):
    """Phase spectrum in cycles, with optional unwrap."""

    _input_names = ("b", "a")

    def __init__(self, fft_length: int, unwrap: bool = False) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(fft_length: int) -> None:
        if fft_length <= 1:
            raise ValueError("fft_length must be greater than 1.")

    @staticmethod
    def _design(fft_length: int, unwrap: bool = False) -> Design:
        Phase._check(fft_length)
        return Design(values={"fft_length": fft_length, "unwrap": unwrap})

    @staticmethod
    def _forward(b: jnp.ndarray | None = None, a: jnp.ndarray | None = None,
                 *, fft_length: int, unwrap: bool) -> jnp.ndarray:
        if b is None and a is None:
            raise ValueError("Either b or a must be specified.")
        if b is not None:
            B = jnp.fft.rfft(b, n=fft_length)
        if a is not None:
            A = jnp.fft.rfft(remove_gain(a), n=fft_length)
        if b is None:
            numer, denom = -A.imag, A.real
        elif a is None:
            numer, denom = B.imag, B.real
        else:
            numer = B.imag * A.real - B.real * A.imag
            denom = B.real * A.real + B.imag * A.imag
        p = jnp.arctan2(numer, denom) / jnp.pi
        if unwrap:
            diff = jnp.diff(p, axis=-1)
            bias = (-2.0 * (1 < diff)) + (2.0 * (diff < -1))
            s = jnp.cumsum(bias, axis=-1)
            p = jnp.concatenate([p[..., :1], p[..., 1:] + s], axis=-1)
        return p

    def __call__(self, b=None, a=None):
        return self.apply(self.params, b, a)


class Yingram(BaseOp):
    """YIN CMND on midi-spaced lags (reference yingram.py)."""

    def __init__(self, frame_length: int, sample_rate: int = 22050,
                 lag_min: int = 22, lag_max: int | None = None,
                 n_bin: int = 20, dtype=None) -> None:
        self.in_dim = frame_length
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(frame_length: int, sample_rate: int, lag_min: int,
               lag_max: int, n_bin: int) -> None:
        if frame_length <= 0:
            raise ValueError("frame_length must be positive.")
        if sample_rate <= 0:
            raise ValueError("sample_rate must be positive.")
        if not 1 <= lag_min <= lag_max <= frame_length:
            raise ValueError("Invalid lag_min/lag_max.")
        if n_bin <= 0:
            raise ValueError("n_bin must be positive.")

    @staticmethod
    def _design(frame_length: int, sample_rate: int = 22050,
                lag_min: int = 22, lag_max: int | None = None,
                n_bin: int = 20) -> Design:
        if lag_max is None:
            lag_max = frame_length - 1
        Yingram._check(frame_length, sample_rate, lag_min, lag_max, n_bin)

        def midi2lag(midi):
            return sample_rate / (440 * 2 ** ((midi - 69) / 12))

        def lag2midi(lag):
            return 12 * np.log2(sample_rate / (440 * lag)) + 69

        midi_min = int(np.ceil(lag2midi(lag_max)))
        midi_max = int(lag2midi(lag_min))
        lags = midi2lag(np.arange(midi_min, midi_max + 1, 1 / n_bin))
        return Design(values={"lag_max": lag_max},
                      arrays={"lags": lags,
                              "lags_ceil": np.ceil(lags).astype(np.int64),
                              "lags_floor": np.floor(lags).astype(np.int64),
                              "ramp": np.arange(1, lag_max)})

    def _setup(self, design, learnable=False, dtype=None):
        super()._setup(design, learnable, dtype)
        # index arrays must stay integral
        self.params["lags_ceil"] = jnp.asarray(
            np.asarray(self.params["lags_ceil"], np.int64))
        self.params["lags_floor"] = jnp.asarray(
            np.asarray(self.params["lags_floor"], np.int64))

    @staticmethod
    def _forward(x: jnp.ndarray, *, lag_max: int, lags: jnp.ndarray,
                 lags_ceil: jnp.ndarray, lags_floor: jnp.ndarray,
                 ramp: jnp.ndarray) -> jnp.ndarray:
        from .acorr import Autocorrelation
        W = x.shape[-1]
        pad = [(0, 0)] * (x.ndim - 1) + [(1, 0)]
        x0 = jnp.pad(x, pad)
        s = jnp.cumsum(x0 * x0, axis=-1)
        term1 = jnp.flip(s[..., W - lag_max + 1:], -1)
        term2 = s[..., W:] - s[..., :lag_max]
        term3 = -2 * Autocorrelation._forward(
            x, acr_order=lag_max - 1, formatter=lambda v: v)
        d = (term1 + term2 + term3)[..., 1:]
        d = ramp * d / (jnp.cumsum(d, axis=-1) + 1e-7)
        d0 = jnp.pad(d, pad, constant_values=1.0)
        numer = (lags - lags_floor) * (d0[..., lags_ceil]
                                       - d0[..., lags_floor])
        denom = (lags_ceil - lags_floor).astype(d0.dtype)
        return numer / denom + d0[..., lags_floor]

    def __call__(self, x):
        check_size(x.shape[-1], self.in_dim, "frame length")
        return self.apply(self.params, x)


class MedianFilter(BaseOp):
    """Median filter over time with NaN padding and magic-number masking."""

    def __init__(self, filter_length: int, across_features: bool = False,
                 magic_number: float | None = None) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(filter_length: int) -> None:
        if filter_length <= 0:
            raise ValueError("filter_length must be positive.")

    @staticmethod
    def _design(filter_length: int, across_features: bool = False,
                magic_number: float | None = None) -> Design:
        MedianFilter._check(filter_length)
        if filter_length % 2 == 1:
            padding = ((filter_length - 1) // 2, (filter_length - 1) // 2)
        else:
            padding = (filter_length // 2, (filter_length - 2) // 2)
        return Design(values={"filter_length": filter_length,
                              "padding": padding,
                              "across_features": across_features,
                              "magic_number": magic_number})

    @staticmethod
    def _forward(x: jnp.ndarray, *, filter_length: int, padding,
                 across_features: bool, magic_number) -> jnp.ndarray:
        d = x.ndim
        if d == 1:
            x = x.reshape(1, -1, 1)
        elif d == 2:
            x = x[None]
        if x.ndim != 3:
            raise ValueError("Input must be 1D, 2D, or 3D tensor.")

        if magic_number is not None:
            mask = x == magic_number
            x = jnp.where(mask, jnp.nan, x)

        T = x.shape[1]
        xp = jnp.pad(x, [(0, 0), padding, (0, 0)],
                     constant_values=jnp.nan)
        idx = np.arange(T)[:, None] + np.arange(filter_length)[None, :]
        y = jnp.moveaxis(xp[:, idx, :], -1, -2)  # (B, T, D, L)
        if across_features:
            y = y.reshape(*y.shape[:2], -1)
        med = jnp.nanquantile(y, 0.5, axis=-1)
        out = med

        if magic_number is not None:
            mp = jnp.pad(mask.astype(x.dtype), [(0, 0), padding, (0, 0)],
                         constant_values=jnp.nan)
            m = jnp.moveaxis(mp[:, idx, :], -1, -2)
            if across_features:
                m = m.reshape(*m.shape[:2], 1, -1)[..., 0, :]
            magic_count = jnp.nansum(m, axis=-1)
            valid_count = jnp.nansum(1 - m, axis=-1)
            dominant = magic_count > valid_count
            out = jnp.where(dominant, magic_number, out)

        if d == 1:
            out = out.reshape(-1)
        elif d == 2:
            out = out[0]
        return out


class MagicNumberInterpolation(BaseOp):
    """Fill magic values by linear interpolation between the nearest valid
    neighbors (constant extrapolation at the edges).

    TPU-native reformulation of the reference's unique_consecutive host
    loop (magic_intpl.py): previous/next valid indices come from cummax
    scans, so the op is one fused dense graph and differentiable for free.
    """

    def __init__(self, magic_number: float = 0.0) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check() -> None:
        pass

    @staticmethod
    def _design(magic_number: float = 0.0) -> Design:
        return Design(values={"magic_number": magic_number})

    @staticmethod
    def _forward(x: jnp.ndarray, *, magic_number: float) -> jnp.ndarray:
        d = x.ndim
        if d == 1:
            x = x.reshape(1, -1, 1)
        elif d == 2:
            x = x[None]
        if x.ndim != 3:
            raise ValueError("Input must be 1D, 2D, or 3D tensor.")
        B, T, D = x.shape

        valid = x != magic_number
        t = jnp.arange(T)[None, :, None]
        prev_idx = jax.lax.cummax(jnp.where(valid, t, -1), axis=1)
        nxt = jnp.where(valid, t, T)
        next_idx = -jax.lax.cummax(jnp.flip(-nxt, 1), axis=1)
        next_idx = jnp.flip(next_idx, 1)

        has_prev = prev_idx >= 0
        has_next = next_idx < T
        pi = jnp.clip(prev_idx, 0, T - 1)
        ni = jnp.clip(next_idx, 0, T - 1)
        xv_prev = jnp.take_along_axis(x, pi, axis=1)
        xv_next = jnp.take_along_axis(x, ni, axis=1)
        # constant extrapolation where a side is missing
        left = jnp.where(has_prev, xv_prev, xv_next)
        right = jnp.where(has_next, xv_next, xv_prev)
        span = jnp.maximum(ni - pi, 1)
        w = jnp.where(has_prev & has_next,
                      (t - pi) / span, 0.0).astype(x.dtype)
        filled = left * (1 - w) + right * w
        out = jnp.where(valid, x, filled)

        if d == 1:
            out = out.reshape(-1)
        elif d == 2:
            out = out[0]
        return out


class F0Evaluation(BaseOp):
    """F0 RMSE (Hz/cent/semitone) over co-voiced frames and V/UV error
    metrics (reference: diffsptk/modules/f0eval.py).  The reference's
    boolean-masked gather becomes a masked mean (static shapes)."""

    _input_names = ("x", "y")

    def __init__(self, reduction: str = "mean",
                 out_format: str = "f0-rmse-cent") -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check() -> None:
        pass

    @staticmethod
    def _design(reduction: str = "mean",
                out_format: str = "f0-rmse-cent") -> Design:
        return Design(values={"reduction": reduction,
                              "out_format": out_format})

    @staticmethod
    def _forward(x: jnp.ndarray, y: jnp.ndarray, *, reduction: str,
                 out_format: str) -> jnp.ndarray:
        UNVOICED = 0
        if out_format.startswith("f0-rmse"):
            voiced = (x != UNVOICED) & (y != UNVOICED)
            if out_format == "f0-rmse-hz":
                convert = lambda v: v
            elif out_format == "f0-rmse-cent":
                convert = lambda v: 1200 * jnp.log2(jnp.where(v > 0, v, 1.0))
            elif out_format == "f0-rmse-semitone":
                convert = lambda v: 12 * jnp.log2(jnp.where(v > 0, v, 1.0))
            else:
                raise ValueError(
                    f"out_format {out_format} is not supported.")
            se = jnp.square(convert(x) - convert(y)) * voiced
            count = jnp.maximum(jnp.sum(voiced), 1)
            out = jnp.sqrt(jnp.sum(se) / count)
        else:
            TP = jnp.sum((x != UNVOICED) & (y != UNVOICED), axis=-1)
            FP = jnp.sum((x != UNVOICED) & (y == UNVOICED), axis=-1)
            FN = jnp.sum((x == UNVOICED) & (y != UNVOICED), axis=-1)
            TN = jnp.sum((x == UNVOICED) & (y == UNVOICED), axis=-1)
            FPFN = FP + FN
            if out_format == "vuv-error-rate":
                out = FPFN / x.shape[-1]
            elif out_format == "vuv-error-percent":
                out = 100 * FPFN / x.shape[-1]
            elif out_format == "vuv-macro-f1-score":
                f1p = jnp.nan_to_num((2 * TP) / (2 * TP + FPFN))
                f1n = jnp.nan_to_num((2 * TN) / (2 * TN + FPFN))
                out = (f1p + f1n) / 2
            else:
                raise ValueError(
                    f"out_format {out_format} is not supported.")
        if reduction == "none":
            pass
        elif reduction == "sum":
            out = jnp.sum(out)
        elif reduction == "mean":
            out = jnp.mean(out)
        else:
            raise ValueError(f"reduction {reduction} is not supported.")
        return out

    def __call__(self, x, y):
        return self.apply(self.params, x, y)
