"""Line-spectral-pair conversions
(reference: diffsptk/modules/{lpc2lsp,lsp2lpc,lsp2sp,lpccheck,lspcheck}.py).

lpc2lsp is redesigned TPU-first: instead of companion-matrix complex eig
(no TPU path), the palindromic sum/difference polynomials are evaluated on
the unit circle as real cosine series and their interlaced roots are
isolated by a dense sign-change grid + fixed-trip bisection — fully batched,
jittable, no host callback (SURVEY.md §7 hard-part #4).
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, filter_values
from .parcor import (
    LinearPredictiveCoefficientsToParcorCoefficients,
    ParcorCoefficientsToLinearPredictiveCoefficients,
)
from .rootpol import roots_to_polynomial

TAU = 2 * np.pi
LOG_ZERO = -1.0e10


def _palindromic_cos_series(c: jnp.ndarray) -> jnp.ndarray:
    """For palindromic coefficients c (length D+1, D even), return the
    cosine-series coefficients g s.t. G(w) = g[0] + sum_k g[k] cos(k w)
    equals e^{j D w / 2} C(e^{-jw})."""
    D = c.shape[-1] - 1
    half = D // 2
    g0 = c[..., half:half + 1]
    gk = 2 * jnp.flip(c[..., :half], -1)
    return jnp.concatenate([g0, gk], axis=-1)  # (..., half+1)


def _cos_eval(g: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the cosine series at angles w: (..., half+1), (..., R) ->
    (..., R)."""
    k = jnp.arange(g.shape[-1], dtype=w.dtype)
    basis = jnp.cos(w[..., None] * k)          # (..., R, half+1)
    return jnp.sum(basis * g[..., None, :], axis=-1)


def _find_unit_circle_roots(c: jnp.ndarray, n_roots: int,
                            n_grid: int, n_bisect: int = 40) -> jnp.ndarray:
    """Roots in (0, pi) of a palindromic polynomial, batched + jittable."""
    g = _palindromic_cos_series(c)
    w = jnp.linspace(0.0, np.pi, n_grid + 1, dtype=c.dtype)
    G = _cos_eval(g, jnp.broadcast_to(w, c.shape[:-1] + w.shape))
    sign_change = (G[..., :-1] * G[..., 1:]) <= 0
    csum = jnp.cumsum(sign_change.astype(jnp.int32), axis=-1)

    lo_list, hi_list = [], []
    for r in range(n_roots):
        idx = jnp.argmax(csum >= r + 1, axis=-1)
        lo_list.append(w[idx])
        hi_list.append(w[idx + 1])
    lo = jnp.stack(lo_list, axis=-1)
    hi = jnp.stack(hi_list, axis=-1)

    G_lo = _cos_eval(g, lo)
    for _ in range(n_bisect):
        mid = 0.5 * (lo + hi)
        G_mid = _cos_eval(g, mid)
        same = (G_lo * G_mid) > 0
        lo = jnp.where(same, mid, lo)
        G_lo = jnp.where(same, G_mid, G_lo)
        hi = jnp.where(same, hi, mid)
    return 0.5 * (lo + hi)


def _deconv_small(x: jnp.ndarray, kernel: tuple) -> jnp.ndarray:
    """Exact polynomial division by a tiny monic-leading kernel."""
    N = len(kernel)
    T = x.shape[-1]
    out_len = T - N + 1
    q = []
    buf = x
    for t in range(out_len):
        qt = buf[..., t] / kernel[0]
        q.append(qt)
        for j in range(1, N):
            if kernel[j] != 0:
                buf = buf.at[..., t + j].add(-qt * kernel[j])
    return jnp.stack(q, axis=-1)


class LinearPredictiveCoefficientsToLineSpectralPairs(BaseOp):
    """LPC (..., M+1) -> LSP frequencies [K, w1..wM].

    Examples
    --------
    >>> import jax, numpy as np
    >>> import diffsptk_tpu
    >>> a = diffsptk_tpu.LPC(32, 4)(
    ...     diffsptk_tpu.nrand(31, key=jax.random.PRNGKey(2)))
    >>> w = diffsptk_tpu.LinearPredictiveCoefficientsToLineSpectralPairs(4)(a)
    >>> np.round(np.asarray(w), 3)
    array([5.076, 0.485, 1.268, 1.611, 2.731])
    >>> back = diffsptk_tpu.LineSpectralPairsToLinearPredictiveCoefficients(4)(w)
    >>> bool(np.allclose(np.asarray(back), np.asarray(a), atol=1e-8))
    True
    """

    _input_names = ("a",)

    def __init__(self, lpc_order: int, *, log_gain: bool = False,
                 sample_rate: int | None = None,
                 out_format: str | int = "radian",
                 n_grid: int | None = None, dtype=None) -> None:
        self.in_dim = lpc_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))))

    @staticmethod
    def _check(lpc_order: int, log_gain: bool, sample_rate: int | None,
               out_format) -> None:
        if lpc_order < 0:
            raise ValueError("lpc_order must be non-negative.")
        if out_format in (2, 3, "hz", "khz") and (
                sample_rate is None or sample_rate <= 0):
            raise ValueError("sample_rate must be positive.")

    @staticmethod
    def _design(lpc_order: int, log_gain: bool = False,
                sample_rate: int | None = None,
                out_format: str | int = "radian",
                n_grid: int | None = None) -> Design:
        LinearPredictiveCoefficientsToLineSpectralPairs._check(
            lpc_order, log_gain, sample_rate, out_format)
        if out_format in (0, "radian"):
            formatter = lambda x: x
        elif out_format in (1, "cycle"):
            formatter = lambda x: x / TAU
        elif out_format in (2, "khz"):
            formatter = lambda x: x / (TAU / sample_rate * 1000)
        elif out_format in (3, "hz"):
            formatter = lambda x: x / (TAU / sample_rate)
        else:
            raise ValueError(f"out_format {out_format} is not supported.")
        if n_grid is None:
            n_grid = max(128, 64 * (lpc_order + 1))
        return Design(values={"log_gain": log_gain, "formatter": formatter,
                              "n_grid": n_grid})

    @staticmethod
    def _forward(a: jnp.ndarray, *, log_gain: bool, formatter,
                 n_grid: int) -> jnp.ndarray:
        M = a.shape[-1] - 1
        K, a1 = a[..., :1], a[..., 1:]
        if log_gain:
            K = jnp.log(K)
        if M == 0:
            return K

        pad1 = [(0, 0)] * (a1.ndim - 1) + [(1, 0)]
        a0 = jnp.pad(a1, pad1, constant_values=1.0)
        az = jnp.pad(a0, [(0, 0)] * (a1.ndim - 1) + [(0, 1)])
        p = az - jnp.flip(az, -1)
        q = az + jnp.flip(az, -1)

        if M % 2 == 0:
            p = _deconv_small(p, (1.0, -1.0))
            q = _deconv_small(q, (1.0, 1.0))
            wp = _find_unit_circle_roots(p, M // 2, n_grid)
            wq = _find_unit_circle_roots(q, M // 2, n_grid)
        else:
            p = _deconv_small(p, (1.0, 0.0, -1.0))
            wp = (_find_unit_circle_roots(p, (M - 1) // 2, n_grid)
                  if M > 1 else jnp.zeros(a1.shape[:-1] + (0,), a.dtype))
            wq = _find_unit_circle_roots(q, (M + 1) // 2, n_grid)
        w = jnp.sort(jnp.concatenate([wp, wq], axis=-1), axis=-1)
        return jnp.concatenate((K, formatter(w)), axis=-1)

    def __call__(self, a):
        check_size(a.shape[-1], self.in_dim, "dimension of LPC")
        return self.apply(self.params, a)


class LineSpectralPairsToLinearPredictiveCoefficients(BaseOp):
    """LSP -> LPC by P/Q polynomial reconstruction."""

    _input_names = ("w",)

    def __init__(self, lpc_order: int, *, log_gain: bool = False,
                 sample_rate: int | None = None,
                 in_format: str | int = "radian", dtype=None) -> None:
        self.in_dim = lpc_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))))

    @staticmethod
    def _check(lpc_order: int, log_gain: bool, sample_rate: int | None,
               in_format) -> None:
        LinearPredictiveCoefficientsToLineSpectralPairs._check(
            lpc_order, log_gain, sample_rate, in_format)

    @staticmethod
    def _design(lpc_order: int, log_gain: bool = False,
                sample_rate: int | None = None,
                in_format: str | int = "radian") -> Design:
        LineSpectralPairsToLinearPredictiveCoefficients._check(
            lpc_order, log_gain, sample_rate, in_format)
        if in_format in (0, "radian"):
            formatter = lambda x: x
        elif in_format in (1, "cycle"):
            formatter = lambda x: x * TAU
        elif in_format in (2, "khz"):
            formatter = lambda x: x * (TAU / sample_rate * 1000)
        elif in_format in (3, "hz"):
            formatter = lambda x: x * (TAU / sample_rate)
        else:
            raise ValueError(f"in_format {in_format} is not supported.")
        return Design(values={"log_gain": log_gain, "formatter": formatter})

    @staticmethod
    def _forward(w: jnp.ndarray, *, log_gain: bool, formatter) -> jnp.ndarray:
        M = w.shape[-1] - 1
        K, w1 = w[..., :1], w[..., 1:]
        if log_gain:
            K = jnp.exp(K)
        if M == 0:
            return K

        w1 = formatter(w1)
        z = jnp.exp(1j * w1)
        p_roots = z[..., 1::2]
        q_roots = z[..., 0::2]

        def corr(x, k, padding=0):
            # cross-correlation with small static kernel
            if padding:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(padding,) * 2])
            T = x.shape[-1] - len(k) + 1
            out = sum(x[..., j:j + T] * kj for j, kj in enumerate(k)
                      if kj != 0)
            return out

        if M == 1:
            q = roots_to_polynomial(
                jnp.concatenate([q_roots, jnp.conj(q_roots)], axis=-1))
            a = 0.5 * q[..., 1:-1]
        else:
            p = roots_to_polynomial(
                jnp.concatenate([p_roots, jnp.conj(p_roots)], axis=-1))
            q = roots_to_polynomial(
                jnp.concatenate([q_roots, jnp.conj(q_roots)], axis=-1))
            if M % 2 == 0:
                p = corr(p, (-1.0, 1.0))
                q = corr(q, (1.0, 1.0))
            else:
                p = corr(p, (-1.0, 0.0, 1.0), padding=1)
                q = corr(q, (0.0, 1.0, 0.0))
            a = 0.5 * (p + q)
        return jnp.concatenate((K, a.real), axis=-1)

    def __call__(self, w):
        check_size(w.shape[-1], self.in_dim, "dimension of LSP")
        return self.apply(self.params, w)


class LineSpectralPairsToSpectrum(BaseOp):
    """LSP -> log/power spectrum via the closed-form cosine product
    (reference lsp2sp.py).

    Examples
    --------
    >>> import jax, numpy as np
    >>> import diffsptk_tpu
    >>> a = diffsptk_tpu.LPC(32, 4)(
    ...     diffsptk_tpu.nrand(31, key=jax.random.PRNGKey(2)))
    >>> w = diffsptk_tpu.LinearPredictiveCoefficientsToLineSpectralPairs(4)(a)
    >>> diffsptk_tpu.LineSpectralPairsToSpectrum(4, 16)(w).shape
    (9,)
    """

    _input_names = ("w",)

    def __init__(self, lsp_order: int, fft_length: int, *,
                 alpha: float = 0, gamma: float = -1,
                 log_gain: bool = False, out_format: str | int = "power",
                 dtype=None) -> None:
        self.in_dim = lsp_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(lsp_order: int, fft_length: int, alpha: float,
               gamma: float) -> None:
        if lsp_order < 0:
            raise ValueError("lsp_order must be non-negative.")
        if fft_length <= 1:
            raise ValueError("fft_length must be greater than 1.")
        if 1 <= abs(alpha):
            raise ValueError("alpha must be in (-1, 1).")
        if not -1 <= gamma < 0:
            raise ValueError("gamma must be in [-1, 0).")

    @staticmethod
    def _design(lsp_order: int, fft_length: int, alpha: float = 0,
                gamma: float = -1, log_gain: bool = False,
                out_format: str | int = "power") -> Design:
        LineSpectralPairsToSpectrum._check(lsp_order, fft_length, alpha,
                                           gamma)
        if out_format in (0, "db"):
            formatter = lambda x: x * (20 / np.log(10))
        elif out_format in (1, "log-magnitude"):
            formatter = lambda x: x
        elif out_format in (2, "magnitude"):
            formatter = lambda x: jnp.exp(x)
        elif out_format in (3, "power"):
            formatter = lambda x: jnp.exp(2 * x)
        else:
            raise ValueError(f"out_format {out_format} is not supported.")

        c1 = 0.5 / gamma
        c2 = np.log(2) * (lsp_order if lsp_order % 2 == 0 else lsp_order - 1)
        omega = np.linspace(0, np.pi, fft_length // 2 + 1)
        warped = omega + 2 * np.arctan(
            alpha * np.sin(omega) / (1 - alpha * np.cos(omega)))
        cos_omega = np.cos(warped)[:, None]

        def floor_log_np(x):
            with np.errstate(divide="ignore", invalid="ignore"):
                y = np.log(x)
            return np.nan_to_num(y, nan=LOG_ZERO, neginf=LOG_ZERO)

        if lsp_order % 2 == 0:
            p_bias = floor_log_np(np.sin(0.5 * warped))
            q_bias = floor_log_np(np.cos(0.5 * warped))
        else:
            p_bias = floor_log_np(np.sin(warped))
            q_bias = np.zeros_like(warped)

        return Design(
            values={"log_gain": log_gain, "formatter": formatter, "c1": c1,
                    "c2": c2},
            arrays={"cos_omega": cos_omega, "p_bias": p_bias,
                    "q_bias": q_bias})

    @staticmethod
    def _forward(w: jnp.ndarray, *, log_gain: bool, formatter, c1: float,
                 c2: float, cos_omega: jnp.ndarray, p_bias: jnp.ndarray,
                 q_bias: jnp.ndarray) -> jnp.ndarray:
        def floor_log(x):
            return jnp.clip(jnp.log(x), min=LOG_ZERO)

        K, w1 = w[..., :1], w[..., 1:]
        if not log_gain:
            K = floor_log(K)
        cos_w = jnp.cos(w1)[..., None, :]
        pq = floor_log(jnp.abs(cos_omega - cos_w))  # (..., L/2+1, M)
        p = jnp.sum(pq[..., 1::2], axis=-1)
        q = jnp.sum(pq[..., 0::2], axis=-1)
        r = jax_logsumexp_2(2 * (p + p_bias), 2 * (q + q_bias))
        sp = K + c1 * (c2 + r)
        return formatter(sp)

    def __call__(self, w):
        check_size(w.shape[-1], self.in_dim, "dimension of LSP")
        return self.apply(self.params, w)


def jax_logsumexp_2(a, b):
    m = jnp.maximum(a, b)
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))


class LinearPredictiveCoefficientsStabilityCheck(BaseOp):
    """Clip PARCOR magnitude to (1 - margin) (reference lpccheck.py).

    A stable filter passes through unchanged:

    Examples
    --------
    >>> import jax, numpy as np
    >>> import diffsptk_tpu
    >>> a = diffsptk_tpu.LPC(32, 4)(
    ...     diffsptk_tpu.nrand(31, key=jax.random.PRNGKey(2)))
    >>> chk = diffsptk_tpu.LinearPredictiveCoefficientsStabilityCheck(4)(a)
    >>> bool(np.allclose(np.asarray(chk), np.asarray(a)))
    True
    """

    _input_names = ("a",)

    def __init__(self, lpc_order: int, margin: float = 1e-16,
                 warn_type: str = "warn") -> None:
        self.in_dim = lpc_order + 1
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(lpc_order: int, margin: float) -> None:
        if lpc_order < 0:
            raise ValueError("lpc_order must be non-negative.")
        if not 0 < margin < 1:
            raise ValueError("margin must be in (0, 1).")

    @staticmethod
    def _design(lpc_order: int, margin: float = 1e-16,
                warn_type: str = "warn") -> Design:
        LinearPredictiveCoefficientsStabilityCheck._check(lpc_order, margin)
        return Design(values={"bound": 1 - margin, "warn_type": warn_type})

    @staticmethod
    def _forward(a: jnp.ndarray, *, bound: float,
                 warn_type: str) -> jnp.ndarray:
        k = LinearPredictiveCoefficientsToParcorCoefficients._forward(
            a, gamma=1.0)
        K, k1 = k[..., :1], k[..., 1:]
        k1 = jnp.clip(k1, -bound, bound)
        k2 = jnp.concatenate((K, k1), axis=-1)
        return ParcorCoefficientsToLinearPredictiveCoefficients._forward(
            k2, gamma=1.0)

    def __call__(self, a):
        check_size(a.shape[-1], self.in_dim, "dimension of LPC")
        return self.apply(self.params, a)


class LineSpectralPairsStabilityCheck(BaseOp):
    """Repair LSPs that violate ordering/minimal-distance constraints
    (reference lspcheck.py).

    Well-ordered LSPs pass through unchanged:

    Examples
    --------
    >>> import jax, numpy as np
    >>> import diffsptk_tpu
    >>> a = diffsptk_tpu.LPC(32, 4)(
    ...     diffsptk_tpu.nrand(31, key=jax.random.PRNGKey(2)))
    >>> w = diffsptk_tpu.LinearPredictiveCoefficientsToLineSpectralPairs(4)(a)
    >>> chk = diffsptk_tpu.LineSpectralPairsStabilityCheck(4)(w)
    >>> bool(np.allclose(np.asarray(chk), np.asarray(w)))
    True
    """

    _input_names = ("w",)

    def __init__(self, lsp_order: int, rate: float = 0.0, n_iter: int = 1,
                 warn_type: str = "warn") -> None:
        self.in_dim = lsp_order + 1
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(lsp_order: int, rate: float, n_iter: int) -> None:
        if lsp_order < 0:
            raise ValueError("lsp_order must be non-negative.")
        if not 0 <= rate <= 1:
            raise ValueError("rate must be in [0, 1].")
        if n_iter < 0:
            raise ValueError("n_iter must be non-negative.")

    @staticmethod
    def _design(lsp_order: int, rate: float = 0.0, n_iter: int = 1,
                warn_type: str = "warn") -> Design:
        LineSpectralPairsStabilityCheck._check(lsp_order, rate, n_iter)
        return Design(values={
            "min_distance": rate * np.pi / (lsp_order + 1),
            "n_iter": n_iter, "warn_type": warn_type})

    @staticmethod
    def _forward(w: jnp.ndarray, *, min_distance: float, n_iter: int,
                 warn_type: str) -> jnp.ndarray:
        K, w1 = w[..., :1], w[..., 1:]
        M = w1.shape[-1]
        for _ in range(n_iter):
            for m in range(M - 1):
                dist = w1[..., m + 1] - w1[..., m]
                step = 0.5 * jnp.clip(min_distance - dist, min=0)
                w1 = w1.at[..., m].add(-step).at[..., m + 1].add(step)
            w1 = jnp.clip(w1, min_distance, np.pi - min_distance)
        return jnp.concatenate((K, w1), axis=-1)

    def __call__(self, w):
        check_size(w.shape[-1], self.in_dim, "dimension of LSP")
        return self.apply(self.params, w)
