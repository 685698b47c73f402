"""Pseudo MGLSA digital filter — the differentiable vocoder core
(reference: diffsptk/modules/mglsadf.py:49-840).

Four interchangeable modes, all TPU-native:

* multi-stage  — Taylor cascade e^F ~= sum a_i F^i / i!; each stage is the
  time-varying FIR (gather-dot) from zerodf.  The default and the headline
  bench path: pure dense VPU/MXU work, embarrassingly parallel over time.
* single-stage — one long time-varying FIR with the impulse response
  obtained from mgc2mgc / FFT.
* freq-domain  — istft(mgc2sp(mc) * stft(x)): frame-parallel.
* pade-approx  — Padé [L/L] of exp: 2 cascaded FIR stages + 2L time-varying
  complex one-pole recurrences through the native scan kernel, with the
  optional chunk+warmup re-framing for block parallelism.  Padé polynomial
  roots are static and computed host-side (no complex eig on TPU).

Phase in {minimum, maximum, zero, mixed}.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseNonFunctionalOp, Design, check_size, to_device_array
from ..kernels.recurrence import sample_wise_lpc
from ..utils.linalg import remove_gain
from .gnorm import GeneralizedCepstrumGainNormalization, get_gamma
from .linear_intpl import linear_interpolate
from .mc2b import (
    MelCepstrumToMLSADigitalFilterCoefficients,
    MLSADigitalFilterCoefficientsToMelCepstrum,
)
from .mgc2mgc import MelGeneralizedCepstrumToMelGeneralizedCepstrum
from .mgc2sp import MelGeneralizedCepstrumToSpectrum
from .stft import (
    InverseShortTimeFourierTransform,
    ShortTimeFourierTransform,
)
from .zerodf import AllZeroDigitalFilter


def mirror(x: jnp.ndarray, half: bool = False) -> jnp.ndarray:
    x0, x1 = x[..., :1], x[..., 1:]
    if half:
        x1 = x1 * 0.5
    return jnp.concatenate((jnp.flip(x1, -1), x0, x1), axis=-1)


def _exp_taylor_weights(order: int) -> np.ndarray:
    """weights[i] = cp[i]/cp[i-1] for cp = Taylor coefficients of exp
    (i.e. 1/i), with weights[0] = 1."""
    cp = np.array([1.0 / math.factorial(k) for k in range(order + 1)])
    w = cp[1:] / cp[:-1]
    return np.insert(w, 0, 1.0)


def _exp_pade_weights(order: int) -> np.ndarray:
    """Ratios of the numerator coefficients of the [L/L] Padé of exp."""
    import mpmath as mp
    cr = mp.taylor(mp.exp, 0, order * 2)
    cp, _ = mp.pade(cr, order, order)
    cp = np.array([float(v) for v in cp])
    w = cp[1:] / cp[:-1]
    return np.insert(w, 0, 1.0)


class MultiStageFIRFilter:
    """Taylor-series cascade (reference mglsadf.py:254-386)."""

    def __init__(self, filter_order, frame_period, *, alpha=0.0, gamma=0.0,
                 ignore_gain=False, phase="minimum", taylor_order=20,
                 cep_order=199, n_fft=512, cascade="folded",
                 cascade_precision=None, learnable=False, dtype=None):
        if taylor_order < 0:
            raise ValueError("taylor_order must be non-negative.")
        if cascade not in ("stages", "folded", "fused"):
            raise ValueError(
                "cascade must be 'stages', 'folded', or 'fused'.")
        self.ignore_gain = ignore_gain
        self.phase = phase
        self.frame_period = frame_period
        # "folded" (default): framing/transform/blend folded into static
        # matmul plans (kernels/mlsa_cascade.py) — pure XLA, ~4x the
        # stage-by-stage path on TPU; "stages": stage-by-stage XLA FFT
        # graph; "fused": VMEM-resident Pallas kernel
        # (kernels/pallas_mlsa.py).  All three are the same math.
        # cascade_precision overrides the dot precision of the folded /
        # fused paths ("DEFAULT" trades ~1e-3 relative error for ~2-4x
        # on a single synthesis pass; keep the default for
        # inverse->forward round trips, which re-amplify the error).
        self.cascade = cascade
        self.cascade_precision = cascade_precision

        if alpha == 0 and gamma == 0:
            cep_order = filter_order

        if phase == "minimum":
            cep_orders = (cep_order, 0)
        elif phase == "maximum":
            cep_orders = (0, cep_order)
        elif phase == "zero":
            cep_orders = (cep_order, cep_order)
        elif phase == "mixed":
            cep_orders = ((cep_order, cep_order)
                          if isinstance(cep_order, int) else cep_order)
        else:
            raise ValueError(f"phase {phase} is not supported.")
        self.cep_orders = cep_orders

        if phase == "mixed":
            self.mgc2c = [
                MelGeneralizedCepstrumToMelGeneralizedCepstrum(
                    filter_order[i], cep_orders[i], in_alpha=alpha,
                    in_gamma=gamma, n_fft=n_fft)
                for i in range(2)]
        else:
            self.mgc2c = MelGeneralizedCepstrumToMelGeneralizedCepstrum(
                filter_order, cep_order, in_alpha=alpha, in_gamma=gamma,
                n_fft=n_fft)

        self.zerodf = AllZeroDigitalFilter(
            sum(cep_orders), frame_period, ignore_gain=False,
            zeroth_index=cep_orders[1])

        self.weights = to_device_array(_exp_taylor_weights(taylor_order),
                                       dtype)
        self.a = to_device_array(np.ones(taylor_order + 1), dtype)
        self.learnable = ("a",) if learnable else ()

    @property
    def params(self):
        return {"a": self.a}

    def __call__(self, x, mc, a=None):
        a = self.a if a is None else a
        if self.phase == "mixed":
            mc_min, mc_max = mc
            c_min = self.mgc2c[0](mc_min)
            c_max = self.mgc2c[1](mc_max)
            c0 = c_min[..., :1] + c_max[..., :1]
            c = jnp.concatenate(
                [jnp.flip(c_max[..., 1:], -1), jnp.zeros_like(c0),
                 c_min[..., 1:]], axis=-1)
        else:
            c = self.mgc2c(mc)
            c0, c = remove_gain(c, value=0.0, return_gain=True)
            if self.phase == "maximum":
                c = jnp.flip(c, -1)
            elif self.phase == "zero":
                c = mirror(c, half=True)

        M = c.shape[-1] - 1
        if M + 1 > 32:
            # Every Taylor stage filters with the same coefficients, so
            # the per-frame coefficient spectrum is shared across stages.
            from .zerodf import _next_pow2
            P = self.frame_period
            nfft = _next_pow2(2 * P + M + 1)
            advance = self.zerodf.padding[1]
            if self.cascade == "fused":
                from ..kernels.mlsa_cascade import lane_aligned_nfft
                from ..kernels.pallas_mlsa import taylor_cascade
                kw = ({"precision": self.cascade_precision}
                      if self.cascade_precision else {})
                y = taylor_cascade(x, c, self.weights, a, P, advance,
                                   lane_aligned_nfft(2 * P + M + 1), **kw)
            elif self.cascade == "folded":
                import jax as _jax

                from ..kernels.mlsa_cascade import (lane_aligned_nfft,
                                                    taylor_cascade_folded)
                kw = ({"precision": getattr(_jax.lax.Precision,
                                            self.cascade_precision)}
                      if self.cascade_precision else {})
                # The folded plans compute a linear convolution, so the
                # transform length only has to clear the 2P+M+1 alias
                # floor — pick the lane-tile-exact length (K = 128k)
                # instead of the next power of two (K = 2^j + 1, which
                # wastes a whole MXU lane tile on one spectrum row).
                y = taylor_cascade_folded(x, c, self.weights, a, P,
                                          advance,
                                          lane_aligned_nfft(2 * P + M + 1),
                                          **kw)
            else:
                from ..kernels import mxu_fft
                from .zerodf import zerodf_fft
                c_spec = mxu_fft.rfft(c, nfft)
                y = x * a[0]
                for i in range(1, a.shape[0]):
                    x = zerodf_fft(x, c, P, advance=advance,
                                   b_spec=c_spec,
                                   nfft=nfft) * self.weights[i]
                    y = y + x * a[i]
        else:
            y = x * a[0]
            for i in range(1, a.shape[0]):
                x = self.zerodf(x, c) * self.weights[i]
                y = y + x * a[i]

        if not self.ignore_gain:
            K = jnp.exp(linear_interpolate(c0, self.frame_period))
            y = y * K[..., 0]
        return y


class SingleStageFIRFilter:
    """One long time-varying FIR (reference mglsadf.py:389-526)."""

    def __init__(self, filter_order, frame_period, *, alpha=0.0, gamma=0.0,
                 ignore_gain=False, phase="minimum", ir_length=2000,
                 n_fft=4096, dtype=None):
        self.ignore_gain = ignore_gain
        self.phase = phase
        self.n_fft = n_fft

        if phase == "minimum":
            ir_orders = (ir_length - 1, 0)
        elif phase == "maximum":
            ir_orders = (0, ir_length - 1)
        elif phase == "zero":
            ir_orders = (ir_length - 1, ir_length - 1)
        elif phase == "mixed":
            ir_orders = ((ir_length - 1, ir_length - 1)
                         if isinstance(ir_length, int)
                         else (ir_length[0] - 1, ir_length[1] - 1))
        else:
            raise ValueError(f"phase {phase} is not supported.")
        self.ir_orders = ir_orders
        self.ir_length = ir_length

        if phase in ("minimum", "maximum"):
            self.mgc2ir = MelGeneralizedCepstrumToMelGeneralizedCepstrum(
                filter_order, ir_length - 1, in_alpha=alpha, in_gamma=gamma,
                out_gamma=1, out_mul=True, n_fft=n_fft)
        elif phase == "zero":
            self.mgc2c = MelGeneralizedCepstrumToMelGeneralizedCepstrum(
                filter_order, ir_length - 1, in_alpha=alpha, in_gamma=gamma,
                n_fft=n_fft)
        else:  # mixed
            self.mgc2c = [
                MelGeneralizedCepstrumToMelGeneralizedCepstrum(
                    filter_order[i], ir_orders[i], in_alpha=alpha,
                    in_gamma=gamma, n_fft=n_fft)
                for i in range(2)]

        self.zerodf = AllZeroDigitalFilter(
            sum(ir_orders), frame_period, ignore_gain=False,
            zeroth_index=ir_orders[1])

    def __call__(self, x, mc):
        n_fft = self.n_fft
        if self.phase in ("minimum", "maximum"):
            h = self.mgc2ir(mc)
            if self.ignore_gain:
                h = h / h[..., :1]
            if self.phase == "maximum":
                h = jnp.flip(h, -1)
        elif self.phase == "zero":
            c = self.mgc2c(mc)
            c = jnp.concatenate((c[..., :1], c[..., 1:] * 0.5), axis=-1)
            if self.ignore_gain:
                c = remove_gain(c, value=0.0)
            H = jnp.fft.hfft(c, n=n_fft)
            h = jnp.fft.ifft(jnp.exp(H)).real[..., : self.ir_length]
            h = mirror(h)
        else:  # mixed
            mc_min, mc_max = mc
            c_min = self.mgc2c[0](mc_min)
            c_max = self.mgc2c[1](mc_max)
            if self.ignore_gain:
                c0 = jnp.zeros_like(c_min[..., :1])
            else:
                c0 = c_min[..., :1] + c_max[..., :1]
            c = jnp.concatenate(
                [jnp.flip(c_max[..., 1:], -1), c0, c_min[..., 1:]], axis=-1)
            pad = [(0, 0)] * (c.ndim - 1) + [(0, n_fft - c.shape[-1])]
            c = jnp.pad(c, pad)
            shift = self.ir_orders[1]
            c = jnp.roll(c, -shift, axis=-1)
            C = jnp.fft.fft(c, n=n_fft)
            h = jnp.fft.ifft(jnp.exp(C.real) *
                             jnp.exp(1j * C.imag)).real[..., :n_fft]
            h = jnp.roll(h, shift, axis=-1)[..., : sum(self.ir_orders) + 1]
        return self.zerodf(x, h)


class FrequencyDomainFIRFilter:
    """STFT-domain multiply (reference mglsadf.py:529-644)."""

    def __init__(self, filter_order, frame_period, *, alpha=0.0, gamma=0.0,
                 ignore_gain=False, phase="minimum", frame_length=400,
                 fft_length=512, n_fft=512, dtype=None, **stft_kwargs):
        if frame_length <= 2 * frame_period:
            raise ValueError(
                "frame_period must be less than half of frame_length.")
        self.ignore_gain = ignore_gain
        self.phase = phase

        if isinstance(filter_order, int):
            filter_order = (filter_order, filter_order)

        n = 2 if phase == "mixed" else 1
        self.gnorm, self.mc2b, self.b2mc, self.mgc2sp = [], [], [], []
        for i in range(n):
            if ignore_gain:
                self.gnorm.append(GeneralizedCepstrumGainNormalization(
                    filter_order[i], gamma=gamma))
                self.mc2b.append(MelCepstrumToMLSADigitalFilterCoefficients(
                    filter_order[i], alpha=alpha))
                self.b2mc.append(MLSADigitalFilterCoefficientsToMelCepstrum(
                    filter_order[i], alpha=alpha))
            self.mgc2sp.append(MelGeneralizedCepstrumToSpectrum(
                filter_order[i], fft_length, alpha=alpha, gamma=gamma,
                out_format="complex", n_fft=n_fft))

        self.stft = ShortTimeFourierTransform(
            frame_length, frame_period, fft_length, out_format="complex",
            **stft_kwargs)
        self.istft = InverseShortTimeFourierTransform(
            frame_length, frame_period, fft_length, **stft_kwargs)

    def __call__(self, x, mc):
        mc_seq = [mc] if isinstance(mc, jnp.ndarray) else list(mc)
        Hs = []
        for i, c in enumerate(mc_seq):
            if self.ignore_gain:
                b = self.mc2b[i](c)
                b = self.gnorm[i](b)
                b = b.at[..., 0].set(0.0)
                c = self.b2mc[i](b)
            Hs.append(self.mgc2sp[i](c))

        if self.phase == "minimum":
            H = Hs[0]
        elif self.phase == "maximum":
            H = jnp.conj(Hs[0])
        elif self.phase == "zero":
            H = jnp.abs(Hs[0])
        elif self.phase == "mixed":
            H = Hs[0] * jnp.conj(Hs[1])
        else:
            raise RuntimeError

        X = self.stft(x)
        return self.istft(H * X, out_length=x.shape[-1])


class MultiStageIIRFilter:
    """Padé cascade of FIR stages + complex one-pole scans
    (reference mglsadf.py:647-840)."""

    def __init__(self, filter_order, frame_period, *, alpha=0.0, gamma=0.0,
                 ignore_gain=False, phase="minimum", pade_order=5,
                 cep_order=199, n_fft=512, chunk_length=None,
                 warmup_length=None, learnable=False, dtype=None):
        if phase != "minimum" or not isinstance(filter_order, int):
            raise ValueError("Only minimum-phase filter is supported.")
        self.ignore_gain = ignore_gain
        self.frame_period = frame_period

        self.mgc2c = MelGeneralizedCepstrumToMelGeneralizedCepstrum(
            filter_order, cep_order, in_alpha=alpha, in_gamma=gamma,
            n_fft=n_fft)

        self.chunking = chunk_length is not None
        if self.chunking:
            self.warmup_length = (warmup_length if warmup_length is not None
                                  else cep_order)
            if chunk_length <= 0:
                raise ValueError("chunk_length must be positive.")
            self.chunk_length = chunk_length

        self.weights = to_device_array(_exp_pade_weights(pade_order), dtype)

        if pade_order == 3:
            a1 = np.linspace(1.0, 0.4, pade_order + 1)
        elif pade_order == 4:
            a1 = np.linspace(1.0, 0.6, pade_order + 1)
        elif 5 <= pade_order <= 14:
            a1 = np.ones(pade_order + 1)
        else:
            raise ValueError("pade_order must be in [3, 14].")
        self.a1_np = a1
        self.a1 = to_device_array(a1, dtype)
        self.a2 = self.a1
        self.learnable = ("a1",) if learnable else ()

        # Static Padé roots, host-side (complex eig has no TPU path).
        self.roots1 = to_device_array(self._host_roots(a1))
        self.roots2 = self.roots1
        self.pade_order = pade_order

    def _host_roots(self, a: np.ndarray) -> np.ndarray:
        w = np.asarray(jax.device_get(self.weights), np.float64)
        coefs = np.cumprod(w) * np.asarray(a, np.float64)
        return np.roots(coefs[::-1])

    def __call__(self, x, mc):
        one_d = x.ndim == 1
        if one_d:
            x, mc = x[None], mc[None]

        c = self.mgc2c(mc)
        c0, c1 = c[..., :1], c[..., 1:]
        c_b = linear_interpolate(jnp.flip(c1, -1), self.frame_period)
        c_a = linear_interpolate(c1, self.frame_period)

        T = x.shape[-1]
        B, _, M = c_a.shape

        a1, a2 = self.a1, self.a2
        weights = self.weights

        c_b2, c_b1 = c_b[..., :-1], c_b[..., -1]

        # Numerator, 1st stage: cascaded one-tap delays.
        y = x * a1[0]
        for i in range(1, a1.shape[0]):
            x = jnp.pad(x[..., :-1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])
            x = x * c_b1 * weights[i]
            y = y + x * a1[i]

        # Numerator, 2nd stage: order-(M-1) taps delayed by >= 2.
        x = y
        y = x * a2[0]
        idx = np.arange(T)[:, None] + np.arange(M + 1)[None, :]
        for i in range(1, a2.shape[0]):
            xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(M, 0)])
            frames = xp[..., idx]                      # (B, T, M+1)
            x = jnp.sum(frames[..., :-2] * c_b2, axis=-1) * weights[i]
            y = y + x * a2[i]

        if self.chunking:
            W, C = self.warmup_length, self.chunk_length
            P = C - W
            y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(W, 0)])
            n_frames = (y.shape[-1] - C) // P + 1
            fidx = np.arange(n_frames)[:, None] * P + np.arange(C)[None, :]
            y = y[..., fidx].reshape(-1, C)
            ca_flat = c_a.reshape(B, -1)
            ca_flat = jnp.pad(ca_flat,
                              [(0, 0)] * (ca_flat.ndim - 1) + [(M * W, 0)])
            cidx = (np.arange(n_frames)[:, None] * (M * P)
                    + np.arange(M * C)[None, :])
            c_a = ca_flat[..., cidx].reshape(y.shape[0], C, M)

        c_a1, c_a2 = c_a[..., :1], c_a[..., 1:]
        pad = [(0, 0)] * (c_a2.ndim - 1) + [(1, 0)]
        c_a2 = jnp.pad(c_a2, pad)

        roots1, roots2 = self.roots1, self.roots2
        y = y.astype(jnp.result_type(y.dtype, roots1.dtype))

        # Denominator: 2 * pade_order sequential complex sections.
        p1 = 1.0 / roots1
        for i in range(self.pade_order):
            y = sample_wise_lpc(y, p1[i] * c_a1)
        p2 = 1.0 / roots2
        for i in range(self.pade_order):
            y = sample_wise_lpc(y, p2[i] * c_a2)
        y = y.real

        if self.chunking:
            y = y[..., self.warmup_length:]
            y = y.reshape(B, -1)[..., :T]

        if not self.ignore_gain:
            K = jnp.exp(linear_interpolate(c0, self.frame_period))
            y = y * K[..., 0]

        if one_d:
            y = y[0]
        return y


class PseudoMGLSADigitalFilter(BaseNonFunctionalOp):
    """MLSA/MGLSA filter: (excitation (..., T), mel-cepstrum
    (..., T/P, M+1)) -> (..., T).

    Examples
    --------
    >>> import jax, numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> sp = diffsptk_tpu.Spectrum(64)(
    ...     diffsptk_tpu.nrand(63, key=jax.random.PRNGKey(0)))
    >>> mc = diffsptk_tpu.MelCepstralAnalysis(
    ...     fft_length=64, cep_order=4, alpha=0.42)(sp)
    >>> e = diffsptk_tpu.nrand(63, key=jax.random.PRNGKey(1))
    >>> mlsa = diffsptk_tpu.MLSA(4, frame_period=16, alpha=0.42,
    ...                          taylor_order=10)
    >>> y = mlsa(e, jnp.tile(mc, (4, 1)))
    >>> y.shape
    (64,)
    """

    def __init__(self, filter_order, frame_period: int, *, alpha: float = 0,
                 gamma: float = 0, c: int | None = None,
                 ignore_gain: bool = False, phase: str = "minimum",
                 mode: str = "multi-stage", **kwargs) -> None:
        self.frame_period = frame_period

        if phase == "mixed":
            if isinstance(filter_order, int):
                filter_order = (filter_order, filter_order)
            self.split_sections = (filter_order[0], filter_order[1] + 1)
        else:
            if not isinstance(filter_order, int):
                raise ValueError(
                    "filter_order must be int unless phase is 'mixed'.")
            self.split_sections = (filter_order + 1,)
        gamma = get_gamma(gamma, c)

        def flip(v):
            return v if isinstance(v, int) else (v[1], v[0])

        kw = kwargs.copy()
        for key in ("cep_order", "ir_length"):
            if key in kw:
                kw[key] = flip(kw[key])
        fo = flip(filter_order)

        common = dict(alpha=alpha, gamma=gamma, ignore_gain=ignore_gain,
                      phase=phase)
        if mode == "multi-stage":
            self.mglsadf = MultiStageFIRFilter(fo, frame_period, **common,
                                               **kw)
        elif mode == "single-stage":
            self.mglsadf = SingleStageFIRFilter(fo, frame_period, **common,
                                                **kw)
        elif mode == "freq-domain":
            self.mglsadf = FrequencyDomainFIRFilter(fo, frame_period,
                                                    **common, **kw)
        elif mode == "pade-approx":
            self.mglsadf = MultiStageIIRFilter(fo, frame_period, **common,
                                               **kw)
        else:
            raise ValueError(f"mode {mode} is not supported.")

    def __call__(self, x: jnp.ndarray, mc: jnp.ndarray) -> jnp.ndarray:
        check_size(mc.shape[-1], sum(self.split_sections),
                   "dimension of mel-cepstrum")
        check_size(x.shape[-1], mc.shape[-2] * self.frame_period,
                   "sequence length")
        if len(self.split_sections) != 1:
            n = self.split_sections[0]
            mc_max, mc_min = mc[..., :n], mc[..., n:]
            pad = [(0, 0)] * (mc.ndim - 1) + [(1, 0)]
            mc_max = jnp.pad(jnp.flip(mc_max, -1), pad)
            mc_inner = (mc_min, mc_max)
        else:
            mc_inner = mc
        return self.mglsadf(x, mc_inner)


class PseudoInverseMGLSADigitalFilter(BaseNonFunctionalOp):
    """IMLSA: literally mglsadf(y, -mc)
    (reference: diffsptk/modules/imglsadf.py:23-63).

    Inverse-then-forward round-trips the excitation:

    Examples
    --------
    >>> import jax, numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> sp = diffsptk_tpu.Spectrum(64)(
    ...     diffsptk_tpu.nrand(63, key=jax.random.PRNGKey(0)))
    >>> mc = jnp.tile(diffsptk_tpu.MelCepstralAnalysis(
    ...     fft_length=64, cep_order=4, alpha=0.42)(sp), (4, 1))
    >>> e = diffsptk_tpu.nrand(63, key=jax.random.PRNGKey(1))
    >>> kw = dict(frame_period=16, alpha=0.42, taylor_order=10)
    >>> y = diffsptk_tpu.MLSA(4, **kw)(e, mc)
    >>> e2 = diffsptk_tpu.IMLSA(4, **kw)(y, mc)
    >>> bool(np.allclose(np.asarray(e2), np.asarray(e), atol=1e-2))
    True
    """

    def __init__(self, filter_order, frame_period: int, **kwargs) -> None:
        self.mglsadf = PseudoMGLSADigitalFilter(filter_order, frame_period,
                                                **kwargs)

    def __call__(self, y: jnp.ndarray, mc: jnp.ndarray) -> jnp.ndarray:
        return self.mglsadf(y, -mc)
