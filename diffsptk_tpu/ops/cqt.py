"""Constant-Q transform and inverse
(reference: diffsptk/modules/cqt.py:51-319, icqt.py:100-271).

Recursive-downsample VQT: per-octave STFT -> dense FFT-basis matmul, with
sqrt(2) resampling between octaves through the polyphase kaiser resampler.
Per-octave sizes are static, so the octave loop is a Python loop of jitted
stages (SURVEY.md §7 hard-part #5).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import BaseNonFunctionalOp, to_device_array
from ..utils.resample import Resampler, get_resample_params
from .cqt_design import (
    cqt_frequencies,
    early_downsample_count,
    et_relative_bw,
    relative_bandwidth,
    vqt_filter_fft,
    wavelet_lengths,
)
from .stft import (
    InverseShortTimeFourierTransform,
    ShortTimeFourierTransform,
)


class ConstantQTransform(BaseNonFunctionalOp):
    """Waveform (..., T) -> CQT (..., T/P, K) complex.

    Examples
    --------
    >>> import jax
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.nrand(511, key=jax.random.PRNGKey(0))
    >>> diffsptk_tpu.CQT(64, 16000, n_bin=12)(x).shape
    (8, 12)
    """

    def __init__(self, frame_period: int, sample_rate: int, *,
                 f_min: float = 32.7, n_bin: int = 84,
                 n_bin_per_octave: int = 12, tuning: float = 0,
                 filter_scale: float = 1, norm: float = 1,
                 sparsity: float = 1e-2, window: str = "hann",
                 scale: bool = True, res_type: str | None = "kaiser_best",
                 dtype=None, **kwargs) -> None:
        if frame_period <= 0:
            raise ValueError("frame_period must be positive.")

        K = n_bin
        B = n_bin_per_octave
        n_octave = int(np.ceil(K / B))
        n_filter = min(B, K)

        freqs = cqt_frequencies(K, f_min, B, tuning)
        alpha = (et_relative_bw(B) if K == 1
                 else relative_bandwidth(freqs))
        lengths, filter_cutoff = wavelet_lengths(
            freqs, sample_rate, window, filter_scale, 0, alpha)

        rkw = get_resample_params(res_type) if res_type is not None else {}
        rkw.pop("resampling_method", None)
        rkw.update({k: v for k, v in kwargs.items()
                    if k in ("lowpass_filter_width", "rolloff", "beta")})

        self.early_downsample = None
        downsample_count = early_downsample_count(
            sample_rate * 0.5, filter_cutoff, frame_period, n_octave)
        self.downsample_scale = 1.0
        if 0 < downsample_count:
            factor = 2 ** downsample_count
            self.early_downsample = Resampler(factor, 1, **rkw, dtype=dtype)
            self.downsample_scale = (np.sqrt(factor) if scale
                                     else float(factor))
            frame_period //= factor
            sample_rate /= factor
            if scale:
                lengths, _ = wavelet_lengths(freqs, sample_rate, window,
                                             filter_scale, 0, alpha)

        cqt_scale = (1.0 / np.sqrt(lengths)) if scale else np.ones(K)
        self.cqt_scale = to_device_array(cqt_scale, dtype)

        fp = [frame_period]
        sr = [sample_rate * 1.0]
        for i in range(n_octave - 1):
            if fp[i] % 2 == 0:
                fp.append(fp[i] // 2)
                sr.append(sr[i] * 0.5)
            else:
                fp.append(fp[i])
                sr.append(sr[i])

        # One SHARED FFT length across octaves (the max natural size):
        # the Parseval inner product with each compact wavelet is
        # invariant to padding, and a single plan size cuts the
        # per-octave FFT compilation the remote AOT compiler must do.
        slices = [slice(-n_filter * (i + 1),
                        None if i == 0 else (-n_filter * i))
                  for i in range(n_octave)]
        naturals = [vqt_filter_fft(sr[i], freqs[slices[i]], filter_scale,
                                   norm, sparsity, window=window,
                                   alpha=alpha[slices[i]])
                    for i in range(n_octave)]
        shared_fft = max(nf for _, nf, _ in naturals)

        self.fft_bases = []
        self.transforms = []
        self.resamplers = []
        for i in range(n_octave):
            sl = slices[i]
            if naturals[i][1] == shared_fft:
                fft_basis, fft_length = naturals[i][0], naturals[i][1]
            else:
                fft_basis, fft_length, _ = vqt_filter_fft(
                    sr[i], freqs[sl], filter_scale, norm, sparsity,
                    window=window, alpha=alpha[sl],
                    force_n_fft=shared_fft)
            fft_basis = fft_basis * np.sqrt(sample_rate / sr[i])
            self.fft_bases.append(to_device_array(fft_basis.T, dtype))
            self.transforms.append(ShortTimeFourierTransform(
                frame_length=fft_length, frame_period=fp[i],
                fft_length=fft_length, center=True, window="rectangular",
                norm="none", eps=0, out_format="complex"))
            if fp[i] % 2 == 0:
                self.resamplers.append(
                    ("halve", Resampler(2, 1, **rkw, dtype=dtype),
                     np.sqrt(2)))
            else:
                self.resamplers.append(("identity", None, 1.0))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.early_downsample is not None:
            x = self.early_downsample(x) * self.downsample_scale
        cs = []
        for i, (stft, W) in enumerate(zip(self.transforms, self.fft_bases)):
            X = stft(x)
            cs.append(jnp.matmul(X, W))
            if i != len(self.transforms) - 1:
                kind, rs, s = self.resamplers[i]
                if kind == "halve":
                    x = rs(x) * s
        c = self._trim_stack(self.cqt_scale.shape[0], cs) * self.cqt_scale
        return c

    @staticmethod
    def _trim_stack(n_bin: int, cqt_response: list) -> jnp.ndarray:
        max_col = min(c.shape[-2] for c in cqt_response)
        pieces = []
        end = n_bin
        for c in cqt_response:
            n_oct = c.shape[-1]
            if end < n_oct:
                pieces.append(c[..., :max_col, -end:])
                end = 0
                break
            pieces.append(c[..., :max_col, :])
            end -= n_oct
        # responses are ordered top octave first; stack low-to-high
        return jnp.concatenate(pieces[::-1], axis=-1)


class InverseConstantQTransform(BaseNonFunctionalOp):
    """CQT (..., T/P, K) -> waveform (..., T).

    Examples
    --------
    >>> import jax
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.nrand(511, key=jax.random.PRNGKey(0))
    >>> c = diffsptk_tpu.CQT(64, 16000, n_bin=12)(x)
    >>> diffsptk_tpu.ICQT(64, 16000, n_bin=12)(c, out_length=512).shape
    (512,)
    """

    def __init__(self, frame_period: int, sample_rate: int, *,
                 f_min: float = 32.7, n_bin: int = 84,
                 n_bin_per_octave: int = 12, tuning: float = 0,
                 filter_scale: float = 1, norm: float = 1,
                 sparsity: float = 1e-2, window: str = "hann",
                 scale: bool = True, res_type: str | None = "kaiser_best",
                 dtype=None, **kwargs) -> None:
        if frame_period <= 0:
            raise ValueError("frame_period must be positive.")

        K = n_bin
        B = n_bin_per_octave
        n_octave = int(np.ceil(K / B))

        freqs = cqt_frequencies(K, f_min, B, tuning)
        alpha = (et_relative_bw(B) if K == 1
                 else relative_bandwidth(freqs))
        lengths, _ = wavelet_lengths(freqs, sample_rate, window,
                                     filter_scale, 0, alpha)
        cqt_scale = np.sqrt(lengths) if scale else np.ones(K)
        self.cqt_scale = to_device_array(cqt_scale, dtype)

        rkw = get_resample_params(res_type) if res_type is not None else {}
        rkw.pop("resampling_method", None)

        fp = [frame_period]
        sr = [sample_rate * 1.0]
        for i in range(n_octave - 1):
            if fp[i] % 2 == 0:
                fp.append(fp[i] // 2)
                sr.append(sr[i] * 0.5)
            else:
                fp.append(fp[i])
                sr.append(sr[i])
        fp.reverse()
        sr.reverse()

        # shared FFT length across octaves (see ConstantQTransform)
        _slices = [slice(B * i, B * i + min(B, K - B * i))
                   for i in range(n_octave)]
        naturals = [vqt_filter_fft(sr[i], freqs[_slices[i]], filter_scale,
                                   norm, sparsity, window=window,
                                   alpha=alpha[_slices[i]])
                    for i in range(n_octave)]
        shared_fft = max(nf for _, nf, _ in naturals)

        self.slices = []
        self.fft_bases = []
        self.transforms = []
        self.resamplers = []
        for i in range(n_octave):
            sl = _slices[i]
            self.slices.append(sl)
            if naturals[i][1] == shared_fft:
                fft_basis, fft_length = naturals[i][0], naturals[i][1]
            else:
                fft_basis, fft_length, _ = vqt_filter_fft(
                    sr[i], freqs[sl], filter_scale, norm, sparsity,
                    window=window, alpha=alpha[sl],
                    force_n_fft=shared_fft)
            fft_basis = np.conj(fft_basis)
            freq_power = 1.0 / np.sum(np.abs(fft_basis) ** 2, axis=1)
            freq_power *= fft_length / lengths[sl]
            fft_basis = fft_basis * freq_power[:, None]
            # Fold the inverse transform into the (rank n_filter) basis:
            # irfft(C @ B) = Re(C) @ irfft(B) + Im(C) @ irfft(iB), so the
            # per-frame length-L inverse FFT becomes two tiny matmuls
            # against host-precomputed time bases — the spectrogram is
            # rank n_filter, and the L-point transform of each basis row
            # is a design-time constant.
            tb_re = np.fft.irfft(fft_basis, n=fft_length)
            tb_im = np.fft.irfft(1j * fft_basis, n=fft_length)
            self.time_bases_re = getattr(self, "time_bases_re", [])
            self.time_bases_im = getattr(self, "time_bases_im", [])
            self.time_bases_re.append(to_device_array(tb_re, dtype))
            self.time_bases_im.append(to_device_array(tb_im, dtype))
            self.fft_bases.append(to_device_array(fft_basis, dtype))
            self.transforms.append(InverseShortTimeFourierTransform(
                frame_length=fft_length, frame_period=fp[i],
                fft_length=fft_length, center=True, window="rectangular",
                norm="none"))
            self.resamplers.append(
                Resampler(1, int(sample_rate // sr[i]), **rkw, dtype=dtype))

    def __call__(self, c: jnp.ndarray,
                 out_length: int | None = None) -> jnp.ndarray:
        y = None
        for i in range(len(self.transforms)):
            C = c[..., self.slices[i]] * self.cqt_scale[self.slices[i]]
            u = (jnp.matmul(jnp.real(C), self.time_bases_re[i])
                 + jnp.matmul(jnp.imag(C), self.time_bases_im[i]))
            x = self.transforms[i].unframe(u)
            x = self.resamplers[i](x)
            if i == 0:
                y = x[..., :out_length]
            else:
                end = (x.shape[-1] if out_length is None
                       else min(x.shape[-1], out_length))
                end = min(end, y.shape[-1])
                y = y.at[..., :end].add(x[..., :end])
        return y
