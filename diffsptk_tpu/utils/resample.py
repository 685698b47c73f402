"""Polyphase sinc resampling (kaiser-windowed), the TPU equivalent of the
torchaudio resampler the reference borrows (SURVEY.md §2.9).

The kernel bank is designed host-side (numpy float64); application is one
strided lax.conv per phase — dense MXU work, no scatter.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import to_device_array

_KAISER_BEST = dict(lowpass_filter_width=64, rolloff=0.9475937167399596,
                    beta=14.769656459379492)
_KAISER_FAST = dict(lowpass_filter_width=16, rolloff=0.85,
                    beta=8.555504641634386)


def get_resample_params(mode: str = "kaiser_best") -> dict:
    if mode == "kaiser_best":
        return dict(_KAISER_BEST)
    if mode == "kaiser_fast":
        return dict(_KAISER_FAST)
    raise ValueError("Only kaiser_best and kaiser_fast are supported.")


def design_resample_kernel(orig_freq: int, new_freq: int,
                           lowpass_filter_width: int = 64,
                           rolloff: float = 0.9475937167399596,
                           beta: float | None = 14.769656459379492):
    """Kaiser-windowed sinc kernel bank (new_freq, 1, K) and the left pad
    width, following the standard polyphase construction."""
    g = math.gcd(int(orig_freq), int(new_freq))
    orig_freq = int(orig_freq) // g
    new_freq = int(new_freq) // g

    base_freq = min(orig_freq, new_freq) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig_freq / base_freq))
    idx = np.arange(-width, width + orig_freq, dtype=np.float64)[None, :] \
        / orig_freq
    t = (-np.arange(new_freq, dtype=np.float64)[:, None] / new_freq + idx) \
        * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    if beta is None:
        beta = 14.769656459379492
    window = np.i0(beta * np.sqrt(np.maximum(
        1 - (t / lowpass_filter_width) ** 2, 0.0))) / np.i0(beta)
    t = t * np.pi
    scale = base_freq / orig_freq
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * scale
    return kernel[:, None, :], width, orig_freq, new_freq


class Resampler:
    """Rate conversion by new_freq/orig_freq with kaiser-windowed sinc."""

    def __init__(self, orig_freq: int, new_freq: int, *,
                 lowpass_filter_width: int = 64,
                 rolloff: float = 0.9475937167399596,
                 beta: float | None = 14.769656459379492,
                 resampling_method: str = "sinc_interp_kaiser",
                 dtype=None) -> None:
        kernel, width, orig, new = design_resample_kernel(
            orig_freq, new_freq, lowpass_filter_width, rolloff, beta)
        self.kernel = to_device_array(kernel, dtype)
        self.width = width
        self.orig_freq = orig
        self.new_freq = new

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.orig_freq == self.new_freq:
            return x
        shape = x.shape
        T = shape[-1]
        xf = x.reshape(-1, T)
        target_length = -(-self.new_freq * T // self.orig_freq)  # ceil
        pad = self.width + self.orig_freq
        xf = jnp.pad(xf, [(0, 0), (self.width, pad)])
        K = self.kernel.shape[-1]
        kern = np.asarray(self.kernel)[:, 0, :]          # (P, K) host
        n_frames = (xf.shape[-1] - K) // self.orig_freq + 1
        if self.new_freq == 1 and self.orig_freq > 1:
            # Integer downsample by D: split x into its D input phases
            # and sum one folded-plan FIR per phase
            # (kernels/fir.py — the framed gather below materializes a
            # (B, n, K) tensor, ~50x the math's traffic).
            from ..kernels.fir import fir_correlate
            D = self.orig_freq
            # zero-extend so every phase covers n_frames valid outputs
            # (touched samples stay within the original buffer; the
            # extension only feeds outputs that are sliced away)
            L = (n_frames + -(-K // D)) * D
            xz = jnp.pad(xf, [(0, 0), (0, max(0, L - xf.shape[-1]))])
            xz = xz[..., :L]
            xp = xz.reshape(xf.shape[0], -1, D)           # (B, L/D, D)
            y = None
            for p in range(D):
                hp = kern[:1, p::D]                       # (1, ceil(K/D))
                if hp.shape[-1] == 0:
                    continue
                part = fir_correlate(xp[..., p], hp)[..., 0, :n_frames]
                y = part if y is None else y + part
        elif self.orig_freq == 1 and self.new_freq > 1:
            # Integer upsample by P: one folded-plan FIR bank with P
            # output phases, interleaved.
            from ..kernels.fir import fir_correlate
            ph = fir_correlate(xf, kern)                  # (B, P, n)
            n = ph.shape[-1]
            y = jnp.swapaxes(ph, -2, -1).reshape(xf.shape[0], -1)
            n_frames = n
        else:
            # Rational ratio: framed matmul, frame n covers
            # [n*orig, n*orig + K); all phases from one (n, K) @ (K, P)
            # MXU dot.  (A 1-channel wide-kernel strided conv takes
            # minutes to compile on the TPU AOT compiler.)
            idx = (np.arange(n_frames)[:, None] * self.orig_freq
                   + np.arange(K)[None, :])
            frames = xf[..., idx]                        # (B, n, K)
            y = frames @ self.kernel[:, 0, :].T.astype(x.dtype)
        y = y.reshape(xf.shape[0], -1)[..., :target_length]
        return y.reshape(*shape[:-1], target_length)
