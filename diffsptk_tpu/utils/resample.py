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
        # Polyphase filtering as a framed matmul: frame n covers
        # [n*orig, n*orig + K); all phases come from one (n, K) @ (K, P)
        # dot on the MXU.  (The equivalent 1-channel wide-kernel strided
        # conv takes minutes to compile on the TPU AOT compiler.)
        K = self.kernel.shape[-1]
        n_frames = (xf.shape[-1] - K) // self.orig_freq + 1
        idx = (np.arange(n_frames)[:, None] * self.orig_freq
               + np.arange(K)[None, :])
        frames = xf[..., idx]                            # (B, n, K)
        y = frames @ self.kernel[:, 0, :].T.astype(x.dtype)  # (B, n, P)
        y = y.reshape(xf.shape[0], -1)[..., :target_length]
        return y.reshape(*shape[:-1], target_length)
