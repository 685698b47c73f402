"""Accelerated Griffin-Lim phase reconstruction
(reference: diffsptk/modules/griffin.py:86-290; Nenov et al. 2023 momentum
scheme).

The iteration is a fixed-trip Python loop over jitted stft/istft rounds —
under jit it fuses into one graph; each round is frame-parallel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import BaseOp, Design, filter_values, get_layer
from .stft import (
    InverseShortTimeFourierTransform,
    ShortTimeFourierTransform,
)


class GriffinLim(BaseOp):
    """Power spectrum (..., T/P, N/2+1) -> waveform (..., T).

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.sin(127, period=16)
    >>> sp = diffsptk_tpu.STFT(32, 8, 32, out_format="power")(x)
    >>> y = diffsptk_tpu.GriffinLim(32, 8, 32, n_iter=5)(sp, out_length=128)
    >>> y.shape
    (128,)
    """

    _input_names = ("y", "out_length")

    def __init__(self, frame_length: int, frame_period: int,
                 fft_length: int, *, center: bool = True,
                 mode: str = "constant", window: str = "blackman",
                 norm: str = "power", symmetric: bool = True,
                 n_iter: int = 100, alpha: float = 0.99, beta: float = 0.99,
                 gamma: float = 1.1, init_phase: str = "random",
                 seed: int = 0, verbose: bool = False, dtype=None) -> None:
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(n_iter: int, alpha: float, beta: float, gamma: float) -> None:
        if n_iter < 0:
            raise ValueError("n_iter must be non-negative.")
        if alpha < 0 or beta < 0 or gamma < 0:
            raise ValueError("alpha/beta/gamma must be non-negative.")

    @staticmethod
    def _design(frame_length: int, frame_period: int, fft_length: int,
                center: bool = True, mode: str = "constant",
                window: str = "blackman", norm: str = "power",
                symmetric: bool = True, n_iter: int = 100,
                alpha: float = 0.99, beta: float = 0.99, gamma: float = 1.1,
                init_phase: str = "random", seed: int = 0,
                verbose: bool = False, module: bool = True) -> Design:
        GriffinLim._check(n_iter, alpha, beta, gamma)

        if init_phase == "zeros":
            phase_generator = lambda s: jnp.zeros_like(s)
        elif init_phase == "random":
            def phase_generator(s):
                key = jax.random.PRNGKey(seed)
                return 2 * jnp.pi * jax.random.uniform(key, s.shape, s.dtype)
        else:
            raise ValueError(f"init_phase: {init_phase} is not supported.")

        stft = get_layer(module, ShortTimeFourierTransform, dict(
            frame_length=frame_length, frame_period=frame_period,
            fft_length=fft_length, center=center, zmean=False, mode=mode,
            window=window, norm=norm, symmetric=symmetric, eps=0,
            relative_floor=None, out_format="complex"))
        istft = get_layer(module, InverseShortTimeFourierTransform, dict(
            frame_length=frame_length, frame_period=frame_period,
            fft_length=fft_length, center=center, window=window, norm=norm,
            symmetric=symmetric))
        return Design(
            values={"n_iter": n_iter, "alpha": alpha, "beta": beta,
                    "gamma": gamma, "phase_generator": phase_generator},
            layers={"stft": stft, "istft": istft})

    @staticmethod
    def _forward(y: jnp.ndarray, out_length: int | None = None, *,
                 n_iter: int, alpha: float, beta: float, gamma: float,
                 phase_generator, stft, istft) -> jnp.ndarray:
        eps = 1e-16
        s = jnp.sqrt(y + eps)
        angle = jnp.exp(1j * phase_generator(s))

        t_prev = d_prev = None
        for n in range(n_iter):
            t = stft(istft(s * angle, out_length))
            t = t[..., : s.shape[-2], :]
            if n == 0:
                c = d = t
            else:
                t = (1 - gamma) * d_prev + gamma * t
                diff = t - t_prev
                c = t + alpha * diff
                d = t + beta * diff
            angle = c / (jnp.abs(c) + eps)
            t_prev, d_prev = t, d

        return istft(s * angle, out_length)

    def __call__(self, y, out_length=None):
        return self.apply(self.params, y, out_length)
