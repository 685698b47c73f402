"""Waveform framing (reference: diffsptk/modules/frame.py).

TPU-native layout: framing is a single static gather ``x_padded[idx]`` with a
host-built (N, L) index matrix — XLA lowers this to one gather that tiles onto
the VPU; no strided views exist in XLA.  Under time-block sharding the same op
runs block-locally after an overlap-save halo exchange
(see diffsptk_tpu/parallel/halo.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, filter_values

_PAD_MODES = {
    "constant": "constant",
    "reflect": "reflect",
    "replicate": "edge",
    "circular": "wrap",
}


class Frame(BaseOp):
    """Split a waveform (..., T) into frames (..., T/P, L).

    Parameters: frame_length L, frame_period P, center (pad both sides so
    frames are centered), zmean (per-frame mean removal), mode (padding).

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.ramp(5)
    >>> np.asarray(diffsptk_tpu.Frame(5, 2)(x)).astype(int)
    array([[0, 0, 0, 1, 2],
           [0, 1, 2, 3, 4],
           [2, 3, 4, 5, 0]])
    >>> np.asarray(diffsptk_tpu.Frame(4, 2, center=False)(x)).astype(int)
    array([[0, 1, 2, 3],
           [2, 3, 4, 5],
           [4, 5, 0, 0]])
    """

    def __init__(self, frame_length: int, frame_period: int, *,
                 center: bool = True, zmean: bool = False,
                 mode: str = "constant") -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(frame_length: int, frame_period: int, mode: str) -> None:
        if frame_length <= 0:
            raise ValueError("frame_length must be positive.")
        if frame_period <= 0:
            raise ValueError("frame_period must be positive.")
        if mode not in _PAD_MODES:
            raise ValueError(f"mode {mode} is not supported.")

    @staticmethod
    def _design(frame_length: int, frame_period: int, center: bool = True,
                zmean: bool = False, mode: str = "constant") -> Design:
        Frame._check(frame_length, frame_period, mode)
        return Design(values={
            "frame_length": frame_length,
            "frame_period": frame_period,
            "center": center,
            "zmean": zmean,
            "mode": mode,
        })

    @staticmethod
    def _forward(x: jnp.ndarray, *, frame_length: int, frame_period: int,
                 center: bool, zmean: bool, mode: str) -> jnp.ndarray:
        L, P = frame_length, frame_period
        if center:
            pad = (L // 2, (L - 1) // 2)
        else:
            pad = (0, L - 1)
        cfg = [(0, 0)] * (x.ndim - 1) + [pad]
        x = jnp.pad(x, cfg, mode=_PAD_MODES[mode])
        T = x.shape[-1]
        n_frames = (T - L) // P + 1
        # Static gather indices: frame n covers [n*P, n*P + L).
        idx = np.arange(n_frames)[:, None] * P + np.arange(L)[None, :]
        y = x[..., idx]
        if zmean:
            y = y - jnp.mean(y, axis=-1, keepdims=True)
        return y
