"""STFT / inverse STFT (reference: diffsptk/modules/stft.py, istft.py).

STFT is literally ``spec(window(frame(x)))``; ISTFT is
``unframe(ifftr(Y))``.  Composition happens at design time, so the whole
chain jits into one fused XLA graph (gather -> multiply -> batched rfft).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import BaseOp, Design, filter_values, get_layer
from .fftr import (
    RealValuedFastFourierTransform,
    RealValuedInverseFastFourierTransform,
)
from .frame import Frame
from .spec import Spectrum
from .unframe import Unframe
from .window import Window

LEARNABLES = ("basis", "window")


def _normalize_learnable(learnable):
    if learnable is True:
        return LEARNABLES
    if learnable is False:
        return ()
    if any(k not in LEARNABLES for k in learnable):
        raise ValueError("An unsupported key is found in learnable.")
    return tuple(learnable)


class ShortTimeFourierTransform(BaseOp):
    """(..., T) -> (..., T/P, L/2+1) spectrogram.

    Examples
    --------
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.nrand(63)
    >>> diffsptk_tpu.STFT(12, 10, 16)(x).shape
    (7, 9)
    """

    def __init__(self, frame_length: int, frame_period: int, fft_length: int,
                 *, center: bool = True, zmean: bool = False,
                 mode: str = "constant", window: str = "blackman",
                 norm: str = "power", symmetric: bool = True,
                 eps: float = 1e-9, relative_floor: float | None = None,
                 out_format: str = "power",
                 learnable: bool | list = False, dtype=None) -> None:
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(learnable) -> None:
        _normalize_learnable(learnable)

    @staticmethod
    def _design(frame_length: int, frame_period: int, fft_length: int,
                center: bool = True, zmean: bool = False,
                mode: str = "constant", window: str = "blackman",
                norm: str = "power", symmetric: bool = True,
                eps: float = 1e-9, relative_floor: float | None = None,
                out_format: str = "power", learnable: bool | list = False,
                module: bool = True) -> Design:
        learn = _normalize_learnable(learnable)
        frame = get_layer(module, Frame, dict(
            frame_length=frame_length, frame_period=frame_period,
            center=center, zmean=zmean, mode=mode))
        window_ = get_layer(module, Window, dict(
            in_length=frame_length, out_length=fft_length, window=window,
            norm=norm, symmetric=symmetric, learnable="window" in learn))
        if out_format == "complex":
            spec = get_layer(module, RealValuedFastFourierTransform, dict(
                fft_length=fft_length, out_format="complex",
                learnable="basis" in learn))
        else:
            spec = get_layer(module, Spectrum, dict(
                fft_length=fft_length, eps=eps,
                relative_floor=relative_floor, out_format=out_format,
                learnable="basis" in learn))
        return Design(layers={"frame": frame, "window": window_,
                              "spec": spec})

    @staticmethod
    def _forward(x: jnp.ndarray, *, frame, window, spec) -> jnp.ndarray:
        return spec(window(frame(x)))

    @property
    def trainable_params(self):
        # Collect child learnable params for optimizer construction.
        out = {}
        for name in self._layer_names:
            layer = getattr(self, name)
            if isinstance(layer, BaseOp) and layer.learnable:
                out[name] = layer.trainable_params
        return out


class InverseShortTimeFourierTransform(BaseOp):
    """(..., T/P, L/2+1) complex -> (..., T) waveform via WOLA.

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.nrand(63)
    >>> kw = dict(frame_length=16, frame_period=8, fft_length=32)
    >>> S = diffsptk_tpu.STFT(**kw, out_format="complex")(x)
    >>> y = diffsptk_tpu.ISTFT(**kw)(S, out_length=64)
    >>> bool(jnp.allclose(y[:-8], x[:-8], atol=1e-6))  # tail lacks WOLA
    True
    """

    _input_names = ("y", "out_length")

    def __init__(self, frame_length: int, frame_period: int, fft_length: int,
                 *, center: bool = True, window: str = "blackman",
                 norm: str = "power", symmetric: bool = True,
                 learnable: bool | list = False, dtype=None) -> None:
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(learnable) -> None:
        _normalize_learnable(learnable)

    @staticmethod
    def _design(frame_length: int, frame_period: int, fft_length: int,
                center: bool = True, window: str = "blackman",
                norm: str = "power", symmetric: bool = True,
                learnable: bool | list = False, module: bool = True) -> Design:
        learn = _normalize_learnable(learnable)
        ifftr = get_layer(module, RealValuedInverseFastFourierTransform, dict(
            fft_length=fft_length, out_length=frame_length,
            learnable="basis" in learn))
        unframe = get_layer(module, Unframe, dict(
            frame_length=frame_length, frame_period=frame_period,
            center=center, window=window, norm=norm, symmetric=symmetric,
            learnable="window" in learn))
        return Design(layers={"ifftr": ifftr, "unframe": unframe})

    @staticmethod
    def _forward(y: jnp.ndarray, out_length: int | None = None, *,
                 ifftr, unframe) -> jnp.ndarray:
        return unframe(ifftr(y), out_length)

    def __call__(self, y, out_length=None):
        return self.apply(self.params, y, out_length)
