"""MDCT/MDST and inverses (reference: diffsptk/modules/{mdct,imdct,mdst,
imdst}.py).

50%-overlap frame -> window -> oddly-stacked basis matmul; the inverse
rides the scatter-free overlap-add from Unframe.  Perfect reconstruction is
preserved by padding one frame_period (mdct.py:173).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, filter_values, get_layer
from .frame import Frame
from .stft import _normalize_learnable
from .unframe import Unframe
from .window import Window


def design_mdt(length: int, window: str, transform: str = "cosine"):
    """Oddly-stacked (I)MDCT/(I)MDST basis (reference mdct.py:254-281)."""
    if length < 2 or length % 2 == 1:
        raise ValueError("length must be at least 2 and even.")
    L2 = length
    L = L2 // 2
    n = np.arange(L2) + 0.5
    k = (np.pi / L) * n[:L]
    n = n + L / 2
    z = 2.0 / L
    if window != "rectangular":
        z *= 2.0
    z **= 0.5
    if transform == "cosine":
        W = z * np.cos(k[None, :] * n[:, None])
    elif transform == "sine":
        W = z * np.sin(k[None, :] * n[:, None])
    else:
        raise ValueError(f"transform must be 'cosine' or 'sine', got "
                         f"'{transform}'.")
    return W


class ModifiedDiscreteTransform(BaseOp):
    """(..., L) -> (..., L/2) oddly-stacked transform."""

    def __init__(self, length: int, window: str, transform: str = "cosine",
                 learnable: bool = False, dtype=None) -> None:
        self.in_dim = length
        self._setup(
            self._design(**filter_values(locals(), ("learnable", "dtype"))),
            learnable=learnable, dtype=dtype)

    @staticmethod
    def _check(length: int) -> None:
        if length < 2 or length % 2 == 1:
            raise ValueError("length must be at least 2 and even.")

    @staticmethod
    def _design(length: int, window: str, transform: str = "cosine",
                learnable: bool = False) -> Design:
        return Design(arrays={"W": design_mdt(length, window, transform)})

    @staticmethod
    def _forward(x: jnp.ndarray, *, W: jnp.ndarray) -> jnp.ndarray:
        return jnp.matmul(x, W)

    def __call__(self, x):
        check_size(x.shape[-1], self.in_dim, "dimension of input")
        return self.apply(self.params, x)


class InverseModifiedDiscreteTransform(BaseOp):
    """(..., L/2) -> (..., L)."""

    _input_names = ("y",)

    def __init__(self, length: int, window: str, transform: str = "cosine",
                 learnable: bool = False, dtype=None) -> None:
        self.in_dim = length // 2
        self._setup(
            self._design(**filter_values(locals(), ("learnable", "dtype"))),
            learnable=learnable, dtype=dtype)

    @staticmethod
    def _check(length: int) -> None:
        ModifiedDiscreteTransform._check(length)

    @staticmethod
    def _design(length: int, window: str, transform: str = "cosine",
                learnable: bool = False) -> Design:
        return Design(arrays={"W": design_mdt(length, window, transform).T})

    @staticmethod
    def _forward(y: jnp.ndarray, *, W: jnp.ndarray) -> jnp.ndarray:
        return jnp.matmul(y, W)

    def __call__(self, y):
        check_size(y.shape[-1], self.in_dim, "dimension of input")
        return self.apply(self.params, y)


class ModifiedDiscreteCosineTransform(BaseOp):
    """Waveform (..., T) -> MDCT coefficients (..., 2T/L, L/2).

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.ramp(7)
    >>> diffsptk_tpu.MDCT(4)(x).shape                     # TDAC: 2T/L frames
    (5, 2)
    """

    def __init__(self, frame_length: int, window: str = "sine",
                 transform: str = "cosine",
                 learnable: bool | list = False, dtype=None) -> None:
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(learnable) -> None:
        _normalize_learnable(learnable)

    @staticmethod
    def _design(frame_length: int, window: str = "sine",
                transform: str = "cosine", learnable: bool | list = False,
                module: bool = True) -> Design:
        learn = _normalize_learnable(learnable)
        frame_period = frame_length // 2
        frame = get_layer(module, Frame, dict(frame_length=frame_length,
                                              frame_period=frame_period))
        window_ = get_layer(module, Window, dict(
            in_length=frame_length, out_length=None, window=window,
            norm="none", symmetric=True, learnable="window" in learn))
        mdt = get_layer(module, ModifiedDiscreteTransform, dict(
            length=frame_length, window=window, transform=transform,
            learnable="basis" in learn))
        return Design(values={"frame_period": frame_period},
                      layers={"frame": frame, "window": window_,
                              "mdt": mdt})

    @staticmethod
    def _forward(x: jnp.ndarray, *, frame_period: int, frame, window,
                 mdt) -> jnp.ndarray:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, frame_period)]
        x = jnp.pad(x, pad)  # for perfect reconstruction
        return mdt(window(frame(x)))


class InverseModifiedDiscreteCosineTransform(BaseOp):
    """MDCT coefficients -> waveform via overlap-add.

    Perfect reconstruction with the paired analysis transform:

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> x = diffsptk_tpu.ramp(7)
    >>> y = diffsptk_tpu.IMDCT(4)(diffsptk_tpu.MDCT(4)(x), out_length=8)
    >>> np.round(np.asarray(y), 3)
    array([0., 1., 2., 3., 4., 5., 6., 7.])
    """

    _input_names = ("y", "out_length")

    def __init__(self, frame_length: int, window: str = "sine",
                 transform: str = "cosine",
                 learnable: bool | list = False, dtype=None) -> None:
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(learnable) -> None:
        _normalize_learnable(learnable)

    @staticmethod
    def _design(frame_length: int, window: str = "sine",
                transform: str = "cosine", learnable: bool | list = False,
                module: bool = True) -> Design:
        learn = _normalize_learnable(learnable)
        frame_period = frame_length // 2
        imdt = get_layer(module, InverseModifiedDiscreteTransform, dict(
            length=frame_length, window=window, transform=transform,
            learnable="basis" in learn))
        window_ = get_layer(module, Window, dict(
            in_length=frame_length, out_length=None, window=window,
            norm="none", symmetric=True, learnable="window" in learn))
        unframe = get_layer(module, Unframe, dict(
            frame_length=frame_length, frame_period=frame_period))
        return Design(values={"frame_period": frame_period},
                      layers={"imdt": imdt, "window": window_,
                              "unframe": unframe})

    @staticmethod
    def _forward(y: jnp.ndarray, out_length: int | None = None, *,
                 frame_period: int, imdt, window, unframe) -> jnp.ndarray:
        x = unframe(window(imdt(y)), out_length)
        if out_length is None:
            x = x[..., :-frame_period]
        return x

    def __call__(self, y, out_length=None):
        return self.apply(self.params, y, out_length)


class ModifiedDiscreteSineTransform(ModifiedDiscreteCosineTransform):
    """MDST = MDCT machinery with the sine basis."""

    def __init__(self, frame_length: int, window: str = "sine",
                 learnable: bool | list = False, dtype=None) -> None:
        super().__init__(frame_length, window, transform="sine",
                         learnable=learnable, dtype=dtype)

    @staticmethod
    def _design(frame_length: int, window: str = "sine",
                learnable: bool | list = False, module: bool = True,
                transform: str = "sine") -> Design:
        return ModifiedDiscreteCosineTransform._design(
            frame_length, window, transform="sine", learnable=learnable,
            module=module)


class InverseModifiedDiscreteSineTransform(
        InverseModifiedDiscreteCosineTransform):
    """IMDST: IMDCT with the sine kernel (reference: imdst.py)."""

    def __init__(self, frame_length: int, window: str = "sine",
                 learnable: bool | list = False, dtype=None) -> None:
        super().__init__(frame_length, window, transform="sine",
                         learnable=learnable, dtype=dtype)

    @staticmethod
    def _design(frame_length: int, window: str = "sine",
                learnable: bool | list = False, module: bool = True,
                transform: str = "sine") -> Design:
        return InverseModifiedDiscreteCosineTransform._design(
            frame_length, window, transform="sine", learnable=learnable,
            module=module)


class HilbertTransform(BaseOp):
    """Analytic signal via FFT mask (reference: diffsptk/modules/hilbert.py).
    Returns a complex array; .imag is the Hilbert transform.

    Examples
    --------
    >>> import numpy as np
    >>> import diffsptk_tpu
    >>> z = diffsptk_tpu.HilbertTransform(8)(diffsptk_tpu.impulse(7))
    >>> np.round(np.asarray(z.imag), 3)
    array([ 0.   ,  0.604,  0.   ,  0.104,  0.   , -0.104,  0.   , -0.604])
    """

    def __init__(self, fft_length: int, dim: int = -1, dtype=None) -> None:
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(fft_length: int) -> None:
        if fft_length <= 0:
            raise ValueError("fft_length must be positive.")

    @staticmethod
    def _design(fft_length: int, dim: int = -1) -> Design:
        HilbertTransform._check(fft_length)
        h = np.zeros(fft_length)
        center = (fft_length + 1) // 2
        h[0] = 1.0
        h[1:center] = 2.0
        if fft_length % 2 == 0:
            h[center] = 1.0
        return Design(values={"dim": dim}, arrays={"h": h})

    @staticmethod
    def _forward(x: jnp.ndarray, *, dim: int, h: jnp.ndarray) -> jnp.ndarray:
        L = h.shape[0]
        shape = [1] * x.ndim
        shape[dim] = L
        hh = h.reshape(shape)
        X = jnp.fft.fft(x, n=L, axis=dim)
        return jnp.fft.ifft(X * hh, n=L, axis=dim)
