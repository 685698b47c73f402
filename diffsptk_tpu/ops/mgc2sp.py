"""Mel-generalized cepstrum -> spectrum
(reference: diffsptk/modules/mgc2sp.py:95-202).

mgc2mgc to plain cepstrum, then one rfft; 8 scalar output formats plus
complex (used by the frequency-domain MLSA mode).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..core import BaseOp, Design, check_size, filter_values, get_layer
from .mgc2mgc import MelGeneralizedCepstrumToMelGeneralizedCepstrum


def _make_formatter(out_format):
    if out_format in (0, "db"):
        return lambda x: x.real * (20 / math.log(10))
    if out_format in (1, "log-magnitude"):
        return lambda x: x.real
    if out_format in (2, "magnitude"):
        return lambda x: jnp.exp(x.real)
    if out_format in (3, "power"):
        return lambda x: jnp.exp(2 * x.real)
    if out_format in (4, "cycle"):
        return lambda x: x.imag / jnp.pi
    if out_format in (5, "radian"):
        return lambda x: x.imag
    if out_format in (6, "degree"):
        return lambda x: x.imag * (180 / jnp.pi)
    if out_format == "complex":
        return lambda x: jnp.exp(x.real) * jnp.exp(1j * x.imag)
    raise ValueError(f"out_format {out_format} is not supported.")


class MelGeneralizedCepstrumToSpectrum(BaseOp):
    """(..., M+1) -> (..., L/2+1).

    Examples
    --------
    >>> import jax, numpy as np
    >>> import diffsptk_tpu
    >>> sp = diffsptk_tpu.Spectrum(64)(
    ...     diffsptk_tpu.nrand(63, key=jax.random.PRNGKey(0)))
    >>> mc = diffsptk_tpu.MelCepstralAnalysis(
    ...     fft_length=64, cep_order=4, alpha=0.42)(sp)
    >>> db = diffsptk_tpu.MelGeneralizedCepstrumToSpectrum(
    ...     4, 16, alpha=0.42, out_format="db")(mc)
    >>> np.round(np.asarray(db), 1)
    array([18.7, 12. , 15.5, 15.5, 15.5, 15.9, 17.8, 18.1, 19. ])
    """

    _input_names = ("mc",)

    def __init__(self, cep_order: int, fft_length: int, *, alpha: float = 0,
                 gamma: float = 0, norm: bool = False, mul: bool = False,
                 n_fft: int = 512, out_format: str | int = "power",
                 dtype=None) -> None:
        self.in_dim = cep_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check() -> None:
        pass

    @staticmethod
    def _design(cep_order: int, fft_length: int, alpha: float = 0,
                gamma: float = 0, norm: bool = False, mul: bool = False,
                n_fft: int = 512, out_format: str | int = "power",
                module: bool = True) -> Design:
        formatter = _make_formatter(out_format)
        mgc2c = get_layer(
            module, MelGeneralizedCepstrumToMelGeneralizedCepstrum,
            dict(in_order=cep_order, in_alpha=alpha, in_gamma=gamma,
                 in_norm=norm, in_mul=mul, out_order=fft_length // 2,
                 out_alpha=0, out_gamma=0, out_norm=False, out_mul=False,
                 n_fft=n_fft))
        return Design(values={"formatter": formatter},
                      layers={"mgc2c": mgc2c})

    @staticmethod
    def _forward(mc: jnp.ndarray, *, formatter, mgc2c) -> jnp.ndarray:
        c = mgc2c(mc)
        sp = jnp.fft.rfft(c, n=(c.shape[-1] - 1) * 2)
        return formatter(sp)

    def __call__(self, mc):
        check_size(mc.shape[-1], self.in_dim, "dimension of cepstrum")
        return self.apply(self.params, mc)
