"""Mel-cepstrum power utilities: pnorm/ipnorm, HTS postfilter (mcpf),
MLSA stability check (reference: diffsptk/modules/{pnorm,ipnorm,mcpf,
mlsacheck}.py)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, check_size, filter_values, get_layer
from .cep import CepstrumToAutocorrelation
from .freqt import FrequencyTransform
from .mc2b import (
    MelCepstrumToMLSADigitalFilterCoefficients,
    MLSADigitalFilterCoefficientsToMelCepstrum,
)


class MelCepstrumPowerNormalization(BaseOp):
    """mc -> [log power, power-normalized mc] (length M+2)."""

    def __init__(self, cep_order: int, alpha: float = 0,
                 ir_length: int = 128, dtype=None) -> None:
        self.in_dim = cep_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check() -> None:
        pass

    @staticmethod
    def _design(cep_order: int, alpha: float = 0, ir_length: int = 128,
                module: bool = True) -> Design:
        freqt = get_layer(module, FrequencyTransform,
                          dict(in_order=cep_order, out_order=ir_length - 1,
                               alpha=-alpha))
        c2acr = get_layer(module, CepstrumToAutocorrelation,
                          dict(cep_order=ir_length - 1, acr_order=0,
                               n_fft=ir_length))
        return Design(layers={"freqt": freqt, "c2acr": c2acr})

    @staticmethod
    def _forward(x: jnp.ndarray, *, freqt, c2acr) -> jnp.ndarray:
        x0, x1 = x[..., :1], x[..., 1:]
        P = jnp.log(c2acr(freqt(x)))
        return jnp.concatenate((P, x0 - 0.5 * P, x1), axis=-1)

    def __call__(self, x):
        check_size(x.shape[-1], self.in_dim, "dimension of cepstrum")
        return self.apply(self.params, x)


class MelCepstrumInversePowerNormalization(BaseOp):
    """Inverse of :class:`MelCepstrumPowerNormalization`
    (reference: ipnorm.py)."""

    _input_names = ("y",)

    def __init__(self, cep_order: int) -> None:
        if cep_order < 0:
            raise ValueError("cep_order must be non-negative.")
        self.in_dim = cep_order + 2
        self._setup(Design())

    @staticmethod
    def _check(cep_order: int) -> None:
        if cep_order < 0:
            raise ValueError("cep_order must be non-negative.")

    @staticmethod
    def _design(cep_order: int = 0) -> Design:
        return Design()

    @staticmethod
    def _forward(y: jnp.ndarray) -> jnp.ndarray:
        P, y1, y2 = y[..., :1], y[..., 1:2], y[..., 2:]
        return jnp.concatenate((0.5 * P + y1, y2), axis=-1)

    def __call__(self, y):
        check_size(y.shape[-1], self.in_dim, "dimension of input")
        return self.apply(self.params, y)


class MelCepstrumPostfiltering(BaseOp):
    """HTS-style formant postfilter (reference mcpf.py).

    Examples
    --------
    >>> import jax, numpy as np
    >>> import diffsptk_tpu
    >>> sp = diffsptk_tpu.Spectrum(64)(
    ...     diffsptk_tpu.nrand(63, key=jax.random.PRNGKey(0)))
    >>> mc = diffsptk_tpu.MelCepstralAnalysis(
    ...     fft_length=64, cep_order=4, alpha=0.42)(sp)
    >>> pf = diffsptk_tpu.MelCepstrumPostfiltering(4, alpha=0.42, beta=0.2)
    >>> np.round(np.asarray(pf(mc)), 3)
    array([ 1.761, -0.101,  0.269,  0.218,  0.272])
    """

    _input_names = ("mc",)

    def __init__(self, cep_order: int, alpha: float = 0, beta: float = 0,
                 onset: int = 2, ir_length: int = 128, dtype=None) -> None:
        self.in_dim = cep_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(onset: int) -> None:
        if onset < 0:
            raise ValueError("onset must be non-negative.")

    @staticmethod
    def _design(cep_order: int, alpha: float = 0, beta: float = 0,
                onset: int = 2, ir_length: int = 128,
                module: bool = True) -> Design:
        MelCepstrumPostfiltering._check(onset)
        freqt = get_layer(module, FrequencyTransform,
                          dict(in_order=cep_order, out_order=ir_length - 1,
                               alpha=-alpha))
        c2acr = get_layer(module, CepstrumToAutocorrelation,
                          dict(cep_order=ir_length - 1, acr_order=0,
                               n_fft=ir_length))
        mc2b = get_layer(module, MelCepstrumToMLSADigitalFilterCoefficients,
                         dict(cep_order=cep_order, alpha=alpha))
        b2mc = get_layer(module, MLSADigitalFilterCoefficientsToMelCepstrum,
                         dict(cep_order=cep_order, alpha=alpha))
        weight = np.full(cep_order + 1, 1.0 + beta)
        weight[:onset] = 1.0
        return Design(layers={"freqt": freqt, "c2acr": c2acr, "mc2b": mc2b,
                              "b2mc": b2mc},
                      arrays={"weight": weight})

    @staticmethod
    def _forward(mc: jnp.ndarray, *, freqt, c2acr, mc2b, b2mc,
                 weight: jnp.ndarray) -> jnp.ndarray:
        e1 = c2acr(freqt(mc))
        mc2 = mc * weight
        e2 = c2acr(freqt(mc2))
        b2 = mc2b(mc2)
        b2 = b2.at[..., :1].add(0.5 * jnp.log(e1 / e2))
        return b2mc(b2)

    def __call__(self, mc):
        check_size(mc.shape[-1], self.in_dim, "dimension of cepstrum")
        return self.apply(self.params, mc)


class MLSADigitalFilterStabilityCheck(BaseOp):
    """Check/repair mel-cepstra against the Padé stability threshold
    (reference mlsacheck.py:120-230)."""

    _input_names = ("mc",)

    def __init__(self, cep_order: int, *, alpha: float = 0,
                 pade_order: int = 4, strict: bool = True,
                 threshold: float | None = None, fast: bool = True,
                 n_fft: int = 256, warn_type: str = "warn",
                 mod_type: str = "scale", dtype=None) -> None:
        self.in_dim = cep_order + 1
        self._setup(self._design(**filter_values(locals(), ("dtype",))),
                    dtype=dtype)

    @staticmethod
    def _check(cep_order: int) -> None:
        if cep_order < 0:
            raise ValueError("cep_order must be non-negative.")

    @staticmethod
    def _design(cep_order: int, alpha: float = 0, pade_order: int = 4,
                strict: bool = True, threshold: float | None = None,
                fast: bool = True, n_fft: int = 256,
                warn_type: str = "warn", mod_type: str = "scale") -> Design:
        MLSADigitalFilterStabilityCheck._check(cep_order)
        if threshold is None:
            table = {4: (4.5, 6.20), 5: (6.0, 7.65), 6: (7.4, 9.13),
                     7: (8.9, 10.6)}
            if pade_order not in table:
                raise ValueError(f"pade_order {pade_order} is not supported.")
            threshold = table[pade_order][0 if strict else 1]
        alpha_vector = (-alpha) ** np.arange(cep_order + 1)
        return Design(
            values={"threshold": threshold, "fast": fast, "n_fft": n_fft,
                    "warn_type": warn_type, "mod_type": mod_type},
            arrays={"alpha_vector": alpha_vector})

    @staticmethod
    def _forward(mc: jnp.ndarray, *, threshold: float, fast: bool,
                 n_fft: int, warn_type: str, mod_type: str,
                 alpha_vector: jnp.ndarray) -> jnp.ndarray:
        gain = jnp.sum(mc * alpha_vector, axis=-1, keepdims=True)
        if fast:
            if mod_type == "clip":
                raise ValueError("clip is not supported in fast mode.")
            max_amplitude = jnp.sum(mc, axis=-1, keepdims=True) - gain
        else:
            c1 = jnp.concatenate((mc[..., :1] - gain, mc[..., 1:]), axis=-1)
            C1 = jnp.fft.rfft(c1, n=n_fft)
            C1_amplitude = jnp.abs(C1)
            max_amplitude = jnp.max(C1_amplitude, axis=-1, keepdims=True)
        max_amplitude = jnp.clip(max_amplitude, min=1e-16)

        if mod_type == "clip":
            scale = threshold / C1_amplitude
        elif mod_type == "scale":
            scale = threshold / max_amplitude
        else:
            raise ValueError(f"mod_type {mod_type} is not supported.")
        scale = jnp.clip(scale, max=1)

        if fast:
            c0, c1 = mc[..., :1], mc[..., 1:]
            c0 = (c0 - gain) * scale + gain
            c1 = c1 * scale
            return jnp.concatenate((c0, c1), axis=-1)
        c2 = jnp.fft.irfft(C1 * scale)[..., : mc.shape[-1]]
        return jnp.concatenate((c2[..., :1] + gain, c2[..., 1:]), axis=-1)

    def __call__(self, mc):
        check_size(mc.shape[-1], self.in_dim, "dimension of mel-cepstrum")
        return self.apply(self.params, mc)
