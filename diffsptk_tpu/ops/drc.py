"""Dynamic range compression (reference: diffsptk/modules/drc.py).

The reference wraps torchcomp's ``compexp_gain`` (a compiled one-pole gain
smoother).  This is the native equivalent: the standard feed-forward
compressor/expander gain computer (Giannoulis et al. 2012) followed by an
attack/release ballistic one-pole smoother run through lax.scan.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, filter_values


def ms2coef(ms: float, sample_rate: int) -> float:
    """One-pole coefficient for a given time constant in ms."""
    return 1.0 - math.exp(-1000.0 / (ms * sample_rate))


def compexp_gain(x_rms: jnp.ndarray, comp_thresh, comp_ratio, exp_thresh,
                 exp_ratio, at, rt) -> jnp.ndarray:
    """Smoothed compressor/expander gain for |x| (linear in, linear out)."""
    x_db = 20.0 * jnp.log10(x_rms)
    comp_slope = 1.0 - 1.0 / comp_ratio
    exp_slope = 1.0 - 1.0 / exp_ratio
    g_db = jnp.minimum(
        jnp.minimum(comp_slope * (comp_thresh - x_db),
                    exp_slope * (exp_thresh - x_db)), 0.0)
    g = jnp.power(10.0, g_db / 20.0)

    def step(prev, gt):
        coef = jnp.where(gt < prev, at, rt)
        cur = prev + coef * (gt - prev)
        return cur, cur

    g_t = jnp.moveaxis(g, -1, 0)
    _, y = jax.lax.scan(step, jnp.ones_like(g_t[0]), g_t)
    return jnp.moveaxis(y, 0, -1)


class DynamicRangeCompression(BaseOp):
    """Feed-forward compressor: gain computer + smoothed envelope
    (reference: diffsptk/modules/drc.py, torchcomp-backed there; here the
    envelope recursion rides the first-order Pallas scan).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> drc = diffsptk_tpu.DynamicRangeCompression(
    ...     sample_rate=16000, threshold=-30, ratio=4)
    >>> x = 0.5 * jnp.sin(2 * jnp.pi * 440 * jnp.arange(160.0) / 16000)
    >>> y = drc(x)
    >>> bool(float(jnp.max(jnp.abs(y))) < 0.5)   # peaks compressed
    True
    """

    def __init__(self, *, sample_rate: int, threshold: float = -20,
                 ratio: float = 2, attack_time: float = 1,
                 release_time: float = 500, makeup_gain: float = 0,
                 abs_max: float = 1, learnable: bool = False,
                 dtype=None) -> None:
        self._setup(
            self._design(**filter_values(locals(), ("learnable", "dtype"))),
            learnable=learnable, dtype=dtype)

    @staticmethod
    def _check(ratio, attack_time, release_time, sample_rate, makeup_gain,
               abs_max) -> None:
        if ratio <= 1:
            raise ValueError("ratio must be greater than 1.")
        if attack_time <= 0:
            raise ValueError("attack_time must be positive.")
        if release_time <= 0:
            raise ValueError("release_time must be positive.")
        if sample_rate <= 0:
            raise ValueError("sample_rate must be positive.")
        if makeup_gain < 0:
            raise ValueError("makeup_gain must be non-negative.")
        if abs_max <= 0:
            raise ValueError("abs_max must be positive.")

    @staticmethod
    def _design(sample_rate: int, threshold: float = -20, ratio: float = 2,
                attack_time: float = 1, release_time: float = 500,
                makeup_gain: float = 0, abs_max: float = 1) -> Design:
        DynamicRangeCompression._check(ratio, attack_time, release_time,
                                       sample_rate, makeup_gain, abs_max)
        # The reference feeds torchcomp.ms2coef(ms * c, sr) where
        # c = round(log 9, 1) and torchcomp's coefficient is
        # 1 - exp(-2200 / (ms * sr)): the 10%-90% rise factor cancels,
        # leaving the plain time constant 1 - exp(-1000 / (ms * sr))
        # (verified against drc.py's Examples golden variance).
        params = np.array([
            threshold, ratio, ms2coef(attack_time, sample_rate),
            ms2coef(release_time, sample_rate),
            10.0 ** (makeup_gain / 20.0)])
        return Design(values={"abs_max": abs_max}, arrays={"params": params})

    @staticmethod
    def _forward(x: jnp.ndarray, *, abs_max: float,
                 params: jnp.ndarray) -> jnp.ndarray:
        eps = 1e-10
        one_d = x.ndim == 1
        y = x[None] if one_d else x
        y_abs = jnp.abs(y) / abs_max + eps
        g = compexp_gain(y_abs, params[0], params[1], -1000.0, eps,
                         params[2], params[3])
        y = y * g * params[4]
        return y[0] if one_d else y
