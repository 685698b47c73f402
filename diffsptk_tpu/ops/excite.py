"""Excitation generation (reference: diffsptk/modules/excite.py).

Pitch (period in samples, 0 = unvoiced) -> excitation.  Phase is the cumsum
of instantaneous frequency with a cummax reset at unvoiced regions; all
branchy masked assignments become jnp.where, so the op is fully dense and
jittable (no data-dependent shapes).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import BaseOp, Design, filter_values
from .linear_intpl import linear_interpolate

TAU = 2 * math.pi
UNVOICED_SYMBOL = 0


def _pulse_pos(phase):
    return jnp.diff(jnp.ceil(phase), axis=-1) >= 1


def generate_pulse(pitch, phase, bipolar):
    pos = _pulse_pos(phase)
    e = jnp.where(pos, jnp.sqrt(jnp.maximum(pitch, 0.0)), 0.0)
    if bipolar:
        pos_double = _pulse_pos(0.5 * phase)
        e = jnp.where(pos & ~pos_double, -e, e)
    return e


def generate_harmonic_pulse(pitch, phase, bipolar):
    n_harm = jnp.floor(0.5 * pitch)
    theta = TAU * phase[..., :-1]
    half = 0.5 * theta
    if bipolar:
        numer = jnp.cos(half) - jnp.cos((n_harm + 0.5) * theta)
    else:
        numer = -jnp.sin(half) + jnp.sin((n_harm + 0.5) * theta)
    denom = 2 * jnp.sin(half)
    eps = 1e-6
    singular = jnp.abs(denom) < eps
    e = numer / jnp.where(singular, 1.0, denom)
    e = jnp.where(singular, 0.0 if bipolar else n_harm, e)
    return jnp.sqrt(2 / jnp.clip(n_harm, min=1)) * e


def generate_sinusoidal(phase, bipolar):
    return jnp.sin(TAU * phase) if bipolar else 0.5 * (1 - jnp.cos(TAU * phase))


def generate_sawtooth(phase, bipolar):
    e = jnp.mod(phase, 1)
    return 2 * e - 1 if bipolar else e


def generate_inverted_sawtooth(phase, bipolar):
    e = 1 - jnp.mod(phase, 1)
    return 2 * e - 1 if bipolar else e


def generate_triangle(phase, bipolar):
    if bipolar:
        return 2 * jnp.abs(2 * jnp.mod(phase + 0.75, 1) - 1) - 1
    return jnp.abs(2 * jnp.mod(phase + 0.5, 1) - 1)


def generate_square(phase, bipolar):
    e = (jnp.mod(phase, 1) <= 0.5).astype(phase.dtype)
    return 2 * e - 1 if bipolar else e


class ExcitationGeneration(BaseOp):
    """Pitch (..., N) in samples -> excitation (..., N*P).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> excite = diffsptk_tpu.ExcitationGeneration(
    ...     2, voiced_region="pulse", unvoiced_region="zeros")
    >>> p = jnp.asarray([2.0, 2.0, 3.0, 3.0])
    >>> np.round(np.asarray(excite(p)), 3)
    array([1.414, 0.   , 1.414, 0.   , 1.732, 0.   , 0.   , 1.732])
    """

    _input_names = ("p",)

    def __init__(self, frame_period: int, *, voiced_region: str = "pulse",
                 unvoiced_region: str = "gauss", polarity: str = "auto",
                 init_phase: str | float = "zeros", seed: int = 0) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(frame_period: int) -> None:
        if frame_period <= 0:
            raise ValueError("frame_period must be positive.")

    @staticmethod
    def _design(frame_period: int, voiced_region: str = "pulse",
                unvoiced_region: str = "gauss", polarity: str = "auto",
                init_phase: str | float = "zeros", seed: int = 0) -> Design:
        ExcitationGeneration._check(frame_period)
        return Design(values={
            "frame_period": frame_period, "voiced_region": voiced_region,
            "unvoiced_region": unvoiced_region, "polarity": polarity,
            "init_phase": init_phase, "seed": seed})

    @staticmethod
    def _forward(p: jnp.ndarray, *, frame_period: int, voiced_region: str,
                 unvoiced_region: str, polarity: str,
                 init_phase: str | float, seed: int) -> jnp.ndarray:
        key = jax.random.PRNGKey(seed)
        base_mask = jnp.clip(p, 0, 1)
        mask = jnp.repeat(base_mask != UNVOICED_SYMBOL, frame_period,
                          axis=-1)

        # Extend the last voiced pitch one frame into the unvoiced region
        # so interpolation has a right bracket.
        pad = [(0, 0)] * (p.ndim - 1) + [(1, 0)]
        trans = jnp.diff(jnp.pad(base_mask, pad), axis=-1) == -1
        p = jnp.where(trans, jnp.roll(p, 1, axis=-1), p)

        # Interpolate pitch to sample rate.
        p = linear_interpolate(p[..., None], frame_period)[..., 0]
        p = p * mask

        if not isinstance(init_phase, str):
            shift = init_phase / TAU
        elif init_phase == "zeros":
            shift = 0.0
        elif init_phase == "random":
            key, sub = jax.random.split(key)
            shift = jax.random.uniform(sub, p[..., :1].shape, p.dtype)
        else:
            raise ValueError(f"init_phase {init_phase} is not supported.")

        q = jnp.where(p > 0, 1.0 / jnp.where(p > 0, p, 1.0), 0.0)
        # accumulate at the widest available precision (f64 under x64,
        # f32 on TPU) to limit phase drift over long signals
        s = jnp.cumsum(q, axis=-1)
        bias = jax.lax.cummax(s * ~mask, axis=s.ndim - 1)
        phase = (s - bias).astype(p.dtype)

        if polarity == "auto":
            bipolar = voiced_region != "pulse"
        elif polarity in ("unipolar", "bipolar"):
            bipolar = polarity == "bipolar"
        else:
            raise ValueError(f"polarity {polarity} is not supported.")

        if "pulse" in voiced_region:
            generators = {"pulse": generate_pulse,
                          "harmonic-pulse": generate_harmonic_pulse}
            if voiced_region not in generators:
                raise ValueError(
                    f"voiced_region {voiced_region} is not supported.")
            phase = jnp.pad(phase, pad) + shift
            e = generators[voiced_region](p, phase, bipolar)
        else:
            generators = {"sinusoidal": generate_sinusoidal,
                          "sawtooth": generate_sawtooth,
                          "inverted-sawtooth": generate_inverted_sawtooth,
                          "triangle": generate_triangle,
                          "square": generate_square}
            if voiced_region not in generators:
                raise ValueError(
                    f"voiced_region {voiced_region} is not supported.")
            phase = phase + shift
            e = jnp.where(mask, generators[voiced_region](phase, bipolar),
                          0.0)

        if unvoiced_region == "zeros":
            pass
        elif unvoiced_region == "gauss":
            key, sub = jax.random.split(key)
            e = jnp.where(mask, e, jax.random.normal(sub, e.shape, e.dtype))
        elif unvoiced_region == "m-sequence":
            from ..signals import mseq
            noise = mseq(*e.shape[:-1], e.shape[-1] - 1, dtype=e.dtype)
            e = jnp.where(mask, e, noise)
        elif unvoiced_region == "uniform":
            key, sub = jax.random.split(key)
            e = jnp.where(
                mask, e,
                math.sqrt(12) * jax.random.uniform(sub, e.shape, e.dtype))
        else:
            raise ValueError(
                f"unvoiced_region {unvoiced_region} is not supported.")
        return e
