"""Test-signal generators (SPTK-compatible).

JAX counterparts of the reference generators (diffsptk/signals.py:22-436).
Random generators take an explicit PRNG ``key`` (JAX has no global RNG); if
omitted, a fresh key is drawn from a module-level counter for scripting
convenience.

Examples
--------
>>> import numpy as np
>>> import diffsptk_tpu
>>> np.asarray(diffsptk_tpu.impulse(3)).astype(int)
array([1, 0, 0, 0])
>>> np.asarray(diffsptk_tpu.step(3)).astype(int)
array([1, 1, 1, 1])
>>> np.asarray(diffsptk_tpu.ramp(4)).astype(int)
array([0, 1, 2, 3, 4])
>>> np.round(np.asarray(diffsptk_tpu.sin(4, period=4)), 2)
array([ 0.,  1.,  0., -1., -0.])
>>> diffsptk_tpu.nrand(15).shape
(16,)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .core import default_dtype

_seed_counter = np.random.SeedSequence(0)


def _auto_key():
    global _seed_counter
    child = _seed_counter.spawn(1)[0]
    return jax.random.PRNGKey(int(child.generate_state(1)[0]))


def impulse(order: int, dtype=None) -> jnp.ndarray:
    """Unit impulse of length M+1."""
    dtype = dtype or default_dtype()
    return jnp.zeros(order + 1, dtype).at[0].set(1)


def step(order: int, value: float = 1, dtype=None) -> jnp.ndarray:
    """Constant (step) sequence of length M+1."""
    return jnp.full(order + 1, float(value), dtype or default_dtype())


def ramp(arg, end=None, step: float = 1, *, eps: float = 1e-8, dtype=None):
    """SPTK-style ramp: if only ``arg`` is given it is the end (inclusive);
    otherwise arange(start, end, step) inclusive of the endpoint."""
    if end is None:
        start, stop = 0.0, float(arg)
    else:
        start, stop = float(arg), float(end)
    n = int(np.floor((stop - start) / step + eps)) + 1
    x = start + step * np.arange(max(n, 0))
    return jnp.asarray(x, dtype or default_dtype())


def sin(order: int, period: float | None = None, magnitude: float = 1,
        dtype=None) -> jnp.ndarray:
    """Sinusoid of length M+1 with the given period in samples."""
    if period is None:
        period = order + 1
    n = jnp.arange(order + 1, dtype=dtype or default_dtype())
    return jnp.sin(n * (2 * jnp.pi / period)) * magnitude


def train(order: int, frame_period: float, norm: str | int = "power",
          dtype=None) -> jnp.ndarray:
    """Pulse train of length M+1 with pulses every ``frame_period`` samples.

    Pulse height depends on ``norm`` so that none/power/magnitude yield
    1, sqrt(P), and P respectively (reference: diffsptk/signals.py:224-241).
    """
    if frame_period < 1:
        raise ValueError("frame_period must be greater than or equal to 1.")
    if norm in (0, "none"):
        pulse = 1.0
    elif norm in (1, "power"):
        pulse = frame_period ** 0.5
    elif norm in (2, "magnitude"):
        pulse = float(frame_period)
    else:
        raise ValueError(f"norm {norm} is not supported.")
    # Pulse positions: where floor of the accumulated frequency increments.
    f = 1.0 / frame_period
    v = np.full(order + 2, f)
    v[0] = -f
    v = np.floor(np.cumsum(v))
    index = np.diff(v) >= 1
    x = np.zeros(order + 1)
    x[index] = pulse
    return jnp.asarray(x, dtype or default_dtype())


def mseq(*order, dtype=None) -> jnp.ndarray:
    """Maximum-length sequence in {-1, +1} via the SPTK 32-bit LFSR
    (taps at bits 0 and 28; reference: diffsptk/signals.py:281-301)."""
    if len(order) == 1 and isinstance(order[0], (list, tuple)):
        shape = list(order[0])
    else:
        shape = list(order)
    shape[-1] += 1
    n = math.prod(shape)
    out = np.ones(n)
    x = 0x55555555
    for i in range(n):
        x >>= 1
        x0 = 1 if x & 0x00000001 else -1
        x28 = 1 if x & 0x10000000 else -1
        if x0 + x28:
            x &= 0x7FFFFFFF
        else:
            x |= 0x80000000
        if x0 != 1:
            out[i] = x0
    return jnp.asarray(out.reshape(shape), dtype or default_dtype())


def mseq_like(x, dtype=None) -> jnp.ndarray:
    shape = list(x.shape)
    shape[-1] -= 1
    return mseq(*shape, dtype=dtype or x.dtype)


def nrand(*order, key=None, mean: float = 0, stdv: float = 1,
          var: float | None = None, dtype=None) -> jnp.ndarray:
    """Gaussian noise of shape (..., M+1)."""
    if len(order) == 1 and isinstance(order[0], (list, tuple)):
        shape = list(order[0])
    else:
        shape = list(order)
    shape[-1] += 1
    if var is not None:
        stdv = var ** 0.5
    if key is None:
        key = _auto_key()
    x = jax.random.normal(key, tuple(shape), dtype or default_dtype())
    return x * stdv + mean


def nrand_like(x, **kwargs) -> jnp.ndarray:
    shape = list(x.shape)
    shape[-1] -= 1
    return nrand(*shape, dtype=kwargs.pop("dtype", x.dtype), **kwargs)


def rand(*order, key=None, a: float = 0, b: float = 1, dtype=None):
    """Uniform noise in [a, b) of shape (..., M+1)."""
    if len(order) == 1 and isinstance(order[0], (list, tuple)):
        shape = list(order[0])
    else:
        shape = list(order)
    shape[-1] += 1
    if key is None:
        key = _auto_key()
    return jax.random.uniform(key, tuple(shape), dtype or default_dtype(),
                              minval=a, maxval=b)


def rand_like(x, **kwargs) -> jnp.ndarray:
    shape = list(x.shape)
    shape[-1] -= 1
    return rand(*shape, dtype=kwargs.pop("dtype", x.dtype), **kwargs)
