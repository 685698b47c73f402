"""Recursive (IIR) filter kernels — the native-kernel layer of the framework.

These replace the external compiled kernels the reference borrows
(torchlpc.sample_wise_lpc at poledf.py:106/mglsadf.py:690, torchaudio
lfilter at utils/private.py:328; SURVEY.md §2.9):

* ``first_order_recurrence`` — y[t] = p[t] y[t-1] + x[t] as a log-depth
  ``lax.associative_scan``: fully parallel on TPU, exact, real or complex.
  Serves the MLSA Padé mode's complex one-pole sections and DRC smoothing.
* ``sample_wise_lpc`` — time-varying order-M all-pole recurrence.  Order-M
  state carried through ``lax.scan`` (batch-parallel on the VPU); this is
  the exact path.  A chunked overlap-warmup variant for block parallelism
  lives in ``chunked_sample_wise_lpc``.
* ``lfilter`` — static-coefficient IIR (direct form I), built from an FIR
  convolution plus the all-pole scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def first_order_recurrence(x: jnp.ndarray, p: jnp.ndarray,
                           axis: int = -1) -> jnp.ndarray:
    """Solve y[t] = p[t] * y[t-1] + x[t] (y[-1] = 0) along ``axis``.

    Exact log-depth parallel form: the affine maps t -> (p[t], x[t]) compose
    associatively, so a single associative_scan yields all prefixes.
    """

    def combine(l, r):
        pl, xl = l
        pr, xr = r
        return pl * pr, xl * pr + xr

    _, y = jax.lax.associative_scan(combine, (jnp.broadcast_to(p, x.shape), x),
                                    axis=axis)
    return y


def sample_wise_lpc(x: jnp.ndarray, a: jnp.ndarray,
                    zi: jnp.ndarray | None = None) -> jnp.ndarray:
    """Time-varying all-pole filter: y[t] = x[t] - sum_k a[t,k] y[t-k].

    x: (..., T); a: (..., T, M); zi: optional (..., M) initial history
    ordered [y[-1], y[-2], ...].  Interface-compatible with
    torchlpc.sample_wise_lpc (the reference's external kernel).
    """
    M = a.shape[-1]
    if M == 1:
        y = first_order_recurrence(
            x if zi is None else x.at[..., 0].add(-a[..., 0, 0] * zi[..., 0]),
            -a[..., 0])
        return y

    xt = jnp.moveaxis(x, -1, 0)              # (T, ...)
    at = jnp.moveaxis(a, -2, 0)              # (T, ..., M)
    hist = (jnp.zeros(x.shape[:-1] + (M,), x.dtype) if zi is None
            else zi.astype(x.dtype))

    def step(hist, inp):
        xt, at = inp
        yt = xt - jnp.sum(at * hist, axis=-1)
        hist = jnp.concatenate([yt[..., None], hist[..., :-1]], axis=-1)
        return hist, yt

    _, y = jax.lax.scan(step, hist, (xt, at))
    return jnp.moveaxis(y, 0, -1)


def chunked_sample_wise_lpc(x: jnp.ndarray, a: jnp.ndarray,
                            chunk_length: int,
                            warmup_length: int) -> jnp.ndarray:
    """Block-parallel approximation of ``sample_wise_lpc``.

    Each chunk re-converges from ``warmup_length`` preceding samples
    (the reference's chunking recipe for the MLSA Padé mode,
    mglsadf.py:694-709): the all-pole impulse response decays, so a warmup
    of a few filter time-constants bounds the error.  All chunks then run
    in parallel on the batch axis — this is the throughput path on TPU.
    """
    T = x.shape[-1]
    M = a.shape[-1]
    C, W = chunk_length, warmup_length
    if T % C:
        raise ValueError("T must be divisible by chunk_length")
    n_chunks = T // C
    # Build overlapped segments of length W + C.
    pad = [(0, 0)] * (x.ndim - 1) + [(W, 0)]
    xp = jnp.pad(x, pad)
    ap = jnp.pad(a, pad[:-1] + [(W, 0), (0, 0)])
    idx = (np.arange(n_chunks)[:, None] * C + np.arange(W + C)[None, :])
    xs = xp[..., idx]                                  # (..., n_chunks, W+C)
    as_ = ap[..., idx, :]                              # (..., n_chunks, W+C, M)
    ys = sample_wise_lpc(xs, as_)                      # batched over chunks
    ys = ys[..., W:]
    return ys.reshape(*x.shape[:-1], T)


def _fir(x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Causal FIR y[t] = sum_k b[k] x[t-k] via padded gather-dot."""
    N = b.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(N - 1, 0)]
    xp = jnp.pad(x, pad)
    T = x.shape[-1]
    idx = np.arange(T)[:, None] + np.arange(N)[None, :]
    frames = xp[..., idx]                              # (..., T, N)
    return frames @ b[::-1]


def lfilter(b, a, x: jnp.ndarray) -> jnp.ndarray:
    """Static IIR filter (scipy.signal.lfilter semantics, zero state).

    b, a: 1-D coefficient arrays (host or device); normalized by a[0].
    """
    b = jnp.asarray(b, x.dtype)
    a = jnp.asarray(a, x.dtype)
    b = b / a[0]
    a = a / a[0]
    v = _fir(x, b)
    M = a.shape[-1] - 1
    if M == 0:
        return v
    if M == 1:
        return first_order_recurrence(v, jnp.full(x.shape[-1:], -a[1],
                                                  x.dtype))
    at = jnp.broadcast_to(a[1:], x.shape + (M,))
    return sample_wise_lpc(v, at)
