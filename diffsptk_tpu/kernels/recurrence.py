"""Recursive (IIR) filter kernels — the native-kernel layer of the framework.

These replace the external compiled kernels the reference borrows
(torchlpc.sample_wise_lpc at poledf.py:106/mglsadf.py:690, torchaudio
lfilter at utils/private.py:328; SURVEY.md §2.9):

* ``first_order_recurrence`` — y[t] = p[t] y[t-1] + x[t] as a log-depth
  ``lax.associative_scan``: fully parallel on TPU, exact, real or complex.
  Serves the MLSA Padé mode's complex one-pole sections and DRC smoothing.
* ``sample_wise_lpc`` — time-varying order-M all-pole recurrence.  For
  long sequences it dispatches to ``blocked_sample_wise_lpc``, the EXACT
  block-parallel superposition form (serial depth block+n_blocks instead
  of T); short sequences use the plain ``lax.scan``.  A warmup-based
  approximate variant lives in ``chunked_sample_wise_lpc``.
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

    On TPU at float32/complex64 this runs the single-pass Pallas scan
    kernel (kernels/pallas_scan.py) with a custom VJP; elsewhere, the
    exact log-depth parallel form: the affine maps t -> (p[t], x[t])
    compose associatively, so one associative_scan yields all prefixes.
    """
    if axis in (-1, x.ndim - 1):
        from .pallas_scan import scan_diff, supported
        if supported(x, p):
            return scan_diff(jnp.broadcast_to(p, x.shape), x)

    def combine(l, r):
        pl, xl = l
        pr, xr = r
        return pl * pr, xl * pr + xr

    _, y = jax.lax.associative_scan(combine, (jnp.broadcast_to(p, x.shape), x),
                                    axis=axis)
    return y


def sample_wise_lpc(x: jnp.ndarray, a: jnp.ndarray,
                    zi: jnp.ndarray | None = None,
                    block: int | None = 256,
                    axis_name: str | None = None) -> jnp.ndarray:
    """Time-varying all-pole filter: y[t] = x[t] - sum_k a[t,k] y[t-k].

    x: (..., T); a: (..., T, M); zi: optional (..., M) initial history
    ordered [y[-1], y[-2], ...].  Interface-compatible with
    torchlpc.sample_wise_lpc (the reference's external kernel).

    For long sequences this runs the EXACT block-parallel form (see
    ``blocked_sample_wise_lpc``): the per-sample lax.scan serializes T
    steps, which dominates wall-clock on TPU; blocking cuts the serial
    depth to the block length.  Pass ``block=None`` to force the plain
    scan.
    """
    M = a.shape[-1]
    if M == 0:
        # order-0 filter: no feedback taps, identity recursion
        return x
    if axis_name is not None:
        # time-sharded path (inside shard_map): exact cross-shard state
        # handoff through the blocked form's affine summaries
        return blocked_sample_wise_lpc(x, a, zi=zi, block=block or 256,
                                       axis_name=axis_name)
    if M == 1:
        y = first_order_recurrence(
            x if zi is None else x.at[..., 0].add(-a[..., 0, 0] * zi[..., 0]),
            -a[..., 0])
        return y
    T = x.shape[-1]
    if block is not None and T >= 4 * block and block >= 2 * M:
        return blocked_sample_wise_lpc(x, a, zi=zi, block=block)
    return _scan_sample_wise_lpc(x, a, zi)


def _scan_sample_wise_lpc(x, a, zi=None):
    M = a.shape[-1]
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


def blocked_sample_wise_lpc(x: jnp.ndarray, a: jnp.ndarray,
                            zi: jnp.ndarray | None = None,
                            block: int = 256,
                            axis_name: str | None = None) -> jnp.ndarray:
    """EXACT block-parallel time-varying all-pole filter.

    Linearity lets each block's output be superposed from M+1 responses
    computed with all blocks in parallel (batch axis): the zero-state
    response to the block's input plus the M homogeneous responses to
    unit initial histories.  The true initial history of each block then
    follows from a short sequential recursion of (M x M) transition
    matrices across blocks (n_blocks steps instead of T).  Serial depth
    drops from T to block + n_blocks with an (M+1)x flop multiplier —
    the right trade on TPU, where the per-sample scan is dispatch-bound.

    With ``axis_name`` (inside shard_map over a time-sharded sequence)
    the same decomposition extends across devices: each shard composes
    its blocks' transition maps into one affine shard summary
    (s_out = c + C s_in), the summaries are all-gathered (M + M^2
    numbers per shard over ICI), and every shard folds its left
    neighbors' maps to recover its exact entering state — the
    cross-shard M-state handoff, with no warmup approximation.
    """
    T = x.shape[-1]
    M = a.shape[-1]
    C = block
    pad = (-T) % C
    if pad and axis_name is not None:
        raise ValueError(
            "sharded blocked LPC needs block | local T: zero-padded "
            "tail blocks would corrupt the cross-shard state summary.")
    if pad:
        xpad = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        x = jnp.pad(x, xpad)
        a = jnp.pad(a, xpad + [(0, 0)])
    n = x.shape[-1] // C
    batch = x.shape[:-1]

    xs = x.reshape(*batch, n, C)
    as_ = a.reshape(*batch, n, C, M)

    # Augmented systems per block: index 0 driven by x with zero history;
    # systems 1..M homogeneous with history e_{j-1}.
    eye = jnp.eye(M, dtype=x.dtype)
    hist0 = jnp.zeros((*batch, n, M + 1, M), x.dtype)
    hist0 = hist0.at[..., 1:, :].set(eye)

    xt = jnp.moveaxis(xs, -1, 0)                     # (C, ..., n)
    at = jnp.moveaxis(as_, -2, 0)                    # (C, ..., n, M)

    def step(hist, inp):
        xc, ac = inp
        yt = -jnp.einsum("...m,...km->...k", ac, hist)
        yt = yt.at[..., 0].add(xc)
        hist = jnp.concatenate([yt[..., None], hist[..., :-1]], axis=-1)
        return hist, yt

    _, ys = jax.lax.scan(step, hist0, (xt, at))      # (C, ..., n, M+1)
    ys = jnp.moveaxis(ys, 0, -2)                     # (..., n, C, M+1)
    y0 = ys[..., 0]                                  # zero-state (..., n, C)
    H = ys[..., 1:]                                  # homogeneous (...,n,C,M)

    # Block end-state (history entering the next block):
    # s_end[i] = y[C-1-i]  =>  s_end = g + G s_start.
    tail = jnp.flip(ys[..., C - M:, :], axis=-2)     # (..., n, M, M+1)
    g = tail[..., 0]                                 # (..., n, M)
    G = tail[..., 1:]                                # (..., n, M, M)

    gt = jnp.moveaxis(g, -2, 0)                      # (n, ..., M)
    Gt = jnp.moveaxis(G, -3, 0)                      # (n, ..., M, M)

    # Prefix-compose the per-block affine maps s -> g + G s, carrying
    # (c, C) such that the state entering block i is c_i + C_i s_start.
    c0 = jnp.zeros((*batch, M), x.dtype)
    C0 = jnp.broadcast_to(jnp.eye(M, dtype=x.dtype), (*batch, M, M))

    def chain(cC, inp):
        c, Cm = cC
        gk, Gk = inp
        c2 = gk + jnp.einsum("...ij,...j->...i", Gk, c)
        C2 = jnp.einsum("...ij,...jk->...ik", Gk, Cm)
        return (c2, C2), (c, Cm)                     # emit incoming map

    (c_tot, C_tot), (c_in, C_in) = jax.lax.scan(chain, (c0, C0), (gt, Gt))
    c_in = jnp.moveaxis(c_in, 0, -2)                 # (..., n, M)
    C_in = jnp.moveaxis(C_in, 0, -3)                 # (..., n, M, M)

    if axis_name is None:
        s0 = (jnp.zeros((*batch, M), x.dtype) if zi is None
              else zi.astype(x.dtype))
    else:
        # cross-shard handoff: fold the left shards' affine summaries
        cs = jax.lax.all_gather(c_tot, axis_name)    # (S, ..., M)
        Cs = jax.lax.all_gather(C_tot, axis_name)    # (S, ..., M, M)
        me = jax.lax.axis_index(axis_name)
        s0 = (jnp.zeros((*batch, M), x.dtype) if zi is None
              else zi.astype(x.dtype))

        def fold(k, s):
            s2 = cs[k] + jnp.einsum("...ij,...j->...i", Cs[k], s)
            return jnp.where(k < me, s2, s)

        s0 = jax.lax.fori_loop(0, cs.shape[0], fold, s0)

    s_in = c_in + jnp.einsum("...nij,...j->...ni", C_in, s0)
    y = y0 + jnp.einsum("...cm,...m->...c", H, s_in)
    y = y.reshape(*batch, n * C)
    return y[..., :T] if pad else y


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
