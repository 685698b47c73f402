"""Folded-plan MLSA Taylor cascade (XLA matmul formulation).

The multi-stage MLSA filter (reference: diffsptk/modules/mglsadf.py:254-386)
runs S sequential stages of the same frame-blocked FFT FIR
(ops/zerodf.py:zerodf_fft).  The generic stage materializes overlapping
(N, nfft) frame contexts, runs full-length forward/inverse transforms,
and lerp-blends adjacent frames — several HBM round trips of
nfft-wide intermediates per stage.

This module *folds the framing, the transform, and the blend into
static matmul plans* so each stage becomes a handful of MXU matmuls over
the (N, P) frame grid with no context materialization:

* forward: the overlapping-frame gather composed with the length-L real
  DFT is, per frame row n, ``X[n] = sum_r xq[n + r - r0] @ F_r`` where
  ``F_r`` is the (P, K) slice of the DFT matrix that multiplies the
  samples row ``n + r - r0`` contributes to frame n's context.  The
  gather disappears into ``n_blk`` shifted (N, P) @ (P, 2K) matmuls.
* inverse + blend: the output slots consumed by the lerp blend are a
  (K, P) slice of the inverse DFT, and the blend weight lambda(tau)
  depends only on the output column, so it folds into the plan:
  ``lo*(1-lam)``, ``hi*lam``, and the last-row edge each become
  pre-scaled (K, P) plan blocks evaluated by one (N, K) @ (K, 3P)
  matmul pair.

Per stage that leaves: n_blk + 2 matmuls, one complex multiply against
the shared per-frame coefficient spectrum, and one row-shifted add —
all static slices, so the same formulation lowers cleanly to a Pallas
VMEM-resident kernel (pallas_mlsa2.py) and to every XLA backend here.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax.lax import Precision


@functools.lru_cache(maxsize=None)
def cascade_plan(nfft: int, m: int, p: int, advance: int):
    """Static plan matrices for one folded MLSA stage.

    Returns (Ffwd, Ginv_re, Ginv_im, r0, n_blk):
      Ffwd    (n_blk, P, 2K)  forward DFT with framing folded in;
                              columns [0:K] real part, [K:2K] -imag.
      Ginv_re (K, 3P)         inverse DFT evaluated at the blend slots,
      Ginv_im (K, 3P)         blend weights folded in: columns
                              [0:P] lo*(1-lam), [P:2P] hi*lam,
                              [2P:3P] lo*lam (last-row edge).
    """
    P, M, z = p, m, advance
    L = 2 * P + M
    K = nfft // 2 + 1
    PADL = P + M - z
    r0 = -(-PADL // P)
    shift = r0 * P - PADL
    n_blk = -(-(shift + L) // P)

    k = np.arange(K)
    ln = np.arange(n_blk * P) - shift             # ctx position of each
    ang = 2.0 * np.pi * np.outer(ln, k) / nfft    # (n_blk*P, K)
    valid = ((0 <= ln) & (ln < L))[:, None]
    Ffwd = np.concatenate(
        [np.where(valid, np.cos(ang), 0.0),
         np.where(valid, -np.sin(ang), 0.0)], axis=1)   # (n_blk*P, 2K)
    Ffwd = Ffwd.reshape(n_blk, P, 2 * K)

    w = np.full(K, 2.0)
    w[0] = 1.0
    if nfft % 2 == 0:
        w[-1] = 1.0
    lam = np.arange(P) / P
    s_lo = M + P + np.arange(P)
    s_hi = M + np.arange(P)

    def inv_block(slots, scale):
        a = 2.0 * np.pi * np.outer(k, slots) / nfft      # (K, P)
        gre = (w[:, None] * np.cos(a) / nfft) * scale
        gim = (-w[:, None] * np.sin(a) / nfft) * scale
        return gre, gim

    lo_re, lo_im = inv_block(s_lo, 1.0 - lam)
    hi_re, hi_im = inv_block(s_hi, lam)
    la_re, la_im = inv_block(s_lo, lam)
    Ginv_re = np.concatenate([lo_re, hi_re, la_re], axis=1)   # (K, 3P)
    Ginv_im = np.concatenate([lo_im, hi_im, la_im], axis=1)
    # Plans stay float64 on the host; the call site casts to the compute
    # dtype, so float64 runs (CPU tests) keep full-precision constants.
    return Ffwd, Ginv_re, Ginv_im, r0, n_blk


def lane_aligned_nfft(min_nfft: int) -> int:
    """Smallest even transform length >= ``min_nfft`` whose half-spectrum
    K = nfft/2 + 1 is an exact multiple of the 128-lane MXU tile.

    The folded cascade computes a *linear* convolution of the (M+1)-tap
    stage filter with a (2P+M)-sample context; any nfft >= 2P+M+1 is
    alias-free at the slots the blend reads, so the transform length is
    a free parameter.  The canonical power of two (e.g. 512 -> K=257)
    wastes a whole 128-lane tile on one row; nfft = 256k - 2 gives
    K = 128k exactly (e.g. 510 -> K=256, 254 -> K=128), cutting the
    padded MXU work by ~1.3-1.5x at the flagship geometry.
    """
    k = -(-(min_nfft + 2) // 256)
    return 256 * k - 2


@functools.lru_cache(maxsize=None)
def _coef_spectrum_plan(nfft: int, n_taps: int):
    k = np.arange(nfft // 2 + 1)
    t = np.arange(n_taps)
    ang = 2.0 * np.pi * np.outer(t, k) / nfft
    return np.cos(ang), -np.sin(ang)        # (n_taps, K) float64


def coef_spectrum(c: jnp.ndarray, nfft: int):
    """rfft(c, nfft) of the (..., M+1) stage coefficients as one small
    DFT matmul: re/im (..., K) real pair.

    Works for any transform length (the MXU Cooley-Tukey path needs a
    power of two) and avoids complex intermediates.  Cost is trivial
    next to the cascade (one (N, M+1) @ (M+1, K) pair per call), so the
    matmuls stay at HIGHEST precision.
    """
    Cre, Cim = _coef_spectrum_plan(nfft, c.shape[-1])
    dt = c.dtype
    cre = jnp.matmul(c, jnp.asarray(Cre, dt), precision=Precision.HIGHEST)
    cim = jnp.matmul(c, jnp.asarray(Cim, dt), precision=Precision.HIGHEST)
    return cre, cim


def _stage(xq, cre, cim, Ffwd, Ginv_re, Ginv_im, r0, n_blk, P, K,
           precision):
    """One folded MLSA stage on the (..., N, P) frame grid."""
    N = xq.shape[-2]
    pad = [(0, 0)] * (xq.ndim - 2) + [(r0, n_blk - 1 - r0), (0, 0)]
    xpad = jnp.pad(xq, pad)
    X = None
    for r in range(n_blk):
        part = jnp.matmul(xpad[..., r:r + N, :], Ffwd[r],
                          precision=precision)
        X = part if X is None else X + part               # (..., N, 2K)
    Xre, Xim = X[..., :K], X[..., K:]
    Yre = Xre * cre - Xim * cim
    Yim = Xre * cim + Xim * cre
    V = (jnp.matmul(Yre, Ginv_re, precision=precision)
         + jnp.matmul(Yim, Ginv_im, precision=precision))  # (..., N, 3P)
    hi = jnp.concatenate(
        [V[..., 1:, P:2 * P], V[..., N - 1:, 2 * P:]], axis=-2)
    return V[..., :P] + hi


@functools.lru_cache(maxsize=None)
def stage_plans(nfft: int, m: int, p: int, advance: int = 0):
    """Folded forward plans plus the *unblended* inverse plan.

    For callers that blend lo/hi explicitly because the hi frame may
    live on a neighbor shard (parallel/vocoder.py): Ffwd as in
    ``cascade_plan``; G2 evaluates the inverse DFT at the 2P blend
    slots M..M+2P-1 with no lerp weights folded in.
    """
    Ffwd, _, _, r0, n_blk = cascade_plan(nfft, m, p, advance)
    K = nfft // 2 + 1
    w = np.full(K, 2.0)
    w[0] = 1.0
    if nfft % 2 == 0:
        w[-1] = 1.0
    k = np.arange(K)
    slots = m + np.arange(2 * p)
    a = 2.0 * np.pi * np.outer(k, slots) / nfft
    G2_re = w[:, None] * np.cos(a) / nfft
    G2_im = -w[:, None] * np.sin(a) / nfft
    return Ffwd, G2_re, G2_im, r0, n_blk


def stage_apply(xq_ext: jnp.ndarray, cre: jnp.ndarray, cim: jnp.ndarray,
                nfft: int, m: int, p: int, advance: int = 0,
                precision=Precision.HIGH) -> jnp.ndarray:
    """One folded MLSA stage on pre-extended frame rows.

    xq_ext (..., n_out + n_blk, P): local frames extended by r0 rows on
    the left and n_blk - r0 on the right (neighbor halos, or zeros at
    global edges — the same zeros the plan's dead rows encode).
    cre/cim (..., n_out + 1, K): coefficient spectra for the local
    frames plus the right-neighbor frame (edge-replicated globally).
    Returns the blended (..., n_out, P) stage output.
    """
    Ffwd, G2_re, G2_im, r0, n_blk = stage_plans(nfft, m, p, advance)
    dt = xq_ext.dtype
    F = jnp.asarray(Ffwd, dt)
    Gre = jnp.asarray(G2_re, dt)
    Gim = jnp.asarray(G2_im, dt)
    K = nfft // 2 + 1
    n_out = xq_ext.shape[-2] - n_blk
    X = None
    for r in range(n_blk):
        part = jnp.matmul(xq_ext[..., r:r + n_out + 1, :], F[r],
                          precision=precision)
        X = part if X is None else X + part
    Xre, Xim = X[..., :K], X[..., K:]
    Yre = Xre * cre - Xim * cim
    Yim = Xre * cim + Xim * cre
    U = (jnp.matmul(Yre, Gre, precision=precision)
         + jnp.matmul(Yim, Gim, precision=precision))   # (.., n_out+1, 2P)
    lam = jnp.asarray(np.arange(p) / p, dt)
    lo = U[..., :-1, p:]
    hi = U[..., 1:, :p]
    return lo * (1 - lam) + hi * lam


def _stage_chunked(xq, cres, cims, Ffwd, Ginv_re, Ginv_im, r0, n_blk,
                   P, K, Q, precision):
    """One tap-chunked MLSA stage on the (..., N, P) frame grid.

    cres/cims: (..., N, Q, K) per-chunk coefficient spectra.  Chunk j
    covers taps [jP, jP+P) of the full filter; its forward spectrum is
    the shared small-geometry transform row-shifted by j frames
    (shifting the context by exactly P samples moves it one frame row),
    so one forward plan and one inverse plan serve every chunk.
    """
    N = xq.shape[-2]
    NE = N + Q - 1
    pad = [(0, 0)] * (xq.ndim - 2) + [(r0 + Q - 1, n_blk - 1 - r0), (0, 0)]
    xpad = jnp.pad(xq, pad)
    X = None
    for r in range(n_blk):
        part = jnp.matmul(xpad[..., r:r + NE, :], Ffwd[r],
                          precision=precision)
        X = part if X is None else X + part               # (..., NE, 2K)
    Yre = Yim = None
    for j in range(Q):
        o = Q - 1 - j
        Xre = X[..., o:o + N, :K]
        Xim = X[..., o:o + N, K:]
        cre = cres[..., j, :]
        cim = cims[..., j, :]
        yre = Xre * cre - Xim * cim
        yim = Xre * cim + Xim * cre
        Yre = yre if Yre is None else Yre + yre
        Yim = yim if Yim is None else Yim + yim
    V = (jnp.matmul(Yre, Ginv_re, precision=precision)
         + jnp.matmul(Yim, Ginv_im, precision=precision))  # (..., N, 3P)
    hi = jnp.concatenate(
        [V[..., 1:, P:2 * P], V[..., N - 1:, 2 * P:]], axis=-2)
    return V[..., :P] + hi


def chunk_split(c: jnp.ndarray, P: int):
    """Split (..., N, M+1) stage coefficients into (..., N, Q, P) tap
    chunks (zero-padded) for the chunked cascade."""
    M = c.shape[-1] - 1
    Q = -(-(M + 1) // P)
    cpad = jnp.pad(c, [(0, 0)] * (c.ndim - 1) + [(0, Q * P - (M + 1))])
    return cpad.reshape(c.shape[:-1] + (Q, P)), Q


def taylor_cascade_folded(x: jnp.ndarray, c: jnp.ndarray,
                          weights: jnp.ndarray, a: jnp.ndarray,
                          P: int, advance: int, nfft: int,
                          precision=Precision.HIGH) -> jnp.ndarray:
    """Taylor-cascade MLSA filter, folded-plan formulation.

    Bit-equivalent math to the stage-by-stage ``zerodf_fft`` loop in
    ops/mglsadf.py (same DFT, same lerp blend, same edge handling), with
    the framing/transform/blend folded into static plans.

    Long filters (M+1 > P) are *tap-chunked*: the stage convolution is
    regrouped as ``y[s] = sum_j (c[jP:jP+P] * x)[s - jP]`` — exact
    same math, but every chunk rides the small (m_eff = P-1) geometry,
    whose forward transform is a row-shift of one shared plan.  At the
    flagship geometry (P=80, M=199) this cuts the transform from
    K=256 / 5 windows to K=128 / 3 windows, ~2.3x less MXU work.

    x (..., T) float; c (..., N, M+1) stage coefficients (shared across
    stages); weights/a (S+1,) Taylor stage weights.
    """
    M = c.shape[-1] - 1
    T = x.shape[-1]
    N = c.shape[-2]

    Q = -(-(M + 1) // P)
    nfft_c = lane_aligned_nfft(3 * P)
    if Q >= 2 and nfft_c < nfft:
        K = nfft_c // 2 + 1
        Ffwd, Ginv_re, Ginv_im, r0, n_blk = cascade_plan(
            nfft_c, P - 1, P, advance)
        Ffwd = jnp.asarray(Ffwd, x.dtype)
        Ginv_re = jnp.asarray(Ginv_re, x.dtype)
        Ginv_im = jnp.asarray(Ginv_im, x.dtype)
        cch, Q = chunk_split(c, P)
        cres, cims = coef_spectrum(cch, nfft_c)            # (..., N, Q, K)
        cres = cres.astype(x.dtype)
        cims = cims.astype(x.dtype)
        xq = x.reshape(x.shape[:-1] + (N, P))
        y = a[0] * xq
        for s in range(1, a.shape[0]):
            xq = _stage_chunked(xq, cres, cims, Ffwd, Ginv_re, Ginv_im,
                                r0, n_blk, P, K, Q, precision) * weights[s]
            y = y + a[s] * xq
        return y.reshape(x.shape[:-1] + (T,))

    K = nfft // 2 + 1
    Ffwd, Ginv_re, Ginv_im, r0, n_blk = cascade_plan(nfft, M, P, advance)
    Ffwd = jnp.asarray(Ffwd, x.dtype)
    Ginv_re = jnp.asarray(Ginv_re, x.dtype)
    Ginv_im = jnp.asarray(Ginv_im, x.dtype)

    cre, cim = coef_spectrum(c, nfft)
    cre = cre.astype(x.dtype)
    cim = cim.astype(x.dtype)

    xq = x.reshape(x.shape[:-1] + (N, P))
    y = a[0] * xq
    for s in range(1, a.shape[0]):
        xq = _stage(xq, cre, cim, Ffwd, Ginv_re, Ginv_im, r0, n_blk,
                    P, K, precision) * weights[s]
        y = y + a[s] * xq
    return y.reshape(x.shape[:-1] + (T,))
