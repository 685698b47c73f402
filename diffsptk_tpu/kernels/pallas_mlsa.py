"""Fused MLSA Taylor cascade (Pallas TPU kernel, folded-plan form).

The multi-stage MLSA filter runs S (default 20) *sequential* stages of
the same frame-blocked FIR (reference: diffsptk/modules/mglsadf.py:
254-386).  kernels/mlsa_cascade.py folds the framing, the DFT, and the
lerp blend into static matmul plans; this kernel additionally keeps one
batch row's (N, P) frame grid resident in VMEM across all S stages, so
the per-stage HBM round trips of the XLA formulation disappear.

Layout rules that make this lower cleanly through Mosaic (the round-2
kernel died in the backend on exactly these):

* the signal state is a (rows, 128) VMEM scratch — frame rows on
  sublanes, the P in-frame samples on lanes [0, P), lanes >= P
  permanently zero.  No flat 1-D buffer, no in-kernel reshape.
* the context gather is gone: the forward transform reads n_blk
  statically-shifted row windows of the scratch, each contracted with a
  128-row plan slice whose dead rows are zero.  All slices are static.
* the inverse plan's lo / hi / last-row blocks sit at 128-aligned
  column offsets, so the row-shifted blend is three static-slice
  accumulations.
* stage weights live in SMEM, read at the fori_loop index.

Gradients: jax.custom_vjp with the backward pass differentiating the
XLA folded formulation (identical math; synthesis inference is the hot
path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlsa_cascade import (
    cascade_plan,
    chunk_split,
    coef_spectrum,
    lane_aligned_nfft,
    taylor_cascade_folded,
)

LANE = 128


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


@functools.lru_cache(maxsize=None)
def _fused_plan(nfft: int, m: int, p: int, advance: int):
    """Lane-padded variants of the folded plans.

    Ffwd128 (n_blk * 128, 2 Kp): each r-block's contraction dim is
    padded P -> 128 with zero rows (the scratch's dead lanes multiply
    against them).  Ginv (Kp, 3*128): lo / hi / lam blocks each start
    at a 128-aligned column.
    """
    Ffwd, Ginv_re, Ginv_im, r0, n_blk = cascade_plan(nfft, m, p, advance)
    K = nfft // 2 + 1
    Kp = _pad128(K)
    F128 = np.zeros((n_blk, LANE, 2 * Kp), np.float32)
    F128[:, :p, :K] = Ffwd[:, :, :K]
    F128[:, :p, Kp:Kp + K] = Ffwd[:, :, K:]
    F128 = F128.reshape(n_blk * LANE, 2 * Kp)

    def pad_g(G):
        Gp = np.zeros((Kp, 3 * LANE), np.float32)
        Gp[:K, 0:p] = G[:, 0:p]
        Gp[:K, LANE:LANE + p] = G[:, p:2 * p]
        Gp[:K, 2 * LANE:2 * LANE + p] = G[:, 2 * p:3 * p]
        return Gp

    return F128, pad_g(Ginv_re), pad_g(Ginv_im), r0, n_blk, Kp


def _split_hi_lo(a: np.ndarray):
    """Exact f32 = hi + lo split with both halves bf16-representable."""
    hi = a.astype(np.float32).astype(jnp.bfloat16)
    lo = (a.astype(np.float32) - np.asarray(hi, np.float32)) \
        .astype(jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


@functools.lru_cache(maxsize=None)
def _fused_plan_b3(nfft: int, m: int, p: int, advance: int):
    """bf16x3 variants of the lane-padded plans.

    Mosaic supports only DEFAULT/HIGHEST dot precisions in-kernel, so
    HIGH (bf16x3: a ~= ah+al, b ~= bh+bl, a@b ~= ah@bh + ah@bl + al@bh)
    is expressed structurally — each operand pair is concatenated along
    the contraction axis so the three products ride ONE single-pass
    bf16 MXU dot at 3x contraction depth:

      F_b3 (n_blk*3*128, 2Kp): per r-block rows [F_hi; F_lo; F_hi],
          paired in-kernel with lanes [xh, xh, xl].
      G_b3 (6*Kp, 3*128): rows [Gre_hi; Gre_lo; Gre_hi;
          Gim_hi; Gim_lo; Gim_hi], paired with
          [Yre_h, Yre_h, Yre_l, Yim_h, Yim_h, Yim_l].
    """
    F128, Gre, Gim, r0, n_blk, Kp = _fused_plan(nfft, m, p, advance)
    F128 = F128.reshape(n_blk, LANE, 2 * Kp)
    blocks = []
    for r in range(n_blk):
        fh, fl = _split_hi_lo(F128[r])
        blocks += [fh, fl, fh]
    F_b3 = np.concatenate(blocks, axis=0)          # (n_blk*3*128, 2Kp)
    gre_h, gre_l = _split_hi_lo(Gre)
    gim_h, gim_l = _split_hi_lo(Gim)
    G_b3 = np.concatenate([gre_h, gre_l, gre_h,
                           gim_h, gim_l, gim_h], axis=0)   # (6Kp, 384)
    return F_b3, G_b3, r0, n_blk, Kp


def _cascade_kernel_b3(wa_ref, x_ref, cre_ref, cim_ref, f_ref, g_ref,
                       out_ref, xq_ref, *, n_frames, P, r0, n_blk, Kp,
                       n_stages):
    """bf16x3 (HIGH) cascade: two single-pass bf16 dots per stage."""
    N = n_frames
    f32, bf16 = jnp.float32, jnp.bfloat16

    xq_ref[:] = jnp.zeros_like(xq_ref)
    xq_ref[r0:r0 + N, :P] = x_ref[0]
    out_ref[:] = wa_ref[1, 0] * x_ref[:]

    cre = cre_ref[0]
    cim = cim_ref[0]

    def stage(s, _):
        # Mosaic rejects concats wider than ~3 lane tiles inside the
        # fori_loop body, so each bf16x3 triple rides its own 3-piece
        # concat (384-lane contraction) and the dots accumulate.
        xq = xq_ref[:]
        xh = xq.astype(bf16)
        xl = (xq - xh.astype(f32)).astype(bf16)
        X = jnp.zeros((N, 2 * Kp), f32)
        for r in range(n_blk):
            cat = jnp.concatenate(
                [xh[r:r + N, :], xh[r:r + N, :], xl[r:r + N, :]], axis=1)
            X = X + jnp.dot(cat, f_ref[r * 3 * LANE:(r + 1) * 3 * LANE, :],
                            preferred_element_type=f32,
                            precision=jax.lax.Precision.DEFAULT)
        Xre, Xim = X[:, :Kp], X[:, Kp:]
        Yre = Xre * cre - Xim * cim
        Yim = Xre * cim + Xim * cre
        yre_h = Yre.astype(bf16)
        yre_l = (Yre - yre_h.astype(f32)).astype(bf16)
        yim_h = Yim.astype(bf16)
        yim_l = (Yim - yim_h.astype(f32)).astype(bf16)
        ycat_re = jnp.concatenate([yre_h, yre_h, yre_l], axis=1)
        ycat_im = jnp.concatenate([yim_h, yim_h, yim_l], axis=1)
        V = (jnp.dot(ycat_re, g_ref[:3 * Kp, :],
                     preferred_element_type=f32,
                     precision=jax.lax.Precision.DEFAULT)
             + jnp.dot(ycat_im, g_ref[3 * Kp:, :],
                       preferred_element_type=f32,
                       precision=jax.lax.Precision.DEFAULT))
        w_s = wa_ref[0, s]
        xq_ref[r0:r0 + N, :] = V[:, :LANE] * w_s
        xq_ref[r0:r0 + N - 1, :] = (xq_ref[r0:r0 + N - 1, :]
                                    + V[1:N, LANE:2 * LANE] * w_s)
        xq_ref[r0 + N - 1:r0 + N, :] = (
            xq_ref[r0 + N - 1:r0 + N, :]
            + V[N - 1:N, 2 * LANE:3 * LANE] * w_s)
        out_ref[0] = out_ref[0] + wa_ref[1, s] * xq_ref[r0:r0 + N, :P]
        return 0

    jax.lax.fori_loop(1, n_stages + 1, stage, 0)


def _cascade_kernel(wa_ref, x_ref, cre_ref, cim_ref, f_ref, gre_ref,
                    gim_ref, out_ref, xq_ref, *, n_frames, P, r0, n_blk,
                    Kp, n_stages, precision):
    N = n_frames
    prec = getattr(jax.lax.Precision, precision)

    xq_ref[:] = jnp.zeros_like(xq_ref)
    xq_ref[r0:r0 + N, :P] = x_ref[0]
    out_ref[:] = wa_ref[1, 0] * x_ref[:]

    cre = cre_ref[0]
    cim = cim_ref[0]

    def stage(s, _):
        X = jnp.zeros((N, 2 * Kp), jnp.float32)
        for r in range(n_blk):
            X = X + jnp.dot(xq_ref[r:r + N, :],
                            f_ref[r * LANE:(r + 1) * LANE, :],
                            preferred_element_type=jnp.float32,
                            precision=prec)
        Xre, Xim = X[:, :Kp], X[:, Kp:]
        Yre = Xre * cre - Xim * cim
        Yim = Xre * cim + Xim * cre
        V = (jnp.dot(Yre, gre_ref[:], preferred_element_type=jnp.float32,
                     precision=prec)
             + jnp.dot(Yim, gim_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=prec))                      # (N, 3*128)
        w_s = wa_ref[0, s]
        xq_ref[r0:r0 + N, :] = V[:, :LANE] * w_s
        xq_ref[r0:r0 + N - 1, :] = (xq_ref[r0:r0 + N - 1, :]
                                    + V[1:N, LANE:2 * LANE] * w_s)
        xq_ref[r0 + N - 1:r0 + N, :] = (
            xq_ref[r0 + N - 1:r0 + N, :]
            + V[N - 1:N, 2 * LANE:3 * LANE] * w_s)
        out_ref[0] = out_ref[0] + wa_ref[1, s] * xq_ref[r0:r0 + N, :P]
        return 0

    jax.lax.fori_loop(1, n_stages + 1, stage, 0)


@functools.lru_cache(maxsize=None)
def _chunked_plan(nfft: int, p: int, advance: int):
    """Lane-padded plans for the tap-chunked small geometry
    (m_eff = p-1) with a 2-block lo/hi inverse: gap rows between batch
    segments make the uniform blend exact (the la edge block of the
    monolithic kernel is emulated by the first gap row's replicated
    coefficient spectrum), so only the lo*(1-lam) / hi*lam blocks
    remain."""
    Ffwd, Ginv_re, Ginv_im, r0, n_blk = cascade_plan(nfft, p - 1, p,
                                                     advance)
    K = nfft // 2 + 1
    Kp = _pad128(K)
    F128 = np.zeros((n_blk, LANE, 2 * Kp), np.float32)
    F128[:, :p, :K] = Ffwd[:, :, :K]
    F128[:, :p, Kp:Kp + K] = Ffwd[:, :, K:]
    F128 = F128.reshape(n_blk * LANE, 2 * Kp)

    def pad_g(G):
        Gp = np.zeros((Kp, 2 * LANE), np.float32)
        Gp[:K, 0:p] = G[:, 0:p]                    # lo * (1 - lam)
        Gp[:K, LANE:LANE + p] = G[:, p:2 * p]      # hi * lam
        return Gp

    return F128, pad_g(Ginv_re), pad_g(Ginv_im), r0, n_blk, Kp


@functools.lru_cache(maxsize=None)
def _chunked_plan_b3(nfft: int, p: int, advance: int):
    """bf16x3 variants of the chunked lane-padded plans (see
    _fused_plan_b3 for the structural-precision layout)."""
    F128, Gre, Gim, r0, n_blk, Kp = _chunked_plan(nfft, p, advance)
    F128 = F128.reshape(n_blk, LANE, 2 * Kp)
    blocks = []
    for r in range(n_blk):
        fh, fl = _split_hi_lo(F128[r])
        blocks += [fh, fl, fh]
    F_b3 = np.concatenate(blocks, axis=0)          # (n_blk*3*128, 2Kp)
    gre_h, gre_l = _split_hi_lo(Gre)
    gim_h, gim_l = _split_hi_lo(Gim)
    G_b3 = np.concatenate([gre_h, gre_l, gre_h,
                           gim_h, gim_l, gim_h], axis=0)   # (6Kp, 256)
    return F_b3, G_b3, r0, n_blk, Kp


def _chunked_kernel_b3(wa_ref, x_ref, cre_ref, cim_ref, f_ref, g_ref,
                       out_ref, xq_ref, *, ng, P, r0, n_blk, Kp,
                       n_stages, Q, n_seg, period):
    """bf16x3 tap-chunked cascade over a group of gap-separated batch
    segments: frames at scratch rows off..off+ng, chunk j's spectrum =
    row-shift j of the shared forward transform, mask keeps gap rows
    zero every stage.

    The three bf16x3 products ride SEPARATE single-pass dots against
    the hi/lo plan halves instead of the (operand-concat x 3-deep plan)
    form: same FLOPs, but no (NE, 384) VMEM concat copies per window —
    at 20 stages the copies were ~10% of the kernel."""
    f32, bf16 = jnp.float32, jnp.bfloat16
    off = Q - 1 + r0
    NE = ng + Q - 1

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=f32,
                       precision=jax.lax.Precision.DEFAULT)

    xq_ref[:] = jnp.zeros_like(xq_ref)
    xq_ref[off:off + ng, :P] = x_ref[0]
    out_ref[:] = wa_ref[1, 0] * x_ref[:]

    pos = jax.lax.broadcasted_iota(jnp.int32, (ng, 1), 0)
    mask = ((pos % period) < n_seg).astype(f32)

    def stage(s, _):
        xq = xq_ref[:]
        xh = xq.astype(bf16)
        xl = (xq - xh.astype(f32)).astype(bf16)
        X = jnp.zeros((NE, 2 * Kp), f32)
        for r in range(n_blk):
            base = r * 3 * LANE
            fh = f_ref[base:base + LANE, :]
            fl = f_ref[base + LANE:base + 2 * LANE, :]
            w_h = xh[r:r + NE, :]
            X = X + dot(w_h, fh) + dot(w_h, fl) \
                + dot(xl[r:r + NE, :], fh)
        Yre = jnp.zeros((ng, Kp), f32)
        Yim = jnp.zeros((ng, Kp), f32)
        for j in range(Q):
            o = Q - 1 - j
            Xre = X[o:o + ng, :Kp]
            Xim = X[o:o + ng, Kp:]
            cre = cre_ref[0, :, j * Kp:(j + 1) * Kp]
            cim = cim_ref[0, :, j * Kp:(j + 1) * Kp]
            Yre = Yre + (Xre * cre - Xim * cim)
            Yim = Yim + (Xre * cim + Xim * cre)
        yre_h = Yre.astype(bf16)
        yre_l = (Yre - yre_h.astype(f32)).astype(bf16)
        yim_h = Yim.astype(bf16)
        yim_l = (Yim - yim_h.astype(f32)).astype(bf16)
        gre_h = g_ref[:Kp, :]
        gre_l = g_ref[Kp:2 * Kp, :]
        gim_h = g_ref[3 * Kp:4 * Kp, :]
        gim_l = g_ref[4 * Kp:5 * Kp, :]
        V = (dot(yre_h, gre_h) + dot(yre_h, gre_l) + dot(yre_l, gre_h)
             + dot(yim_h, gim_h) + dot(yim_h, gim_l)
             + dot(yim_l, gim_h))                             # (ng, 256)
        hi = jnp.concatenate(
            [V[1:, LANE:2 * LANE], jnp.zeros((1, LANE), f32)], axis=0)
        new = (V[:, :LANE] + hi) * (wa_ref[0, s] * mask)
        xq_ref[off:off + ng, :] = new
        out_ref[0] = out_ref[0] + wa_ref[1, s] * new[:, :P]
        return 0

    jax.lax.fori_loop(1, n_stages + 1, stage, 0)


def _chunked_kernel(wa_ref, x_ref, cre_ref, cim_ref, f_ref, gre_ref,
                    gim_ref, out_ref, xq_ref, *, ng, P, r0, n_blk, Kp,
                    n_stages, Q, n_seg, period, precision):
    f32 = jnp.float32
    prec = getattr(jax.lax.Precision, precision)
    off = Q - 1 + r0
    NE = ng + Q - 1

    xq_ref[:] = jnp.zeros_like(xq_ref)
    xq_ref[off:off + ng, :P] = x_ref[0]
    out_ref[:] = wa_ref[1, 0] * x_ref[:]

    pos = jax.lax.broadcasted_iota(jnp.int32, (ng, 1), 0)
    mask = ((pos % period) < n_seg).astype(f32)

    def stage(s, _):
        X = jnp.zeros((NE, 2 * Kp), f32)
        for r in range(n_blk):
            X = X + jnp.dot(xq_ref[r:r + NE, :],
                            f_ref[r * LANE:(r + 1) * LANE, :],
                            preferred_element_type=f32, precision=prec)
        Yre = jnp.zeros((ng, Kp), f32)
        Yim = jnp.zeros((ng, Kp), f32)
        for j in range(Q):
            o = Q - 1 - j
            Xre = X[o:o + ng, :Kp]
            Xim = X[o:o + ng, Kp:]
            cre = cre_ref[0, :, j * Kp:(j + 1) * Kp]
            cim = cim_ref[0, :, j * Kp:(j + 1) * Kp]
            Yre = Yre + (Xre * cre - Xim * cim)
            Yim = Yim + (Xre * cim + Xim * cre)
        V = (jnp.dot(Yre, gre_ref[:], preferred_element_type=f32,
                     precision=prec)
             + jnp.dot(Yim, gim_ref[:], preferred_element_type=f32,
                       precision=prec))                       # (ng, 256)
        hi = jnp.concatenate(
            [V[1:, LANE:2 * LANE], jnp.zeros((1, LANE), f32)], axis=0)
        new = (V[:, :LANE] + hi) * (wa_ref[0, s] * mask)
        xq_ref[off:off + ng, :] = new
        out_ref[0] = out_ref[0] + wa_ref[1, s] * new[:, :P]
        return 0

    jax.lax.fori_loop(1, n_stages + 1, stage, 0)


def _group_factor(B: int, rows_per_group: int, target: int = 1024) -> int:
    """Largest divisor of B whose group covers <= target frame rows."""
    cap = max(1, target // rows_per_group)
    g = 1
    for d in range(1, min(B, cap) + 1):
        if B % d == 0:
            g = d
    return g


def _cascade_pallas_chunked(x, c, weights, a, P, advance, nfft,
                            interpret=False, precision="HIGH"):
    """Tap-chunked grouped fused cascade.

    x (B, N, P) f32 frame grid, c (B, N, M+1) stage coefficients.
    Batch rows are grouped gap-separated into one program's frame grid
    so the per-stage MXU dots are (G*(N+gap), 384)-row instead of
    (N, 384)-row, and every chunk's forward spectrum is a row shift of
    one shared transform (see mlsa_cascade.taylor_cascade_folded)."""
    B, N, _ = x.shape
    M = c.shape[-1] - 1
    S = weights.shape[0] - 1
    wa = jnp.stack([weights, a]).astype(jnp.float32)

    cch, Q = chunk_split(c, P)                      # (B, N, Q, P)
    K = nfft // 2 + 1
    cre, cim = coef_spectrum(cch, nfft)             # (B, N, Q, K)
    Kp = _pad128(K)
    pad = [(0, 0), (0, 0), (0, 0), (0, Kp - K)]
    cre = jnp.pad(cre.astype(jnp.float32), pad)
    cim = jnp.pad(cim.astype(jnp.float32), pad)

    if precision == "HIGH":
        F_b3, G_b3, r0, n_blk, Kp2 = _chunked_plan_b3(nfft, P, advance)
        assert Kp2 == Kp
    else:
        F128, Gre, Gim, r0, n_blk, Kp2 = _chunked_plan(nfft, P, advance)
        assert Kp2 == Kp

    gap = max(r0 + Q - 1, n_blk - r0, 1)
    period = N + gap
    G = _group_factor(B, period)
    ng = G * period

    # gap rows: zeros in the signal, edge-replicated coefficient spectra
    # (the first gap row's spectrum makes the uniform blend reproduce
    # the la edge of the monolithic plan exactly).
    xg = jnp.pad(x, [(0, 0), (0, gap), (0, 0)])
    xg = xg.reshape(B // G, ng, P)
    cre = jnp.pad(cre, [(0, 0), (0, gap), (0, 0), (0, 0)], mode="edge")
    cim = jnp.pad(cim, [(0, 0), (0, gap), (0, 0), (0, 0)], mode="edge")
    cre = cre.reshape(B // G, ng, Q * Kp)
    cim = cim.reshape(B // G, ng, Q * Kp)

    rows = ((ng + Q - 1 + n_blk + 7) // 8) * 8
    if precision == "HIGH":
        kernel = functools.partial(
            _chunked_kernel_b3, ng=ng, P=P, r0=r0, n_blk=n_blk, Kp=Kp,
            n_stages=S, Q=Q, n_seg=N, period=period)
        plan_specs = [
            pl.BlockSpec((n_blk * 3 * LANE, 2 * Kp), lambda b: (0, 0)),
            pl.BlockSpec((6 * Kp, 2 * LANE), lambda b: (0, 0)),
        ]
        plans = (F_b3, G_b3)
    else:
        kernel = functools.partial(
            _chunked_kernel, ng=ng, P=P, r0=r0, n_blk=n_blk, Kp=Kp,
            n_stages=S, Q=Q, n_seg=N, period=period, precision=precision)
        plan_specs = [
            pl.BlockSpec((n_blk * LANE, 2 * Kp), lambda b: (0, 0)),
            pl.BlockSpec((Kp, 2 * LANE), lambda b: (0, 0)),
            pl.BlockSpec((Kp, 2 * LANE), lambda b: (0, 0)),
        ]
        plans = (F128, Gre, Gim)
    out = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # wa
            pl.BlockSpec((1, ng, P), lambda b: (b, 0, 0)),    # x frames
            pl.BlockSpec((1, ng, Q * Kp), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, ng, Q * Kp), lambda b: (b, 0, 0)),
            *plan_specs,
        ],
        out_specs=pl.BlockSpec((1, ng, P), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B // G, ng, P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, LANE), jnp.float32)],
        interpret=interpret,
    )(wa, xg, cre, cim, *plans)
    out = out.reshape(B, period, P)[:, :N]
    return out


def _cascade_pallas(x, cspec_re, cspec_im, weights, a, P, M, advance,
                    nfft, interpret=False, precision="HIGHEST"):
    """x (B, N, P) f32, cspec re/im (B, N, Kp) -> y (B, N, P) f32."""
    B, N, _ = x.shape
    S = weights.shape[0] - 1
    wa = jnp.stack([weights, a]).astype(jnp.float32)

    if precision == "HIGH":
        F_b3, G_b3, r0, n_blk, Kp = _fused_plan_b3(nfft, M, P, advance)
        rows = ((r0 + N + n_blk + 7) // 8) * 8
        kernel = functools.partial(
            _cascade_kernel_b3, n_frames=N, P=P, r0=r0, n_blk=n_blk,
            Kp=Kp, n_stages=S)
        plan_specs = [
            pl.BlockSpec((n_blk * 3 * LANE, 2 * Kp), lambda b: (0, 0)),
            pl.BlockSpec((6 * Kp, 3 * LANE), lambda b: (0, 0)),
        ]
        plans = (F_b3, G_b3)
    else:
        F128, Gre, Gim, r0, n_blk, Kp = _fused_plan(nfft, M, P, advance)
        rows = ((r0 + N + n_blk + 7) // 8) * 8
        kernel = functools.partial(
            _cascade_kernel, n_frames=N, P=P, r0=r0, n_blk=n_blk, Kp=Kp,
            n_stages=S, precision=precision)
        plan_specs = [
            pl.BlockSpec((n_blk * LANE, 2 * Kp), lambda b: (0, 0)),
            pl.BlockSpec((Kp, 3 * LANE), lambda b: (0, 0)),
            pl.BlockSpec((Kp, 3 * LANE), lambda b: (0, 0)),
        ]
        plans = (F128, Gre, Gim)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # wa
            pl.BlockSpec((1, N, P), lambda b: (b, 0, 0)),     # x frames
            pl.BlockSpec((1, N, Kp), lambda b: (b, 0, 0)),    # cspec re
            pl.BlockSpec((1, N, Kp), lambda b: (b, 0, 0)),    # cspec im
            *plan_specs,
        ],
        out_specs=pl.BlockSpec((1, N, P), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, P), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, LANE), jnp.float32)],
        interpret=interpret,
    )(wa, x, cspec_re, cspec_im, *plans)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def taylor_cascade(x, c, weights, a, P, advance, nfft,
                   precision="HIGHEST"):
    """Fused Taylor-cascade MLSA filter.

    x (..., T) f32; c (..., N, M+1) stage coefficients; weights/a (S+1,).
    Forward runs the VMEM-resident Pallas kernel on TPU (XLA folded
    fallback elsewhere); backward differentiates the XLA formulation.
    ``precision`` sets the in-kernel dot precision: "HIGHEST" (f32
    parity via 6-pass dots; default), "HIGH" (bf16x3 expressed as
    single-pass bf16 dots at 3x contraction depth — the same accuracy
    class as the folded XLA path's default, ~2x the HIGHEST rate), or
    "DEFAULT" (one bf16 pass, ~1e-3 relative error for a single
    synthesis pass; NOT safe for inverse->forward round trips, where
    the bf16 error is re-amplified by the forward filter).
    """
    return _taylor_cascade_fwd(x, c, weights, a, P, advance, nfft,
                               precision)[0]


def _use_fused(dtype) -> bool:
    if dtype != jnp.float32:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _taylor_cascade_fwd(x, c, weights, a, P, advance, nfft,
                        precision="HIGHEST"):
    if _use_fused(x.dtype):
        M = c.shape[-1] - 1
        T = x.shape[-1]
        N = c.shape[-2]
        xb = x.reshape(-1, N, P)
        cb = jnp.broadcast_to(
            c, x.shape[:-1] + c.shape[-2:]).reshape(
                -1, c.shape[-2], c.shape[-1])
        Q = -(-(M + 1) // P)
        nfft_c = lane_aligned_nfft(3 * P)
        if Q >= 2 and nfft_c < nfft:
            y = _cascade_pallas_chunked(xb, cb, weights, a, P, advance,
                                        nfft_c, precision=precision)
        else:
            K = nfft // 2 + 1
            Kp = _pad128(K)
            cre, cim = coef_spectrum(cb, nfft)
            pad = [(0, 0), (0, 0), (0, Kp - K)]
            cre = jnp.pad(cre.astype(jnp.float32), pad)
            cim = jnp.pad(cim.astype(jnp.float32), pad)
            y = _cascade_pallas(xb, cre, cim, weights, a, P, M, advance,
                                nfft, precision=precision)
        y = y.reshape(x.shape[:-1] + (T,))
    else:
        y = taylor_cascade_folded(x, c, weights, a, P, advance, nfft)
    return y, (x, c, weights, a)


def _taylor_cascade_bwd(P, advance, nfft, precision, res, g):
    x, c, weights, a = res
    _, vjp = jax.vjp(
        lambda x_, c_, w_, a_: taylor_cascade_folded(
            x_, c_, w_, a_, P, advance, nfft),
        x, c, weights, a)
    return vjp(g)


taylor_cascade.defvjp(_taylor_cascade_fwd, _taylor_cascade_bwd)
