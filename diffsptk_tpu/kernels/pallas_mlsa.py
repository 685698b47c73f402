"""Fused MLSA Taylor cascade (Pallas TPU kernel).

The multi-stage MLSA filter runs S (default 20) *sequential* stages of
the same frame-blocked FFT FIR (ops/zerodf.py:zerodf_fft): each stage
re-frames the previous stage's output, transforms, multiplies by the
shared per-frame coefficient spectrum, inverse-transforms, and
lerp-blends adjacent frames.  As XLA ops every stage round-trips its
(N, nfft) intermediates through HBM — ~20x the traffic the math needs
(docs/roofline.md).

This kernel keeps ONE batch row's signal resident in VMEM across all S
stages.  Per stage, per row:

  ctx  = overlapping (N, nfft) frames of the padded signal  (VMEM slices)
  X    = ctx @ F          (direct real DFT as two MXU matmuls)
  Y    = X * cspec        (complex multiply, VPU)
  U    = Y @ G            (inverse DFT evaluated ONLY at the 2P samples
                           the lerp blend consumes — samples M..M+2P-1)
  x'   = lerp(U) * w_s ;  y += a_s * x'

The direct DFT costs ~4x the Cooley-Tukey FLOPs of kernels/mxu_fft, but
every operand stays in VMEM and the inverse transform is sliced to
2P/nfft of its columns, so the stage's HBM traffic is zero.  Gradients:
jax.custom_vjp with the backward pass taken from the pure-XLA
implementation (identical math; synthesis inference is the hot path).

Status: correctness-validated in interpreter mode; enable in
MultiStageFIRFilter via ``mode="fused"`` once benchmarked on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad128(n: int) -> int:
    return ((n + 127) // 128) * 128


@functools.lru_cache(maxsize=None)
def _dft_plan(nfft: int, m: int, p: int):
    """Forward DFT (nfft, Kp) and inverse slice (Kp, Qp) matrices.

    The spectral axis K = nfft//2+1 and the blend slice 2P are
    zero-padded to 128-multiples (Kp, Qp) so the Pallas TPU lowering's
    lane-tiling constraint holds; the padded rows/columns are zero, so
    they contribute nothing to the matmuls.
    """
    K = nfft // 2 + 1
    Kp, Qp = _pad128(K), _pad128(2 * p)
    t = np.arange(nfft)
    k = np.arange(K)
    ang = 2.0 * np.pi * np.outer(t, k) / nfft
    F_re = np.zeros((nfft, Kp), np.float32)
    F_im = np.zeros((nfft, Kp), np.float32)
    F_re[:, :K] = np.cos(ang)
    F_im[:, :K] = -np.sin(ang)
    # irfft(Y)[m + tau], tau in [0, 2P):  (1/nfft) sum_k w_k *
    #   (Yre cos(2 pi k (m+tau) / nfft) - Yim sin(...)),  w = [1,2,..,2,1]
    w = np.full(K, 2.0)
    w[0] = w[-1] = 1.0
    tau = m + np.arange(2 * p)
    ang2 = 2.0 * np.pi * np.outer(k, tau) / nfft
    G_re = np.zeros((Kp, Qp), np.float32)
    G_im = np.zeros((Kp, Qp), np.float32)
    G_re[:K, :2 * p] = w[:, None] * np.cos(ang2) / nfft
    G_im[:K, :2 * p] = -w[:, None] * np.sin(ang2) / nfft
    return F_re, F_im, G_re, G_im


def _cascade_kernel(wa_ref, x_ref, cre_ref, cim_ref, fre_ref, fim_ref,
                    gre_ref, gim_ref, out_ref, xp_ref, *, n_frames, P, M,
                    advance, n_stages, nfft):
    N, L = n_frames, 2 * P + M
    T = N * P
    # Store the signal at a 128- and P-aligned left offset LP (so every
    # VMEM store below is lane-aligned); the context gather compensates
    # with a static lane shift of LP - (P + M - advance).
    PADL = P + M - advance
    lcm = int(P * 128 // np.gcd(P, 128))
    LP = int(((PADL + lcm - 1) // lcm) * lcm)
    shift = LP - PADL
    Nb = xp_ref.shape[0] // P           # padded row count
    n_blk = (shift + nfft + P - 1) // P  # shifted slices per context row

    xp_ref[:] = jnp.zeros_like(xp_ref)
    xp_ref[pl.ds(LP, T)] = x_ref[0, 0]
    out_ref[:] = wa_ref[1, 0] * x_ref[:]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, nfft), 1)
    ctx_mask = (col < L).astype(jnp.float32)
    lam = (jax.lax.broadcasted_iota(jnp.int32, (N, P), 1)
           .astype(jnp.float32) * (1.0 / P))

    cre = cre_ref[0]
    cim = cim_ref[0]

    def stage(s, _):
        xq = xp_ref[:].reshape(Nb, P)
        parts = [xq[i:i + N, :] for i in range(n_blk)]
        ctx = jnp.concatenate(parts, axis=1)              # (N, n_blk*P)
        ctx = ctx[:, shift:shift + nfft] * ctx_mask

        Xre = jnp.dot(ctx, fre_ref[:],
                      preferred_element_type=jnp.float32)
        Xim = jnp.dot(ctx, fim_ref[:],
                      preferred_element_type=jnp.float32)
        Yre = Xre * cre - Xim * cim
        Yim = Xre * cim + Xim * cre
        U = (jnp.dot(Yre, gre_ref[:], preferred_element_type=jnp.float32)
             + jnp.dot(Yim, gim_ref[:],
                       preferred_element_type=jnp.float32))   # (N, 2P)

        lo = U[:, P:2 * P]
        hi_head = U[1:N, :P] if N > 1 else U[:0, :P]
        hi = jnp.concatenate([hi_head, U[N - 1:, P:2 * P]], axis=0)
        w_s = wa_ref[0, s]
        xnew = (lo * (1.0 - lam) + hi * lam) * w_s          # (N, P)

        out_ref[:] = out_ref[:] + wa_ref[1, s] * xnew.reshape(1, 1, T)
        xp_ref[pl.ds(LP, T)] = xnew.reshape(T)
        return 0

    jax.lax.fori_loop(1, n_stages + 1, stage, 0)


def _cascade_pallas(x, cspec, weights, a, P, M, advance, nfft,
                    interpret=False):
    """x (B, T) f32, cspec (B, N, K) complex -> y (B, T) f32."""
    B, T = x.shape
    N = T // P
    K = nfft // 2 + 1
    Kp, Qp = _pad128(K), _pad128(2 * P)
    S = weights.shape[0] - 1
    F_re, F_im, G_re, G_im = _dft_plan(nfft, M, P)
    # Scratch rows: the signal lives at a 128/P-aligned left offset LP
    # (mirrors the kernel's computation) and the gather reads up to
    # n_blk extra rows past the last frame.
    PADL = P + M - advance
    lcm = int(P * 128 // np.gcd(P, 128))
    LP = int(((PADL + lcm - 1) // lcm) * lcm)
    n_blk = ((LP - PADL) + nfft + P - 1) // P
    Nb = LP // P + N + n_blk
    # Round to a sublane multiple so the flat (Nb*P,) VMEM buffer is
    # lane-aligned (P*8 is a 128-multiple for the even P of this path).
    Nb = ((Nb + 7) // 8) * 8
    wa = jnp.stack([weights, a]).astype(jnp.float32)
    cre = jnp.real(cspec).astype(jnp.float32)
    cim = jnp.imag(cspec).astype(jnp.float32)
    pad = [(0, 0), (0, 0), (0, Kp - K)]
    cre = jnp.pad(cre, pad)
    cim = jnp.pad(cim, pad)

    kernel = functools.partial(
        _cascade_kernel, n_frames=N, P=P, M=M, advance=advance,
        n_stages=S, nfft=nfft)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # wa
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0)),   # x
            pl.BlockSpec((1, N, Kp), lambda b: (b, 0, 0)),  # cspec re
            pl.BlockSpec((1, N, Kp), lambda b: (b, 0, 0)),  # cspec im
            pl.BlockSpec((nfft, Kp), lambda b: (0, 0)),     # F_re
            pl.BlockSpec((nfft, Kp), lambda b: (0, 0)),     # F_im
            pl.BlockSpec((Kp, Qp), lambda b: (0, 0)),       # G_re
            pl.BlockSpec((Kp, Qp), lambda b: (0, 0)),       # G_im
        ],
        out_specs=pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 1, T), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Nb * P,), jnp.float32)],
        interpret=interpret,
    )(wa, x[:, None, :], cre, cim, F_re, F_im, G_re,
      G_im).reshape(B, T)


def _cascade_xla(x, c, weights, a, P, advance, nfft):
    """Reference XLA implementation (ops/zerodf.py path) for the
    backward pass and non-TPU platforms."""
    from ..kernels import mxu_fft
    from ..ops.zerodf import zerodf_fft

    c_spec = mxu_fft.rfft(c, nfft)
    y = x * a[0]
    for i in range(1, a.shape[0]):
        x = zerodf_fft(x, c, P, advance=advance, b_spec=c_spec,
                       nfft=nfft) * weights[i]
        y = y + x * a[i]
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def taylor_cascade(x, c, weights, a, P, advance, nfft):
    """Fused Taylor-cascade MLSA filter.

    x (..., T) f32; c (..., N, M+1) stage coefficients; weights/a (S+1,).
    Forward runs the VMEM-resident Pallas kernel on TPU (XLA fallback
    elsewhere); backward differentiates the XLA formulation.
    """
    return _taylor_cascade_fwd(x, c, weights, a, P, advance, nfft)[0]


def _taylor_cascade_fwd(x, c, weights, a, P, advance, nfft):
    from ..kernels import mxu_fft

    out_shape = x.shape
    if mxu_fft.use_mxu(x.dtype, nfft):
        M = c.shape[-1] - 1
        xb = x.reshape(-1, x.shape[-1])
        cb = jnp.broadcast_to(
            c, x.shape[:-1] + c.shape[-2:]).reshape(
                -1, c.shape[-2], c.shape[-1])
        cspec = mxu_fft.rfft(cb, nfft)
        y = _cascade_pallas(xb, cspec, weights, a, P, M, advance, nfft)
        y = y.reshape(out_shape)
    else:
        y = _cascade_xla(x, c, weights, a, P, advance, nfft)
    return y, (x, c, weights, a)


def _taylor_cascade_bwd(P, advance, nfft, res, g):
    x, c, weights, a = res
    _, vjp = jax.vjp(
        lambda x_, c_, w_, a_: _cascade_xla(x_, c_, w_, a_, P, advance,
                                            nfft),
        x, c, weights, a)
    return vjp(g)


taylor_cascade.defvjp(_taylor_cascade_fwd, _taylor_cascade_bwd)
