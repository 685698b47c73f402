"""Real FFTs as MXU matmuls (Cooley-Tukey, two stages).

XLA's TPU FFT runs ~0.5 ms per batched 512-point rfft on v5e — well off
the matmul units' speed.  For the power-of-two sizes the MLSA cascade
and the cepstral solvers use, a two-stage Cooley-Tukey factorization
with a 128-deep first stage runs the same transform ~2x faster as MXU
matmuls at Precision.HIGHEST (f32-equivalent accumulation, max error
~3e-7 relative at nfft=512).

Real transforms use the standard even/odd complex packing: an
nfft-point rfft is an (nfft/2)-point complex FFT plus an O(n) unpack.
Dispatch helper ``use_mxu`` gates on TPU + float32; other
platforms/dtypes keep ``jnp.fft``.

Replaces the role of cuFFT in the reference's hot loops
(diffsptk/modules/mglsadf.py:378-381 stage filters, mcep.py:209-222
Newton iterations).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.lax import Precision

_PRECISION = Precision.HIGHEST
_MIN_N, _MAX_N = 64, 16384


@functools.lru_cache(maxsize=None)
def _plan_host(nfft: int):
    """Host-side constants for the packed complex FFT of length
    n = nfft/2, stored as float32 re/im pairs: complex64 host->device
    transfers are UNIMPLEMENTED on the axon tunnel backend, and XLA
    device_puts (rather than inlines) constants of this size."""
    n = nfft // 2
    n1 = min(128, n)
    n2 = n // n1
    t1, t2 = np.arange(n1), np.arange(n2)
    W1 = np.exp(-2j * np.pi * np.outer(t1, t1) / n1)
    W2 = np.exp(-2j * np.pi * np.outer(t2, t2) / n2)
    Tw = np.exp(-2j * np.pi * np.outer(t1, t2) / n)
    k = np.arange(n + 1)
    Wr = np.exp(-2j * np.pi * k / nfft)

    def ri(a):
        return (a.real.astype(np.float32), a.imag.astype(np.float32))

    return n, n1, n2, ri(W1), ri(W2), ri(Tw), ri(Wr)


def _cplx(pair) -> jnp.ndarray:
    """Form the complex64 constant on device from its f32 re/im pair."""
    return jax.lax.complex(jnp.asarray(pair[0]), jnp.asarray(pair[1]))


def _plan(nfft: int):
    n, n1, n2, w1, w2, tw, wr = _plan_host(nfft)
    return n, n1, n2, _cplx(w1), _cplx(w2), _cplx(tw), _cplx(wr)


def _cfft(z: jnp.ndarray, nfft: int, inverse: bool) -> jnp.ndarray:
    """Length-n complex FFT of (..., n) via two matmul stages."""
    n, n1, n2, W1, W2, Tw, _ = _plan(nfft)
    # keep the transform out of its producers' fusions: the axon
    # backend miscompiles certain producer+matmul fusions of this
    # pattern (observed: batch-width-dependent garbage in the WORLD
    # synthesis graph at B=8; each piece is bit-correct in isolation)
    z = jax.lax.optimization_barrier(z)
    if inverse:
        W1, W2, Tw = jnp.conj(W1), jnp.conj(W2), jnp.conj(Tw)
    batch = z.shape[:-1]
    zr = z.reshape(-1, n1, n2)                 # z[t], t = n2*t1 + t2
    A = jnp.einsum("kt,rts->rks", W1, zr, precision=_PRECISION)
    B = A * Tw
    if n2 == 1:
        Z = B[..., 0]
    elif n2 == 2:
        Z = jnp.concatenate([B[..., 0] + B[..., 1],
                             B[..., 0] - B[..., 1]], -1)
    else:
        Xr = jnp.einsum("rks,sl->rkl", B, W2, precision=_PRECISION)
        Z = jnp.swapaxes(Xr, -2, -1).reshape(-1, n)   # k = k1 + n1*k2
    if inverse:
        Z = Z * (1.0 / n)
    return Z.reshape(*batch, n)


def rfft_mxu(x: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """(..., L) real, L <= nfft -> (..., nfft//2 + 1) complex64."""
    n, _, _, _, _, _, Wr = _plan(nfft)
    L = x.shape[-1]
    if L < nfft:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, nfft - L)])
    # even/odd split via reshape (a stride-2 lane slice miscompiles in
    # some fusion contexts on the axon backend)
    xr = x.reshape(*x.shape[:-1], n, 2)
    z = jax.lax.complex(xr[..., 0], xr[..., 1])
    Z = _cfft(z, nfft, inverse=False)
    Zf = jnp.concatenate([Z, Z[..., :1]], -1)          # Z[n] = Z[0]
    Zc = jnp.conj(jnp.flip(Zf, -1))                    # conj(Z[n-k])
    E = (Zf + Zc) * 0.5
    O = (Zf - Zc) * (-0.5j)
    return E + Wr * O


def irfft_mxu(X: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """(..., nfft//2 + 1) complex -> (..., nfft) real."""
    n, _, _, _, _, _, Wr = _plan(nfft)
    # rfft-format semantics (numpy/XLA): the DC and Nyquist bins are
    # real by definition — their imaginary parts are discarded.  The
    # WORLD synthesis feeds phase-shifted spectra whose Nyquist bin is
    # complex, so skipping this produces O(Im X[n] / n) errors.
    ends = np.zeros(n + 1, np.float32)
    ends[0] = ends[n] = 1.0
    X = jnp.where(ends.astype(bool), jnp.real(X).astype(X.dtype), X)
    Xc = jnp.conj(jnp.flip(X, -1))                     # conj(X[n-k])
    E = (X + Xc) * 0.5
    O = (X - Xc) * 0.5 * jnp.conj(Wr)
    Z = (E + 1j * O)[..., :n]
    z = _cfft(Z, nfft, inverse=True)
    out = jnp.stack([jnp.real(z), jnp.imag(z)], -1)    # interleave even/odd
    return out.reshape(*X.shape[:-1], nfft)


@functools.lru_cache(maxsize=None)
def _cos_plan(nfft: int):
    H = nfft // 2
    t = np.arange(H + 1)
    C = np.cos(2 * np.pi * np.outer(t, t) / nfft).astype(np.float32)
    w = np.ones(H + 1, np.float32)
    w[1:H] = 2.0
    return C, (C * w[:, None] / nfft).astype(np.float32)


def rfft_real(c: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """Re(rfft(c, nfft)) for real c with len <= nfft/2+1: one cosine
    matmul on the MXU (the mcep Newton loop needs only the real part;
    reference mcep.py:211)."""
    H = nfft // 2
    if not use_mxu(c.dtype, nfft, c):
        return jnp.fft.rfft(c, n=nfft).real
    C, _ = _cos_plan(nfft)
    L = c.shape[-1]
    return jnp.einsum("...t,tk->...k", c, C[:L],
                      precision=_PRECISION)


def irfft_real(d: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """First nfft/2+1 samples of irfft(d, nfft) for a REAL spectrum d
    (even sequence): one cosine matmul on the MXU."""
    H = nfft // 2
    if not use_mxu(d.dtype, nfft, d):
        return jnp.fft.irfft(d, n=nfft)[..., :H + 1]
    _, Ci = _cos_plan(nfft)
    return jnp.einsum("...k,kt->...t", d, Ci, precision=_PRECISION)


def hfft_real(a: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """First nfft/2+1 samples of hfft(a) for REAL a (..., nfft/2+1):
    the even-sequence FFT is a cosine matmul, = nfft * irfft_real."""
    if not use_mxu(a.dtype, nfft, a):
        H = nfft // 2
        return jnp.fft.hfft(a, n=nfft)[..., :H + 1]
    return irfft_real(a, nfft) * nfft


def use_mxu(dtype, nfft: int, arr=None) -> bool:
    if not (_MIN_N <= nfft <= _MAX_N and (nfft & (nfft - 1)) == 0):
        return False
    if dtype not in (jnp.float32, jnp.complex64):
        return False
    if arr is not None and not isinstance(arr, jax.core.Tracer):
        # eager complex binops are UNIMPLEMENTED on the axon tunnel
        # backend (each op dispatches with complex operands crossing
        # the runtime boundary); the matmul path is for jitted graphs —
        # eager callers keep jnp.fft
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def hfft(a: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """FFT of the hermitian-symmetric signal whose half-spectrum is
    ``a`` (..., nfft/2+1) -> (..., nfft) real; equals
    irfft(conj(a)) * nfft."""
    if use_mxu(a.dtype, nfft, a):
        return irfft_mxu(jnp.conj(a), nfft) * nfft
    return jnp.fft.hfft(a, n=nfft)


def rfft(x: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """rfft with automatic MXU dispatch (TPU float32)."""
    if use_mxu(x.dtype, nfft, x):
        return rfft_mxu(x, nfft)
    return jnp.fft.rfft(x, n=nfft)


def irfft(X: jnp.ndarray, nfft: int) -> jnp.ndarray:
    """irfft with automatic MXU dispatch (TPU complex64)."""
    if use_mxu(X.dtype, nfft, X):
        return irfft_mxu(X, nfft)
    return jnp.fft.irfft(X, n=nfft)
