"""Folded-plan FIR filterbank application (static small filters).

XLA lowers a 1-D convolution with a handful of channels terribly on
TPU — the (1 -> K) channel dims pad to the 128-lane register tile, so a
4-band 48-tap PQMF conv runs ~100x off its FLOP roofline.  The same
folding used by the MLSA cascade (kernels/mlsa_cascade.py) applies: cut
the signal into non-overlapping S-sample rows and fold the filter taps
into n_blk static (S, K*S) matmul plans, so the whole filterbank is a
couple of MXU matmuls regardless of K.

y[..., k, t] = sum_m h[k, m] * x[..., t + m]   (cross-correlation,
"valid": t in [0, T), T = x.shape[-1] - taps + 1).  Callers pre-pad x
for whatever alignment they need, exactly as with lax.conv VALID.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax.lax import Precision

S = 128


@functools.lru_cache(maxsize=None)
def _fir_plans(h_key, dt_str: str, K: int, taps: int):
    """(n_blk, S, K*S) plans: Fr[u, k*S + v] = h[k, r*S + u - v]."""
    h = np.frombuffer(h_key, dtype=dt_str).reshape(K, taps).astype(
        np.float64)
    n_blk = -(-(S + taps - 1) // S)
    u = np.arange(S)
    v = np.arange(S)
    plans = np.zeros((n_blk, S, K * S))
    for r in range(n_blk):
        m = r * S + u[:, None] - v[None, :]          # (S, S)
        valid = (0 <= m) & (m < taps)
        mc = np.clip(m, 0, taps - 1)
        for k in range(K):
            plans[r, :, k * S:(k + 1) * S] = np.where(valid, h[k, mc], 0.0)
    return plans


def fir_correlate(x: jnp.ndarray, h: np.ndarray,
                  precision=Precision.HIGHEST) -> jnp.ndarray:
    """Apply a static (K, taps) FIR bank: (..., Tp) -> (..., K, Tp-taps+1).

    ``h`` must be a host-side numpy array (the plans are folded at trace
    time).  Matches lax.conv_general_dilated(padding="VALID") with OIH
    filters h[:, None, :] flipped to cross-correlation order.
    """
    h = np.asarray(h)
    K, taps = h.shape
    T = x.shape[-1] - taps + 1
    if T <= 0:
        raise ValueError("signal shorter than the filter")
    N = -(-T // S)
    plans = _fir_plans(np.ascontiguousarray(h).tobytes(), str(h.dtype),
                       K, taps)
    n_blk = plans.shape[0]
    rows = N + n_blk - 1
    pad = rows * S + taps - 1 - x.shape[-1]
    if pad > 0:
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        x = jnp.pad(x, cfg)
    xq = x[..., :rows * S].reshape(x.shape[:-1] + (rows, S))
    dt = x.dtype
    Y = None
    for r in range(n_blk):
        part = jnp.matmul(xq[..., r:r + N, :], jnp.asarray(plans[r], dt),
                          precision=precision)        # (..., N, K*S)
        Y = part if Y is None else Y + part
    Y = Y.reshape(Y.shape[:-1] + (K, S))              # (..., N, K, S)
    Y = jnp.moveaxis(Y, -2, -3)                       # (..., K, N, S)
    Y = Y.reshape(Y.shape[:-2] + (N * S,))
    return Y[..., :T]
