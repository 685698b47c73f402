"""Soft dynamic time warping with the SPTK local-path constraints
(reference: diffsptk/modules/dtw.py).

TPU-first redesign (SURVEY.md §7 step 8): the reference's Python double
loop over (T1, T2) becomes an anti-diagonal wavefront — one functional
update per diagonal, each fully vectorized over the diagonal and the batch.
Unreachable predecessors carry +inf and drop out of the soft-min
automatically (exp(-inf) = 0), so no per-cell branching is needed.
The Viterbi backtrace (non-differentiable) runs host-side in numpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseOp, Design, filter_values

_CONSTRAINTS = {
    0: ([(1, 0), (0, 1)], False),
    1: ([(1, 0), (0, 1), (1, 1)], False),
    2: ([(1, 0), (1, 1)], False),
    3: ([(1, 0), (1, 1), (1, 2)], False),
    4: ([(1, 0), (0, 1), (1, 1)], True),
    5: ([(1, 1), (1, 2), (2, 1)], False),
    6: ([(1, 0), (1, 1), (1, 2)], True),
}


def _make_dist(metric):
    if metric in (0, "manhattan"):
        return lambda x, y: jnp.sum(
            jnp.abs(x[..., :, None, :] - y[..., None, :, :]), axis=-1)
    if metric in (1, "euclidean"):
        return lambda x, y: jnp.sqrt(jnp.sum(
            jnp.square(x[..., :, None, :] - y[..., None, :, :]), axis=-1))
    if metric in (2, "squared-euclidean"):
        return lambda x, y: jnp.sum(
            jnp.square(x[..., :, None, :] - y[..., None, :, :]), axis=-1)
    if metric in (3, "symmetric-kl"):
        def skl(x, y):
            xx = x[..., :, None, :]
            yy = y[..., None, :, :]
            return jnp.sum((xx - yy) * (jnp.log(xx) - jnp.log(yy)), axis=-1)
        return skl
    raise ValueError(f"metric {metric} is not supported.")


def _softmin(values, gamma):
    """-gamma * logsumexp(-v / gamma) over a list; +inf entries vanish.

    Cells whose candidates are ALL +inf (unreachable under one-sided
    constraint sets, e.g. row/column 0 for p in {2, 3, 5}) must not reach
    logsumexp: its backward pass forms softmax weights 0/0 = NaN there,
    and NaN survives multiplication by the zero cotangent, poisoning the
    whole gradient.  Double-where: substitute a safe value, restore +inf.
    """
    v = jnp.stack(values, axis=0)
    all_inf = jnp.all(jnp.isinf(v), axis=0)
    v_safe = jnp.where(all_inf[None], 0.0, v)
    r = -gamma * jax.scipy.special.logsumexp(-v_safe / gamma, axis=0)
    return jnp.where(all_inf, jnp.inf, r)


def _soft_dtw_distance(D, steps, two_step, gamma):
    """Wavefront forward pass -> full R (and R_) matrices."""
    B, T1, T2 = D.shape
    inf = jnp.inf
    R = jnp.full((B, T1, T2), inf, D.dtype).at[:, 0, 0].set(D[:, 0, 0])
    R_ = jnp.full((B, T1, T2), inf, D.dtype) if two_step else None

    max_step = max(max(s) for s in steps)
    for d in range(1, T1 + T2 - 1):
        # cells on this anti-diagonal
        i_lo = max(0, d - (T2 - 1))
        i_hi = min(T1 - 1, d)
        ii = np.arange(i_lo, i_hi + 1)
        jj = d - ii
        dcell = D[:, ii, jj]                      # (B, n)

        cands, cands_ = [], []
        for (si, sj) in steps:
            pi, pj = ii - si, jj - sj
            ok = (pi >= 0) & (pj >= 0)
            pi_c = np.clip(pi, 0, T1 - 1)
            pj_c = np.clip(pj, 0, T2 - 1)
            w = si + sj
            src = R_ if (two_step and (si == 0 or sj == 0)) else R
            prev = src[:, pi_c, pj_c]
            prev = jnp.where(jnp.asarray(ok), prev, inf)
            val = dcell * w + prev
            cands.append(val)
            if two_step and not (si == 0 or sj == 0):
                cands_.append(val)

        r = _softmin(cands, gamma)
        # keep the origin cell fixed
        R = R.at[:, ii, jj].set(r)
        if two_step:
            r_ = _softmin(cands_, gamma) if cands_ else jnp.full_like(r, inf)
            R_ = R_.at[:, ii, jj].set(r_)
    return R, R_


def _viterbi_np(D, lengths, steps, two_step):
    """Hard-DTW backtrace in numpy (indices path; non-differentiable)."""
    B, T1, T2 = D.shape
    inf = np.inf
    R = np.full((B, T1, T2), inf)
    R_ = np.full((B, T1, T2), inf)
    P = np.full((B, T1, T2, 2), -1, dtype=np.int64)
    P_ = np.full((B, T1, T2, 2), -1, dtype=np.int64)
    R[:, 0, 0] = D[:, 0, 0]
    for i in range(T1):
        for j in range(T2):
            if i == 0 and j == 0:
                continue
            best, best_p = np.full(B, inf), np.full((B, 2), -1, np.int64)
            best_, best_p_ = np.full(B, inf), np.full((B, 2), -1, np.int64)
            for (si, sj) in steps:
                pi, pj = i - si, j - sj
                if pi < 0 or pj < 0:
                    continue
                w = si + sj
                src = R_ if (two_step and (si == 0 or sj == 0)) else R
                val = D[:, i, j] * w + src[:, pi, pj]
                upd = val < best
                best = np.where(upd, val, best)
                best_p[upd] = [pi, pj]
                if two_step and not (si == 0 or sj == 0):
                    upd_ = val < best_
                    best_ = np.where(upd_, val, best_)
                    best_p_[upd_] = [pi, pj]
            R[:, i, j] = best
            P[:, i, j] = best_p
            if two_step:
                R_[:, i, j] = best_
                P_[:, i, j] = best_p_

    paths = []
    for b in range(B):
        two = False
        ij = np.asarray(lengths[b]) - 1
        path = [ij]
        while (0 <= ij).all():
            prev = (P_ if (two_step and two) else P)[b, ij[0], ij[1]]
            if (0 <= prev).all():
                path.append(prev)
            two = bool((prev == ij).any())
            ij = prev
        paths.append(np.stack(path[::-1], axis=0))
    return paths


class DynamicTimeWarping(BaseOp):
    """Soft-DTW distance (and optional Viterbi path) between sequences.

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> dtw = diffsptk_tpu.DTW(p=1)
    >>> d = dtw(jnp.asarray([[0.0], [1.0], [2.0]]),
    ...         jnp.asarray([[0.0], [2.0]]))
    >>> np.round(np.asarray(d), 3)
    array([0.2])
    """

    _input_names = ("x", "y", "lengths", "return_indices")

    def __init__(self, metric: str | int = "euclidean", p: int = 4,
                 softness: float = 1e-3) -> None:
        self._setup(self._design(**filter_values(locals())))

    @staticmethod
    def _check(softness: float, p: int) -> None:
        if softness <= 0:
            raise ValueError("softness must be positive.")
        if p not in _CONSTRAINTS:
            raise ValueError(f"local path constraint {p} is not supported.")

    @staticmethod
    def _design(metric: str | int = "euclidean", p: int = 4,
                softness: float = 1e-3) -> Design:
        DynamicTimeWarping._check(softness, p)
        steps, two_step = _CONSTRAINTS[p]
        return Design(values={"steps": steps, "two_step": two_step,
                              "softness": softness,
                              "dist_func": _make_dist(metric)})

    @staticmethod
    def _forward(x, y, lengths=None, return_indices: bool = False, *,
                 steps, two_step, softness, dist_func):
        if x.ndim == 1:
            x = x.reshape(1, -1, 1)
            y = y.reshape(1, -1, 1)
        elif x.ndim == 2:
            x = x[None]
            y = y[None]
        if x.ndim != 3 or y.ndim != 3:
            raise ValueError("x and y must be 1D, 2D, or 3D tensors.")

        D = dist_func(x, y)
        B, T1, T2 = D.shape
        if lengths is None:
            lengths = np.tile([[T1, T2]], (B, 1))
        lengths = np.asarray(lengths)

        R, _ = _soft_dtw_distance(D, steps, two_step, softness)
        dist = R[np.arange(B), lengths[:, 0] - 1, lengths[:, 1] - 1]
        dist = dist / jnp.asarray(lengths.sum(axis=1), dist.dtype)

        if return_indices:
            paths = _viterbi_np(np.asarray(jax.device_get(D)), lengths,
                                steps, two_step)
            return dist, [jnp.asarray(p) for p in paths]
        return dist

    def __call__(self, x, y, lengths=None, return_indices=False):
        return self.apply(self.params, x, y, lengths, return_indices)

    @staticmethod
    def merge(x, y, indices):
        """Join aligned pairs along the Viterbi path."""
        if x.ndim != y.ndim:
            raise ValueError("x and y must have the same rank.")
        xe = x[indices[:, 0]]
        ye = y[indices[:, 1]]
        if x.ndim == 1:
            return jnp.stack([xe, ye], axis=-1)
        return jnp.concatenate([xe, ye], axis=-1)
