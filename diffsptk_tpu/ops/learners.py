"""Data-driven learners: GMM, LBG, PCA, ICA, NMF
(reference: diffsptk/modules/{gmm,lbg,pca,ica,nmf}.py).

Design: each learner's inner step (E-step posteriors, Lloyd assignment,
multiplicative update) is a jitted pure function; the convergence loop runs
on host.  Streaming replaces the reference's DataLoader plumbing
(diffsptk/utils/private.py:167-181): every per-iteration reduction is a
plain sum of per-chunk sufficient statistics, so ``batch_size=`` chunks a
large array (or the input may already be a list/iterator of arrays — the
JAX-native DataLoader analog) and the accumulators are identical to the
full-batch result up to float summation order.  The same statistics are
psum-friendly, which is what ``parallel.DataParallelGMM`` exploits.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseLearnerOp, default_dtype
from .vq import VectorQuantization


def as_chunks(x, batch_size):
    """Normalize learner input to a list of 2D array chunks.

    ``x`` may be a single array (optionally chunked into ``batch_size``
    rows), or any iterable of arrays (already-batched data larger than a
    single array).  Mirrors the contract of the reference's
    ``to_dataloader`` (diffsptk/utils/private.py:167-181).
    """
    if isinstance(x, (jnp.ndarray, np.ndarray)):
        x = jnp.asarray(x)
        if batch_size is None:
            return [x]
        return [x[i:i + batch_size] for i in range(0, x.shape[0],
                                                   batch_size)]
    chunks = [jnp.asarray(c) for c in x]
    if not chunks:
        raise ValueError("Input data is empty.")
    return chunks


class GaussianMixtureModeling(BaseLearnerOp):
    """Batched EM with diag/full/block covariance and UBM-MAP smoothing.

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> rng = np.random.default_rng(0)
    >>> x = jnp.asarray(np.concatenate([rng.normal(-3, 0.4, (100, 2)),
    ...                                 rng.normal(+3, 0.4, (100, 2))]))
    >>> gmm = diffsptk_tpu.GMM(1, 2, n_iter=20, seed=0)
    >>> (w, mu, sigma), ll = gmm(x)
    >>> np.round(np.sort(np.asarray(mu).ravel()), 1)
    array([-3. , -3. ,  2.9,  3. ])
    """

    def __init__(self, order: int, n_mixture: int, *, n_iter: int = 100,
                 eps: float = 1e-5, weight_floor: float = 1e-5,
                 var_floor: float = 1e-6, var_type: str = "diag",
                 block_size=None, ubm=None, alpha: float = 0,
                 batch_size=None, verbose=False, seed: int = 0,
                 dtype=None) -> None:
        if order < 0:
            raise ValueError("order must be non-negative.")
        if n_mixture <= 0:
            raise ValueError("n_mixture must be positive.")
        if n_iter <= 0:
            raise ValueError("n_iter must be positive.")
        if eps < 0:
            raise ValueError("eps must be non-negative.")
        if not 0 <= weight_floor <= 1 / n_mixture:
            raise ValueError("weight_floor must be in [0, 1 / K].")
        if var_floor < 0:
            raise ValueError("var_floor must be non-negative.")
        if not 0 <= alpha <= 1:
            raise ValueError("alpha must be in [0, 1].")
        if alpha != 0 and ubm is None:
            raise ValueError("ubm must be provided when alpha is not 0.")

        if batch_size is not None and batch_size <= 0:
            raise ValueError("batch_size must be positive.")
        self.order = order
        self.n_mixture = n_mixture
        self.n_iter = n_iter
        self.eps = eps
        self.weight_floor = weight_floor
        self.var_floor = var_floor
        self.alpha = alpha
        self.batch_size = batch_size

        L = order + 1
        if block_size is None:
            block_size = [L]
        block_size = list(block_size)
        if sum(block_size) != L:
            raise ValueError("The sum of block_size must be order + 1.")
        if not all(0 < b for b in block_size):
            raise ValueError("All elements of block_size must be positive.")
        self.is_diag = var_type == "diag" and len(block_size) == 1

        mask = np.zeros((L, L))
        cumsum = np.cumsum(np.insert(block_size, 0, 0))
        for b1, s1, e1 in zip(block_size, cumsum[:-1], cumsum[1:]):
            if var_type == "diag":
                for b2, s2, e2 in zip(block_size, cumsum[:-1], cumsum[1:]):
                    if b1 == b2:
                        mask[s1:e1, s2:e2] = np.eye(b1)
            elif var_type == "full":
                mask[s1:e1, s1:e1] = 1
            else:
                raise ValueError(f"var_type {var_type} is not supported.")
        dtype = dtype or default_dtype()
        self.mask = jnp.asarray(mask, dtype)

        K = n_mixture
        self.w = jnp.ones(K, dtype) / K
        self.mu = jax.random.normal(jax.random.PRNGKey(seed), (K, L), dtype)
        self.sigma = jnp.tile(jnp.eye(L, dtype=dtype), (K, 1, 1))

        if ubm is not None:
            self.set_params(ubm)
            self.ubm_w = jnp.asarray(ubm[0], dtype)
            self.ubm_mu = jnp.asarray(ubm[1], dtype)
            self.ubm_sigma = jnp.asarray(ubm[2], dtype)

    def set_params(self, params) -> None:
        w, mu, sigma = params
        if w is not None:
            self.w = jnp.asarray(w, self.w.dtype)
        if mu is not None:
            self.mu = jnp.asarray(mu, self.mu.dtype)
        if sigma is not None:
            self.sigma = jnp.asarray(sigma, self.sigma.dtype)

    def warmup(self, x, **lbg_params) -> None:
        """Initialize the mean vectors by LBG clustering."""
        chunks = as_chunks(x, self.batch_size)
        lbg_params.setdefault("batch_size", self.batch_size)
        lbg = LindeBuzoGrayAlgorithm(self.order, self.n_mixture,
                                     **lbg_params)
        codebook, indices, _ = lbg(chunks, return_indices=True)
        K, L = codebook.shape
        counts = jnp.zeros(K).at[indices].add(1.0)
        mu = codebook
        var = jnp.zeros((K, L))
        t1 = 0
        for c in chunks:
            t2 = t1 + c.shape[0]
            idx = indices[t1:t2]
            diff = c - mu[idx]
            var = var.at[idx].add(diff * diff)
            t1 = t2
        var = var / jnp.maximum(counts, 1)[:, None]
        self.w = counts / t1
        self.mu = mu
        self.sigma = (jax.vmap(jnp.diag)(var)
                      * self.mask + (1 - self.mask) * 0.0).astype(
                          self.sigma.dtype)

    def _e_step(self, x, reduction: str = "sum", in_order=None,
                params=None):
        w, mu_full, sigma_full = (params if params is not None
                                  else (self.w, self.mu, self.sigma))
        if in_order is None:
            L = self.order + 1
            mu, sigma = mu_full, sigma_full
        else:
            L = in_order + 1
            mu, sigma = mu_full[:, :L], sigma_full[:, :L, :L]
        log_pi = L * math.log(2 * math.pi)
        if self.is_diag:
            diag = jnp.diagonal(sigma, axis1=-2, axis2=-1)
            log_det = jnp.sum(jnp.log(diag), axis=-1)
            precision = 1.0 / diag
            diff = x[:, None, :] - mu[None, :, :]
            mahala = jnp.sum(diff * diff * precision, axis=-1)
        else:
            col = jnp.linalg.cholesky(sigma)
            log_det = 2 * jnp.sum(
                jnp.log(jnp.diagonal(col, axis1=-2, axis2=-1)), axis=-1)
            diff = x[:, None, :] - mu[None, :, :]
            # mahala = ||col^-1 diff||^2 via one triangular solve per
            # component — no explicit inverse
            z = jax.scipy.linalg.solve_triangular(
                col, jnp.moveaxis(diff, 0, -1), lower=True)   # (K, L, B)
            mahala = jnp.moveaxis(jnp.sum(z * z, axis=-2), -1, 0)
        numer = jnp.log(w) - 0.5 * (log_pi + log_det + mahala)
        denom = jax.scipy.special.logsumexp(numer, axis=-1, keepdims=True)
        posterior = jnp.exp(numer - denom)
        if reduction == "none":
            ll = denom[..., 0]
        elif reduction == "sum":
            ll = jnp.sum(denom)
        else:
            raise ValueError(f"reduction {reduction} is not supported.")
        return posterior, ll

    def _accum_stats(self, params, x):
        """Per-chunk E-step sufficient statistics: (Σγ, Σγx, Σγxx, ll).

        Plain sums over the data axis, so streaming chunks and a mesh
        batch axis are the same reduction: under jit with ``x`` sharded,
        GSPMD compiles them to psums — data-parallel EM with no further
        code (reference streams the same sums per DataLoader batch,
        gmm.py:322-358).
        """
        posterior, ll = self._e_step(x, params=params)
        z = jnp.sum(posterior, axis=0)
        px = posterior.T @ x
        if self.is_diag:
            pxx = posterior.T @ (x * x)
        else:
            pxx = jnp.einsum("bk,bl,bm->klm", posterior, x, x)
        return z, px, pxx, ll

    def _m_step(self, stats, T):
        """Closed-form M-step from accumulated statistics."""
        y, px, pxx, ll = stats

        if self.alpha == 0:
            z = y
            w = z / T
        else:
            xi = self.ubm_w * self.alpha
            z = y + xi
            w = z / (T + self.alpha)
        zinv = 1.0 / z
        w = jnp.clip(w, min=self.weight_floor)
        sum_floor = self.weight_floor * self.n_mixture
        a = (1 - sum_floor) / (jnp.sum(w) - sum_floor)
        b = self.weight_floor * (1 - a)
        w = a * w + b

        if self.alpha == 0:
            mu = px * zinv[:, None]
        else:
            mu = (px + xi[:, None] * self.ubm_mu) * zinv[:, None]

        if self.is_diag:
            mm = mu ** 2
            if self.alpha == 0:
                sig = pxx * zinv[:, None] - mm
            else:
                nu = px / y[:, None]
                nm = nu * mu
                aa = pxx - y[:, None] * (2 * nm - mm)
                aa = jnp.nan_to_num(aa, nan=0.0, posinf=0.0, neginf=0.0)
                bb = xi[:, None] * jnp.diagonal(self.ubm_sigma,
                                                axis1=-2, axis2=-1)
                cc = xi[:, None] * (self.ubm_mu - mu) ** 2
                sig = (aa + bb + cc) * zinv[:, None]
            sig = jnp.clip(sig, min=self.var_floor)
            sigma = jax.vmap(jnp.diag)(sig)
        else:
            mm = jnp.einsum("kl,km->klm", mu, mu)
            if self.alpha == 0:
                sig = pxx * zinv[:, None, None] - mm
            else:
                nu = px / y[:, None]
                nm = jnp.einsum("kl,km->klm", nu, mu)
                mn = jnp.swapaxes(nm, -2, -1)
                aa = pxx - y[:, None, None] * (nm + mn - mm)
                aa = jnp.nan_to_num(aa, nan=0.0, posinf=0.0, neginf=0.0)
                bb = xi[:, None, None] * self.ubm_sigma
                cc = xi[:, None, None] * jnp.einsum(
                    "kl,km->klm", self.ubm_mu - mu, self.ubm_mu - mu)
                sig = (aa + bb + cc) * zinv[:, None, None]
            sig = sig * self.mask
            d = jnp.clip(jnp.diagonal(sig, axis1=-2, axis2=-1),
                         min=self.var_floor)
            L = sig.shape[-1]
            eye = jnp.eye(L, dtype=bool)
            sig = jnp.where(eye, d[..., None, :] * jnp.eye(L), sig)
            sigma = sig

        return (w, mu, sigma), ll

    def _em_update(self, params, x):
        """One full-batch EM iteration as a pure function of (params, x)."""
        return self._m_step(self._accum_stats(params, x),
                            jnp.asarray(x.shape[0], x.dtype))

    def __call__(self, x, return_posterior: bool = False,
                 callback=None):
        """Fit by EM.  ``callback(iteration=, log_likelihood=, change=,
        params=)`` runs once per iteration; returning False stops the
        loop cleanly (checkpoint/metrics hook, utils/metrics.py).  The
        fit continues from the current parameters, so a preempted run
        resumes by reloading them (``set_params``) and calling again."""
        chunks = as_chunks(x, self.batch_size)
        T = sum(c.shape[0] for c in chunks)
        if not hasattr(self, "_em_jit"):
            self._em_jit = jax.jit(self._em_update)
            self._accum_jit = jax.jit(self._accum_stats)
            self._m_jit = jax.jit(self._m_step)
        params = (self.w, self.mu, self.sigma)
        prev_ll = -np.inf
        ll = jnp.asarray(-np.inf)
        for n in range(self.n_iter):
            if len(chunks) == 1:
                new_params, ll = self._em_jit(params, chunks[0])
            else:
                stats = self._accum_jit(params, chunks[0])
                for c in chunks[1:]:
                    stats = jax.tree.map(
                        jnp.add, stats, self._accum_jit(params, c))
                new_params, ll = self._m_jit(
                    stats, jnp.asarray(float(T), chunks[0].dtype))
            change = float(ll) - prev_ll
            # ll is evaluated at the pre-update parameters, matching the
            # reference's convergence bookkeeping (gmm.py:376-392).
            params = new_params
            if callback is not None and callback(
                    iteration=n, log_likelihood=float(ll) / T,
                    change=change, params=params) is False:
                break
            if n and change < self.eps:
                break
            prev_ll = float(ll)
        self.w, self.mu, self.sigma = params

        params = (self.w, self.mu, self.sigma)
        if return_posterior:
            posterior = jnp.concatenate(
                [self._e_step(c)[0] for c in chunks], axis=0)
            return params, posterior, ll
        return params, ll

    def transform(self, x):
        N = x.shape[-1] - 1
        posterior, log_prob = self._e_step(x, reduction="none", in_order=N)
        indices = jnp.argmax(posterior, axis=-1)
        if self.order == N:
            return None, indices, log_prob
        L = N + 1
        sigma_yx = self.sigma[:, L:, :L]
        sigma_xx = self.sigma[:, :L, :L]
        # syx = sigma_yx sigma_xx^-1 without forming the inverse:
        # solve sigma_xx syxᵀ = sigma_xyᵀ (sigma_xx is SPD)
        syx = jnp.swapaxes(
            jnp.linalg.solve(sigma_xx, jnp.swapaxes(sigma_yx, -2, -1)),
            -2, -1)
        mu_x = self.mu[indices, :L]
        mu_y = self.mu[indices, L:]
        diff = (x - mu_x)[..., None]
        E = mu_y + (syx[indices] @ diff)[..., 0]
        return E, indices, log_prob


class LindeBuzoGrayAlgorithm(BaseLearnerOp):
    """Codebook training by binary splitting + Lloyd iterations."""

    def __init__(self, order: int, codebook_size: int, *,
                 min_data_per_cluster: int = 1, n_iter: int = 100,
                 eps: float = 1e-10, perturb_factor: float = 1e-5,
                 init="mean", metric: str = "none", batch_size=None,
                 seed: int = 0, verbose=False, dtype=None) -> None:
        if codebook_size <= 0:
            raise ValueError("codebook_size must be positive.")
        if min_data_per_cluster <= 0:
            raise ValueError("min_data_per_cluster must be positive.")
        if n_iter <= 0:
            raise ValueError("n_iter must be positive.")
        if eps < 0:
            raise ValueError("eps must be non-negative.")
        if perturb_factor <= 0:
            raise ValueError("perturb_factor must be positive.")
        if batch_size is not None and batch_size <= 0:
            raise ValueError("batch_size must be positive.")
        self.order = order
        self.codebook_size = codebook_size
        self.min_data_per_cluster = min_data_per_cluster
        self.n_iter = n_iter
        self.eps = eps
        self.perturb_factor = perturb_factor
        self.metric = metric
        self.batch_size = batch_size
        self.key = jax.random.PRNGKey(seed)

        self.vq = VectorQuantization(order, codebook_size, seed=seed,
                                     dtype=dtype)
        if isinstance(init, (np.ndarray, jnp.ndarray)):
            given = init.shape[0]
            c = codebook_size
            while c % 2 == 0 and c != given:
                c //= 2
            if c != given:
                raise ValueError(
                    "Codebook size must be a power-of-two multiple of the "
                    "initial codebook size.")
            self.curr_codebook_size = given
            self.init = "none"
            self.vq.codebook = self.vq.codebook.at[:given].set(
                jnp.asarray(init))
        else:
            c = codebook_size
            while c % 2 == 0:
                c //= 2
            self.curr_codebook_size = c
            self.init = init

    def _rand(self, shape, dtype):
        self.key, sub = jax.random.split(self.key)
        return jax.random.normal(sub, shape, dtype)

    def __call__(self, x, return_indices: bool = False, callback=None):
        chunks = as_chunks(x, self.batch_size)
        if chunks[0].ndim != 2:
            raise ValueError("Input vectors must be 2D.")
        T = sum(c.shape[0] for c in chunks)
        L = chunks[0].shape[1]

        if self.init == "mean":
            # Streaming mean over chunks (reference: lbg.py init loop).
            mean = sum(jnp.sum(c, axis=0) for c in chunks) / T
            self.vq.codebook = self.vq.codebook.at[0].set(mean)
        elif self.init != "none":
            raise ValueError(f"init {self.init} is not supported.")
        self.vq.codebook = self.vq.codebook.at[
            self.curr_codebook_size:].set(1e10)

        def e_step(K=None):
            """Assignment pass: per-chunk indices, mean distance, and
            (when K is given) per-cluster counts + centroid sums —
            chunk sums are exactly the full-batch reductions."""
            sq = 0.0
            idx_chunks = []
            n_data = None if K is None else jnp.zeros(K)
            csum = None if K is None else jnp.zeros((K, L),
                                                    chunks[0].dtype)
            for c in chunks:
                xq, indices, _ = self.vq(c)
                sq = sq + jnp.sum(jnp.square(c - xq))
                idx_chunks.append(indices)
                if K is not None:
                    n_data = n_data.at[indices].add(1.0)
                    csum = csum.at[indices].add(c)
            return idx_chunks, float(sq) / T, n_data, csum

        distance = np.inf
        stopped = False
        while not stopped:
            next_size = self.curr_codebook_size * 2
            if next_size <= self.codebook_size:
                cb = self.vq.codebook[: self.curr_codebook_size]
                r = self._rand(cb.shape, cb.dtype) * self.perturb_factor
                self.vq.codebook = self.vq.codebook.at[
                    self.curr_codebook_size:next_size].set(cb - r)
                self.vq.codebook = self.vq.codebook.at[
                    : self.curr_codebook_size].set(cb + r)
                self.curr_codebook_size = next_size

            prev_distance = distance
            for n in range(self.n_iter):
                K = self.curr_codebook_size
                _, distance, n_data, centroids = e_step(K)
                if callback is not None and callback(
                        iteration=n, codebook_size=K, distance=distance,
                        params=self.vq.codebook[:K]) is False:
                    stopped = True      # cooperative stop: no further
                    break               # splits either
                if n and abs(prev_distance - distance) \
                        / (distance + 1e-16) < self.eps:
                    break
                prev_distance = distance

                mask = self.min_data_per_cluster <= n_data
                centroids = jnp.where(mask[:, None],
                                      centroids
                                      / jnp.maximum(n_data, 1)[:, None],
                                      centroids)
                if bool(jnp.any(~mask)):
                    m = int(jnp.argmax(n_data))
                    n_bad = int(jnp.sum(~mask))
                    r = self._rand((n_bad, L), centroids.dtype) \
                        * self.perturb_factor
                    bad_idx = jnp.where(~mask, size=n_bad)[0]
                    centroids = centroids.at[bad_idx].set(
                        centroids[m] - r)
                    centroids = centroids.at[m].add(jnp.mean(r, axis=0))
                self.vq.codebook = self.vq.codebook.at[:K].set(centroids)

            if self.curr_codebook_size == self.codebook_size:
                break

        ret = [self.vq.codebook]
        if return_indices:
            idx_chunks, _, _, _ = e_step()
            ret.append(jnp.concatenate(idx_chunks, axis=0))
        ret.append(jnp.asarray(distance))
        return ret

    def transform(self, x):
        xq, indices, _ = self.vq(x)
        return xq, indices


class PrincipalComponentAnalysis(BaseLearnerOp):
    """PCA by eigendecomposition of the sample/unbiased covariance;
    transform() projects onto the top components (reference: pca.py)."""

    def __init__(self, order: int, n_comp: int, *,
                 cov_type: str | int = "sample", sort: str = "descending",
                 batch_size=None, verbose=False, dtype=None) -> None:
        if order < 0:
            raise ValueError("order must be non-negative.")
        if n_comp <= 0 or order + 1 < n_comp:
            raise ValueError("n_comp must be in [1, order + 1].")
        if sort not in ("ascending", "descending"):
            raise ValueError("sort must be ascending or descending.")
        if batch_size is not None and batch_size <= 0:
            raise ValueError("batch_size must be positive.")
        self.n_comp = n_comp
        self.sort = sort
        self.batch_size = batch_size
        dtype = dtype or default_dtype()
        L = order + 1
        self.s = jnp.zeros(n_comp, dtype)
        self.V = jnp.zeros((n_comp, L), dtype)
        self.m = jnp.zeros(L, dtype)

        def sample_cov(x0, x1, x2):
            return x2 / x0 - jnp.outer(x1, x1) / (x0 * x0)

        if cov_type in (0, "sample"):
            self.cov = sample_cov
        elif cov_type in (1, "unbiased"):
            self.cov = lambda x0, x1, x2: (sample_cov(x0, x1, x2)
                                           * (x0 / (x0 - 1)))
        elif cov_type in (2, "correlation"):
            def corr(x0, x1, x2):
                c = sample_cov(x0, x1, x2)
                v = jnp.sqrt(jnp.diag(c))
                return c / jnp.outer(v, v)
            self.cov = corr
        else:
            raise ValueError(f"cov_type {cov_type} is not supported.")

    def __call__(self, x):
        chunks = as_chunks(x, self.batch_size)
        if chunks[0].ndim != 2:
            raise ValueError("Input vectors must be 2D.")
        # Streaming moment accumulation, one chunk at a time — the
        # reference's DataLoader loop (pca.py:148-163) as plain sums.
        x0 = sum(c.shape[0] for c in chunks)
        if x0 <= self.n_comp:
            raise RuntimeError("Number of data samples is too small.")
        x1 = sum(jnp.sum(c, axis=0) for c in chunks)
        x2 = sum(jnp.einsum("bl,bm->lm", c, c) for c in chunks)
        m = x1 / x0
        c = self.cov(x0, x1, x2)
        val, vec = jnp.linalg.eigh(c)
        val = val[-self.n_comp:]
        vec = vec[:, -self.n_comp:]
        if self.sort == "descending":
            val = jnp.flip(val, -1)
            vec = jnp.flip(vec, -1)
        self.s, self.V, self.m = val, vec.T, m
        return self.s, self.V, self.m

    def center(self, x):
        return x - self.m

    def whiten(self, x):
        V = (jnp.flip(self.V.T, -1) if self.sort == "ascending"
             else self.V.T)
        s = jnp.flip(self.s, -1) if self.sort == "ascending" else self.s
        d = jnp.sqrt(jnp.clip(s, min=1e-10))
        return jnp.matmul(x, V / d)

    def transform(self, x):
        V = (jnp.flip(self.V.T, -1) if self.sort == "ascending"
             else self.V.T)
        return jnp.matmul(self.center(x), V)


class IndependentComponentAnalysis(BaseLearnerOp):
    """FastICA with fixed-point iteration on whitened data."""

    def __init__(self, order: int, n_comp: int, *, func: str = "logcosh",
                 n_iter: int = 100, eps: float = 1e-4, batch_size=None,
                 seed: int = 0, verbose=False, dtype=None) -> None:
        if n_iter <= 0:
            raise ValueError("n_iter must be positive.")
        if eps < 0:
            raise ValueError("eps must be non-negative.")
        if batch_size is not None and batch_size <= 0:
            raise ValueError("batch_size must be positive.")
        self.n_comp = n_comp
        self.n_iter = n_iter
        self.eps = eps
        self.batch_size = batch_size
        if func == "logcosh":
            self.g = jnp.tanh
            self.g_prime = lambda u: 1 - jnp.tanh(u) ** 2
        elif func == "gauss":
            self.g = lambda u: u * jnp.exp(-(u ** 2) / 2)
            self.g_prime = lambda u: (1 - u ** 2) * jnp.exp(-(u ** 2) / 2)
        else:
            raise ValueError(f"func {func} is not supported.")
        self.pca = PrincipalComponentAnalysis(order, n_comp,
                                              batch_size=batch_size,
                                              dtype=dtype)
        dtype = dtype or default_dtype()
        self.W = jax.random.normal(jax.random.PRNGKey(seed),
                                   (n_comp, n_comp), dtype)

    def __call__(self, x, callback=None):
        chunks = as_chunks(x, self.batch_size)
        self.pca(chunks)

        def decorrelate(W):
            s, V = jnp.linalg.eigh(W @ W.T)
            d = 1 / jnp.sqrt(jnp.clip(s, min=1e-10))
            return (V * d) @ V.T @ W

        W = decorrelate(self.W)
        # Whitened chunks reused every iteration; for data too large to
        # keep resident, pass an iterator and re-whiten per pass instead.
        xqs = [self.pca.whiten(self.pca.center(c)) for c in chunks]
        T = sum(c.shape[0] for c in chunks)
        for n in range(self.n_iter):
            prev_W = W
            # Fixed-point update accumulated over chunks
            # (reference: ica.py:172-182).
            term1 = 0
            term2 = 0
            for xq in xqs:
                Wx = W @ xq.T
                term1 = term1 + self.g(Wx) @ xq
                term2 = term2 + W * jnp.sum(self.g_prime(Wx), axis=1,
                                            keepdims=True)
            W = (term1 - term2) / T
            W = decorrelate(W)
            similarity = jnp.abs(jnp.diagonal(W @ prev_W.T))
            criterion = float(jnp.max(jnp.abs(similarity - 1)))
            if callback is not None and callback(
                    iteration=n, criterion=criterion, params=W) is False:
                break
            if criterion < self.eps:
                break

        self.W = W
        s2 = sum(jnp.sum(jnp.square(self.transform(c)), axis=0)
                 for c in chunks)
        self.W = W / jnp.sqrt(s2 / T)[:, None]
        return self.W

    def transform(self, x):
        return (self.W @ self.pca.whiten(self.pca.center(x)).T).T


class NonnegativeMatrixFactorization(BaseLearnerOp):
    """Multiplicative updates with beta-divergence."""

    def __init__(self, n_data: int, order: int, n_comp: int, *,
                 beta: float = 0, n_iter: int = 100, eps: float = 1e-5,
                 act_norm: bool = False, batch_size=None, seed: int = 0,
                 verbose=False, dtype=None) -> None:
        if n_data <= 0 or order < 0 or n_comp <= 0:
            raise ValueError("invalid size arguments.")
        if n_iter <= 0:
            raise ValueError("n_iter must be positive.")
        if eps < 0:
            raise ValueError("eps must be non-negative.")
        if batch_size is not None and batch_size <= 0:
            raise ValueError("batch_size must be positive.")
        self.beta = beta
        self.n_iter = n_iter
        self.eps = eps
        self.act_norm = act_norm
        self.batch_size = batch_size
        if beta < 1:
            self.phi = 1 / (2 - beta)
        elif 2 < beta:
            self.phi = 1 / (beta - 1)
        else:
            self.phi = 1.0
        dtype = dtype or default_dtype()
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        U = jax.random.uniform(k1, (n_data, n_comp), dtype)
        if act_norm:
            U = U / jnp.sum(U, axis=1, keepdims=True)
        self.U = U
        self.H = jax.random.uniform(k2, (n_comp, order + 1), dtype)

    def __call__(self, x, callback=None):
        chunks = as_chunks(x, self.batch_size)
        if chunks[0].ndim != 2:
            raise ValueError("Input vectors must be 2D.")
        if any(bool(jnp.any(c <= 0)) for c in chunks):
            raise ValueError("Input vectors must be positive.")
        if sum(c.shape[0] for c in chunks) != self.U.shape[0]:
            raise ValueError("Data length must match n_data.")
        beta, phi = self.beta, self.phi

        # The coefficient update is row-local and the dictionary update
        # accumulates (K, M+1) sums, so the chunked sweep is exactly the
        # full-batch update (reference streams the same way,
        # nmf.py:196-241).
        prev_div = np.inf
        for n in range(self.n_iter):
            H_numer = 0
            H_denom = 0
            t1 = 0
            for z in chunks:
                t2 = t1 + z.shape[0]
                U = self.U[t1:t2]
                y = U @ self.H
                y2 = z * y ** (beta - 2)
                y1 = y ** (beta - 1)
                U = U * ((y2 @ self.H.T) / (y1 @ self.H.T)) ** phi
                if self.act_norm:
                    U = U / jnp.sum(U, axis=1, keepdims=True)
                self.U = self.U.at[t1:t2].set(U)

                y = U @ self.H
                H_numer = H_numer + U.T @ (z * y ** (beta - 2))
                H_denom = H_denom + U.T @ y ** (beta - 1)
                t1 = t2

            self.H = self.H * (H_numer / H_denom) ** phi

            div = 0.0
            t1 = 0
            for z in chunks:
                t2 = t1 + z.shape[0]
                y = self.U[t1:t2] @ self.H
                if beta == 0:
                    r = z / y
                    div = div + jnp.sum(r - jnp.log(r) - 1)
                elif beta == 1:
                    div = div + jnp.sum(z * jnp.log(z / y) - (z - y))
                else:
                    b1 = beta - 1
                    r1 = z * (z ** b1 - y ** b1) / b1
                    r2 = (z ** beta - y ** beta) / beta
                    div = div + jnp.sum(r1 - r2)
                t1 = t2
            div = float(div)
            if callback is not None and callback(
                    iteration=n, divergence=div,
                    params=(self.U, self.H)) is False:
                break
            if n and abs(prev_div - div) / (div + 1e-16) < self.eps:
                break
            prev_div = div

        return (self.U, self.H), jnp.asarray(div)

    def transform(self, x):
        """Project new data onto the learned dictionary (fixed H)."""
        z = jnp.asarray(x)
        k = jax.random.PRNGKey(0)
        U = jax.random.uniform(k, (z.shape[0], self.H.shape[0]), z.dtype)
        for _ in range(self.n_iter):
            y = U @ self.H
            y2 = z * y ** (self.beta - 2)
            y1 = y ** (self.beta - 1)
            U = U * ((y2 @ self.H.T) / (y1 @ self.H.T)) ** self.phi
        return U

