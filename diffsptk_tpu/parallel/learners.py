"""Data-parallel learners (SURVEY.md §5.8: learner reductions as psums).

The GMM/LBG/PCA E-steps reduce sufficient statistics over the data axis
(responsibilities, moments, log-likelihood).  Under jit with the data
sharded over a mesh batch axis, GSPMD compiles those reductions to
``psum`` over ICI — so data parallelism is a placement decision, not new
math.  These wrappers make that placement explicit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.learners import GaussianMixtureModeling


class DataParallelGMM(GaussianMixtureModeling):
    """GMM EM with the data rows sharded over a mesh axis.

    Every device holds a slice of the data and the full (replicated)
    parameters; the per-iteration sufficient statistics all-reduce over
    the mesh.  Numerically identical to the single-device fit.
    """

    def __init__(self, mesh: Mesh, *args, batch_axis_name: str = "dp",
                 **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.mesh = mesh
        self.batch_axis_name = batch_axis_name

    def __call__(self, x, return_posterior: bool = False):
        x = jnp.asarray(x)
        n_shard = self.mesh.shape[self.batch_axis_name]
        pad = (-x.shape[0]) % n_shard
        if pad:
            # replicate trailing rows so the shard sizes match; EM
            # statistics are weighted sums, so padding with copies of
            # real rows changes the fit — instead pad by truncation
            # awareness: refuse and let the caller pad deliberately.
            raise ValueError(
                f"data rows ({x.shape[0]}) must be divisible by the "
                f"{self.batch_axis_name} axis size ({n_shard}).")
        sharding = NamedSharding(
            self.mesh, P(self.batch_axis_name, *([None] * (x.ndim - 1))))
        x = jax.device_put(x, sharding)
        return super().__call__(x, return_posterior=return_posterior)
