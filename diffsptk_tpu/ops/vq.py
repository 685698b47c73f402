"""Vector quantization (reference: diffsptk/modules/{vq,ivq,msvq,imsvq}.py).

The reference wraps vector-quantize-pytorch; this is a native JAX VQ/RVQ:
nearest-neighbor codebook lookup with a straight-through estimator and
commitment loss.  Codebooks are plain params, so optax trains them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseNonFunctionalOp, check_size, default_dtype


def _nearest(x: jnp.ndarray, codebook: jnp.ndarray):
    """x (..., D), codebook (K, D) -> (xq, indices)."""
    d = (jnp.sum(x * x, axis=-1, keepdims=True)
         - 2 * x @ codebook.T
         + jnp.sum(codebook * codebook, axis=-1))
    indices = jnp.argmin(d, axis=-1)
    return codebook[indices], indices


class VectorQuantization(BaseNonFunctionalOp):
    """x (..., M+1) -> (xq, indices, commitment loss).

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> vq = diffsptk_tpu.VectorQuantization(1, 4, seed=1)
    >>> xq, idx, loss = vq(jnp.asarray([0.1, 0.2]))
    >>> xq.shape, idx.shape
    ((2,), ())
    """

    def __init__(self, order: int, codebook_size: int, *, seed: int = 0,
                 beta: float = 0.25, dtype=None, **kwargs) -> None:
        if order < 0:
            raise ValueError("order must be non-negative.")
        if codebook_size <= 0:
            raise ValueError("codebook_size must be positive.")
        self.order = order
        self.codebook_size = codebook_size
        self.beta = beta
        key = jax.random.PRNGKey(seed)
        self.codebook = jax.random.normal(
            key, (codebook_size, order + 1), dtype or default_dtype())
        self.learnable = ("codebook",)

    @property
    def params(self):
        return {"codebook": self.codebook}

    def __call__(self, x: jnp.ndarray, codebook=None):
        codebook = self.codebook if codebook is None else codebook
        check_size(x.shape[-1], self.order + 1, "dimension of input")
        xq, indices = _nearest(x, codebook)
        loss = jnp.mean(jnp.square(jax.lax.stop_gradient(xq) - x))
        xq = x + jax.lax.stop_gradient(xq - x)  # straight-through
        return xq, indices, loss


class InverseVectorQuantization(BaseNonFunctionalOp):
    """Codebook lookup: indices -> xq."""

    def __init__(self, vq: VectorQuantization | None = None) -> None:
        # The reference ctor takes no arguments; the codebook arrives at
        # call time (reference: ivq.py Examples).  Binding a VQ instance
        # here is an optional convenience.
        self.vq = vq

    def __call__(self, indices: jnp.ndarray, codebook=None) -> jnp.ndarray:
        if codebook is None:
            if self.vq is None:
                raise ValueError(
                    "pass a codebook at call time or bind a VQ instance.")
            codebook = self.vq.codebook
        return codebook[indices]


class MultiStageVectorQuantization(BaseNonFunctionalOp):
    """Residual VQ: x -> (xq, indices (..., Q), loss)."""

    def __init__(self, order: int, codebook_size: int, n_stage: int, *,
                 seed: int = 0, dtype=None, **kwargs) -> None:
        if n_stage <= 0:
            raise ValueError("n_stage must be positive.")
        self.order = order
        self.n_stage = n_stage
        keys = jax.random.split(jax.random.PRNGKey(seed), n_stage)
        self.codebooks = jnp.stack([
            jax.random.normal(k, (codebook_size, order + 1),
                              dtype or default_dtype()) for k in keys])
        self.learnable = ("codebooks",)

    @property
    def codebook(self):
        return self.codebooks

    @property
    def params(self):
        return {"codebooks": self.codebooks}

    def __call__(self, x: jnp.ndarray, codebooks=None):
        codebooks = self.codebooks if codebooks is None else codebooks
        check_size(x.shape[-1], self.order + 1, "dimension of input")
        residual = x
        quantized = jnp.zeros_like(x)
        indices = []
        loss = 0.0
        for q in range(self.n_stage):
            xq, idx = _nearest(residual, codebooks[q])
            loss = loss + jnp.mean(
                jnp.square(jax.lax.stop_gradient(xq) - residual))
            residual = residual - jax.lax.stop_gradient(xq)
            quantized = quantized + xq
            indices.append(idx)
        quantized = x + jax.lax.stop_gradient(quantized - x)
        return quantized, jnp.stack(indices, axis=-1), loss / self.n_stage


class InverseMultiStageVectorQuantization(BaseNonFunctionalOp):
    """Cumulative codebook sum: indices (..., Q) -> xq."""

    def __init__(self,
                 msvq: MultiStageVectorQuantization | None = None) -> None:
        # Reference ctor takes no arguments (imsvq.py Examples).
        self.msvq = msvq

    def __call__(self, indices: jnp.ndarray, codebooks=None) -> jnp.ndarray:
        if codebooks is None:
            if self.msvq is None:
                raise ValueError(
                    "pass codebooks at call time or bind an MSVQ instance.")
            codebooks = self.msvq.codebooks
        out = 0.0
        for q in range(indices.shape[-1]):
            out = out + codebooks[q][indices[..., q]]
        return out
