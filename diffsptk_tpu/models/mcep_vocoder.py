"""Flagship pipeline: STFT -> mcep -> (I)MLSA analysis-synthesis
(BASELINE.md config #3; reference README.md:62-92 usage).

One jittable graph: framing gather, window multiply, batched rfft, the
fixed-trip Newton solver (MXU matmuls + batched small LU), and the Taylor
MLSA cascade (dense gather-dot FIR stages).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.mcep import MelCepstralAnalysis
from ..ops.mglsadf import (
    PseudoInverseMGLSADigitalFilter,
    PseudoMGLSADigitalFilter,
)
from ..ops.stft import ShortTimeFourierTransform


class MelCepstralVocoder:
    """Analysis (mel-cepstrum extraction) and synthesis (MLSA filtering)."""

    def __init__(self, *, frame_length: int = 400, frame_period: int = 80,
                 fft_length: int = 512, cep_order: int = 24,
                 alpha: float = 0.42, n_iter: int = 10,
                 taylor_order: int = 20, cep_order_mlsa: int = 199,
                 mode: str = "multi-stage",
                 cascade: str = "folded",
                 cascade_precision: str | None = None) -> None:
        self.frame_period = frame_period
        self.stft = ShortTimeFourierTransform(
            frame_length, frame_period, fft_length, eps=0,
            relative_floor=-80, out_format="power")
        self.mcep = MelCepstralAnalysis(
            fft_length=fft_length, cep_order=cep_order, alpha=alpha,
            n_iter=n_iter)
        kwargs: dict = dict(alpha=alpha, mode=mode)
        if mode in ("multi-stage", "pade-approx"):
            kwargs["cep_order"] = cep_order_mlsa
        if mode == "multi-stage":
            kwargs["taylor_order"] = taylor_order
            kwargs["cascade"] = cascade
            if cascade_precision is not None:
                kwargs["cascade_precision"] = cascade_precision
        self.mlsa = PseudoMGLSADigitalFilter(cep_order, frame_period,
                                             **kwargs)
        self.imlsa = PseudoInverseMGLSADigitalFilter(cep_order, frame_period,
                                                     **kwargs)

    def analyze(self, x: jnp.ndarray) -> jnp.ndarray:
        """Waveform (..., T) -> mel-cepstrum (..., T/P, M+1)."""
        return self.mcep(self.stft(x))

    def synthesize(self, e: jnp.ndarray, mc: jnp.ndarray) -> jnp.ndarray:
        """Excitation + mel-cepstrum -> waveform."""
        return self.mlsa(e, mc)

    def analysis_synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        """Full round trip: extract mc, inverse-filter to excitation,
        re-synthesize."""
        mc = self.analyze(x)
        T = mc.shape[-2] * self.frame_period
        e = self.imlsa(x[..., :T], mc)
        return self.mlsa(e, mc)
