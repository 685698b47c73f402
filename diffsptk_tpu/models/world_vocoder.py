"""WORLD vocoder pipeline (BASELINE.md config #4): pitch -> aperiodicity
-> spectral envelope -> synthesis, as one object.

Mirrors the reference's canonical WORLD usage (diffsptk README/world
modules); every stage is the corresponding diffsptk_tpu op, so gradients
flow through the waveform analysis and the synthesis but not through F0
(matching the reference's detach semantics).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.ap import Aperiodicity
from ..ops.pitch import Pitch
from ..ops.pitch_spec import PitchAdaptiveSpectralAnalysis
from ..ops.world_synth import WorldSynthesis


class WorldVocoder:
    """WORLD analysis-synthesis.

    Parameters mirror the stage ops; pass stage-specific extras via
    ``pitch_kwargs`` / ``ap_kwargs`` / ``spec_kwargs`` / ``synth_kwargs``.
    """

    def __init__(self, frame_period: int = 80, sample_rate: int = 16000,
                 fft_length: int = 1024, *,
                 pitch_algorithm: str = "yin",
                 ap_algorithm: str = "tandem",
                 spec_algorithm: str = "cheap-trick",
                 f_min: float = 60.0, f_max: float = 500.0,
                 pitch_kwargs: dict | None = None,
                 ap_kwargs: dict | None = None,
                 spec_kwargs: dict | None = None,
                 synth_kwargs: dict | None = None) -> None:
        self.pitch = Pitch(frame_period, sample_rate,
                           algorithm=pitch_algorithm, out_format="f0",
                           f_min=f_min, f_max=f_max,
                           **(pitch_kwargs or {}))
        self.ap = Aperiodicity(frame_period, sample_rate, fft_length,
                               algorithm=ap_algorithm, **(ap_kwargs or {}))
        self.spec = PitchAdaptiveSpectralAnalysis(
            frame_period, sample_rate, fft_length,
            algorithm=spec_algorithm, **(spec_kwargs or {}))
        self.synth = WorldSynthesis(
            frame_period, sample_rate, fft_length,
            f0_ceil=max(f_max, 500.0) * 1.2, f0_floor=f_min,
            **(synth_kwargs or {}))

    def analyze(self, x: jnp.ndarray, even_frames: bool = False):
        """Waveform (..., T) -> (f0, aperiodicity, envelope).

        The pitch stage follows the reference's hop-framing convention
        (T // P + 1 frames, see ops/pitch.py).  ``even_frames=True``
        drops the final edge frame, yielding exactly T // P frames —
        the uniform-shard layout the sequence-parallel
        ShardedWorldVocoder produces (parallel/world.py), whose SPMD
        blocks must all carry the same static frame count.
        """
        f0 = self.pitch(x)
        if even_frames:
            f0 = f0[..., : x.shape[-1] // self.synth.frame_period]
        ap = self.ap(x, f0)
        sp = self.spec(x, f0)
        return f0, ap, sp

    def synthesize(self, f0, ap, sp, out_length: int | None = None):
        return self.synth(f0, ap, sp, out_length=out_length)

    def analysis_synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        f0, ap, sp = self.analyze(x)
        return self.synthesize(f0, ap, sp, out_length=x.shape[-1])
