"""Fully sharded mel-cepstral vocoder: the flagship chain
(STFT -> mcep Newton -> MLSA analysis-synthesis) over a (dp, tp) mesh.

Sequence parallelism is EXACT here, not warmup-approximate: every stage of
the MLSA Taylor cascade is a time-varying FIR whose frame-blocked FFT form
(ops/zerodf.py) only needs a (P + M)-sample left halo and a P-sample right
halo per stage — a pair of `ppermute` neighbor sends over ICI — after which
all FFT/matmul work is block-local.  The mcep Newton solver and the
window/spectrum stages are frame-parallel (zero communication).  The
N-shard output is bitwise the single-device op graph up to float
associativity (tested in tests/test_parallel.py).

This is the distribution design SURVEY.md §5.7/§7.9 calls for: shard
waveforms over (batch, time-block), exchange overlap-save halos between
neighboring time shards, keep every hot kernel dense and local.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.mcep import MelCepstralAnalysis
from ..ops.mgc2mgc import MelGeneralizedCepstrumToMelGeneralizedCepstrum
from ..ops.mglsadf import _exp_taylor_weights
from ..ops.stft import ShortTimeFourierTransform
from ..utils.linalg import remove_gain
from .halo import exchange_halo


class ShardedMelCepstralVocoder:
    """Mel-cepstral analysis-synthesis over a (dp, tp) device mesh.

    Batch shards over ``dp``; the waveform/time axis shards over ``tp``.
    ``analysis_synthesis`` runs the whole chain inside one ``shard_map``.
    T must be divisible by frame_period * n_time_shards.
    """

    def __init__(self, mesh: Mesh, *, frame_length: int = 400,
                 frame_period: int = 80, fft_length: int = 512,
                 cep_order: int = 24, alpha: float = 0.42, n_iter: int = 10,
                 taylor_order: int = 20, cep_order_mlsa: int = 199,
                 time_axis_name: str = "tp",
                 batch_axis_name: str | None = "dp") -> None:
        self.mesh = mesh
        self.tp = time_axis_name
        self.dp = batch_axis_name if batch_axis_name in mesh.shape else None
        self.frame_length = frame_length
        self.frame_period = frame_period

        self.stft = ShortTimeFourierTransform(
            frame_length, frame_period, fft_length, eps=0,
            relative_floor=-80, out_format="power")
        self.mcep = MelCepstralAnalysis(
            fft_length=fft_length, cep_order=cep_order, alpha=alpha,
            n_iter=n_iter)
        self.mgc2c = MelGeneralizedCepstrumToMelGeneralizedCepstrum(
            cep_order, cep_order_mlsa, in_alpha=alpha, n_fft=512)
        self.cep_order_mlsa = cep_order_mlsa
        self.taylor_weights = _exp_taylor_weights(taylor_order)
        self.taylor_order = taylor_order

    # ---------------------------------------------------------------- local
    def _local_frames(self, x_blk: jnp.ndarray) -> jnp.ndarray:
        """Centered framing of the local time block (halo-exchanged)."""
        L, Pd = self.frame_length, self.frame_period
        halo_l = L // 2
        halo_r = max(L - 1 - halo_l - (Pd - 1), 0)
        x_ext = exchange_halo(x_blk, halo_l, halo_r, self.tp)
        n_local = x_blk.shape[-1] // Pd
        idx = (np.arange(n_local)[:, None] * Pd
               + np.arange(L)[None, :])
        return x_ext[..., idx]

    def _local_analysis(self, x_blk: jnp.ndarray) -> jnp.ndarray:
        y = self._local_frames(x_blk)
        y = self.stft.window(y)
        X = self.stft.spec(y)
        return self.mcep(X)                    # frame-parallel Newton

    def _local_mlsa(self, x_blk: jnp.ndarray,
                    mc_blk: jnp.ndarray) -> jnp.ndarray:
        """One MLSA multi-stage filter on the local block; exact across
        shard boundaries via per-stage halo exchange."""
        Pd = self.frame_period
        M = self.cep_order_mlsa
        n_local = mc_blk.shape[-2]

        c = self.mgc2c(mc_blk)
        c0, c = remove_gain(c, value=0.0, return_gain=True)
        # right halo of one frame (edge-replicated at the global end): the
        # lerp upper bracket of the last local frame is the neighbor's
        # first filter.
        c_ext = exchange_halo(c, 0, 1, self.tp, axis=-2, pad_mode="edge")
        c0_ext = exchange_halo(c0, 0, 1, self.tp, axis=-2, pad_mode="edge")
        from ..kernels.mlsa_cascade import (coef_spectrum,
                                            lane_aligned_nfft,
                                            stage_apply, stage_plans)
        nfft = lane_aligned_nfft(2 * Pd + M + 1)
        cre, cim = coef_spectrum(c_ext, nfft)  # (..., Nl+1, nfft/2+1)
        cre = cre.astype(x_blk.dtype)
        cim = cim.astype(x_blk.dtype)

        lam = jnp.asarray(np.arange(Pd) / Pd, x_blk.dtype)
        # folded-plan stage (kernels/mlsa_cascade.py): the halo moves to
        # the frame axis — r0 rows left / n_blk - r0 right cover the
        # (P+M, P)-sample dependency cone frame-aligned.
        _, _, _, r0, n_blk = stage_plans(nfft, M, Pd)

        def stage(xin):
            xq = xin.reshape(*xin.shape[:-1], n_local, Pd)
            xq_ext = exchange_halo(xq, r0, n_blk - r0, self.tp, axis=-2)
            y = stage_apply(xq_ext, cre, cim, nfft, M, Pd)
            return y.reshape(*xin.shape)

        w = jnp.asarray(self.taylor_weights, x_blk.dtype)
        y = x_blk
        xi = x_blk
        for i in range(1, self.taylor_order + 1):
            xi = stage(xi) * w[i]
            y = y + xi

        # gain e^{c0}, linearly interpolated across frames
        k_lo = c0_ext[..., :-1, 0]
        k_hi = c0_ext[..., 1:, 0]
        K = jnp.exp(k_lo[..., None] * (1 - lam) + k_hi[..., None] * lam)
        return y * K.reshape(*x_blk.shape)

    def _local_mlsa_bulk(self, x_blk: jnp.ndarray,
                         mc_blk: jnp.ndarray) -> jnp.ndarray:
        """Same filter, ONE bulk halo exchange for all S stages.

        The per-stage halo pair costs 2S ppermute sends on the critical
        path; here the block is extended once by the full S-stage
        dependency cone (frame-aligned: S*ceil((P+M)/P) frames left,
        S frames right) and every stage runs locally on the extended
        buffer, re-imposing the global zero padding between stages so
        edge semantics stay bitwise those of the per-stage path.  The
        price is redundant edge compute (~S*(2P+M) samples per shard),
        amortized for T_local >> S*(P+M) — the multi-host latency
        trade described in docs/parallel.md.
        """
        Pd = self.frame_period
        M = self.cep_order_mlsa
        S = self.taylor_order
        n_local = mc_blk.shape[-2]
        ntp = self.mesh.shape[self.tp]
        T_l = x_blk.shape[-1]
        hl_f = S * (-(-(Pd + M) // Pd))
        hr_f = S
        hl, hr = hl_f * Pd, hr_f * Pd

        c = self.mgc2c(mc_blk)
        c0, c = remove_gain(c, value=0.0, return_gain=True)
        c_ext = exchange_halo(c, hl_f, hr_f + 1, self.tp, axis=-2,
                              pad_mode="edge")
        c0_ext = exchange_halo(c0, 0, 1, self.tp, axis=-2, pad_mode="edge")
        from ..kernels.mlsa_cascade import (coef_spectrum,
                                            lane_aligned_nfft,
                                            stage_apply, stage_plans)
        nfft = lane_aligned_nfft(2 * Pd + M + 1)
        cre, cim = coef_spectrum(c_ext, nfft)  # (..., n_ext+1, K)
        cre = cre.astype(x_blk.dtype)
        cim = cim.astype(x_blk.dtype)

        x_ext = exchange_halo(x_blk, hl, hr, self.tp)
        n_ext = n_local + hl_f + hr_f

        tp_i = jax.lax.axis_index(self.tp)
        pos = (jnp.arange(T_l + hl + hr) - hl) + tp_i * T_l
        inside = ((pos >= 0) & (pos < T_l * ntp)).astype(x_blk.dtype)

        lam = jnp.asarray(np.arange(Pd) / Pd, x_blk.dtype)
        _, _, _, r0, n_blk = stage_plans(nfft, M, Pd)

        def stage(xin):
            xq = xin.reshape(*xin.shape[:-1], n_ext, Pd)
            pad = [(0, 0)] * (xq.ndim - 2) + [(r0, n_blk - r0), (0, 0)]
            y = stage_apply(jnp.pad(xq, pad), cre, cim, nfft, M, Pd)
            return y.reshape(*xin.shape) * inside

        w = jnp.asarray(self.taylor_weights, x_blk.dtype)
        y = x_ext * inside
        xi = y
        for i in range(1, S + 1):
            xi = stage(xi) * w[i]
            y = y + xi
        y_blk = y[..., hl:hl + T_l]

        k_lo = c0_ext[..., :-1, 0]
        k_hi = c0_ext[..., 1:, 0]
        K = jnp.exp(k_lo[..., None] * (1 - lam) + k_hi[..., None] * lam)
        return y_blk * K.reshape(*x_blk.shape)

    def _local_roundtrip(self, x_blk: jnp.ndarray) -> jnp.ndarray:
        mc = self._local_analysis(x_blk)
        e = self._local_mlsa_inv(x_blk, mc)
        return self._local_mlsa(e, mc)

    def _local_mlsa_inv(self, y_blk, mc_blk):
        return self._local_mlsa(y_blk, -mc_blk)

    # ---------------------------------------------------------------- public
    def _specs(self, extra_frame_dims: int = 0):
        batch = (self.dp,) if self.dp else ()
        in_spec = P(*batch, self.tp)
        mc_spec = P(*batch, self.tp, None)
        return in_spec, mc_spec

    def _shard(self, fn, in_specs, out_specs):
        return jax.shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    def _check_t(self, T: int) -> None:
        ntp = self.mesh.shape[self.tp]
        if T % (self.frame_period * ntp):
            raise ValueError(
                "T must be divisible by frame_period * n_time_shards.")

    def analyze(self, x: jnp.ndarray) -> jnp.ndarray:
        self._check_t(x.shape[-1])
        xs, ms = self._specs()
        return self._shard(self._local_analysis, (xs,), ms)(x)

    def synthesize(self, e: jnp.ndarray, mc: jnp.ndarray,
                   halo: str = "per-stage") -> jnp.ndarray:
        """``halo``: "per-stage" (2S small ppermute pairs) or "bulk"
        (one big pair + redundant edge compute; see _local_mlsa_bulk)."""
        self._check_t(e.shape[-1])
        xs, ms = self._specs()
        fn = (self._local_mlsa_bulk if halo == "bulk"
              else self._local_mlsa)
        return self._shard(fn, (xs, ms), xs)(e, mc)

    def analysis_synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        self._check_t(x.shape[-1])
        xs, _ = self._specs()
        return self._shard(self._local_roundtrip, (xs,), xs)(x)
