"""Sharded WORLD vocoder: the full analysis-synthesis chain
(YIN pitch -> TANDEM aperiodicity -> CheapTrick envelope -> pulse/noise
synthesis) over a (dp, tp) device mesh.

Distribution design (SURVEY.md §5.7/§7.9): waveforms shard over
(batch, time-block).  Every framed analysis stage becomes block-local
after one ICI halo exchange; the only genuinely global pieces of WORLD
are (a) the excitation phase integral (a cumsum over all T), computed as
local cumsums plus an all-gathered per-shard prefix, and (b) the
overlap-add of pulse responses, whose spills into neighbor blocks ride
two `ppermute` sends.  Synthesis noise is keyed per pulse by its global
sample position (ops/world_synth.py), so the sharded chain reproduces
the single-device output up to float-reduction order.

Halo widths per stage:
  pitch:   (Lyin/2, Lyin) samples, Lyin = window_length + tau_max
  tandem:  TANDEM_HALO samples each side (covers the QMF cascade
           transients plus the worst-case analysis-window overhang in
           every decimated band)
  cheap-trick: fft_length/2 each side (centered framing)
  synthesis: 1 frame of (f0, ap, sp) to the right; OLA spills of
           fft_length/2 (left) and fft_length (right) samples
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.ap import AperiodicityExtractionByTANDEM
from ..ops.pitch import PitchExtractionByYIN
from ..ops.pitch_spec import SpectrumExtractionByCheapTrick
from ..ops.world_common import TAU
from ..ops.world_synth import WorldSynthesis
from .halo import exchange_halo

TANDEM_HALO = 2048


class ShardedWorldVocoder:
    """WORLD analysis-synthesis over a (dp, tp) mesh.

    Batch shards over ``dp``; the waveform/time axis shards over ``tp``.
    T / n_time_shards must be a multiple of frame_period and at least
    max(TANDEM_HALO, fft_length).
    """

    def __init__(self, mesh: Mesh, frame_period: int = 80,
                 sample_rate: int = 16000, fft_length: int = 1024, *,
                 f_min: float = 60.0, f_max: float = 500.0,
                 ap_floor: float = 0.001, ap_ceil: float = 0.999,
                 time_axis_name: str = "tp",
                 batch_axis_name: str | None = "dp",
                 pitch_kwargs: dict | None = None,
                 ap_kwargs: dict | None = None,
                 spec_kwargs: dict | None = None,
                 synth_kwargs: dict | None = None) -> None:
        self.mesh = mesh
        self.tp = time_axis_name
        self.dp = batch_axis_name if batch_axis_name in mesh.shape else None
        self.frame_period = frame_period
        self.sample_rate = sample_rate
        self.fft_length = fft_length
        self.ap_floor = ap_floor
        self.ap_ceil = ap_ceil

        self.pitch = PitchExtractionByYIN(
            frame_period, sample_rate, f_min=f_min, f_max=f_max,
            **(pitch_kwargs or {}))
        self.ap = AperiodicityExtractionByTANDEM(
            frame_period, sample_rate, fft_length, **(ap_kwargs or {}))
        self.spec = SpectrumExtractionByCheapTrick(
            frame_period, sample_rate, fft_length, **(spec_kwargs or {}))
        self.synth = WorldSynthesis(
            frame_period, sample_rate, fft_length,
            f0_ceil=max(f_max, 500.0) * 1.2, f0_floor=f_min,
            **(synth_kwargs or {}))

    # ---------------------------------------------------------------- local
    def _batch_offset(self, n_local_rows: int):
        if self.dp is None:
            return 0
        return lax.axis_index(self.dp) * n_local_rows

    def _local_pitch(self, x_blk: jnp.ndarray) -> jnp.ndarray:
        Lf = self.pitch.window_length + self.pitch.tau_max
        # the unsharded path zero-pads (Lf//2, Lf) around the global
        # signal (ops/pitch.py:_yin_frames); zero edge fill matches
        x_ext = exchange_halo(x_blk, Lf // 2, Lf, self.tp)
        n_l = x_blk.shape[-1] // self.frame_period
        idx = (np.arange(n_l)[:, None] * self.frame_period
               + np.arange(Lf)[None, :])
        frames = x_ext[..., idx]
        return lax.stop_gradient(self.pitch.calc_pitch(None, frames=frames))

    def _local_ap(self, x_blk: jnp.ndarray,
                  f0_blk: jnp.ndarray) -> jnp.ndarray:
        T_l = x_blk.shape[-1]
        n_band = self.ap.n_band
        if T_l % (2 ** (n_band - 1)):
            raise ValueError(
                f"local block length must be divisible by 2**{n_band - 1}.")
        h = TANDEM_HALO
        ntp = self.mesh.shape[self.tp]
        tp_i = lax.axis_index(self.tp)
        x_ext = exchange_halo(x_blk, h, h, self.tp, pad_mode="reflect")
        n0 = tp_i * (T_l // self.frame_period)
        base0 = tp_i * T_l - h            # global sample index of x_ext[0]
        levels = [min(i + 1, n_band - 1) for i in range(n_band)]
        band_bases = [base0 // (2 ** lv) for lv in levels]

        def band_fix(xb, i):
            # At the global edge shards, halo samples lie beyond the
            # signal: the unsharded op clamp-pads the band signal there
            # (edge replicate), while the reflect halo holds mirrored
            # values — overwrite them with the boundary value.  (The QMF
            # filters are symmetric, so the mirrored halo exactly equals
            # the reflect padding the cascade itself would produce; only
            # the window-gather clamp semantics need this fix.)
            hw = h >> levels[i]               # halo width in band coords
            Tb = xb.shape[-1]
            pos = jnp.arange(Tb)
            lv = jnp.where(tp_i == 0, hw, 0)
            rv = jnp.where(tp_i == ntp - 1, Tb - hw, Tb)
            lval = jnp.take(xb, lv, axis=-1)[..., None]
            rval = jnp.take(xb, rv - 1, axis=-1)[..., None]
            xb = jnp.where(pos < lv, lval, xb)
            return jnp.where(pos >= rv, rval, xb)

        def carry_fix(sig, level):
            # Re-mirror halo samples beyond the global edges with this
            # level's own reflect convention (numpy reflect about the
            # first/last valid sample) so the next decimation sees
            # exactly what the unsharded cascade's pad would provide.
            hw = h >> level
            Tb = sig.shape[-1]
            pos = jnp.arange(Tb)
            lv = jnp.where(tp_i == 0, hw, 0)
            rv = jnp.where(tp_i == ntp - 1, Tb - hw, Tb)
            idx = jnp.where(pos < lv, 2 * lv - pos, pos)
            idx = jnp.where(pos >= rv, 2 * rv - 2 - pos, idx)
            idx = jnp.clip(idx, 0, Tb - 1)
            return jnp.take_along_axis(
                sig, jnp.broadcast_to(idx, sig.shape), -1)

        ap = self.ap(x_ext, f0_blk, n_offset=n0, band_bases=band_bases,
                     band_fix=band_fix, carry_fix=carry_fix)
        return jnp.clip(ap, self.ap_floor, self.ap_ceil)

    def _local_sp(self, x_blk: jnp.ndarray,
                  f0_blk: jnp.ndarray) -> jnp.ndarray:
        L = self.fft_length
        # centered replicate-padded framing (world_common framing path)
        x_ext = exchange_halo(x_blk, L // 2, L // 2, self.tp,
                              pad_mode="edge")
        n_l = f0_blk.shape[-1]
        idx = (np.arange(n_l)[:, None] * self.frame_period
               + np.arange(L)[None, :])
        frames = x_ext[..., idx]
        return jnp.exp(self.spec(None, f0_blk, frames=frames))

    def _local_synth(self, f0_blk, ap_blk, sp_blk):
        synth = self.synth
        P_, sr, L = self.frame_period, self.sample_rate, self.fft_length
        H = L // 2
        B, N_l, D = sp_blk.shape
        T_l = N_l * P_
        if T_l < L:
            raise ValueError("local block must be at least fft_length.")
        ntp = self.mesh.shape[self.tp]
        tp_i = lax.axis_index(self.tp)
        t_start = tp_i * T_l
        T_g = T_l * ntp
        fwd = [(i, (i + 1) % ntp) for i in range(ntp)]
        bwd = [(i, (i - 1) % ntp) for i in range(ntp)]

        eps = 1e-6
        ap_blk = jnp.clip(ap_blk, eps, 1 - eps)
        sp_blk = jnp.clip(sp_blk, min=eps)

        # frame -> sample upsampling; right halo of one frame
        f_min = sr / L + 1
        coarse_f0 = lax.stop_gradient(
            jnp.where(f0_blk < f_min, 0.0, f0_blk))
        coarse_vuv = (0 < coarse_f0).astype(coarse_f0.dtype)
        cf0 = exchange_halo(coarse_f0, 0, 1, self.tp, pad_mode="edge")
        cvuv = exchange_halo(coarse_vuv, 0, 1, self.tp, pad_mode="edge")
        # P-fold-repeat lerp (no gathers — they scalarize on TPU);
        # endpoints are the halo-extended frame track and its shift
        wt = jnp.asarray((np.arange(P_) / P_)[None, :], f0_blk.dtype)

        def upsample(c):
            out = (c[..., :N_l, None] * (1 - wt)
                   + c[..., 1:N_l + 1, None] * wt)        # (B, N_l, P)
            return out.reshape(*c.shape[:-1], T_l)

        interp_f0 = upsample(cf0)
        interp_vuv = upsample(cvuv) > 0.5
        interp_f0 = jnp.where(interp_vuv, interp_f0, synth.default_f0)

        # global phase integral in fixed point (ops/world_synth.py):
        # int32 unit sums wrap exactly mod 2^32, so local-cumsum +
        # all-gathered prefix is BITWISE the single-device cumsum
        from ..ops.world_synth import phase_units, units_to_phase
        units = phase_units(TAU / sr * interp_f0)       # (B, T_l) int32
        units_ext = exchange_halo(units, 0, 1, self.tp)
        local_sum = jnp.sum(units, axis=-1)             # (B,) wraps ok
        sums = lax.all_gather(local_sum, self.tp)       # (ntp, B)
        prefix = jnp.sum(
            jnp.where(jnp.arange(ntp)[:, None] < tp_i, sums, 0), axis=0)
        total_units = jnp.cumsum(units_ext, axis=-1) + prefix[:, None]
        wrap_ext = units_to_phase(total_units, sp_blk.dtype)
        dphase = jnp.abs(jnp.diff(wrap_ext, axis=-1))   # (B, T_l)
        pulse_mask = jnp.pi < dphase

        # local slot table (same construction as the unsharded op)
        min_period = max(int(sr / synth.f0_ceil), 1)
        max_p = T_l // min_period + 2
        # vmapped binary search over the mask cumsum, as in the
        # unsharded op (scatter serializes on TPU)
        csum = jnp.cumsum(pulse_mask.astype(jnp.int32), axis=-1)
        wanted = jnp.arange(1, max_p + 1, dtype=jnp.int32)
        time_index = jax.vmap(
            lambda c: jnp.searchsorted(c, wanted, side="left"))(
                csum).astype(jnp.int32)                 # (B, max_p)
        n_pulses = csum[:, -1]
        valid = jnp.arange(max_p)[None, :] < n_pulses[:, None]
        last_valid = jnp.max(jnp.where(valid, time_index, 0), axis=-1,
                             keepdims=True)

        # the pulse after each shard's last one lives in the right
        # neighbor: fetch its first pulse so that pulse's noise span
        # matches the unsharded diff (world_synth.py noise_size)
        first_pulse = time_index[:, :1]
        has_pulse = (n_pulses > 0)[:, None]
        nxt_first = lax.ppermute(first_pulse, self.tp, bwd)
        nxt_has = lax.ppermute(has_pulse, self.tp, bwd)
        use_nxt = jnp.logical_and(tp_i < ntp - 1, nxt_has)
        nxt_rel = jnp.where(use_nxt, nxt_first + T_l, last_valid)
        time_index = jnp.where(valid, time_index, nxt_rel)
        time_app = jnp.concatenate([time_index, nxt_rel], axis=-1)
        noise_size = jnp.clip(jnp.diff(time_app, axis=-1), min=0)[..., None]

        ti = jnp.where(valid, time_index, 0)            # safe local coords
        bidx = jnp.arange(B)[:, None]
        vuv = jnp.take_along_axis(
            interp_vuv.astype(sp_blk.dtype), ti, -1)[..., None]
        y1 = jnp.take_along_axis(wrap_ext, ti, -1) - TAU
        y2 = jnp.take_along_axis(wrap_ext, ti + 1, -1)
        time_shift = -y1 / (y2 - y1) / sr

        # per-pulse envelope/aperiodicity: frame interp with a 1-frame
        # right halo (global clamping == edge fill at the last shard)
        sp_ext = exchange_halo(sp_blk, 0, 1, self.tp, axis=-2,
                               pad_mode="edge")
        ap_ext = exchange_halo(ap_blk, 0, 1, self.tp, axis=-2,
                               pad_mode="edge")
        pulse_locations = (t_start + ti).astype(sp_blk.dtype) / sr
        frame = pulse_locations * (sr / P_) - tp_i * N_l
        f_floor = jnp.clip(jnp.floor(frame).astype(jnp.int32), 0, N_l)
        f_ceil = jnp.clip(jnp.ceil(frame).astype(jnp.int32), 0, N_l)
        w_hi = (frame - f_floor)[..., None]
        w_lo = 1 - w_hi
        env = w_lo * sp_ext[bidx, f_floor] + w_hi * sp_ext[bidx, f_ceil]
        apr = (w_lo * ap_ext[bidx, f_floor] + w_hi * ap_ext[bidx, f_ceil]) ** 2

        response = synth._slot_responses(
            env, apr, vuv, time_shift, noise_size, valid,
            time_index_global=t_start + ti, span=T_g,
            batch_offset=self._batch_offset(B))

        # local OLA + neighbor spill exchange
        from ..kernels.pallas_ola import overlap_add
        buf = overlap_add(ti, response, T_l + L)        # (B, T_l + L)
        recv_tail = lax.ppermute(buf[:, T_l:T_l + L], self.tp, fwd)
        recv_head = lax.ppermute(buf[:, :H], self.tp, bwd)
        recv_tail = jnp.where(tp_i == 0, 0.0, recv_tail)
        recv_head = jnp.where(tp_i == ntp - 1, 0.0, recv_head)
        y = buf[:, H:H + T_l]
        y = y.at[:, :H].add(recv_tail[:, H:])
        y = y.at[:, T_l - H:].add(recv_head)
        return y

    def _local_analyze(self, x_blk):
        f0 = self._local_pitch(x_blk)
        ap = self._local_ap(x_blk, f0)
        sp = self._local_sp(x_blk, f0)
        return f0, ap, sp

    def _local_roundtrip(self, x_blk):
        f0, ap, sp = self._local_analyze(x_blk)
        return self._local_synth(f0, ap, sp)

    # ---------------------------------------------------------------- public
    def _specs(self):
        batch = (self.dp,) if self.dp else ()
        wav = P(*batch, self.tp)
        frames = P(*batch, self.tp, None)
        f0s = P(*batch, self.tp)
        return wav, f0s, frames

    def _shard(self, fn, in_specs, out_specs):
        return jax.shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    def _check_t(self, T: int) -> None:
        ntp = self.mesh.shape[self.tp]
        if T % (self.frame_period * ntp):
            raise ValueError(
                "T must be divisible by frame_period * n_time_shards.")
        if T // ntp < max(TANDEM_HALO, self.fft_length):
            raise ValueError(
                "local block must be at least "
                f"max(TANDEM_HALO, fft_length) = "
                f"{max(TANDEM_HALO, self.fft_length)} samples.")

    def analyze(self, x: jnp.ndarray):
        self._check_t(x.shape[-1])
        wav, f0s, frames = self._specs()
        return self._shard(self._local_analyze, (wav,),
                           (f0s, frames, frames))(x)

    def synthesize(self, f0, ap, sp):
        self._check_t(sp.shape[-2] * self.frame_period)
        wav, f0s, frames = self._specs()
        return self._shard(self._local_synth, (f0s, frames, frames),
                           wav)(f0, ap, sp)

    def analysis_synthesis(self, x: jnp.ndarray) -> jnp.ndarray:
        self._check_t(x.shape[-1])
        wav, _, _ = self._specs()
        return self._shard(self._local_roundtrip, (wav,), wav)(x)
