"""WORLD synthesis (reference: diffsptk/modules/world_synth.py:58-321).

TPU-first redesign of the pulse machinery (SURVEY.md §7 hard-part #2): the
reference extracts pulse positions with ``torch.nonzero`` (data-dependent
shape).  Here pulses live in a fixed-size slot table of
``max_pulses = T / min_period`` entries per batch row: a cumsum of the pulse
mask assigns each pulse an ordinal, one scatter writes its time index into
its slot, and all per-pulse responses (minimum-phase spectra, fractional
shifts, noise) are computed batched over slots with invalid slots masked.
The final overlap-add is one scatter-add of (B, max_pulses, fft_length)
into (B, T + margin).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseNonFunctionalOp
from .world_common import TAU, noise_dft_plans, synthesis_response_plans


_PHASE_BITS = 22      # f32 path: TAU = 2^22 int32 units (wraps mod 2^32)
_PHASE_BITS64 = 52    # f64 path: TAU = 2^52 int64 units (wraps mod 2^64)

# Response-plan matmul precision.  Single-pass bf16 changes the vocoded
# waveform by ~1e-3 relative — measured spec-corr on the bench chain is
# identical to 4 decimal places (0.8368 vs 0.8367 at bf16x3) against a
# 0.95 acceptance bar — at ~60% of the synthesis matmul cost.  CPU/f64
# parity paths are unaffected (precision only changes TPU lowering).
_RESP_PRECISION = jax.lax.Precision.DEFAULT


def phase_units(rate: jnp.ndarray) -> jnp.ndarray:
    """Per-sample phase increments in fixed-point units.

    The scale adapts to the input precision: f64 rates use 2^52 units in
    int64 (quantization ~1.4e-15 TAU/sample — at this resolution every
    *voiced* pulse lands on the same sample as the reference's f64
    cumsum; only exact phase-wrap ties in the default-f0 unvoiced region
    can differ, and those carry noise only), f32 rates use 2^22 units in
    int32 (TPU path; strictly better than an f32 cumsum, whose error
    grows to ~radians over a second).  Both scales divide the integer
    modulus, so the wrapped phase is exact and bitwise independent of
    summation order — the property the sharded synthesis
    (parallel/world.py) relies on.
    """
    if rate.dtype == jnp.float64:
        return jnp.round(rate * (float(1 << _PHASE_BITS64) / TAU)).astype(
            jnp.int64)
    return jnp.round(rate * (float(1 << _PHASE_BITS) / TAU)).astype(
        jnp.int32)


def units_to_phase(units: jnp.ndarray, dtype) -> jnp.ndarray:
    """Wrapped phase in [0, TAU) from (possibly overflowed) unit sums."""
    bits = _PHASE_BITS64 if units.dtype == jnp.int64 else _PHASE_BITS
    return (units & ((1 << bits) - 1)).astype(dtype) * (
        TAU / float(1 << bits))


def _wrap_phase_fixed_point(rate: jnp.ndarray) -> jnp.ndarray:
    units = jnp.cumsum(phase_units(rate), axis=-1)    # wraps mod 2^32
    return units_to_phase(units, rate.dtype)


class WorldSynthesis(BaseNonFunctionalOp):
    """(f0 (B?, N), aperiodicity (B?, N, D), envelope (B?, N, D)) ->
    waveform (B?, N*P).

    Examples
    --------
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> t = jnp.arange(3199.0) / 16000   # T % P != 0 (see Pitch framing)
    >>> x = jnp.sin(2 * jnp.pi * 220 * t)
    >>> f0 = diffsptk_tpu.Pitch(80, 16000, algorithm="yin",
    ...                         out_format="f0", f_min=80, f_max=400)(x)
    >>> A = diffsptk_tpu.Aperiodicity(80, 16000, 1024,
    ...                               algorithm="tandem")(x, f0)
    >>> S = diffsptk_tpu.PitchAdaptiveSpectralAnalysis(80, 16000, 1024)(
    ...     x, f0)
    >>> diffsptk_tpu.WorldSynthesis(80, 16000, 1024)(f0, A, S).shape
    (3200,)
    """

    def __init__(self, frame_period: int, sample_rate: int, fft_length: int,
                 *, default_f0: float = 500, f0_ceil: float = 1200.0,
                 f0_floor: float | None = None, seed: int = 0,
                 dtype=None) -> None:
        if frame_period <= 0:
            raise ValueError("frame_period must be positive.")
        if sample_rate < 8000:
            raise ValueError("sample_rate must be at least 8000 Hz.")
        if fft_length < 1024:
            raise ValueError("fft_length must be at least 1024.")
        self.frame_period = frame_period
        self.sample_rate = sample_rate
        self.fft_length = fft_length
        self.default_f0 = default_f0
        self.f0_ceil = max(f0_ceil, default_f0)
        self.seed = seed

        # Per-pulse noise spans the gap to the next pulse, bounded by
        # sr/f0 of the lowest pulse rate.  When the caller promises a
        # pitch floor, the noise table shrinks from fft_length to that
        # bound (rounded up to the 128-lane TPU tile) — ~3x fewer
        # counter-based Gaussian draws at speech configs.  f0 inputs
        # below the floor get their noise segment truncated at the
        # bound; f0_floor=None keeps the exact full-length behavior.
        if f0_floor is None:
            self.noise_length = fft_length
        else:
            if f0_floor <= 0:
                raise ValueError("f0_floor must be positive.")
            # + frame_period: at a voicing crossover the interpolated f0
            # dips to ~f0_floor/2 for at most one frame, stretching that
            # one gap by up to a frame period.
            bound = (int(round(sample_rate / min(f0_floor, default_f0)))
                     + frame_period + 2)
            self.noise_length = min(fft_length, -(-bound // 128) * 128)

        self.ramp = jnp.arange(fft_length)
        # The DC remover (GetDCRemover()) is folded into the static
        # response plan — see world_common.synthesis_response_plans.

    def _slot_noise(self, time_index: jnp.ndarray, span: int,
                    batch_offset, length: int, dtype) -> jnp.ndarray:
        """Per-slot Gaussian noise keyed by (global batch row, pulse
        position): a counter-based stream that is invariant to how the
        slot table is partitioned across devices.  ``span`` is the
        global signal length (the counter stride between batch rows);
        ``batch_offset`` the global index of local row 0.
        """
        B = time_index.shape[0]
        base = jax.random.PRNGKey(self.seed)
        ctr = ((jnp.arange(B, dtype=jnp.int32)[:, None] + batch_offset)
               * jnp.int32(span) + time_index)
        keys = jax.vmap(jax.vmap(lambda c: jax.random.fold_in(base, c)))(
            ctr)
        return jax.vmap(jax.vmap(
            lambda k: jax.random.normal(k, (length,), dtype)))(keys)

    def _slot_responses(self, env, apr, vuv, time_shift, noise_size,
                        valid, time_index_global, span: int,
                        batch_offset) -> jnp.ndarray:
        """Per-slot periodic + aperiodic responses (B, Pmax, L), already
        masked by slot validity — the sharding-independent core of the
        synthesis (reference: world_synth.py:251-295)."""
        L = self.fft_length
        D = env.shape[-1]

        # GetNoiseSpectrum() — noise is keyed per slot by the pulse's
        # global sample position (batch row folded in), so any (dp, tp)
        # sharding of the synthesis reproduces the identical stream
        # (the reference consumes one sequential randn stream, which
        # would make sharded and unsharded outputs diverge).  Only
        # noise_length samples are drawn (see __init__); the real-DFT
        # matmul plan zero-pads to L implicitly.
        Ln = self.noise_length
        noise = self._slot_noise(time_index_global, span=span,
                                 batch_offset=batch_offset,
                                 length=Ln, dtype=env.dtype)
        mask = self.ramp[:Ln] < noise_size
        noise = noise * mask
        avg = jnp.sum(noise, axis=-1, keepdims=True) / jnp.where(
            noise_size == 0, 1, noise_size)
        noise = (noise - avg) * mask
        Cn, Sn = noise_dft_plans(noise.shape[-1], L)
        Cn = jnp.asarray(Cn, noise.dtype)
        Sn = jnp.asarray(Sn, noise.dtype)
        noise_spectrum = (
            jnp.matmul(noise, Cn, precision=_RESP_PRECISION),
            jnp.matmul(noise, Sn, precision=_RESP_PRECISION))

        # GetPeriodicResponse() + GetAperiodicResponse() + DC removal +
        # the vuv/noise_size/valid blend: everything after the Hilbert
        # angle is linear in the four spectra, so it all folds into ONE
        # static (4K, L) plan (world_common.synthesis_response_plans) —
        # magnitude = exp(u) is free, angle = u @ H (discrete Hilbert),
        # and a single MXU matmul emits the finished masked response.
        # The reference runs this as two serial hffts plus three
        # elementwise passes (world_synth.py:251-314).
        weight_p = 1 - apr
        weight_a = jnp.where(0 < vuv, apr, 1.0)
        Hm, Pfold = synthesis_response_plans(L)
        dt = env.dtype
        Hm, Pfold = jnp.asarray(Hm, dt), jnp.asarray(Pfold, dt)
        prec = _RESP_PRECISION
        u = 0.5 * jnp.log(jnp.stack((weight_p, weight_a)) * env)
        ang = jnp.matmul(u, Hm, precision=prec)
        mag = jnp.exp(u)
        coeff = TAU * self.sample_rate / L * time_shift
        th_p = ang[0] - self.ramp[:D] * coeff[..., None]
        s_p = ((0.5 < vuv) * jnp.sqrt(noise_size)
               * valid[..., None] / L).astype(dt)
        s_a = valid[..., None].astype(dt) / L
        re_p = mag[0] * jnp.cos(th_p) * s_p
        im_p = mag[0] * jnp.sin(th_p) * s_p
        re_a = mag[1] * jnp.cos(ang[1])
        im_a = mag[1] * jnp.sin(ang[1])
        nre, nim = noise_spectrum
        re_a, im_a = ((re_a * nre - im_a * nim) * s_a,
                      (re_a * nim + im_a * nre) * s_a)
        X = jnp.concatenate([re_p, im_p, re_a, im_a], axis=-1)
        return jnp.matmul(X, Pfold, precision=prec)

    def __call__(self, f0, ap, sp, out_length: int | None = None):
        one_d = f0.ndim == 1
        if one_d:
            f0, ap, sp = f0[None], ap[None], sp[None]

        B, N, D = sp.shape
        P = self.frame_period
        T = N * P
        L = self.fft_length
        H = L // 2

        eps = 1e-6
        ap = jnp.clip(ap, eps, 1 - eps)
        sp = jnp.clip(sp, min=eps)

        # GetTemporalParametersForTimeBase()
        f_min = self.sample_rate / L + 1
        coarse_f0 = jax.lax.stop_gradient(jnp.where(f0 < f_min, 0.0, f0))
        coarse_vuv = (0 < coarse_f0).astype(coarse_f0.dtype)
        # Frame-rate -> sample-rate upsampling on the uniform frame grid:
        # because the sample->frame map is t//P, the two lerp endpoints
        # are a P-fold repeat of the frame track and of its shift-by-one
        # (edge-extended) — pure broadcast/reshape, no gathers (even
        # static-index gathers scalarize to ~B*T element fetches on
        # TPU, ~0.5 ms at speech scale).  Equal to the reference's
        # interp1 with constant extrapolation past the last frame.
        wt = jnp.asarray((np.arange(P) / P)[None, :], f0.dtype)  # (1, P)

        def upsample(c):
            c = c[..., :N]              # tolerate an over-long f0 track
            lo = c[..., :, None]                              # (B, N, 1)
            hi = jnp.concatenate([c[..., 1:], c[..., -1:]],
                                 axis=-1)[..., :, None]
            out = lo * (1 - wt) + hi * wt                     # (B, N, P)
            return out.reshape(*c.shape[:-1], N * P)

        interp_f0 = upsample(coarse_f0)
        interp_vuv = upsample(coarse_vuv) > 0.5
        interp_f0 = jnp.where(interp_vuv, interp_f0, self.default_f0)

        # GetPulseLocationsForTimeBase() — fixed slot table.  The phase
        # integral runs in fixed point (TAU = 2^22 units): an f32 cumsum
        # loses ~3 radians over a second of audio (the total phase grows
        # to ~1e5 rad), scattering pulse positions, while int32 addition
        # wraps exactly mod 2^32 and 2^22 | 2^32 makes the wrapped phase
        # exact (quantization error ~1.5e-6 rad/sample, unbiased).  It
        # is also bitwise independent of summation order — the property
        # the sharded synthesis (parallel/world.py) relies on.
        wrap_phase = _wrap_phase_fixed_point(
            TAU / self.sample_rate * interp_f0)
        dphase = jnp.abs(jnp.diff(wrap_phase, axis=-1))   # (B, T-1)
        pulse_mask = jnp.pi < dphase

        # Pulses fire at phase wraps of interp_f0, which is bounded by
        # f0_ceil (voiced) and default_f0 (unvoiced), both <= f0_ceil:
        # the minimum pulse spacing is sr/f0_ceil samples.  The slot
        # table sizes every per-pulse FFT, so this bound is the knob
        # that sets synthesis cost.
        min_period = max(int(self.sample_rate / self.f0_ceil), 1)
        max_pulses = T // min_period + 2

        # Slot s holds the s-th pulse's time index: the first t whose
        # running pulse count reaches s+1.  A vmapped binary search over
        # the (nondecreasing) mask cumsum finds all Pmax slots in
        # log2(T) batched gathers — a scatter formulation (ordinal
        # scatter of every sample's index) serializes ~B*T scalar
        # writes on TPU and costs ~1 ms at speech scale.
        csum = jnp.cumsum(pulse_mask.astype(jnp.int32), axis=-1)
        wanted = jnp.arange(1, max_pulses + 1, dtype=jnp.int32)
        time_index = jax.vmap(
            lambda c: jnp.searchsorted(c, wanted, side="left"))(
                csum).astype(jnp.int32)                   # (B, Pmax)
        n_pulses = csum[:, -1]                            # (B,)
        valid = jnp.arange(max_pulses)[None, :] < n_pulses[:, None]
        # Invalid slots repeat the last valid pulse index so the trailing
        # diff (noise_size of the final pulse) is 0, as in the reference
        # (world_synth.py:277 appends the last index).
        last_valid = jnp.max(jnp.where(valid, time_index, 0), axis=-1,
                             keepdims=True)
        time_index = jnp.where(valid, time_index, last_valid)

        bidx = jnp.arange(B)[:, None]

        # Fractional pulse-time shift.  Per-element take_along_axis on
        # the (B, T) grid scalarizes on TPU (~0.15 ms per gather), so
        # the two phase reads collapse into ONE vectorized row gather:
        # (wrap_phase, dphase) pairs are interleaved into 128-lane rows
        # and the lane is selected by a one-hot reduce.  The identities
        # y1 = wrap[t]-TAU and y2-y1 = TAU-dphase[t] (a pulse is a
        # wrap, so the increment is TAU minus the wrapped jump) put
        # both reads at the same index t.
        half = 64
        pair = jnp.stack([wrap_phase[..., :-1], dphase], axis=-1)
        Tp = -(-(T - 1) // half) * half
        pair = jnp.pad(pair, ((0, 0), (0, Tp - (T - 1)), (0, 0)))
        pair = pair.reshape(B, Tp // half, 2 * half)
        rows = jnp.take_along_axis(
            pair, (time_index // half)[..., None], axis=1)  # (B,Pmax,128)
        lane = 2 * (time_index % half)[..., None]
        sel = jnp.arange(2 * half)[None, None, :]
        wrap_ti = jnp.sum(rows * (sel == lane), axis=-1)
        dphase_ti = jnp.sum(rows * (sel == lane + 1), axis=-1)
        time_shift = ((TAU - wrap_ti) / (TAU - dphase_ti)
                      / self.sample_rate)                  # (B, Pmax)

        # GetSpectralEnvelope() / GetAperiodicRatio() — one fused gather
        # over the concatenated (sp | ap | vuv) rows instead of four
        # D-wide gathers plus a scalarized vuv gather (per-row gather
        # overhead dominates at D=K; the vuv lerp at the pulse's frame
        # coordinate equals the sample-rate upsample's value there).
        # (A Pallas windowed-gather variant measured ~1 ms slower here:
        # 17-sublane-row windows per slot serialize worse than the XLA
        # row gather.)
        frame = time_index.astype(f0.dtype) / P
        f_floor = jnp.clip(jnp.floor(frame).astype(jnp.int32), max=N - 1)
        f_ceil = jnp.clip(jnp.ceil(frame).astype(jnp.int32), max=N - 1)
        w_hi = (frame - f_floor)[..., None]
        w_lo = 1 - w_hi
        spap = jnp.concatenate(
            [sp, ap, coarse_vuv[..., :N, None]], axis=-1)  # (B, N, 2D+1)
        g = w_lo * spap[bidx, f_floor] + w_hi * spap[bidx, f_ceil]
        env = g[..., :D]
        apr = g[..., D:2 * D] ** 2
        vuv = g[..., 2 * D:] > 0.5                         # (B, Pmax, 1)

        noise_size = jnp.diff(time_index, axis=-1,
                              append=time_index[:, -1:])
        noise_size = jnp.clip(noise_size, min=0)[..., None]
        response = self._slot_responses(
            env, apr, vuv, time_shift, noise_size, valid,
            time_index_global=time_index, span=T, batch_offset=0)

        # Synthesis(): masked overlap-add through the Pallas OLA kernel
        # (VMEM-resident output row, per-slot dynamic-slice adds);
        # windowed scatter-add fallback off-TPU.
        from ..kernels.pallas_ola import overlap_add
        margin = (L + P - 1) // P * P
        T_ = T + margin
        y = overlap_add(time_index, response, T_)
        y = y[:, H:H + T]

        if one_d:
            y = y[0]
        if out_length is not None:
            y = y[..., :out_length]
        return y
