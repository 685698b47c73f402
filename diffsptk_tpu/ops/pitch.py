"""Pitch extraction (reference: diffsptk/modules/pitch.py).

The reference wraps the pretrained torchcrepe/penn CNNs.  This build ships:

* ``algorithm='yin'`` (default): a TPU-native batched YIN tracker —
  FFT-based difference function, cumulative-mean normalization, threshold
  dip picking with parabolic refinement.  Fully jittable, no pretrained
  weights needed (weights for the neural trackers cannot be downloaded in
  a hermetic build).
* ``algorithm in ('crepe', 'fcnf0')``: native JAX implementations of the
  CREPE and FCNF0++ networks (see pitch_nn.py) — pass ``weights=`` to load
  a converted pretrained checkpoint; without weights they run with a
  deterministic random initialization (this hermetic image cannot fetch
  the released checkpoints) and warn.

Output formats match the reference: pitch (period in samples), f0, log-f0
(unvoiced -> -1e10), prob, embed (crepe only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import BaseNonFunctionalOp

UNVOICED_SYMBOL = 0.0


def _yin_frames(x: jnp.ndarray, frame_period: int, window_length: int,
                tau_max: int) -> jnp.ndarray:
    """Slice frames of length window_length + tau_max every frame_period
    (centered), zero-padded at the edges."""
    L = window_length + tau_max
    P = frame_period
    T = x.shape[-1]
    # Reference frame-count convention (torchcrepe/penn hop framing,
    # reference pitch.py:247-252): one frame centered at every multiple
    # of the frame period in [0, T], i.e. T // P + 1 frames.
    n_frames = T // P + 1
    # Frame rows as K = ceil(L/P) static slices of the (n, P) period
    # view concatenated on the last axis — pure copies; an
    # advanced-index gather scalarizes to ~n_frames*L element fetches
    # on TPU.
    K = -(-L // P)
    total = (n_frames + K) * P
    pad = [(0, 0)] * (x.ndim - 1) + [(L // 2, max(total - L // 2 - T, 0))]
    xp = jnp.pad(x, pad)[..., :total]
    v = xp.reshape(xp.shape[:-1] + (n_frames + K, P))
    return jnp.concatenate(
        [v[..., i:i + n_frames, :] for i in range(K)], axis=-1)[..., :L]


import functools


@functools.lru_cache(maxsize=None)
def _yin_plans(L: int, W: int, tau_max: int):
    """Static matmul plans for the YIN difference function.

    The batched 2048-pt XLA TPU FFTs of the correlation form cost
    ~0.4 ms each at speech scale and the frame-axis cumsum another
    ~0.35 ms; as plans, the whole difference function is two MXU
    matmuls: forward = frames @ [C_full | S_full | C_head | S_head]
    (head masking folded into zeroed plan rows), inverse = the real
    inverse DFT evaluated at lags [0, tau_max) with the energy-window
    band matrix appended so d's energy terms ride the same matmul pair.
    """
    nfft = 2 * (-(-(L + 1) // 2))               # any even nfft >= L works
    K = nfft // 2 + 1
    t = np.arange(L)
    k = np.arange(K)
    ang = 2.0 * np.pi * np.outer(t, k) / nfft
    Cf = np.cos(ang)
    Sf = -np.sin(ang)
    head = (t < W).astype(np.float64)[:, None]
    fwd = np.concatenate([Cf, Sf, Cf * head, Sf * head], axis=1)
    w = np.full(K, 2.0)
    w[0] = 1.0
    if nfft % 2 == 0:
        w[-1] = 1.0
    tau = np.arange(tau_max)
    iang = 2.0 * np.pi * np.outer(k, tau) / nfft
    ICc = (w[:, None] * np.cos(iang)) / nfft
    ICs = (-w[:, None] * np.sin(iang)) / nfft
    # energy band matrix: e[tau] = sum_{tau <= j < tau+W} frames[j]^2
    Eb = ((tau[None, :] <= t[:, None])
          & (t[:, None] < tau[None, :] + W)).astype(np.float64)
    return fwd, ICc, ICs, Eb, K


def yin_difference(frames: jnp.ndarray, window_length: int,
                   tau_max: int) -> jnp.ndarray:
    """d[tau] = sum_{j<W} (x[j] - x[j+tau])^2 for tau in [0, tau_max)."""
    import jax

    L = frames.shape[-1]
    W = window_length
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if on_tpu:
        fwd, ICc, ICs, Eb, K = _yin_plans(L, W, tau_max)
        dt = frames.dtype
        hi = jax.lax.Precision.HIGHEST
        F = jnp.matmul(frames, jnp.asarray(fwd, dt), precision=hi)
        Fre, Fim = F[..., :K], F[..., K:2 * K]
        Hre, Him = F[..., 2 * K:3 * K], F[..., 3 * K:]
        Pre = Hre * Fre + Him * Fim                   # conj(H) * F
        Pim = Hre * Fim - Him * Fre
        acf = (jnp.matmul(Pre, jnp.asarray(ICc, dt), precision=hi)
               + jnp.matmul(Pim, jnp.asarray(ICs, dt), precision=hi))
        e_tau = jnp.matmul(jnp.square(frames), jnp.asarray(Eb, dt),
                           precision=hi)
        return e_tau[..., :1] + e_tau - 2 * acf

    n_fft = 1
    while n_fft < 2 * L:
        n_fft *= 2
    head = frames[..., :window_length]
    F_full = jnp.fft.rfft(frames, n=n_fft)
    F_head = jnp.fft.rfft(head, n=n_fft)
    acf = jnp.fft.irfft(jnp.conj(F_head) * F_full)[..., :tau_max]
    sq = jnp.cumsum(jnp.square(frames), axis=-1)
    e0 = sq[..., window_length - 1]
    # energy of x[tau : tau+W]
    pad = jnp.pad(sq, [(0, 0)] * (sq.ndim - 1) + [(1, 0)])
    idx = np.arange(tau_max)
    e_tau = (jnp.take(pad, idx + window_length, axis=-1)
             - jnp.take(pad, idx, axis=-1))
    return e0[..., None] + e_tau - 2 * acf


def yin_cmnd(d: jnp.ndarray) -> jnp.ndarray:
    """Cumulative-mean-normalized difference; d'[0] = 1."""
    tau = jnp.arange(d.shape[-1], dtype=d.dtype)
    csum = jnp.cumsum(d, axis=-1)
    cm = d * tau / jnp.where(csum == 0, 1.0, csum)
    return cm.at[..., 0].set(1.0)


class PitchExtractionByYIN:
    def __init__(self, frame_period: int, sample_rate: int, *,
                 f_min: float = 60.0, f_max: float = 500.0,
                 voicing_threshold: float = 0.3,
                 window_length: int | None = None) -> None:
        self.frame_period = frame_period
        self.sample_rate = sample_rate
        self.f_min = f_min
        self.f_max = f_max
        self.voicing_threshold = voicing_threshold
        self.tau_min = max(int(sample_rate / f_max), 2)
        self.tau_max = int(np.ceil(sample_rate / f_min)) + 1
        self.window_length = window_length or 2 * self.tau_max

    def calc_prob(self, x: jnp.ndarray,
                  frames: jnp.ndarray | None = None) -> jnp.ndarray:
        if frames is None:
            frames = _yin_frames(x, self.frame_period, self.window_length,
                                 self.tau_max)
        d = yin_difference(frames, self.window_length, self.tau_max)
        return yin_cmnd(d)

    def calc_embed(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError(
            "out_format 'embed' requires algorithm='crepe'.")

    def calc_pitch(self, x: jnp.ndarray,
                   frames: jnp.ndarray | None = None) -> jnp.ndarray:
        """Returns f0 in Hz with 0 at unvoiced frames.  ``frames``
        bypasses internal framing (sharded callers frame locally after
        a halo exchange)."""
        cm = self.calc_prob(x, frames)                   # (..., N, tau_max)
        tau_axis = jnp.arange(self.tau_max)
        in_range = (self.tau_min <= tau_axis) & (tau_axis
                                                 < self.tau_max - 1)
        cm_masked = jnp.where(in_range, cm, jnp.inf)

        # first local minimum below the threshold (YIN step 4)
        prev = jnp.concatenate([cm[..., :1] + 1, cm[..., :-1]], axis=-1)
        nxt = jnp.concatenate([cm[..., 1:], cm[..., -1:] + 1], axis=-1)
        is_local_min = (cm < prev) & (cm <= nxt)
        below = (cm_masked < self.voicing_threshold) & is_local_min
        any_below = jnp.any(below, axis=-1)
        first_dip = jnp.argmax(below, axis=-1)
        global_min = jnp.argmin(cm_masked, axis=-1)
        tau_star = jnp.where(any_below, first_dip, global_min)

        # refine the dip: local minimum after first crossing
        # parabolic interpolation around tau_star
        t = tau_star
        tm = jnp.clip(t - 1, 0, self.tau_max - 1)
        tp = jnp.clip(t + 1, 0, self.tau_max - 1)
        ym = jnp.take_along_axis(cm, tm[..., None], -1)[..., 0]
        y0 = jnp.take_along_axis(cm, t[..., None], -1)[..., 0]
        yp = jnp.take_along_axis(cm, tp[..., None], -1)[..., 0]
        denom = ym - 2 * y0 + yp
        offset = jnp.where(jnp.abs(denom) > 1e-12,
                           0.5 * (ym - yp) / jnp.where(denom == 0, 1.0,
                                                       denom), 0.0)
        offset = jnp.clip(offset, -1.0, 1.0)
        tau_ref = t.astype(cm.dtype) + offset

        cmin = jnp.min(cm_masked, axis=-1)
        voiced = cmin < self.voicing_threshold
        f0 = jnp.where(voiced, self.sample_rate / jnp.maximum(tau_ref, 1.0),
                       UNVOICED_SYMBOL)
        return f0


class Pitch(BaseNonFunctionalOp):
    """Waveform (B?, T) -> pitch/f0/log-f0 (B?, N) or prob (B?, N, C).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> import diffsptk_tpu
    >>> t = jnp.arange(3200.0) / 16000
    >>> x = jnp.sin(2 * jnp.pi * 220 * t)
    >>> p = diffsptk_tpu.Pitch(80, 16000, algorithm="yin",
    ...                        out_format="f0", f_min=80, f_max=400)
    >>> f0 = p(x)
    >>> float(np.round(np.median(np.asarray(f0)[10:30]), 1))
    220.0
    """

    def __init__(self, frame_period: int, sample_rate: int,
                 algorithm: str = "yin", out_format: str | int = "pitch",
                 **kwargs) -> None:
        if frame_period <= 0:
            raise ValueError("frame_period must be positive.")
        if sample_rate < 8000:
            raise ValueError("sample_rate must be at least 8000 Hz.")

        if algorithm == "yin":
            self.extractor = PitchExtractionByYIN(frame_period, sample_rate,
                                                  **kwargs)
        elif algorithm == "crepe":
            from .pitch_nn import PitchExtractionByCREPE
            self.extractor = PitchExtractionByCREPE(frame_period,
                                                    sample_rate, **kwargs)
        elif algorithm == "fcnf0":
            from .pitch_nn import PitchExtractionByFCNF0
            self.extractor = PitchExtractionByFCNF0(frame_period,
                                                    sample_rate, **kwargs)
        else:
            raise ValueError(f"algorithm {algorithm} is not supported.")

        def calc_pitch(x, convert, unvoiced_symbol=UNVOICED_SYMBOL):
            f0 = self.extractor.calc_pitch(x)
            mask = f0 != UNVOICED_SYMBOL
            safe = jnp.where(mask, f0, 1.0)
            return jnp.where(mask, convert(safe), unvoiced_symbol)

        if out_format in (0, "pitch"):
            self.convert = lambda x: calc_pitch(x, lambda y: sample_rate / y)
        elif out_format in (1, "f0"):
            self.convert = lambda x: calc_pitch(x, lambda y: y)
        elif out_format in (2, "log-f0"):
            self.convert = lambda x: calc_pitch(x, jnp.log, -1.0e10)
        elif out_format == "prob":
            self.convert = lambda x: self.extractor.calc_prob(x)
        elif out_format == "embed":
            self.convert = lambda x: self.extractor.calc_embed(x)
        else:
            raise ValueError(f"out_format {out_format} is not supported.")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jax.lax.stop_gradient(self.convert(x))
