"""Neural pitch extraction networks, implemented natively in JAX
(reference: diffsptk/modules/pitch.py:208-394, which wraps the external
pretrained ``torchcrepe`` and ``penn`` packages).

Both network families are re-implemented here as plain JAX forward
functions over a parameter pytree, so inference jits onto the MXU:

* ``CREPE`` [Kim et al. 2018] — the torchcrepe architecture, 'full' and
  'tiny' capacities.  Parameter names mirror the torch state dict
  (``conv1.weight``, ``conv1_BN.running_mean``, ``classifier.bias``, ...)
  so a released checkpoint converts mechanically.
* ``FCNF0`` [Morrison et al. 2023] — the penn FCNF0++ architecture
  (1024-sample frames at 8 kHz -> 1440 pitch bins, five-cent resolution).

This image has no network egress and does not bundle the pretrained
checkpoints, so ``weights=None`` falls back to a deterministic random
initialization and emits a warning: the full pipeline (resample -> frame
-> network -> Viterbi/local-expected-value decode -> voicing decision) is
exercised end-to-end, but pitch accuracy requires loading converted
weights via ``weights="/path/to/checkpoint"`` (.npz with torch state-dict
names, or a torch checkpoint if torch is importable).
"""

from __future__ import annotations

import logging
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import to_device_array
from ..utils.resample import Resampler
from .stft import ShortTimeFourierTransform


def hop_frames(x, window, hop, mode="constant", zmean=False):
    """Centered frames at every hop multiple in [0, T]: T // hop + 1
    frames (torchcrepe/penn hop convention — one more than
    Frame(center=True) when hop divides T; keeps every Pitch algorithm
    on the same frame count, see ops/pitch.py:_yin_frames)."""
    T = x.shape[-1]
    n = T // hop + 1
    left = window // 2
    right = max((n - 1) * hop + window - left - T, 0)
    cfg = [(0, 0)] * (x.ndim - 1) + [(left, right)]
    xp = jnp.pad(x, cfg, mode=mode)
    idx = np.arange(n)[:, None] * hop + np.arange(window)[None, :]
    y = xp[..., idx]
    if zmean:
        y = y - jnp.mean(y, axis=-1, keepdims=True)
    return y

logger = logging.getLogger("diffsptk_tpu")

UNVOICED_SYMBOL = 0.0

# ------------------------------------------------------------------ CREPE
CREPE_SAMPLE_RATE = 16000
CREPE_WINDOW_SIZE = 1024
CREPE_PITCH_BINS = 360
CREPE_CENTS_PER_BIN = 20.0
CREPE_CENTS_OFFSET = 1997.3794084376191
CREPE_MAX_FMAX = 2006.0
LOUDNESS_REF_DB = 20.0
LOUDNESS_MIN_DB = -100.0

_CREPE_CAPACITY = {
    "full": dict(in_channels=[1, 1024, 128, 128, 128, 256],
                 out_channels=[1024, 128, 128, 128, 256, 512],
                 in_features=2048),
    "tiny": dict(in_channels=[1, 128, 16, 16, 16, 32],
                 out_channels=[128, 16, 16, 16, 32, 64],
                 in_features=256),
}
_CREPE_KERNELS = [512, 64, 64, 64, 64, 64]
_CREPE_STRIDES = [4, 1, 1, 1, 1, 1]
_CREPE_PADS = [(254, 254)] + [(31, 32)] * 5
_CREPE_BN_EPS = 0.0010000000474974513


def crepe_cents_to_frequency(cents):
    """Cents on the CREPE scale (ref 10 Hz) -> Hz.

    Examples
    --------
    >>> import numpy as np
    >>> float(np.round(crepe_cents_to_frequency(crepe_bins_to_cents(180)), 1))
    253.6
    """
    return 10.0 * 2.0 ** (cents / 1200.0)


def crepe_bins_to_cents(bins):
    return CREPE_CENTS_PER_BIN * bins + CREPE_CENTS_OFFSET


def init_crepe_params(model: str = "full", seed: int = 0) -> dict:
    """Deterministic random init with torch-state-dict naming."""
    cap = _CREPE_CAPACITY[model]
    rng = np.random.RandomState(seed)
    params = {}
    for i, (ci, co, k) in enumerate(zip(cap["in_channels"],
                                        cap["out_channels"],
                                        _CREPE_KERNELS), start=1):
        std = 1.0 / math.sqrt(ci * k)
        params[f"conv{i}.weight"] = rng.randn(co, ci, k).astype(
            np.float32) * std
        params[f"conv{i}.bias"] = np.zeros(co, np.float32)
        params[f"conv{i}_BN.weight"] = np.ones(co, np.float32)
        params[f"conv{i}_BN.bias"] = np.zeros(co, np.float32)
        params[f"conv{i}_BN.running_mean"] = np.zeros(co, np.float32)
        params[f"conv{i}_BN.running_var"] = np.ones(co, np.float32)
    nf = cap["in_features"]
    params["classifier.weight"] = rng.randn(
        CREPE_PITCH_BINS, nf).astype(np.float32) / math.sqrt(nf)
    params["classifier.bias"] = np.zeros(CREPE_PITCH_BINS, np.float32)
    return params


def bundled_weights_path(name: str):
    """Path of a bundled checkpoint under diffsptk_tpu/assets, or None."""
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", name)
    return path if os.path.isfile(path) else None


def load_params(weights, init_fn, expect: dict | None = None,
                bundled: str | None = None) -> dict:
    """Load a parameter dict from .npz / torch checkpoint / dict.

    ``weights=None`` falls back to the bundled checkpoint named
    ``bundled`` (trained in-repo on synthetic pitched audio — see
    tools/train_crepe_tiny.py; the reference instead downloads released
    torchcrepe/penn weights, pitch.py:228,342).  Without a bundled file
    a deterministic random init is used with a warning."""
    if weights is None and bundled is not None:
        path = bundled_weights_path(bundled)
        if path is not None:
            logger.info("using bundled checkpoint %s", path)
            weights = path
    if weights is None:
        logger.warning(
            "no pretrained weights supplied; using deterministic random "
            "initialization — pitch output will not be meaningful. Pass "
            "weights='/path/to/checkpoint' (npz or torch state dict).")
        return init_fn()
    if isinstance(weights, dict):
        raw = weights
    elif str(weights).endswith(".npz"):
        raw = dict(np.load(weights))
    else:
        import torch
        state = torch.load(weights, map_location="cpu",
                           weights_only=False)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        elif isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        raw = {k: v.detach().cpu().numpy() for k, v in state.items()
               if hasattr(v, "detach")}
    params = {k: np.asarray(v) for k, v in raw.items()}
    if expect is not None:
        missing = [k for k in expect if k not in params]
        if missing:
            raise ValueError(f"checkpoint is missing parameters: {missing}")
        for k, ref in expect.items():
            if tuple(params[k].shape) != tuple(ref.shape):
                raise ValueError(
                    f"shape mismatch for {k}: checkpoint "
                    f"{params[k].shape} vs architecture {ref.shape}")
    return params


_NN_PRECISION = jax.lax.Precision.DEFAULT
# The pitch CNNs pin their conv precision explicitly: an explicit
# precision= wins over the library-wide full-f32 scope that
# BaseNonFunctionalOp.__call__ installs (core.full_precision) — without
# this the wrapped Pitch entry silently runs the convs 6-pass (3x).
# DEFAULT (single-pass bf16) is validated against bf16x3 on the
# vocoded-speech ground-truth eval (tests/test_pitch_speech.py):
# identical voiced recall, median and p90 cents on TPU — the softmax
# classifier is insensitive to conv rounding — at half the MXU cost
# (FCNF0 inference 31 -> 17 ms at the WORLD bench geometry).


def crepe_forward(params: dict, x: jnp.ndarray, model: str = "full",
                  embed: bool = False) -> jnp.ndarray:
    """CREPE forward: (B, 1024) frames -> (B, 360) probabilities (sigmoid)
    or (B, D) embeddings.  Mirrors torchcrepe's layer order
    conv -> ReLU -> BatchNorm(eval) -> MaxPool(2)."""
    cap = _CREPE_CAPACITY[model]
    h = x[:, None, :]                                   # (B, 1, T)

    def layer(h, i):
        w = params[f"conv{i}.weight"]
        b = params[f"conv{i}.bias"]
        pad = _CREPE_PADS[i - 1]
        h = jnp.pad(h, [(0, 0), (0, 0), pad])
        h = jax.lax.conv_general_dilated(
            h, jnp.asarray(w, h.dtype), window_strides=(_CREPE_STRIDES[i - 1],),
            padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
            precision=_NN_PRECISION)
        h = h + jnp.asarray(b, h.dtype)[None, :, None]
        h = jax.nn.relu(h)
        mean = jnp.asarray(params[f"conv{i}_BN.running_mean"], h.dtype)
        var = jnp.asarray(params[f"conv{i}_BN.running_var"], h.dtype)
        gamma = jnp.asarray(params[f"conv{i}_BN.weight"], h.dtype)
        beta = jnp.asarray(params[f"conv{i}_BN.bias"], h.dtype)
        h = ((h - mean[None, :, None])
             * jax.lax.rsqrt(var + _CREPE_BN_EPS)[None, :, None]
             * gamma[None, :, None] + beta[None, :, None])
        # max pool kernel 2 stride 2
        B, C, T = h.shape
        h = h[:, :, :T - T % 2].reshape(B, C, T // 2, 2).max(-1)
        return h

    for i in range(1, 5):
        h = layer(h, i)
    if embed:
        return h.reshape(h.shape[0], -1)
    for i in range(5, 7):
        h = layer(h, i)
    # (B, C, T) -> (B, T, C) -> flatten, as in torchcrepe
    h = jnp.swapaxes(h, 1, 2).reshape(h.shape[0], cap["in_features"])
    logits = jnp.matmul(h, jnp.asarray(params["classifier.weight"],
                                       h.dtype).T,
                        precision=_NN_PRECISION) \
        + jnp.asarray(params["classifier.bias"], h.dtype)
    return jax.nn.sigmoid(logits)


def viterbi_decode(probs: jnp.ndarray, transition: jnp.ndarray):
    """Max-product Viterbi over pitch bins.

    probs: (..., N, C) observation probabilities; transition: (C, C) row-
    normalized.  Returns (..., N) int32 state path via a forward
    lax.scan and a backward backtrace scan — O(N C^2) dense max-plus,
    which XLA maps onto the VPU."""
    logp = jnp.log(jnp.maximum(probs, 1e-20))
    logt = jnp.log(jnp.maximum(transition, 1e-20))

    def fwd(carry, obs):
        # carry: (..., C) best log-prob; obs: (..., C)
        scores = carry[..., :, None] + logt                # (..., C, C)
        best = jnp.max(scores, axis=-2) + obs
        arg = jnp.argmax(scores, axis=-2)                  # (..., C)
        return best, arg

    obs = jnp.moveaxis(logp, -2, 0)                        # (N, ..., C)
    init = obs[0]
    final, args = jax.lax.scan(fwd, init, obs[1:])
    last = jnp.argmax(final, axis=-1)                      # (...,)

    def bwd(state, arg):
        prev = jnp.take_along_axis(arg, state[..., None],
                                   axis=-1)[..., 0]
        return prev, prev

    _, path = jax.lax.scan(bwd, last, args, reverse=True)
    path = jnp.concatenate([path, last[None]], axis=0)     # (N, ...)
    return jnp.moveaxis(path, 0, -1).astype(jnp.int32)


def crepe_transition() -> np.ndarray:
    """torchcrepe's triangular pitch-transition matrix (decode.py)."""
    xx, yy = np.meshgrid(np.arange(CREPE_PITCH_BINS),
                         np.arange(CREPE_PITCH_BINS))
    t = np.maximum(12 - np.abs(xx - yy), 0).astype(np.float64)
    return t / t.sum(axis=1, keepdims=True)


def weighted_cents(probs: jnp.ndarray, bins: jnp.ndarray,
                   cents_fn, window: int = 4) -> jnp.ndarray:
    """Local weighted average of cents around the decoded bin (the
    torchcrepe 'weighted argmax' refinement)."""
    C = probs.shape[-1]
    offs = jnp.arange(-window, window + 1)
    idx = jnp.clip(bins[..., None] + offs, 0, C - 1)       # (..., 2w+1)
    w = jnp.take_along_axis(probs, idx, axis=-1)
    cents = cents_fn(idx.astype(probs.dtype))
    return jnp.sum(w * cents, axis=-1) / jnp.maximum(
        jnp.sum(w, axis=-1), 1e-12)


def a_weighting_db(frequencies: np.ndarray) -> np.ndarray:
    """IEC 61672 A-weighting in dB (as librosa.A_weighting)."""
    f2 = np.asarray(frequencies, np.float64) ** 2
    const = np.array([12194.217, 20.598997, 107.65265, 737.86223]) ** 2
    num = const[0] * f2**2
    den = ((f2 + const[0]) * (f2 + const[1])
           * np.sqrt((f2 + const[2]) * (f2 + const[3])))
    with np.errstate(divide="ignore"):
        return 2.0 + 20.0 * np.log10(np.maximum(num / np.maximum(den, 1e-300),
                                                1e-300))


def median_filter(x: jnp.ndarray, width: int) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - 1) + [(width // 2, width - 1 - width // 2)]
    xp = jnp.pad(x, pad, mode="edge")
    idx = np.arange(x.shape[-1])[:, None] + np.arange(width)[None, :]
    return jnp.median(xp[..., idx], axis=-1)


def mean_filter(x: jnp.ndarray, width: int) -> jnp.ndarray:
    pad = [(0, 0)] * (x.ndim - 1) + [(width // 2, width - 1 - width // 2)]
    xp = jnp.pad(x, pad, mode="edge")
    idx = np.arange(x.shape[-1])[:, None] + np.arange(width)[None, :]
    return jnp.mean(xp[..., idx], axis=-1)


class PitchExtractionByCREPE:
    """CREPE pitch extraction (reference: pitch.py:208-322)."""

    def __init__(self, frame_period: int, sample_rate: int, *,
                 f_min: float | None = None, f_max: float | None = None,
                 voicing_threshold: float = 1e-2,
                 silence_threshold: float = -60.0, filter_length: int = 3,
                 model: str = "full", weights=None, dtype=None) -> None:
        if model not in _CREPE_CAPACITY:
            raise ValueError("model must be 'tiny' or 'full'.")
        self.model = model
        self.f_min = 50.0 if f_min is None else f_min
        self.f_max = CREPE_MAX_FMAX if f_max is None else f_max
        if not 0 <= self.f_min < self.f_max <= sample_rate / 2:
            raise ValueError("Invalid f_min and f_max.")
        self.voicing_threshold = voicing_threshold
        self.silence_threshold = silence_threshold
        self.filter_length = filter_length

        hop = frame_period * CREPE_SAMPLE_RATE // sample_rate
        self.hop = hop
        self.stft = ShortTimeFourierTransform(
            CREPE_WINDOW_SIZE, hop, CREPE_WINDOW_SIZE, norm="none",
            window="hanning", out_format="db")
        self.resample = Resampler(sample_rate, CREPE_SAMPLE_RATE)

        self.params = load_params(weights,
                                  lambda: init_crepe_params(model),
                                  expect=init_crepe_params(model),
                                  bundled=f"crepe_{model}_synth.npz")
        self.transition = to_device_array(crepe_transition(), dtype)
        freqs = np.arange(CREPE_WINDOW_SIZE // 2 + 1) \
            * (CREPE_SAMPLE_RATE / CREPE_WINDOW_SIZE)
        self.perceptual_weights = to_device_array(
            a_weighting_db(freqs) - LOUDNESS_REF_DB, dtype)
        # restrict decodable bins to [f_min, f_max]
        cents = crepe_bins_to_cents(np.arange(CREPE_PITCH_BINS))
        freq = crepe_cents_to_frequency(cents)
        self.bin_mask = to_device_array(
            ((freq >= self.f_min) & (freq <= self.f_max)).astype(np.float64),
            dtype)

    def _probs(self, x: jnp.ndarray, embed: bool = False) -> jnp.ndarray:
        x = self.resample(x)
        if x.shape[-1] < CREPE_WINDOW_SIZE // 2:
            raise ValueError(
                f"Input length must be greater than "
                f"{CREPE_WINDOW_SIZE // 2} at {CREPE_SAMPLE_RATE} Hz.")
        frames = hop_frames(x, CREPE_WINDOW_SIZE, self.hop, zmean=True)
        frames = frames / jnp.maximum(
            jnp.std(frames, axis=-1, keepdims=True), 1e-10)
        B = frames.shape[:-1]
        # Network inference runs float32, as the reference does
        # (pitch.py:284 `x.float()`); results are cast back.
        y = crepe_forward(self.params,
                          frames.reshape(-1, CREPE_WINDOW_SIZE).astype(
                              jnp.float32),
                          self.model, embed=embed)
        return y.reshape(*B, -1).astype(x.dtype)

    def calc_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._probs(x, embed=False)

    def calc_embed(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._probs(x, embed=True)

    def calc_pitch(self, x: jnp.ndarray) -> jnp.ndarray:
        probs = self.calc_prob(x) * self.bin_mask
        bins = viterbi_decode(probs, self.transition)
        cents = weighted_cents(probs, bins, crepe_bins_to_cents)
        pitch = crepe_cents_to_frequency(cents)
        periodicity = jnp.take_along_axis(probs, bins[..., None],
                                          axis=-1)[..., 0]
        periodicity = median_filter(periodicity, self.filter_length)
        pitch = mean_filter(pitch, self.filter_length)

        # loudness frames follow the same hop convention as the net
        # frames (torchcrepe pads both identically), so no trim occurs
        loud_frames = hop_frames(x, CREPE_WINDOW_SIZE, self.hop)
        loudness = (self.stft.spec(self.stft.window(loud_frames))
                    + self.perceptual_weights)
        loudness = jnp.clip(loudness, min=LOUDNESS_MIN_DB).mean(-1)
        n = min(pitch.shape[-1], loudness.shape[-1])
        mask = ((periodicity[..., :n] < self.voicing_threshold)
                | (loudness[..., :n] < self.silence_threshold))
        return jnp.where(mask, UNVOICED_SYMBOL, pitch[..., :n])


# ------------------------------------------------------------------ FCNF0
PENN_SAMPLE_RATE = 8000
PENN_WINDOW_SIZE = 1024
PENN_PITCH_BINS = 1440
PENN_CENTS_PER_BIN = 5.0
PENN_FMIN = 31.0
PENN_FMAX = 1984.0

# (in_ch, out_ch, post-conv length, maxpool (kernel, stride) or None)
_FCNF0_BLOCKS = [
    (1, 256, 481, (2, 2)),
    (256, 32, 225, (2, 2)),
    (32, 32, 97, (2, 2)),
    (32, 128, 66, None),
    (128, 256, 35, None),
    (256, 512, 4, None),
]
_FCNF0_KERNEL = 32


def penn_bins_to_frequency(bins):
    return PENN_FMIN * 2.0 ** (PENN_CENTS_PER_BIN * bins / 1200.0)


def init_fcnf0_params(seed: int = 0) -> dict:
    rng = np.random.RandomState(seed)
    params = {}
    for i, (ci, co, ln, _pool) in enumerate(_FCNF0_BLOCKS):
        std = 1.0 / math.sqrt(ci * _FCNF0_KERNEL)
        params[f"block{i}.conv.weight"] = rng.randn(
            co, ci, _FCNF0_KERNEL).astype(np.float32) * std
        params[f"block{i}.conv.bias"] = np.zeros(co, np.float32)
        params[f"block{i}.norm.weight"] = np.ones((co, ln), np.float32)
        params[f"block{i}.norm.bias"] = np.zeros((co, ln), np.float32)
    params["head.weight"] = rng.randn(
        PENN_PITCH_BINS, 512, 4).astype(np.float32) / math.sqrt(512 * 4)
    params["head.bias"] = np.zeros(PENN_PITCH_BINS, np.float32)
    return params


def fcnf0_forward(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """FCNF0++ forward: (B, 1024) frames -> (B, 1440) logits.

    Valid (unpadded) conv1d stack with the penn layer plan: kernel 32
    throughout, max-pool 2 after the first three blocks, LayerNorm over
    (channels, length) per block, and a final 1x4 conv head; the input is
    cropped to 993 samples so the stack lands exactly on length 1."""
    h = x[:, None, 16:-15]                                  # (B, 1, 993)
    for i, (_ci, _co, _ln, pool) in enumerate(_FCNF0_BLOCKS):
        w = jnp.asarray(params[f"block{i}.conv.weight"], h.dtype)
        b = jnp.asarray(params[f"block{i}.conv.bias"], h.dtype)
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=_NN_PRECISION)
        h = h + b[None, :, None]
        if pool is not None:
            k, s = pool
            B, C, T = h.shape
            h = h[:, :, :T - T % s].reshape(B, C, T // s, k).max(-1)
        h = jax.nn.relu(h)
        # LayerNorm over (C, L) with elementwise affine
        mean = h.mean(axis=(-2, -1), keepdims=True)
        var = h.var(axis=(-2, -1), keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        h = (h * jnp.asarray(params[f"block{i}.norm.weight"], h.dtype)
             + jnp.asarray(params[f"block{i}.norm.bias"], h.dtype))
    w = jnp.asarray(params["head.weight"], h.dtype)
    logits = jax.lax.conv_general_dilated(
        h, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=_NN_PRECISION)
    logits = logits + jnp.asarray(params["head.bias"],
                                  h.dtype)[None, :, None]
    return logits[..., 0]                                   # (B, 1440)


class PitchExtractionByFCNF0:
    """FCNF0++ pitch extraction (reference: pitch.py:325-394)."""

    def __init__(self, frame_period: int, sample_rate: int, *,
                 f_min: float | None = None, f_max: float | None = None,
                 voicing_threshold: float = 0.5, weights=None,
                 dtype=None) -> None:
        self.f_min = PENN_FMIN if f_min is None else f_min
        self.f_max = PENN_FMAX if f_max is None else f_max
        if not 0 <= self.f_min < self.f_max <= sample_rate / 2:
            raise ValueError("Invalid f_min and f_max.")
        self.voicing_threshold = voicing_threshold

        hop = frame_period * PENN_SAMPLE_RATE // sample_rate
        self.hop = hop
        self.resample = Resampler(sample_rate, PENN_SAMPLE_RATE)
        self.params = load_params(weights, init_fcnf0_params,
                                  expect=init_fcnf0_params(),
                                  bundled="fcnf0_synth.npz")
        cents = PENN_CENTS_PER_BIN * np.arange(PENN_PITCH_BINS)
        freq = PENN_FMIN * 2.0 ** (cents / 1200.0)
        self.bin_mask = to_device_array(
            np.where((freq >= self.f_min) & (freq <= self.f_max),
                     0.0, -np.inf), dtype)

    def _logits(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.resample(x)
        if x.shape[-1] <= PENN_WINDOW_SIZE // 2:
            raise ValueError(
                f"Input length must be greater than "
                f"{PENN_WINDOW_SIZE // 2} at {PENN_SAMPLE_RATE} Hz.")
        frames = hop_frames(x, PENN_WINDOW_SIZE, self.hop, mode="reflect")
        B = frames.shape[:-1]
        # float32 inference, as the reference does (pitch.py:375).
        logits = fcnf0_forward(self.params,
                               frames.reshape(-1, PENN_WINDOW_SIZE).astype(
                                   jnp.float32))
        return logits.reshape(*B, PENN_PITCH_BINS).astype(x.dtype)

    def calc_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.softmax(self._logits(x), axis=-1)

    def calc_embed(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError(
            "FCNF0 does not expose embeddings (matching the reference).")

    def calc_pitch(self, x: jnp.ndarray) -> jnp.ndarray:
        logits = self._logits(x) + self.bin_mask
        probs = jax.nn.softmax(logits, axis=-1)
        bins = jnp.argmax(probs, axis=-1)
        # local expected value decoding over +-19 bins (penn default)
        cents = weighted_cents(
            probs, bins, lambda b: PENN_CENTS_PER_BIN * b, window=19)
        pitch = PENN_FMIN * 2.0 ** (cents / 1200.0)
        # periodicity = normalized inverse entropy (penn 'entropy' method)
        ent = -jnp.sum(probs * jnp.log(jnp.maximum(probs, 1e-20)), axis=-1)
        periodicity = 1.0 - ent / math.log(PENN_PITCH_BINS)
        return jnp.where(periodicity >= self.voicing_threshold, pitch,
                         UNVOICED_SYMBOL)
