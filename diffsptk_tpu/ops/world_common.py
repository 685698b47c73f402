"""Shared WORLD vocoder math (reference:
diffsptk/third_party/world/common.py:58-240, re-expressed in JAX with
static shapes: all f0-adaptive windows/smoothers are dense masked gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


TAU = 2 * np.pi


def interp1(x, y, xq, method: str = "linear", batching=(False, False)):
    """Piecewise-linear interpolation with constant extrapolation
    (matching the reference's interp1).

    Examples
    --------
    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> y = interp1(jnp.asarray([0.0, 1.0, 2.0]),
    ...             jnp.asarray([0.0, 10.0, 20.0]),
    ...             jnp.asarray([0.5, 1.5]))
    >>> np.round(np.asarray(y), 2)
    array([ 5., 15.])
    """
    if not batching[0]:
        x = jnp.broadcast_to(x, xq.shape[:-1] + x.shape[-1:])
    if not batching[1]:
        y = jnp.broadcast_to(y, xq.shape[:-1] + y.shape[-1:])
    m = jnp.diff(y, axis=-1) / jnp.diff(x, axis=-1)
    b = y[..., :-1] - m * x[..., :-1]
    indices = jax.vmap(jnp.searchsorted)(
        x.reshape(-1, x.shape[-1]), xq.reshape(-1, xq.shape[-1])
    ).reshape(xq.shape)
    if method == "linear":
        m = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(1, 1)])
        b = jnp.concatenate([y[..., :1], b, y[..., -1:]], axis=-1)
    elif method == "*linear":
        indices = jnp.clip(indices - 1, 0, m.shape[-1] - 1)
    else:
        raise ValueError(f"Unknown method: {method}")
    mg = jnp.take_along_axis(m, indices, axis=-1)
    bg = jnp.take_along_axis(b, indices, axis=-1)
    return mg * xq + bg


def interp1Q(x, shift, y, xi):
    """Quantized linear interpolation: sample y (uniform grid starting at x
    with step `shift`) at positions xi."""
    z = (xi - x) / shift
    base = jnp.clip(z.astype(jnp.int32), 0, y.shape[-1] - 1)
    frac = z - base
    delta = jnp.diff(y, axis=-1, append=y[..., -1:])
    yb = jnp.take_along_axis(y, base, axis=-1)
    db = jnp.take_along_axis(delta, base, axis=-1)
    return yb + db * frac


def _frame_windows(rows: jnp.ndarray, starts: jnp.ndarray, length: int,
                   guard: int):
    """Per-frame windowed reads rows[..., n, starts[..., n] + k].

    Flattens the frame axis into one guarded signal per batch row and
    rides the Pallas windowed-gather kernel; starts must satisfy
    0 <= start and start + length <= row_len + guard (the guard region
    reads zeros)."""
    from ..kernels.pallas_gather import gather_windows
    lead = rows.shape[:-2]
    n, d = rows.shape[-2], rows.shape[-1]
    stride = d + guard
    flat = jnp.pad(rows, [(0, 0)] * (rows.ndim - 1) + [(0, guard)])
    flat = flat.reshape(lead + (n * stride,))
    flat2 = flat.reshape(-1, n * stride)
    off = jnp.arange(n, dtype=jnp.int32) * stride
    st2 = (starts.astype(jnp.int32) + off).reshape(-1, n)
    win = gather_windows(flat2, st2, length)
    return win.reshape(lead + (n, length))


def dc_correction(power_spectrum, f0, sample_rate, fft_length, ramp,
                  max_bins: int | None = None):
    """Reflect sub-f0 spectrum mass around f0 (WORLD DCCorrection).

    The reference reads the spectrum at the reversed uniform positions
    f0 - k*rate via interp1Q (common.py:58).  The lerped reversed read
    corrected[k] = (1-f) ps[b0-k] + f ps[b0+1-k] is a per-frame shifted
    window of the flipped spectrum — one Pallas windowed gather
    (per-element XLA gathers scalarize on TPU; the FFT-convolution form
    this replaces spent ~0.4 ms in three batched transforms).
    ``max_bins`` statically bounds f0/rate + 2 (defaults to the full
    half-spectrum).
    """
    rate = sample_rate / fft_length
    D = fft_length // 2 + 1
    low_axis = ramp[:D] * rate
    mask = low_axis < f0

    c = f0 / rate                                   # (..., 1)
    b0 = jnp.clip(jnp.floor(c), 0, D - 2)
    f = c - b0
    Lh = D if max_bins is None else min(max_bins, D)

    # W[j] = psrev[(D-2-b0) + j] = ps[b0+1-j]; out-of-range reads
    # (b0+1-j < 0) land in the zero guard, matching the zero-padded
    # convolution this replaces.
    psrev = jnp.flip(power_spectrum, -1)
    starts = (D - 2 - b0[..., 0]).astype(jnp.int32)
    W = _frame_windows(psrev, starts, Lh + 1, guard=Lh + 2)
    corrected = f * W[..., :Lh] + (1 - f) * W[..., 1:Lh + 1]
    if Lh < D:
        pad = [(0, 0)] * (corrected.ndim - 1) + [(0, D - Lh)]
        corrected = jnp.pad(corrected, pad)
    return power_spectrum + corrected * mask


def get_minimum_phase_spectrum(spectrum):
    L = spectrum.shape[-1]
    nfft = 2 * (L - 1)
    cepstrum = jnp.fft.irfft(0.5 * jnp.log(spectrum), n=nfft)
    cepstrum = jnp.concatenate(
        (cepstrum[..., :1], 2 * cepstrum[..., 1:L - 1],
         cepstrum[..., L - 1:L]), axis=-1)
    C = jnp.fft.rfft(cepstrum, n=nfft)
    return jnp.exp(C.real) * jnp.exp(1j * C.imag)


@functools.lru_cache(maxsize=None)
def minimum_phase_plans(nfft: int):
    """Static plans for the matmul minimum-phase construction.

    The irfft -> causal fold -> rfft round trip of
    ``get_minimum_phase_spectrum`` is algebraically C = u + i H(u) with
    u = 0.5 log(spectrum): the real part comes back unchanged and the
    imaginary part is the discrete Hilbert transform of u — a static
    (K, K) matrix.  The final inverse transform of the synthesis
    (irfft(mps * phase) * L followed by fftshift) is likewise a static
    (K, nfft) matmul pair with the shift and scale folded into the plan
    columns.  Three matmuls replace three FFTs and all complex
    arithmetic (diffsptk_tpu redesign of reference
    third_party/world/common.py:73-85 + world_synth.py:251-295).

    Returns (H, IRe, IIm) float64: angle = u @ H;
    out[t] = sum_k Re[k] IRe[k,t] + Im[k] IIm[k,t].
    """
    # The fold weights (w[-1]=1, fold[K-1]=1) and the t + nfft//2
    # fftshift phasing are only correct for even nfft (odd-n fftshift
    # rolls by (n-1)//2); every WORLD caller passes a power of two.
    if nfft % 2 != 0:
        raise ValueError("minimum_phase_plans requires an even fft length.")
    K = nfft // 2 + 1
    t = np.arange(nfft)
    k = np.arange(K)
    # cep[t] = (1/nfft) sum_k w_k u[k] cos(2 pi k t / nfft)
    w = np.full(K, 2.0)
    w[0] = w[-1] = 1.0
    cos_kt = np.cos(2.0 * np.pi * np.outer(k, t) / nfft)    # (K, nfft)
    A = (w[:, None] * cos_kt) / nfft                        # u -> cep
    # causal fold weights then -sin projection back to K bins
    fold = np.full(nfft, 0.0)
    fold[0] = 1.0
    fold[1:K - 1] = 2.0
    fold[K - 1] = 1.0
    sin_tk = -np.sin(2.0 * np.pi * np.outer(t, k) / nfft)   # (nfft, K)
    H = A @ (fold[:, None] * sin_tk)                        # (K, K)
    # inverse transform with fftshift and the * nfft scale folded in:
    # out[t] = sum_k w_k (Re cos(2 pi k (t+H)/nfft) - Im sin(...))
    sh = t + nfft // 2
    IRe = w[:, None] * np.cos(2.0 * np.pi * np.outer(k, sh) / nfft)
    IIm = -w[:, None] * np.sin(2.0 * np.pi * np.outer(k, sh) / nfft)
    return H, IRe, IIm


@functools.lru_cache(maxsize=None)
def synthesis_response_plans(nfft: int):
    """One folded (4K, nfft) plan for the whole per-pulse response.

    The synthesis response is linear in the four spectra
    (Re/Im of the periodic and aperiodic minimum-phase constructions),
    and every step after the inverse transform — zeroing the periodic
    response's acausal half, subtracting its DC via the rank-1
    ``dc_remover`` outer product (reference world_synth.py:112-120,
    266-273) — is ALSO linear.  So the masked-column inverse plans, the
    DC projection row-sums, and the dc_remover outer product all fold
    into one static matrix:

        response = [re_p*s_p, im_p*s_p, re_a*s_a, im_a*s_a] @ P_fold

    with per-slot scalars s_p = vuv*sqrt(noise_size)*valid/nfft and
    s_a = valid/nfft folded into the rows.  One MXU matmul replaces
    four matmuls plus three full passes over (B, Pmax, nfft)
    temporaries (the DC reduction, the concat, the blend).

    Returns (H, P_fold) float64 with P_fold of shape (4K, nfft), rows
    [IRe_p; IIm_p; IRe; IIm] where the _p blocks carry the causal-half
    mask and the DC fold.
    """
    H, IRe, IIm = minimum_phase_plans(nfft)
    half = nfft // 2
    # GetDCRemover() (reference world_synth.py:112-120)
    r = np.arange(1, half + 1)
    dc = 0.5 - 0.5 * np.cos(TAU / (1 + nfft) * r)
    dc = dc / (2 * np.sum(dc))
    dc_remover = np.concatenate([dc, dc[::-1]])
    mask = np.zeros(nfft)
    mask[half:] = 1.0
    sRe = np.sum(IRe[:, half:], axis=1)       # DC of the causal half
    sIm = np.sum(IIm[:, half:], axis=1)
    IRe_p = IRe * mask - np.outer(sRe, dc_remover)
    IIm_p = IIm * mask - np.outer(sIm, dc_remover)
    return H, np.vstack([IRe_p, IIm_p, IRe, IIm])


@functools.lru_cache(maxsize=None)
def noise_dft_plans(n_in: int, nfft: int):
    """Real-DFT plan pair for the per-pulse noise spectrum: a length
    ``n_in`` real signal zero-padded to ``nfft``, as two (n_in, K)
    matmuls (cos, -sin) — XLA's batched FFT loses to one MXU matmul at
    these tiny per-row sizes."""
    K = nfft // 2 + 1
    t = np.arange(n_in)
    k = np.arange(K)
    arg = 2.0 * np.pi * np.outer(t, k) / nfft
    return np.cos(arg), -np.sin(arg)


def frames_matching_f0(x, n_frames, frame_length, frame_period,
                       mode="edge", zmean=False):
    """Centered, replicate-padded frames of x — exactly ``n_frames`` rows.

    Equivalent to Frame(center=True, mode="replicate") for the frames
    both produce, but the row count follows the f0 track instead of T:
    the pitch modules emit T // P + 1 frames (reference pitch.py hop
    framing) while Frame emits (T - 1) // P + 1, and the two disagree
    when P divides T — a composition the reference never exercises (its
    WORLD tests feed SPTK-CLI f0 tracks of T / P frames,
    tests/test_world_synth.py:38) and which would crash upstream.  Here
    analysis always yields one spectrum per f0 frame.
    """
    L, P = frame_length, frame_period
    T = x.shape[-1]
    # right padding must cover the last frame: (n_frames-1)*P + L-1
    # indexes into x padded by L//2 on the left.  Frame rows are built
    # as K = ceil(L/P) static slices of the (n, P) period view
    # concatenated on the last axis (frame n = periods n..n+K-1) — pure
    # copies; the (n_frames, L) advanced-index gather this replaces
    # scalarizes to ~n_frames*L element fetches on TPU (~0.6 ms at
    # speech scale).
    K = -(-L // P)
    total = (n_frames + K) * P
    right = max(total - L // 2 - T, 0)
    cfg = [(0, 0)] * (x.ndim - 1) + [(L // 2, right)]
    xp = jnp.pad(x, cfg, mode=mode)[..., :total]
    v = xp.reshape(xp.shape[:-1] + (n_frames + K, P))
    y = jnp.concatenate(
        [v[..., i:i + n_frames, :] for i in range(K)], axis=-1)[..., :L]
    if zmean:
        y = y - jnp.mean(y, axis=-1, keepdims=True)
    return y


def get_windowed_waveform(x, f0, window_length_ratio, bias_ratio,
                          frame_period, sample_rate, fft_length, window_type,
                          normalize_window, eps, ramp, key=None,
                          frames=None):
    half_window_length = jnp.round(
        window_length_ratio / 2 * sample_rate / f0)
    bias = jnp.round(bias_ratio * sample_rate / f0)
    base_index = ramp[:fft_length] - bias - fft_length // 2
    position = base_index / (window_length_ratio / 2 * sample_rate)
    z = jnp.pi * position * f0
    if window_type == "hanning":
        window = 0.5 + 0.5 * jnp.cos(z)
    elif window_type == "blackman":
        window = 0.42 + 0.5 * jnp.cos(z) + 0.08 * jnp.cos(2 * z)
    else:
        raise RuntimeError
    mask = (-half_window_length <= base_index) & (base_index
                                                  <= half_window_length)
    window = window * mask
    if normalize_window:
        window = window / jnp.linalg.norm(window, axis=-1, keepdims=True)

    if frames is None:
        frames = frames_matching_f0(x, window.shape[-2], fft_length,
                                    frame_period)
    waveform = frames * window
    if eps > 0:
        if key is None:
            key = jax.random.PRNGKey(0)
        waveform = waveform + (jax.random.normal(key, waveform.shape,
                                                 waveform.dtype)
                               * eps * mask)
    w1 = jnp.sum(waveform, axis=-1, keepdims=True)
    w2 = jnp.sum(window, axis=-1, keepdims=True)
    waveform = waveform - window * (w1 / w2)
    return waveform


def linear_smoothing(power_spectrum, width, sample_rate, fft_length, ramp,
                     max_boundary: int):
    """Rectangular smoothing of the power spectrum with per-frame width.

    ``max_boundary`` must statically bound width/rate + 1 (XLA needs a
    fixed mirror size); the reference computes it dynamically
    (common.py:170).

    The reference samples the cumsum at two fractionally shifted uniform
    grids (interp1Q twice).  Per-element gathers along the minor axis
    scalarize on TPU, so the same quantity is computed here as one
    per-frame 4-tap sparse-kernel correlation applied by FFT: the two
    lerped cumsum reads differ only by per-frame integer offsets b and
    fractional weights f, all of which land in a dense kernel built by
    iota comparison.  Exactly equal to the gather form; ~12x faster.
    """
    import jax

    one_sided = fft_length // 2 + 1
    rate = sample_rate / fft_length
    boundary = (width / rate).astype(jnp.int32) + 1
    pad = [(0, 0)] * (power_spectrum.ndim - 1) + [(max_boundary,
                                                   max_boundary)]
    mirror = jnp.pad(power_spectrum, pad, mode="reflect")
    bias = max_boundary - boundary
    mask = bias <= ramp[:max_boundary]
    mask = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1)
                   + [(0, one_sided + max_boundary)], constant_values=True)
    mirror = mirror * mask

    # low[k]  lerp-reads segment = cumsum(mirror * rate) at z1 = k + c1,
    # high[k] at z2 = k + c2, c{1,2} = mb - 0.5 -/+ w/(2 rate).
    # The cumsum rides a lower-triangular ones matmul (XLA's minor-axis
    # cumsum costs ~0.35 ms at speech scale; the MXU matmul ~0.06), and
    # the two lerped reads are per-frame shifted windows of the segment
    # through the Pallas gather kernel.  Reads past the segment end see
    # a replicated final value (increments beyond the mirror are zero),
    # matching the zero-padded correlation this replaces.
    Ls = mirror.shape[-1]
    csum_plan = np.triu(np.ones((Ls, Ls)))      # [j, i] = 1 for j <= i
    segment = jnp.matmul(mirror * rate,
                         jnp.asarray(csum_plan, mirror.dtype),
                         precision=jax.lax.Precision.HIGHEST)
    tail = 2 * max_boundary + 4
    seg_ext = jnp.concatenate(
        [segment, jnp.broadcast_to(segment[..., -1:],
                                   segment.shape[:-1] + (tail,))], axis=-1)

    c1 = max_boundary - 0.5 - width / (2 * rate)
    c2 = max_boundary - 0.5 + width / (2 * rate)
    # c2 <= 1.5*max_boundary analytically (boundary <= max_boundary), so
    # this clip never binds differently from the reference's Ls-2 — but
    # it also caps the window start so reads stay inside the frame's
    # guarded stride.
    lim = min(Ls - 2, 2 * max_boundary)
    b1 = jnp.clip(jnp.floor(c1), 0, lim)
    b2 = jnp.clip(jnp.floor(c2), 0, lim)
    f1 = c1 - b1
    f2 = c2 - b2
    WL = one_sided + 1
    W1 = _frame_windows(seg_ext, b1[..., 0].astype(jnp.int32), WL, guard=4)
    W2 = _frame_windows(seg_ext, b2[..., 0].astype(jnp.int32), WL, guard=4)
    low = (1 - f1) * W1[..., :one_sided] + f1 * W1[..., 1:]
    high = (1 - f2) * W2[..., :one_sided] + f2 * W2[..., 1:]
    return (high - low) / width
