#!/usr/bin/env python
"""Measure all BASELINE.md configs on the available hardware and print a
markdown table (single real chip; multi-chip correctness is validated on
the virtual CPU mesh by tests/test_parallel.py and __graft_entry__).

Usage: python bench_all.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, warmup=2, iters=10):
    """Per-call wall time as the slope between two iteration counts, so
    the ~30 ms scalar-readback RTT of the tunnel platform cancels
    (the readback is the only reliable execution barrier there)."""
    for _ in range(warmup):
        float(jnp.sum(fn(*args)))
    lo, hi = iters, 4 * iters
    ts = {}
    for n in (lo, hi):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(out))
        ts[n] = time.perf_counter() - t0
    return (ts[hi] - ts[lo]) / (hi - lo)


def snr_db(ref, est):
    ref = np.asarray(ref, np.float64).ravel()
    est = np.asarray(est, np.float64).ravel()
    n = min(len(ref), len(est))
    ref, est = ref[:n], est[:n]
    return 10 * np.log10(np.sum(ref**2) / (np.sum((ref - est) ** 2) + 1e-30))


def main() -> None:
    import diffsptk_tpu as dsp

    x, sr = dsp.read("/root/reference/assets/data.wav")
    rows = []

    # 1. STFT spectrogram -------------------------------------------------
    B = 64
    xb = jnp.tile(x[None, :], (B, 1))
    stft = jax.jit(dsp.STFT(400, 80, 512))
    dt = timeit(stft, xb)
    rows.append(("1. STFT spectrogram (400/80/512)", xb.size / dt, None))

    # 2. LPC analysis-synthesis -------------------------------------------
    B = 32
    xb = jnp.tile(x[None, :], (B, 1))
    M, P, L = 24, 80, 400
    frame, window = dsp.Frame(L, P), dsp.Window(L)
    lpc = dsp.LPC(L, M)
    zerodf, poledf = (dsp.AllZeroDigitalFilter(M, P),
                      dsp.AllPoleDigitalFilter(M, P))
    norm0 = dsp.AllPoleToAllZeroDigitalFilterCoefficients(M)

    def lpc_roundtrip(xw):
        a = lpc(window(frame(xw)))
        T = a.shape[-2] * P
        e = zerodf(xw[..., :T], norm0(a))    # inverse filter A(z)/K
        return poledf(e, a)                  # resynthesis K/A(z)

    f = jax.jit(lpc_roundtrip)
    dt = timeit(f, xb)
    y = f(xb)
    rows.append(("2. LPC analysis-synthesis (M=24)", xb.size / dt,
                 snr_db(xb[..., :y.shape[-1]], y)))

    # 3. mel-cepstral round trip (headline) --------------------------------
    # A/B the MLSA cascade implementations (stage-by-stage XLA vs the
    # fused VMEM-resident Pallas kernel) and report the faster one.
    from diffsptk_tpu.models.mcep_vocoder import MelCepstralVocoder
    best = None
    for cascade in ("folded", "stages", "fused"):
        voc = MelCepstralVocoder(frame_length=400, frame_period=80,
                                 fft_length=512, cep_order=24, alpha=0.42,
                                 n_iter=10, cascade=cascade)
        f = jax.jit(voc.analysis_synthesis)
        try:
            dt = timeit(f, xb)
        except Exception as e:
            print(f"#   cascade={cascade} failed: {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        y = f(xb)
        print(f"#   cascade={cascade}: {xb.size / dt / 1e6:.2f} Msamples/s")
        if best is None or dt < best[0]:
            best = (dt, cascade, y)
    if best is None:
        raise RuntimeError("mcep chain failed in both cascade modes")
    dt, cascade, y = best
    rows.append((f"3. STFT->mcep->MLSA round trip [{cascade}]",
                 xb.size / dt, snr_db(xb[..., :y.shape[-1]], y)))

    # 4. WORLD chain --------------------------------------------------------
    B = 8
    xb = jnp.tile(x[None, :], (B, 1))
    P, Lw = 80, 1024
    pitch = dsp.Pitch(P, sr, algorithm="yin", out_format="f0",
                      f_min=80, f_max=180)
    ap = dsp.Aperiodicity(P, sr, Lw, algorithm="tandem")
    ps = dsp.PitchAdaptiveSpectralAnalysis(P, sr, Lw)
    # slot table + noise table sized by the tracker's actual pitch range
    # (f0_ceil must still cover the 500 Hz unvoiced default pulse rate)
    ws = dsp.WorldSynthesis(P, sr, Lw, f0_ceil=600.0, f0_floor=80.0)

    def world_chain(xw):
        f0 = pitch(xw)
        apw = ap(xw, f0)
        sp = ps(xw, f0)
        return ws(f0, apw, sp)

    f = jax.jit(world_chain)
    dt = timeit(f, xb, iters=5)
    y = f(xb)
    # vocoded output is not sample-aligned with the input; compare
    # magnitude spectrograms (phase-insensitive), as vocoder evals do.
    spec = dsp.STFT(400, 80, 512, out_format="db")
    Sx = np.asarray(spec(xb[0]), np.float64)
    Sy = np.asarray(spec(y[0, :xb.shape[-1]]), np.float64)
    n = min(Sx.shape[0], Sy.shape[0])
    r = np.corrcoef(Sx[:n].ravel(), Sy[:n].ravel())[0, 1]
    rows.append(("4. WORLD analysis-synthesis", xb.size / dt,
                 ("spec-corr %.3f" % r)))

    # 5. filterbank battery, multi-channel long audio -----------------------
    C = 8
    xl = jnp.tile(x[None, :], (C, 4)).reshape(C, -1)      # 4.8 s x 8 ch
    cqt = dsp.CQT(64, sr, n_bin=24)
    icqt = dsp.ICQT(64, sr, n_bin=24)
    mdct = dsp.MDCT(256)
    imdct = dsp.IMDCT(256)
    pqmf = dsp.PQMF(4, 47)
    ipqmf = dsp.IPQMF(4, 47)

    def battery(xw):
        y1 = icqt(cqt(xw), out_length=xw.shape[-1])
        y2 = imdct(mdct(xw), out_length=xw.shape[-1])
        y3 = ipqmf(pqmf(xw))[..., 0, :xw.shape[-1]]
        return y1 + y2 + y3

    f = jax.jit(battery)
    dt = timeit(f, xl, iters=5)
    y2 = jax.jit(lambda xw: imdct(mdct(xw), out_length=xw.shape[-1]))(xl)
    rows.append(("5. CQT+MDCT+PQMF battery (8ch)", xl.size / dt,
                 snr_db(xl, y2)))

    print(f"\nHardware: {jax.devices()[0].device_kind} x {jax.device_count()}")
    print("| Config | samples/s/chip | SNR / parity |")
    print("|---|---|---|")
    for name, sps, snr in rows:
        s = ("-" if snr is None
             else (snr if isinstance(snr, str) else f"{snr:.1f} dB"))
        print(f"| {name} | {sps/1e6:.2f} M | {s} |")


if __name__ == "__main__":
    main()
