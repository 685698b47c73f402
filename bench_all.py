#!/usr/bin/env python
"""Measure all BASELINE.md configs on the available hardware and emit the
BASELINE.md measurement table (single real chip; multi-chip correctness
is validated on the virtual CPU mesh by tests/test_parallel*.py and
__graft_entry__).

Usage:
    python bench_all.py                   # print the table
    python bench_all.py --update-baseline # also splice it into BASELINE.md
                                          # between the bench:begin/end markers

The per-call time is the slope between two iteration counts so the
~30 ms scalar-readback RTT of the tunnel platform cancels (the readback
is the only reliable execution barrier there).  Row 1 is so fast that a
single slope bounces run-to-run; it is re-measured until the spread of
three slopes is < 5 % (or 8 attempts) and the median is reported.
"""

from __future__ import annotations

import argparse
import datetime
import os
import re
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, warmup=2, iters=10):
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


def timeit_stable(fn, *args, warmup=2, iters=10, spread=0.05, tries=8):
    """Median of three slopes, re-measured until their spread is small."""
    vals = []
    for _ in range(tries):
        vals.append(timeit(fn, *args, warmup=warmup, iters=iters))
        if len(vals) >= 3:
            last = sorted(vals[-3:])
            if last[0] > 0 and (last[-1] - last[0]) / last[1] < spread:
                return float(np.median(last))
    return float(np.median([v for v in vals if v > 0] or vals))


def snr_db(ref, est):
    ref = np.asarray(ref, np.float64).ravel()
    est = np.asarray(est, np.float64).ravel()
    n = min(len(ref), len(est))
    ref, est = ref[:n], est[:n]
    return 10 * np.log10(np.sum(ref**2) / (np.sum((ref - est) ** 2) + 1e-30))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update-baseline", action="store_true")
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jaxcache")
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import diffsptk_tpu as dsp

    x, sr = dsp.read("/root/reference/assets/data.wav")
    rows = []

    # 1. STFT spectrogram -------------------------------------------------
    # batch large enough that one call is ~10 ms (spread-stable)
    B = 512
    xb = jnp.tile(x[None, :], (B, 1))
    stft = jax.jit(dsp.STFT(400, 80, 512))
    dt = timeit_stable(stft, xb, iters=20)
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
    dt = timeit_stable(f, xb)
    y = f(xb)
    rows.append(("2. LPC analysis-synthesis (M=24)", xb.size / dt,
                 snr_db(xb[..., :y.shape[-1]], y)))

    # 3. mel-cepstral round trip (headline) --------------------------------
    # A/B the MLSA cascade implementations and report the fastest.
    from diffsptk_tpu.models.mcep_vocoder import MelCepstralVocoder
    best = None
    for cascade, prec in (("folded", None), ("stages", None),
                          ("fused", None), ("fused", "HIGH")):
        voc = MelCepstralVocoder(frame_length=400, frame_period=80,
                                 fft_length=512, cep_order=24, alpha=0.42,
                                 n_iter=10, cascade=cascade,
                                 cascade_precision=prec)
        f = jax.jit(voc.analysis_synthesis)
        try:
            dt = timeit_stable(f, xb)
        except Exception as e:
            print(f"#   cascade={cascade}+{prec} failed: "
                  f"{type(e).__name__}: {str(e)[:120]}")
            continue
        y = f(xb)
        print(f"#   cascade={cascade}+{prec}: "
              f"{xb.size / dt / 1e6:.2f} Msamples/s")
        if best is None or dt < best[0]:
            best = (dt, f"{cascade}" + (f"+{prec}" if prec else ""), y)
    if best is None:
        raise RuntimeError("mcep chain failed in all cascade modes")
    dt, cascade, y = best
    rows.append((f"3. STFT->mcep->MLSA round trip [{cascade}]",
                 xb.size / dt, snr_db(xb[..., :y.shape[-1]], y)))

    # 4. WORLD chain --------------------------------------------------------
    # 4a: the driver-named config (BASELINE.json configs[3]): neural
    # Pitch (FCNF0, the reference's default tracker) + D4C aperiodicity
    # + CheapTrick.  4b: the YIN + TANDEM variant.
    B = 8
    xb = jnp.tile(x[None, :], (B, 1))
    P, Lw = 80, 1024
    spec = jax.jit(dsp.STFT(400, 80, 512, out_format="db"))

    def world_row(name, pitch, apx):
        ps = dsp.PitchAdaptiveSpectralAnalysis(P, sr, Lw)
        ws = dsp.WorldSynthesis(P, sr, Lw, f0_ceil=600.0, f0_floor=80.0)

        def chain(xw):
            f0 = pitch(xw)
            return ws(f0, apx(xw, f0), ps(xw, f0))

        f = jax.jit(chain)
        dt = timeit_stable(f, xb, iters=5)
        y = f(xb)
        # vocoded output is not sample-aligned with the input; compare
        # magnitude spectrograms (phase-insensitive), as vocoder evals do.
        Sx = np.asarray(spec(xb[0]), np.float64)
        Sy = np.asarray(spec(y[0, :xb.shape[-1]]), np.float64)
        n = min(Sx.shape[0], Sy.shape[0])
        r = np.corrcoef(Sx[:n].ravel(), Sy[:n].ravel())[0, 1]
        rows.append((name, xb.size / dt, "spec-corr %.3f" % r))

    world_row("4. WORLD (FCNF0 + D4C + CheapTrick)",
              dsp.Pitch(P, sr, algorithm="fcnf0", out_format="f0",
                        f_min=80, f_max=180),
              dsp.Aperiodicity(P, sr, Lw, algorithm="d4c"))
    world_row("4b. WORLD (YIN + TANDEM + CheapTrick)",
              dsp.Pitch(P, sr, algorithm="yin", out_format="f0",
                        f_min=80, f_max=180),
              dsp.Aperiodicity(P, sr, Lw, algorithm="tandem"))

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
    dt = timeit_stable(f, xl, iters=5)
    y2 = jax.jit(lambda xw: imdct(mdct(xw), out_length=xw.shape[-1]))(xl)
    rows.append(("5. CQT+MDCT+PQMF battery (8ch)", xl.size / dt,
                 snr_db(xl, y2)))

    dev = jax.devices()[0].device_kind
    stamp = datetime.date.today().isoformat()
    lines = [f"Measured {stamp} on 1x {dev} (float32, `bench_all.py`).",
             "",
             "| Config | samples/s/chip | SNR / parity |",
             "|---|---|---|"]
    for name, sps, snr_ in rows:
        s = ("-" if snr_ is None
             else (snr_ if isinstance(snr_, str) else f"{snr_:.1f} dB"))
        lines.append(f"| {name} | {sps / 1e6:.1f} M | {s} |")
    table = "\n".join(lines)
    print()
    print(table)

    if args.update_baseline:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE.md")
        text = open(path).read()
        new = re.sub(
            r"(<!-- bench:begin -->\n).*?(\n<!-- bench:end -->)",
            lambda m: m.group(1) + table + m.group(2),
            text, flags=re.S)
        open(path, "w").write(new)
        print(f"# BASELINE.md table updated ({stamp})")


if __name__ == "__main__":
    main()
