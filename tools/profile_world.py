#!/usr/bin/env python
"""Per-stage timing of the WORLD chain on the current default platform.

Prints slope-measured per-call times (tunnel RTT cancels) for each stage
of bench_all config #4 — pitch (YIN), TANDEM aperiodicity, CheapTrick,
WorldSynthesis — plus the full chain, at the bench geometry (B=8 copies
of data.wav, frame_period 80, fft 1024, f0_ceil 600).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, warmup=2, iters=8):
    for _ in range(warmup):
        jnp.sum(fn(*args)).block_until_ready()
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


def main():
    import diffsptk_tpu as dsp

    x, sr = dsp.read("/root/reference/assets/data.wav")
    B = 8
    xb = jnp.tile(x[None, :], (B, 1))
    P, Lw = 80, 1024

    pitch = dsp.Pitch(P, sr, algorithm="yin", out_format="f0",
                      f_min=80, f_max=180)
    ap = dsp.Aperiodicity(P, sr, Lw, algorithm="tandem")
    ps = dsp.PitchAdaptiveSpectralAnalysis(P, sr, Lw)
    ws = dsp.WorldSynthesis(P, sr, Lw, f0_ceil=600.0, f0_floor=80.0)

    jf0 = jax.jit(pitch.__call__)
    jap = jax.jit(ap.__call__)
    jps = jax.jit(ps.__call__)
    jws = jax.jit(ws.__call__)

    f0 = jf0(xb)
    apw = jap(xb, f0)
    sp = jps(xb, f0)

    n = xb.size
    for name, fn, args in [
        ("pitch(yin)", jf0, (xb,)),
        ("tandem_ap", jap, (xb, f0)),
        ("cheaptrick", jps, (xb, f0)),
        ("world_synth", jws, (f0, apw, sp)),
    ]:
        dt = timeit(fn, *args)
        print(f"{name:12s} {dt*1e3:7.2f} ms  ({n/dt/1e6:7.1f} Ms/s)")

    def chain(xw):
        f0 = pitch(xw)
        return ws(f0, ap(xw, f0), ps(xw, f0))

    jc = jax.jit(chain)
    dt = timeit(jc, xb)
    print(f"{'full chain':12s} {dt*1e3:7.2f} ms  ({n/dt/1e6:7.1f} Ms/s)")


if __name__ == "__main__":
    main()
