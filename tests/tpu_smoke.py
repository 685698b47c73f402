"""TPU jit smoke matrix: jit-compile and run every functional-API op on
the real chip.  Not collected by pytest (run manually / by CI on TPU):

    python tests/tpu_smoke.py [filter-substring]

Catches trace bugs the CPU suite can miss (host-concretization of device
values, complex transfer limits, unsupported primitives).
"""

from __future__ import annotations

import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

import diffsptk_tpu as dsp
from diffsptk_tpu import functional as F

SR = 16000
T = 1600
M = 8


def inputs():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32) * 0.3)
    frames = jnp.asarray(rng.standard_normal((2, 10, 32)).astype(np.float32))
    vec = jnp.asarray(rng.standard_normal((2, 10, M + 1)).astype(np.float32))
    pos = jnp.abs(vec) + 0.1
    spec = jnp.abs(jnp.fft.rfft(frames, n=64)) ** 2 + 1e-6
    return x, frames, vec, pos, spec


# name -> (builder returning (fn, args)); fn will be jitted.
def cases():
    x, frames, vec, pos, spec = inputs()
    acorr_v = F.acorr(frames, acr_order=M)
    lpc_v = F.levdur(acorr_v)
    mc = F.mcep(spec, cep_order=M, alpha=0.42, n_iter=2)
    e = x[..., :800]
    b = vec
    yield "frame", lambda: (lambda x: F.frame(x, 32, 16), (x,))
    yield "window", lambda: (lambda f: F.window(f), (frames,))
    yield "unframe", lambda: (lambda f: F.unframe(f, 160, frame_period=16),
                              (frames,))
    yield "stft", lambda: (lambda x: F.stft(x, frame_length=32,
                                            frame_period=16, fft_length=64),
                           (x,))
    yield "istft", lambda: (
        lambda x: F.istft(F.stft(x, frame_length=32, frame_period=16,
                                 fft_length=64, out_format="complex"),
                          out_length=T, frame_length=32, frame_period=16,
                          fft_length=64), (x,))
    yield "spec", lambda: (lambda f: F.spec(f, fft_length=64), (frames,))
    yield "griffin", lambda: (
        lambda A: F.griffin(A, out_length=T, frame_length=32,
                            frame_period=16, fft_length=64, n_iter=2),
        (jnp.abs(F.stft(x, frame_length=32, frame_period=16, fft_length=64,
                        out_format="complex")),))
    for name in ["dct", "idct", "dst", "idst", "dht", "idht", "wht",
                 "iwht"]:
        yield name, (lambda name=name: (getattr(F, name), (frames,)))
    yield "mdct", lambda: (lambda x: F.mdct(x, frame_length=32), (x,))
    yield "imdct", lambda: (
        lambda y: F.imdct(y, out_length=T),
        (F.mdct(x, frame_length=32),))
    yield "mdst", lambda: (lambda x: F.mdst(x, frame_length=32), (x,))
    yield "imdst", lambda: (
        lambda y: F.imdst(y, out_length=T),
        (F.mdst(x, frame_length=32),))
    yield "hilbert", lambda: (F.hilbert, (x,))
    _cqt = dsp.CQT(64, SR, n_bin=12)
    _icqt = dsp.ICQT(64, SR, n_bin=12)
    yield "cqt", lambda: (lambda x: jnp.abs(_cqt(x)), (x,))
    yield "icqt", lambda: (lambda x: _icqt(_cqt(x), out_length=T), (x,))
    _pqmf = dsp.PQMF(4, 47)
    _ipqmf = dsp.IPQMF(4, 47)
    yield "pqmf", lambda: (_pqmf, (x,))
    yield "ipqmf", lambda: (lambda y: _ipqmf(y), (_pqmf(x),))
    _oband = dsp.FractionalOctaveBandAnalysis(SR)
    yield "oband", lambda: (_oband, (x,))
    _gam = dsp.GammatoneFilterBankAnalysis(SR)
    _igam = dsp.GammatoneFilterBankSynthesis(SR)
    yield "gammatone", lambda: (lambda x: jnp.abs(_gam(x)), (x,))
    yield "igammatone", lambda: (
        lambda x: _igam(_gam(x), keepdim=False), (x,))
    yield "fbank", lambda: (
        lambda s: F.fbank(s, n_channel=8, sample_rate=SR)[0], (spec,))
    yield "ifbank", lambda: (
        lambda y: F.ifbank(y, fft_length=64, sample_rate=SR),
        (F.fbank(spec, n_channel=8, sample_rate=SR)[0],))
    yield "mfcc", lambda: (
        lambda s: F.mfcc(s, mfcc_order=4, n_channel=8, sample_rate=SR)[0],
        (spec,))
    yield "plp", lambda: (
        lambda s: F.plp(s, plp_order=4, n_channel=8, sample_rate=SR)[0],
        (spec,))
    yield "chroma", lambda: (
        lambda s: F.chroma(s, n_channel=6, sample_rate=SR), (spec,))
    yield "acorr", lambda: (lambda f: F.acorr(f, acr_order=M), (frames,))
    yield "levdur", lambda: (F.levdur, (acorr_v,))
    yield "rlevdur", lambda: (F.rlevdur, (lpc_v,))
    yield "lpc", lambda: (lambda f: F.lpc(f, lpc_order=M), (frames,))
    yield "lpc2lsp", lambda: (lambda a: F.lpc2lsp(a), (lpc_v,))
    yield "lsp2lpc", lambda: (lambda w: F.lsp2lpc(w), (F.lpc2lsp(lpc_v),))
    yield "lpc2par", lambda: (F.lpc2par, (lpc_v,))
    yield "par2lpc", lambda: (F.par2lpc, (F.lpc2par(lpc_v),))
    yield "lpccheck", lambda: (F.lpccheck, (lpc_v,))
    yield "lspcheck", lambda: (lambda w: F.lspcheck(w),
                               (F.lpc2lsp(lpc_v),))
    yield "lsp2sp", lambda: (lambda w: F.lsp2sp(w, fft_length=64),
                             (F.lpc2lsp(lpc_v),))
    yield "poledf", lambda: (
        lambda e, a: F.poledf(e, a, frame_period=80),
        (e, lpc_v[:, :10],))
    yield "zerodf", lambda: (
        lambda e, b: F.zerodf(e, b, frame_period=80),
        (e, vec[:, :10],))
    yield "dfs", lambda: (lambda x: F.dfs(x, b=[1.0, -0.9], a=[1.0, 0.2]),
                          (x,))
    yield "df2", lambda: (
        lambda x: F.df2(x, SR, pole_frequency=500, pole_bandwidth=100),
        (x,))
    yield "fftcep", lambda: (lambda s: F.fftcep(s, cep_order=M), (spec,))
    yield "freqt", lambda: (
        lambda c: F.freqt(c, out_order=M, alpha=0.42), (mc,))
    yield "freqt2", lambda: (
        lambda c: F.freqt2(c, out_order=M, alpha=0.3, theta=0.5), (mc,))
    yield "ifreqt2", lambda: (
        lambda c: F.ifreqt2(c, out_order=M, alpha=0.3, theta=0.5), (mc,))
    yield "mcep", lambda: (
        lambda s: F.mcep(s, cep_order=M, alpha=0.42, n_iter=2), (spec,))
    _mgcep = dsp.MelGeneralizedCepstralAnalysis(
        fft_length=64, cep_order=M, alpha=0.42, gamma=-0.5, n_iter=2)
    yield "mgcep", lambda: (_mgcep, (spec,))
    yield "smcep", lambda: (
        lambda s: F.smcep(s, cep_order=M, alpha=0.3, theta=0.5, n_iter=2),
        (spec,))
    yield "mgc2mgc", lambda: (
        lambda c: F.mgc2mgc(c, out_order=M, in_alpha=0.42,
                            out_alpha=0.1), (mc,))
    yield "mgc2sp", lambda: (
        lambda c: F.mgc2sp(c, fft_length=64, alpha=0.42), (mc,))
    yield "mc2b", lambda: (lambda c: F.mc2b(c, alpha=0.42), (mc,))
    yield "b2mc", lambda: (lambda b: F.b2mc(b, alpha=0.42),
                           (F.mc2b(mc, alpha=0.42),))
    yield "gnorm", lambda: (lambda c: F.gnorm(c, gamma=-0.5), (mc,))
    yield "ignorm", lambda: (lambda c: F.ignorm(c, gamma=-0.5),
                             (F.gnorm(mc, gamma=-0.5),))
    yield "pnorm", lambda: (lambda c: F.pnorm(c, alpha=0.42), (mc,))
    yield "ipnorm", lambda: (lambda c: F.ipnorm(c),
                             (F.pnorm(mc, alpha=0.42),))
    yield "mcpf", lambda: (lambda c: F.mcpf(c, alpha=0.42), (mc,))
    yield "mlsacheck", lambda: (lambda c: F.mlsacheck(c, alpha=0.42), (mc,))
    yield "c2acr", lambda: (
        lambda c: F.c2acr(c, acr_order=M, n_fft=64), (mc,))
    yield "c2mpir", lambda: (lambda c: F.c2mpir(c, ir_length=16, n_fft=64),
                             (mc,))
    yield "mpir2c", lambda: (
        lambda h: F.mpir2c(h, cep_order=M, n_fft=64),
        # jit the prep: eager real->complex converts are unimplemented
        # on the tunneled backend
        (jax.jit(lambda c: F.c2mpir(c, ir_length=16, n_fft=64))(mc),))
    yield "c2ndps", lambda: (lambda c: F.c2ndps(c, fft_length=64), (mc,))
    yield "ndps2c", lambda: (
        lambda n: F.ndps2c(n, cep_order=M),
        (F.c2ndps(mc, fft_length=64),))
    yield "cdist", lambda: (F.cdist, (mc, mc + 0.01,))
    _mlsa = dsp.MLSA(M, 80, alpha=0.42, taylor_order=4, cep_order=31)
    _imlsa = dsp.IMLSA(M, 80, alpha=0.42, taylor_order=4, cep_order=31)
    yield "mglsadf", lambda: (lambda e, c: _mlsa(e, c), (e, mc[:, :10],))
    yield "imglsadf", lambda: (lambda e, c: _imlsa(e, c), (e, mc[:, :10],))
    _mlsa_pade = dsp.MLSA(M, 80, alpha=0.42, mode="pade-approx",
                          cep_order=31)
    yield "mglsadf_pade", lambda: (
        lambda e, c: _mlsa_pade(e, c), (e, mc[:, :10],))
    _mlsa_fd = dsp.MLSA(M, 80, alpha=0.42, mode="freq-domain",
                        frame_length=400)
    yield "mglsadf_freq", lambda: (
        lambda e, c: _mlsa_fd(e, c), (e, mc[:, :10],))
    # ---- WORLD family (class-only ops) ----
    _f0 = jnp.where((jnp.arange(20) >= 4) & (jnp.arange(20) < 16),
                    120.0, 0.0)[None].repeat(2, 0)
    _xw = x[..., :20 * 80]
    _pitch = dsp.Pitch(80, SR, algorithm="yin", out_format="f0",
                       f_min=80, f_max=180)
    yield "pitch_yin", lambda: (_pitch, (x,))
    _apt = dsp.Aperiodicity(80, SR, 1024, algorithm="tandem")
    yield "ap_tandem", lambda: (lambda xx: _apt(xx, _f0), (_xw,))
    _apd = dsp.Aperiodicity(80, SR, 1024, algorithm="d4c")
    yield "ap_d4c", lambda: (lambda xx: _apd(xx, _f0), (_xw,))
    _ct = dsp.PitchAdaptiveSpectralAnalysis(80, SR, 1024)
    yield "cheaptrick", lambda: (lambda xx: _ct(xx, _f0), (_xw,))
    _stg = dsp.PitchAdaptiveSpectralAnalysis(80, SR, 2048,
                                             algorithm="straight")
    yield "straight", lambda: (lambda xx: _stg(xx, _f0), (_xw,))
    _wsyn = dsp.WorldSynthesis(80, SR, 1024)
    yield "world_synth", lambda: (
        lambda xx: _wsyn(_f0, _apt(xx, _f0), _ct(xx, _f0)), (_xw,))
    yield "excite", lambda: (
        lambda p: F.excite(p, frame_period=80),
        (jnp.full((2, 10), 100.0),))
    yield "linear_intpl", lambda: (
        lambda v: F.linear_intpl(v, upsampling_factor=4), (vec,))
    yield "alaw", lambda: (F.alaw, (x,))
    yield "ialaw", lambda: (F.ialaw, (F.alaw(x),))
    yield "ulaw", lambda: (F.ulaw, (x,))
    yield "iulaw", lambda: (F.iulaw, (F.ulaw(x),))
    yield "quantize", lambda: (F.quantize, (x,))
    yield "dequantize", lambda: (F.dequantize, (F.quantize(x),))
    yield "delta", lambda: (lambda v: F.delta(v, seed=[[-0.5, 0, 0.5]]),
                            (vec,))
    yield "mlpg", lambda: (
        lambda u: F.mlpg(u, seed=[[-0.5, 0, 0.5]]),
        (jnp.tile(vec, (1, 1, 2)),))
    yield "dtw", lambda: (
        lambda q, r: F.dtw(q, r)[0], (vec[0], vec[1] + 0.1,))
    yield "dtw_merge", lambda: (
        F.dtw_merge,
        (vec[0], vec[1] + 0.1,
         F.dtw(vec[0], vec[1] + 0.1, return_indices=True)[1][0]))
    yield "rmse", lambda: (F.rmse, (x, x * 0.9,))
    yield "snr", lambda: (F.snr, (x, x * 0.1,))
    yield "f0eval", lambda: (
        F.f0eval, (jnp.abs(vec[0, :, 0]) * 100, jnp.abs(vec[1, :, 0]) * 100))
    yield "entropy", lambda: (
        lambda p: F.entropy(p / jnp.sum(p, -1, keepdims=True)), (pos,))
    yield "histogram", lambda: (F.histogram, (x,))
    yield "zcross", lambda: (lambda x: F.zcross(x, frame_length=32), (x,))
    yield "flux", lambda: (F.flux, (pos, pos * 1.1,))
    yield "grpdelay", lambda: (
        lambda b: F.grpdelay(b, fft_length=64), (vec,))
    yield "phase", lambda: (lambda b: F.phase(b, fft_length=64), (vec,))
    yield "yingram", lambda: (lambda f: F.yingram(f, SR), (x[..., :640],))
    yield "medfilt", lambda: (F.medfilt, (x,))
    yield "magic_intpl", lambda: (
        F.magic_intpl, (vec.at[:, 2, :].set(0.0),))
    yield "decimate", lambda: (lambda x: F.decimate(x, period=2), (x,))
    yield "interpolate", lambda: (
        lambda x: F.interpolate(x, period=2), (x,))
    yield "delay", lambda: (lambda x: F.delay(x, start=8), (x,))
    yield "drc", lambda: (
        lambda x: F.drc(x, threshold=-20, ratio=4, attack_time=10,
                        release_time=100, sample_rate=SR), (x,))
    # complex values are built/reduced INSIDE jit: eager complex
    # conversions are unimplemented on the tunneled backend
    yield "pol_root", lambda: (
        lambda re, im: F.pol_root(re + 1j * im).real,
        (jnp.asarray([[0.5, 0.5, -0.3]]), jnp.asarray([[0.1, -0.1, 0.0]])))
    yield "root_pol", lambda: (
        lambda a: jnp.abs(F.root_pol(a)),
        (jnp.asarray([[1.0, -0.5, 0.06]]),))
    yield "csm2acr", lambda: (
        lambda c: F.csm2acr(c),
        (jnp.asarray([[0.3, 1.2, 1.0, 0.5]]),))
    yield "acr2csm", lambda: (
        lambda r: F.acr2csm(r),
        (jnp.asarray([[1.0, 0.8, 0.5, 0.2, 0.0, -0.1, -0.15, -0.1]]),))
    yield "norm0", lambda: (F.norm0, (lpc_v,))
    yield "lar2par", lambda: (F.lar2par, (F.par2lar(F.lpc2par(lpc_v)),))
    yield "par2lar", lambda: (F.par2lar, (F.lpc2par(lpc_v),))
    yield "par2is", lambda: (F.par2is, (F.lpc2par(lpc_v),))
    yield "is2par", lambda: (F.is2par, (F.par2is(F.lpc2par(lpc_v)),))
    yield "fftr", lambda: (
        lambda f: jnp.abs(F.fftr(f, fft_length=64)), (frames,))
    yield "ifftr", lambda: (
        lambda f: F.ifftr(F.fftr(f, fft_length=64), out_length=32),
        (frames,))


def main() -> None:
    pattern = sys.argv[1] if len(sys.argv) > 1 else ""
    ok, bad = 0, []
    for name, build in cases():
        if pattern and pattern not in name:
            continue
        try:
            fn, args = build()
            out = jax.jit(fn)(*args)
            leaves = [v for v in jax.tree.leaves(out)
                      if hasattr(v, "dtype")]
            for v in leaves:
                mag = jnp.sum(jnp.abs(v)) if jnp.iscomplexobj(v) \
                    else jnp.sum(v)
                if not bool(jnp.isfinite(mag)):
                    raise AssertionError("non-finite output")
            ok += 1
            print(f"  ok  {name}", flush=True)
        except Exception as exc:  # noqa: BLE001
            bad.append(name)
            print(f"FAIL  {name}: {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:120]}", flush=True)
            if pattern:
                traceback.print_exc()
    print(f"\n{ok} ok, {len(bad)} failed: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
