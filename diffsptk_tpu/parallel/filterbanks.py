"""Time-sharded filterbank battery (BASELINE config #5): PQMF/IPQMF,
MDCT/IMDCT and CQT/ICQT over a (dp, tp) mesh.

All six are exact: N-shard output equals the single-device op (up to the
documented frame-count conventions below), validated in
tests/test_parallel_filterbanks.py.  Three sharding patterns:

* PQMF/IPQMF are static FIR banks: overlap-save with a (delay_l,
  delay_r) sample halo, zero-padded at the global left edge and
  edge-replicated at the right — exactly the unsharded delay padding
  (ops/pqmf.py:_pad_signal).
* MDCT/IMDCT are 50%-overlap framed transforms (P = L/2): analysis
  needs a one-period left halo; synthesis overlap-adds the right
  neighbor's first frame row, with the trailing perfect-reconstruction
  pad frame computed once outside the shard_map (it reads the global
  signal tail).  The TDAC structure makes the WOLA denominator a
  position-periodic constant, so no cross-shard normalization state
  exists.
* CQT/ICQT run the whole multi-rate octave chain block-locally over a
  generous static halo (overlap-save at the base rate): every stage —
  polyphase resamplers, centered framing, basis matmuls — is a
  finite-support linear map, so a halo covering the receptive field
  plus resampler corruption margins makes the owned frame/sample range
  bit-exact; alignment requires the local block and halo to be
  multiples of lcm(frame_period, total decimation).

Reference behavior being distributed: diffsptk/modules/pqmf.py:255
(grouped conv), mdct.py:166-175 (framed basis matmul + OLA),
cqt.py:202-298 / icqt.py:100-271 (recursive-downsample octave chain).
The reference is single-device; this layer is the diffsptk_tpu design
(SURVEY.md §2.10, §5.7).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.cqt import ConstantQTransform, InverseConstantQTransform
from ..ops.mdct import (
    InverseModifiedDiscreteCosineTransform,
    ModifiedDiscreteCosineTransform,
)
from ..ops.pqmf import (
    PseudoQuadratureMirrorFilterBankAnalysis,
    PseudoQuadratureMirrorFilterBankSynthesis,
    _grouped_conv,
)
from .halo import exchange_halo


def _axis_names(mesh, batch_axis_name):
    return batch_axis_name if batch_axis_name in mesh.shape else None


class _ShardedFIRBank:
    """Shared machinery for the PQMF pair: halo'd grouped FIR."""

    def __init__(self, mesh: Mesh, op, *, time_axis_name="tp",
                 batch_axis_name="dp"):
        self.mesh = mesh
        self.tp = time_axis_name
        self.dp = _axis_names(mesh, batch_axis_name)
        self.op = op

    def _run(self, x: jnp.ndarray, n_in: int) -> jnp.ndarray:
        """x (B, T) [analysis] or (B, K, T) [synthesis], time-sharded."""
        if x.ndim == 2 and n_in == 1:
            x = x[:, None, :]
        dl, dr = self.op.delay
        filters = self.op.filters

        def local(blk):
            ext = exchange_halo(blk, dl, dr, self.tp,
                                pad_mode=("constant", "edge"))
            return _grouped_conv(ext, filters)

        bspec = (self.dp,) if self.dp else (None,)
        in_spec = P(*bspec, None, self.tp)
        out_spec = P(*bspec, None, self.tp)
        fn = jax.shard_map(local, mesh=self.mesh, in_specs=(in_spec,),
                           out_specs=out_spec, check_vma=False)
        return fn(x)


class ShardedPQMF(_ShardedFIRBank):
    """PQMF analysis over a (dp, tp) mesh: (B, T) -> (B, K, T), channels
    replicated, time sharded.  Exact vs PseudoQuadratureMirrorFilterBankAnalysis."""

    def __init__(self, mesh: Mesh, n_band: int, filter_order: int, *,
                 time_axis_name="tp", batch_axis_name="dp", **kwargs):
        super().__init__(
            mesh,
            PseudoQuadratureMirrorFilterBankAnalysis(
                n_band, filter_order, **kwargs),
            time_axis_name=time_axis_name, batch_axis_name=batch_axis_name)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._run(x, n_in=1)


class ShardedIPQMF(_ShardedFIRBank):
    """PQMF synthesis over a (dp, tp) mesh: (B, K, T) -> (B, 1, T)."""

    def __init__(self, mesh: Mesh, n_band: int, filter_order: int, *,
                 time_axis_name="tp", batch_axis_name="dp", **kwargs):
        super().__init__(
            mesh,
            PseudoQuadratureMirrorFilterBankSynthesis(
                n_band, filter_order, **kwargs),
            time_axis_name=time_axis_name, batch_axis_name=batch_axis_name)

    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        return self._run(y, n_in=y.shape[-2])


class ShardedMDCT:
    """MDCT over a (dp, tp) mesh: (B, T) -> (B, T/P + 1, L/2), the body
    frames sharded over tp and the trailing perfect-reconstruction pad
    frame appended outside the shard_map.  Exact vs
    ModifiedDiscreteCosineTransform; requires T % (P * n_tp) == 0."""

    def __init__(self, mesh: Mesh, frame_length: int, *,
                 time_axis_name="tp", batch_axis_name="dp", **kwargs):
        self.mesh = mesh
        self.tp = time_axis_name
        self.dp = _axis_names(mesh, batch_axis_name)
        self.op = ModifiedDiscreteCosineTransform(frame_length, **kwargs)
        self.frame_length = frame_length

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        L = self.frame_length
        Pd = L // 2
        ntp = self.mesh.shape[self.tp]
        T = x.shape[-1]
        if T % (Pd * ntp):
            raise ValueError(
                "T must be divisible by (frame_length // 2) * n_time_shards")
        n_b = T // Pd // ntp
        window, mdt = self.op.window, self.op.mdt

        def local(blk):
            ext = exchange_halo(blk, Pd, 0, self.tp)      # (B, T_loc + P)
            v = ext.reshape(*ext.shape[:-1], n_b + 1, Pd)
            rows = jnp.concatenate([v[..., :-1, :], v[..., 1:, :]],
                                   axis=-1)               # (B, n_b, L)
            return mdt(window(rows))

        bspec = (self.dp,) if self.dp else (None,)
        in_spec = P(*bspec, self.tp)
        out_spec = P(*bspec, self.tp, None)
        fn = jax.shard_map(local, mesh=self.mesh, in_specs=(in_spec,),
                           out_specs=out_spec, check_vma=False)
        frames = fn(x)
        # trailing pad frame: window [T - P, T + P) of the zero-extended
        # signal (reads only the global tail — tiny, outside shard_map)
        tail = jnp.concatenate(
            [x[..., -Pd:], jnp.zeros_like(x[..., -Pd:])], axis=-1)
        last = mdt(window(tail[..., None, :]))
        return jnp.concatenate([frames, last], axis=-2)


class ShardedIMDCT:
    """IMDCT over a (dp, tp) mesh: (B, T/P + 1, L/2) -> (B, T).  The
    body frames are sharded over tp; each shard overlap-adds its right
    neighbor's first frame row (the global pad frame for the last
    shard).  Exact vs InverseModifiedDiscreteCosineTransform with
    out_length=None."""

    def __init__(self, mesh: Mesh, frame_length: int, *,
                 time_axis_name="tp", batch_axis_name="dp", **kwargs):
        self.mesh = mesh
        self.tp = time_axis_name
        self.dp = _axis_names(mesh, batch_axis_name)
        self.op = InverseModifiedDiscreteCosineTransform(frame_length,
                                                         **kwargs)
        self.frame_length = frame_length

    def __call__(self, y: jnp.ndarray,
                 out_length: int | None = None) -> jnp.ndarray:
        L = self.frame_length
        Pd = L // 2
        ntp = self.mesh.shape[self.tp]
        N = y.shape[-2]
        T = (N - 1) * Pd
        if (N - 1) % ntp:
            raise ValueError("N - 1 must be divisible by n_time_shards")
        imdt, window = self.op.imdt, self.op.window
        w = np.asarray(self.op.unframe.params["window"], np.float64)
        w2 = w * w
        den = jnp.asarray(w2[Pd:] + w2[:Pd], y.dtype)      # TDAC constant

        body = y[..., :-1, :]
        final = y[..., -1:, :]
        nloc = (N - 1) // ntp

        def local(body_blk, final_row):
            u = window(imdt(body_blk))                     # (B, nloc, L)
            uf = window(imdt(final_row))                   # (B, 1, L)
            ext = exchange_halo(u, 0, 1, self.tp, axis=-2)
            # the last shard's right "halo" is the global pad frame
            idx = lax.axis_index(self.tp)
            n = lax.axis_size(self.tp)
            fill = jnp.where(idx == n - 1, uf, ext[..., -1:, :])
            rows = jnp.concatenate([ext[..., :-1, :], fill], axis=-2)
            num = rows[..., :-1, Pd:] + rows[..., 1:, :Pd]  # (B, nloc, P)
            out = num / (den + 1e-16)
            return out.reshape(*out.shape[:-2], nloc * Pd)

        bspec = (self.dp,) if self.dp else (None,)
        fn = jax.shard_map(
            local, mesh=self.mesh,
            in_specs=(P(*bspec, self.tp, None), P(*bspec, None, None)),
            out_specs=P(*bspec, self.tp), check_vma=False)
        x = fn(body, final)
        if out_length is not None:
            x = x[..., :out_length]
        return x


def _lcm(a: int, b: int) -> int:
    return a * b // math.gcd(a, b)


class ShardedCQT:
    """CQT over a (dp, tp) mesh: (B, T) -> (B, T/fp, K) complex, frames
    sharded over tp.

    Overlap-save at the base rate: each shard runs the full unsharded
    octave chain on its halo-extended block and keeps its owned frame
    range.  Emits the T/fp whole-period frames (the unsharded op's
    trailing center-pad frame is not computed); exactness is
    y_sharded == y_unsharded[..., :T//fp, :].
    """

    def __init__(self, mesh: Mesh, frame_period: int, sample_rate: int, *,
                 time_axis_name="tp", batch_axis_name="dp", **kwargs):
        self.mesh = mesh
        self.tp = time_axis_name
        self.dp = _axis_names(mesh, batch_axis_name)
        self.fp = frame_period
        self.op = ConstantQTransform(frame_period, sample_rate, **kwargs)

        ed = self.op.early_downsample
        F = ed.orig_freq if ed is not None else 1
        n_halve = sum(1 for kind, _, _ in self.op.resamplers
                      if kind == "halve")
        self.dec_total = F * (1 << n_halve)
        fft_len = self.op.transforms[0].frame.frame_length
        widths = [r.width for _, r, _ in self.op.resamplers
                  if r is not None]
        if ed is not None:
            widths.append(ed.width)
        wmax = max(widths, default=0)
        # receptive field of one frame at the deepest octave plus the
        # cumulative resampler corruption, in base-rate samples
        align = _lcm(frame_period, self.dec_total)
        h0 = self.dec_total * (fft_len + 8 * (wmax + 8))
        self.halo = -(-h0 // align) * align

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ntp = self.mesh.shape[self.tp]
        T = x.shape[-1]
        align = _lcm(self.fp, self.dec_total)
        if T % (align * ntp):
            raise ValueError(
                f"T must be divisible by {align * ntp} "
                "(lcm(frame_period, decimation) * n_time_shards)")
        n_b = T // self.fp // ntp
        Tloc = T // ntp
        j0 = self.halo // self.fp
        H = self.halo
        op = self.op

        def local(blk):
            # mirror of ConstantQTransform.__call__ with one addition:
            # after every rate change the local segment is masked to the
            # *global* signal extent — the unsharded op's decimated
            # signals are truncated at the global edges, so the zero
            # halo's filter pre/post-ring must be cut there too.
            idx = lax.axis_index(self.tp)
            g0 = idx * Tloc - H          # global base index of ext[0]
            ext = exchange_halo(blk, H, H, self.tp)
            xx = ext
            dec = 1
            glen = T

            def mask(v, dec, glen):
                gi = g0 // dec + jnp.arange(v.shape[-1])
                return v * ((0 <= gi) & (gi < glen)).astype(v.dtype)

            if op.early_downsample is not None:
                F = op.early_downsample.orig_freq
                xx = op.early_downsample(xx) * op.downsample_scale
                glen = -(-glen // F)
                dec *= F
                xx = mask(xx, dec, glen)
            cs = []
            for i, (stft, W) in enumerate(zip(op.transforms, op.fft_bases)):
                X = stft(xx)
                cs.append(jnp.matmul(X, W))
                if i != len(op.transforms) - 1:
                    kind, rs, s = op.resamplers[i]
                    if kind == "halve":
                        xx = rs(xx) * s
                        glen = -(-glen // 2)
                        dec *= 2
                        xx = mask(xx, dec, glen)
            c = op._trim_stack(op.cqt_scale.shape[0], cs) * op.cqt_scale
            return c[..., j0:j0 + n_b, :]

        bspec = (self.dp,) if self.dp else (None,)
        fn = jax.shard_map(local, mesh=self.mesh,
                           in_specs=(P(*bspec, self.tp),),
                           out_specs=P(*bspec, self.tp, None),
                           check_vma=False)
        return fn(x)


class ShardedICQT:
    """ICQT over a (dp, tp) mesh: (B, N, K) complex frames (sharded over
    tp) -> (B, N * fp) waveform (time sharded).

    Per octave the local block reconstructs its octave-rate segment with
    a frame halo (the WOLA denominator uses global frame validity so
    global-edge normalization matches the unsharded op), upsamples it
    locally, and keeps the owned base-rate range.  Exact vs
    InverseConstantQTransform over the frames both compute.
    """

    def __init__(self, mesh: Mesh, frame_period: int, sample_rate: int, *,
                 time_axis_name="tp", batch_axis_name="dp", **kwargs):
        self.mesh = mesh
        self.tp = time_axis_name
        self.dp = _axis_names(mesh, batch_axis_name)
        self.fp = frame_period
        self.op = InverseConstantQTransform(frame_period, sample_rate,
                                            **kwargs)
        self.n_oct = len(self.op.transforms)
        self.fp_i = [t.unframe.frame_period for t in self.op.transforms]
        self.L = self.op.transforms[0].unframe.frame_length
        self.dec = [self.fp // f for f in self.fp_i]
        for L_, f_ in zip([self.L] * self.n_oct, self.fp_i):
            if L_ % f_:
                raise ValueError(
                    "sharded ICQT requires frame_period_i | fft_length")
        widths = [r.width for r in self.op.resamplers]
        self.mm = [w + 8 * d for w, d in zip(widths, self.dec)]
        min_fp = min(self.fp_i)
        self.Hf = -(-(self.L + 2 * max(self.mm)) // min_fp) + 2

    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        ntp = self.mesh.shape[self.tp]
        N = c.shape[-2]
        if N % ntp:
            raise ValueError("N must be divisible by n_time_shards")
        n_b = N // ntp
        if self.Hf > n_b:
            raise ValueError(
                f"frame halo {self.Hf} exceeds the local block {n_b}")
        Hf = self.Hf
        op = self.op
        Tloc = n_b * self.fp

        def local(cb):
            idx = lax.axis_index(self.tp)
            g0 = (idx * n_b - Hf)                # global index of ext row 0
            ext = exchange_halo(cb, Hf, Hf, self.tp, axis=-2)
            n_ext = n_b + 2 * Hf
            y = None
            for i in range(self.n_oct):
                fpi, L = self.fp_i[i], self.L
                k = L // fpi
                Ci = ext[..., op.slices[i]] * op.cqt_scale[op.slices[i]]
                u = (jnp.matmul(jnp.real(Ci), op.time_bases_re[i])
                     + jnp.matmul(jnp.imag(Ci), op.time_bases_im[i]))
                # WOLA with global-validity normalization (rect window)
                gidx = g0 + jnp.arange(n_ext)
                valid = ((0 <= gidx) & (gidx < N)).astype(u.dtype)
                view = u.reshape(*u.shape[:-1], k, fpi)
                npos = n_ext + k - 1
                num = jnp.zeros(u.shape[:-2] + (npos, fpi), u.dtype)
                den = jnp.zeros((npos,), u.dtype)
                for s in range(k):
                    num = num.at[..., s:s + n_ext, :].add(view[..., :, s, :])
                    den = den.at[s:s + n_ext].add(valid)
                xi = num / (den[:, None] + 1e-16)
                xi = xi.reshape(*xi.shape[:-2], npos * fpi)
                # slice the owned octave segment (+margin), mask to the
                # global octave-signal extent, upsample, keep the owned
                # base range
                mm = self.mm[i]
                q0 = Hf * fpi + L // 2 - mm
                seg_len = Tloc // self.dec[i] + 2 * mm
                seg = lax.dynamic_slice_in_dim(xi, q0, seg_len, axis=-1)
                m = (idx * (Tloc // self.dec[i]) - mm
                     + jnp.arange(seg_len))     # global octave indices
                seg = seg * ((0 <= m) & (m < N * fpi)).astype(seg.dtype)
                up = op.resamplers[i](seg)
                own = lax.dynamic_slice_in_dim(
                    up, mm * self.dec[i], Tloc, axis=-1)
                y = own if y is None else y + own
            return y

        bspec = (self.dp,) if self.dp else (None,)
        fn = jax.shard_map(local, mesh=self.mesh,
                           in_specs=(P(*bspec, self.tp, None),),
                           out_specs=P(*bspec, self.tp), check_vma=False)
        return fn(c)
