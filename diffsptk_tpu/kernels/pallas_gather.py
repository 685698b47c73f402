"""Pallas TPU kernel: batched extraction of windows at dynamic starts.

The WORLD analysis chain (TANDEM aperiodicity, CheapTrick/D4C windowed
waveforms) gathers many short contiguous windows of a signal at
f0-dependent start positions.  XLA compiles these advanced-index gathers
into per-element scatter/gather loops (~8 ns/element on v5e), which
dominates the whole vocoder chain.  This kernel instead keeps the entire
signal row resident in VMEM (speech-scale T is tens of KB) and extracts
each window with an aligned dynamic slice plus an in-register lane
rotate — the same trick as the overlap-add kernel (pallas_ola.py), in
the gather direction.

Reference behavior being accelerated: diffsptk/modules/ap.py:310-360
(TANDEM segment gathers) and third_party/world/common.py:150-205
(get_windowed_waveform), which clamp indices elementwise; callers here
reproduce that exactly by edge-padding the signal before the call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOT_CHUNK = 128
_VMEM_ROW_LIMIT = 4 * 1024 * 1024           # bytes per signal row


def _make_kernel(C: int, nr: int):
    def _kernel(sidx_ref, x_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        base = (i * pl.num_programs(1) + j) * C
        lanes = lax.broadcasted_iota(jnp.int32, (nr, 128), 1)
        U = 4                                          # slots per step

        def one(s):
            # The window rides as an (nr, 128) 2-D tile: a sublane-
            # aligned dynamic slice of the 2-D signal row, then the flat
            # rotate by start % 128 is one lane roll plus a row-carry
            # select — full-sublane VPU shapes ((1, W) rows use 1/8 of
            # the unit).
            t = sidx_ref[base + s]
            t_lo = lax.rem(t, 128)
            row0 = (t - t_lo) // 128
            R = x_ref[0, pl.ds(row0, nr + 1), :]       # (nr+1, 128)
            B1 = pltpu.roll(R, lax.rem(128 - t_lo, 128), 1)  # l->(l+t_lo)%128
            B2 = pltpu.roll(B1, nr, 0)                 # row r+1 at r
            out_ref[0, s] = jnp.where(lanes < 128 - t_lo, B1[:nr],
                                      B2[:nr])

        def body(u, _):
            # unrolled x4: independent slots give the VPU cross-slot ILP
            for v in range(U):
                one(u * U + v)
            return 0

        lax.fori_loop(0, C // U, body, 0)

    return _kernel


@functools.partial(jax.jit, static_argnames=("length",))
def _pallas_gather(x: jnp.ndarray, starts: jnp.ndarray,
                   length: int) -> jnp.ndarray:
    B, T = x.shape
    _, N = starts.shape
    W = -(-length // 128) * 128
    nr = W // 128
    C = _SLOT_CHUNK
    pad_n = (-N) % C
    if pad_n:
        starts = jnp.pad(starts, ((0, 0), (0, pad_n)))
    Np = starts.shape[1]
    # aligned base + wide read must stay in bounds: row0 + nr + 1 rows
    Tp = -(-T // 128) * 128 + W + 128
    x = jnp.pad(x, ((0, 0), (0, Tp - T)))
    starts = jnp.clip(starts, 0, Tp - W - 128).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,              # starts ride whole in SMEM
        grid=(B, Np // C),
        in_specs=[
            # one signal row per block: stays VMEM-resident across the
            # inner (slot-chunk) grid dimension's revisits
            pl.BlockSpec((1, Tp // 128, 128), lambda i, j, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, nr, 128), lambda i, j, s: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    y = pl.pallas_call(
        _make_kernel(C, nr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Np, nr, 128), x.dtype),
    )(starts.reshape(-1), x.reshape(B, Tp // 128, 128))
    return y.reshape(B, Np, W)[:, :N, :length]


def gather_windows(x: jnp.ndarray, starts: jnp.ndarray,
                   length: int) -> jnp.ndarray:
    """out[b, n, k] = x[b, starts[b, n] + k] for k in [0, length).

    Starts may be anywhere in [0, T - length]; callers wanting the
    reference's elementwise index clamping should edge-pad x first.
    Dispatches to the Pallas kernel on TPU float32 rows that fit VMEM;
    elsewhere falls back to an XLA advanced-index gather.
    """
    B, T = x.shape
    use_pallas = False
    try:
        use_pallas = (jax.devices()[0].platform == "tpu"
                      and x.dtype == jnp.float32
                      and T * 4 <= _VMEM_ROW_LIMIT)
    except Exception:
        pass
    if use_pallas:
        return _pallas_gather(x, starts, length)
    idx = jnp.clip(starts[..., None] + jnp.arange(length), 0, T - 1)
    return x[jnp.arange(B)[:, None, None], idx]
