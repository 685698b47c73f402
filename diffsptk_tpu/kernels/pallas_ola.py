"""Pallas TPU kernel: overlap-add of windowed responses (WORLD synthesis).

Adds P windows of length L into a (B, T) buffer at per-window start
indices.  XLA's windowed scatter-add is the fallback; the kernel keeps
each output row resident in VMEM across slot chunks and performs the
per-slot read-modify-write with dynamic slices — no scatter machinery.
The output row (T*4 bytes) must fit comfortably in VMEM, which holds for
speech-scale T (a few hundred thousand samples).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLOT_CHUNK = 128
_VMEM_ROW_LIMIT = 4 * 1024 * 1024          # bytes per output row


def _make_kernel(Pp: int, C: int, nr: int):
    def _kernel(tidx_ref, resp_ref, out_ref, acc_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(jnp.logical_and(i == 0, j == 0))
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        base = i * Pp + j * C
        lanes = lax.broadcasted_iota(jnp.int32, (nr + 1, 128), 1)
        zrow = jnp.zeros((1, 128), out_ref.dtype)

        def one(s, dst, di):
            # The response rides as an (nr, 128) 2-D tile (full-sublane
            # VPU shapes — a (1, L) row uses 1/8 of the unit).  The flat
            # rotate by t % 128 is a lane roll plus a row-carry select,
            # and the destination offset is then sublane-aligned, so
            # the read-modify-write is a dynamic slice on the
            # second-to-last axis of the 2-D output row — no lane
            # relayouts anywhere.
            t = tidx_ref[base + s]
            t_lo = lax.rem(t, 128)
            row0 = (t - t_lo) // 128
            r2 = resp_ref[0, s]                         # (nr, 128)
            rolled = pltpu.roll(r2, t_lo, 1)
            rp = jnp.concatenate([rolled, zrow], axis=0)   # (nr+1, 128)
            carry = pltpu.roll(rp, 1, 0)                # row i-1 (row 0<-0)
            wide = jnp.where(lanes >= t_lo, rp, carry)
            dst[di, pl.ds(row0, nr + 1), :] += wide

        def body(u, _):
            # even/odd slots hit different accumulators: successive
            # windows overlap, so a single accumulator serializes every
            # read-modify-write; two halve the dependency chain
            one(2 * u, out_ref, i)
            one(2 * u + 1, acc_ref, 0)
            return 0

        lax.fori_loop(0, C // 2, body, 0)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_ref[i] += acc_ref[0]

    return _kernel


@functools.partial(jax.jit, static_argnames=("out_len",))
def _pallas_ola(tidx: jnp.ndarray, resp: jnp.ndarray,
                out_len: int) -> jnp.ndarray:
    B, P, L = resp.shape
    pad_p = (-P) % _SLOT_CHUNK
    if pad_p:
        # padded slots: zero response at index 0 — harmless adds
        resp = jnp.pad(resp, ((0, 0), (0, pad_p), (0, 0)))
        tidx = jnp.pad(tidx, ((0, 0), (0, pad_p)))
    pad_l = (-L) % 128
    if pad_l:
        resp = jnp.pad(resp, ((0, 0), (0, 0), (0, pad_l)))
    Lp = L + pad_l
    nr = Lp // 128
    Pp = resp.shape[1]
    C = _SLOT_CHUNK
    # room for the aligned-base write: up to 127 + Lp beyond the last
    # start index, and a multiple of 128 overall
    out_rows = -(-out_len // 128) + nr + 1
    # tidx rides whole in SMEM; the full-array output block plus the
    # odd-slot accumulator stay VMEM-resident across the grid
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Pp // C),
        in_specs=[
            pl.BlockSpec((1, C, nr, 128), lambda i, j, t: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, out_rows, 128), lambda i, j, t: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, out_rows, 128), resp.dtype)],
    )
    y = pl.pallas_call(
        _make_kernel(Pp, C, nr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, out_rows, 128), resp.dtype),
    )(tidx.reshape(-1), resp.reshape(B, Pp, nr, 128))
    return y.reshape(B, out_rows * 128)[:, :out_len]


def overlap_add(tidx: jnp.ndarray, resp: jnp.ndarray,
                out_len: int) -> jnp.ndarray:
    """y[b, tidx[b,p] : tidx[b,p]+L] += resp[b, p] for every slot p.

    Start indices must satisfy 0 <= tidx <= out_len - L (WORLD's slot
    table guarantees this by construction).  Dispatches to the Pallas
    kernel on TPU at float32; elsewhere uses XLA's windowed scatter-add.
    """
    B, P, L = resp.shape
    use_pallas = False
    try:
        use_pallas = (jax.devices()[0].platform == "tpu"
                      and resp.dtype == jnp.float32
                      and out_len * 4 <= _VMEM_ROW_LIMIT)
    except Exception:
        pass
    if use_pallas:
        return _pallas_ola(tidx, resp, out_len)

    operand = jnp.zeros((B, out_len), resp.dtype)
    bidx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                            tidx.shape)
    sidx = jnp.stack([bidx, tidx], axis=-1)
    dn = lax.ScatterDimensionNumbers(
        update_window_dims=(2,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1))
    return lax.scatter_add(operand, sidx, resp, dn,
                           mode=lax.GatherScatterMode.FILL_OR_DROP)
