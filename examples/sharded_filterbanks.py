"""Time-sharded filterbank battery (BASELINE config #5) over a device
mesh: PQMF/IPQMF + MDCT/IMDCT round trips on multi-channel audio with
the waveform split over time blocks.

Runs on 8 virtual CPU devices by default so it works on one host:

    JAX_PLATFORMS=cpu python examples/sharded_filterbanks.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

import diffsptk_tpu as dsp  # noqa: E402
from diffsptk_tpu.parallel.filterbanks import (  # noqa: E402
    ShardedIMDCT,
    ShardedIPQMF,
    ShardedMDCT,
    ShardedPQMF,
)


def main():
    dp, tp = 2, 4
    mesh = Mesh(np.asarray(jax.devices()[:dp * tp]).reshape(dp, tp),
                ("dp", "tp"))

    x, sr = dsp.read("/root/reference/assets/data.wav")
    C = 4                                     # channels over dp
    T = (x.shape[-1] // (128 * tp)) * (128 * tp)
    xb = jnp.tile(x[None, :T], (C, 1))
    xb = jax.device_put(xb, NamedSharding(mesh, P("dp", "tp")))

    L, K, M = 256, 4, 47
    mdct, imdct = ShardedMDCT(mesh, L), ShardedIMDCT(mesh, L)
    pqmf, ipqmf = ShardedPQMF(mesh, K, M), ShardedIPQMF(mesh, K, M)

    @jax.jit
    def battery(xw):
        y_md = imdct(mdct(xw), out_length=xw.shape[-1])
        y_pq = ipqmf(pqmf(xw))[..., 0, :]
        return y_md, y_pq

    y_md, y_pq = battery(xb)
    ref_md = dsp.IMDCT(L)(dsp.MDCT(L)(xb), out_length=T)
    ref_pq = dsp.IPQMF(K, M)(dsp.PQMF(K, M)(xb))[..., 0, :]

    err_md = float(jnp.max(jnp.abs(y_md - ref_md)))
    err_pq = float(jnp.max(jnp.abs(y_pq - ref_pq)))
    snr = 10 * np.log10(float(jnp.sum(xb**2))
                        / (float(jnp.sum((y_md - xb) ** 2)) + 1e-30))
    print(f"mesh=({dp}x{tp})  MDCT round-trip SNR {snr:.1f} dB")
    print(f"sharded == unsharded: MDCT leg {err_md:.2e}, PQMF leg "
          f"{err_pq:.2e}")


if __name__ == "__main__":
    main()
