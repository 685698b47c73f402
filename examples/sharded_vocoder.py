"""Sequence-parallel mel-cepstral vocoder over a device mesh.

Runs on 8 virtual CPU devices by default so it works on one host:

    JAX_PLATFORMS=cpu python examples/sharded_vocoder.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the virtual 8-device mesh lives on the CPU backend; this must be set
# before the first backend touch
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

import diffsptk_tpu as dsp  # noqa: E402
from diffsptk_tpu.models import MelCepstralVocoder  # noqa: E402
from diffsptk_tpu.parallel import ShardedMelCepstralVocoder  # noqa: E402


def main():
    x, sr = dsp.read("/root/reference/assets/data.wav")
    xb = jnp.tile(jnp.asarray(x)[None, :], (4, 1))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "tp"))
    kw = dict(frame_length=400, frame_period=80, fft_length=512,
              cep_order=24, alpha=0.42, n_iter=4)
    sharded = ShardedMelCepstralVocoder(mesh, **kw)
    single = MelCepstralVocoder(**kw)

    y_sharded = jax.jit(sharded.analysis_synthesis)(xb)
    y_single = single.analysis_synthesis(xb)
    err = float(jnp.max(jnp.abs(y_sharded - y_single))
                / jnp.max(jnp.abs(y_single)))
    print(f"mesh (2 dp x 4 tp): max relative deviation from "
          f"single-device graph = {err:.2e}")


if __name__ == "__main__":
    main()
