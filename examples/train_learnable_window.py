"""Train a learnable STFT window to recover the Hanning window from
spectrogram supervision — the minimal learnable=True example."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import diffsptk_tpu as dsp


def main():
    x, sr = dsp.read("/root/reference/assets/data.wav")
    target_op = dsp.STFT(400, 80, 512, window="hanning", norm="none",
                         out_format="power")
    stft = dsp.STFT(400, 80, 512, window="rectangular", norm="none",
                    out_format="power", learnable=["window"], eps=1e-8)
    target = jnp.log(target_op(x) + 1e-8)

    window_op = stft.window
    params = window_op.trainable_params
    opt = optax.adam(3e-2)
    state = opt.init(params)

    def loss_fn(p, x):
        frames = stft.frame(x)
        y = stft.spec(window_op.apply(p, frames))
        return jnp.mean((jnp.log(y + 1e-8) - target) ** 2)

    @jax.jit
    def step(p, s, x):
        l, g = jax.value_and_grad(loss_fn)(p, x)
        updates, s = opt.update(g, s)
        return l, optax.apply_updates(p, updates), s

    for i in range(300):
        l, params, state = step(params, state, x)
        if i % 75 == 0:
            print(f"step {i}: loss {float(l):.4f}")
    learned = np.abs(np.asarray(next(iter(params.values()))))
    hann = np.hanning(402)[1:-1]
    corr = np.corrcoef(learned[:400], hann)[0, 1]
    print(f"correlation of |learned window| with hanning: {corr:.3f}")


if __name__ == "__main__":
    main()
