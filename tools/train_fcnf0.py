"""Train FCNF0++ on synthetic pitched audio, producing the bundled
checkpoint ``diffsptk_tpu/assets/fcnf0_synth.npz``.

Same rationale as tools/train_crepe_tiny.py: this image has no network
egress for the released penn weights (reference: pitch.py:342 loads them
via penn), so the same public architecture [Morrison et al. 2023] is
trained from scratch on a synthetic corpus with exactly known f0.

Differences from the CREPE recipe, driven by the FCNF0 decoder
(ops/pitch_nn.py:calc_pitch):

* categorical softmax cross-entropy over the 1440 5-cent bins (penn's
  loss), targets Gaussian-blurred by 25 cents and normalized to sum 1;
* unvoiced frames train toward the UNIFORM distribution — the decoder's
  voicing gate is normalized inverse entropy, so maximum-entropy output
  on aperiodic input is precisely the "unvoiced" signal;
* the corpus is generated at 8 kHz (penn's native rate) with f0
  log-uniform in [41, 1300] Hz, inside the decodable bin range;
* per-frame random gain in [0.03, 1.0] instead of unit normalization:
  the eval path feeds raw reflect-padded frames (no zmean/std), and the
  first LayerNorm must learn scale robustness.

The architecture has no running statistics (LayerNorm only), so the
training forward IS ops/pitch_nn.fcnf0_forward and the checkpoint is the
plain parameter dict.

Run:  python tools/train_fcnf0.py [--steps N] [--batch B] [--out F]
"""

from __future__ import annotations

import argparse
import functools
import math
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from diffsptk_tpu.ops.pitch_nn import (
    PENN_CENTS_PER_BIN,
    PENN_FMIN,
    PENN_PITCH_BINS,
    PENN_SAMPLE_RATE,
    PENN_WINDOW_SIZE,
    fcnf0_forward,
    init_fcnf0_params,
)

TARGET_STD_CENTS = 25.0


# ------------------------------------------------------------ data synth
def synth_batch(rng: np.random.Generator, batch: int):
    """(frames (B, 1024) float32, targets (B, 1440) float32 summing to 1)."""
    B, W, SR = batch, PENN_WINDOW_SIZE, PENN_SAMPLE_RATE
    t = np.arange(W) / SR

    f0 = np.exp(rng.uniform(np.log(41.0), np.log(1300.0), B))
    drift = rng.uniform(-0.02, 0.02, B)
    inst_f0 = f0[:, None] * (1 + drift[:, None] * (t[None, :] * SR / W))
    phase = 2 * np.pi * np.cumsum(inst_f0, axis=1) / SR

    K = 24
    k = np.arange(1, K + 1)
    rolloff = k[None, :] ** -rng.uniform(0.3, 2.5, (B, 1))
    env = rolloff.copy()
    n_formants = rng.integers(0, 4, B)
    fc = np.exp(rng.uniform(np.log(150.0), np.log(3000.0), (B, 3)))
    bw = rng.uniform(60.0, 500.0, (B, 3))
    gain = rng.uniform(0.0, 8.0, (B, 3))
    hfreq = f0[:, None] * k[None, :]
    for j in range(3):
        active = (n_formants > j)[:, None]
        bump = gain[:, j:j + 1] * np.exp(
            -0.5 * ((hfreq - fc[:, j:j + 1]) / bw[:, j:j + 1]) ** 2)
        env = env * np.where(active, 1 + bump, 1.0)
    env = env * (hfreq < SR / 2 - 150)          # anti-alias

    phases0 = rng.uniform(0, 2 * np.pi, (B, K))
    x = np.einsum("bk,bkt->bt", env,
                  np.sin(k[None, :, None] * phase[:, None, :]
                         + phases0[:, :, None]))
    x = x / np.maximum(np.abs(x).max(axis=1, keepdims=True), 1e-9)

    snr_db = rng.uniform(0.0, 40.0, B)
    sig_pow = np.mean(x ** 2, axis=1)
    noise_pow = sig_pow / 10 ** (snr_db / 10)
    x = x + rng.standard_normal((B, W)) * np.sqrt(noise_pow)[:, None]

    bins = 1200 * np.log2(f0 / PENN_FMIN) / PENN_CENTS_PER_BIN
    bc = np.arange(PENN_PITCH_BINS)
    target = np.exp(-0.5 * ((bc[None, :] - bins[:, None])
                            * PENN_CENTS_PER_BIN / TARGET_STD_CENTS) ** 2)

    unvoiced = rng.random(B) < 0.10
    x[unvoiced] = rng.standard_normal((int(unvoiced.sum()), W))
    target[unvoiced] = 1.0                      # -> uniform after norm

    # raw-amplitude input (see module docstring): random per-frame gain
    x = x * rng.uniform(0.03, 1.0, (B, 1))
    target = target / target.sum(axis=1, keepdims=True)
    return x.astype(np.float32), target.astype(np.float32)


# Device-side corpus synthesis: same distribution as synth_batch but in
# jnp under jit, so accelerator training is not bottlenecked on the
# single host core (~70 steps/min host-bound vs TPU step time in ms).
def synth_batch_device(key, batch: int):
    B, W, SR = batch, PENN_WINDOW_SIZE, PENN_SAMPLE_RATE
    K = 48
    ks = jax.random.split(key, 16)
    t = jnp.arange(W) / SR
    k = jnp.arange(1, K + 1, dtype=jnp.float32)

    f0 = jnp.exp(jax.random.uniform(
        ks[0], (B,), minval=math.log(41.0), maxval=math.log(1300.0)))
    drift = jax.random.uniform(ks[1], (B,), minval=-0.02, maxval=0.02)
    # in-frame vibrato: vocoded/natural speech sweeps f0 substantially
    # within the 128 ms window (the eval in tests/test_pitch_speech.py
    # imposes ~0.35-octave contours); the linear drift alone leaves the
    # network untrained for it
    vib_depth = jax.random.uniform(ks[12], (B, 1), minval=0.0, maxval=0.15)
    vib_rate = jnp.exp(jax.random.uniform(
        ks[13], (B, 1), minval=math.log(0.5), maxval=math.log(8.0)))
    vib_phase = jax.random.uniform(ks[14], (B, 1), maxval=2 * jnp.pi)
    tc = t[None, :] - 0.5 * W / SR
    vib = 2.0 ** (vib_depth * jnp.sin(2 * jnp.pi * vib_rate * tc
                                      + vib_phase)
                  - vib_depth * jnp.sin(vib_phase - jnp.pi * vib_rate
                                        * W / SR))
    inst_f0 = f0[:, None] * (1 + drift[:, None] * (t[None, :] * SR / W))
    inst_f0 = inst_f0 * vib / jnp.mean(vib, axis=1, keepdims=True)
    phase = 2 * jnp.pi * jnp.cumsum(inst_f0, axis=1) / SR

    rolloff = k[None, :] ** -jax.random.uniform(
        ks[2], (B, 1), minval=0.3, maxval=2.5)
    env = rolloff
    n_formants = jax.random.randint(ks[3], (B,), 0, 4)
    fc = jnp.exp(jax.random.uniform(
        ks[4], (B, 3), minval=math.log(150.0), maxval=math.log(3000.0)))
    bw = jax.random.uniform(ks[5], (B, 3), minval=60.0, maxval=500.0)
    gain = jax.random.uniform(ks[6], (B, 3), minval=0.0, maxval=8.0)
    hfreq = f0[:, None] * k[None, :]
    for j in range(3):
        active = (n_formants > j)[:, None]
        bump = gain[:, j:j + 1] * jnp.exp(
            -0.5 * ((hfreq - fc[:, j:j + 1]) / bw[:, j:j + 1]) ** 2)
        env = env * jnp.where(active, 1 + bump, 1.0)
    # smooth cepstral spectral coloration (speech-envelope-like) on top
    # of the rolloff+formant model
    C = 8
    cep = (jax.random.normal(ks[15], (B, C))
           * (0.8 / jnp.arange(1, C + 1, dtype=jnp.float32)))
    ang = jnp.pi * hfreq / (SR / 2)
    env = env * jnp.exp(jnp.einsum(
        "bc,bkc->bk", cep,
        jnp.cos(ang[:, :, None] * jnp.arange(1, C + 1, dtype=jnp.float32))))
    env = env * (hfreq < SR / 2 - 150)

    phases0 = jax.random.uniform(ks[7], (B, K), maxval=2 * jnp.pi)
    x = jnp.einsum("bk,bkt->bt", env,
                   jnp.sin(k[None, :, None] * phase[:, None, :]
                           + phases0[:, :, None]))
    x = x / jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-9)

    snr_db = jax.random.uniform(ks[8], (B,), minval=0.0, maxval=40.0)
    sig_pow = jnp.mean(x ** 2, axis=1)
    noise_pow = sig_pow / 10 ** (snr_db / 10)
    noise = jax.random.normal(ks[9], (B, W))
    x = x + noise * jnp.sqrt(noise_pow)[:, None]

    bins = 1200 * jnp.log2(f0 / PENN_FMIN) / PENN_CENTS_PER_BIN
    bc = jnp.arange(PENN_PITCH_BINS, dtype=jnp.float32)
    target = jnp.exp(-0.5 * ((bc[None, :] - bins[:, None])
                             * PENN_CENTS_PER_BIN / TARGET_STD_CENTS) ** 2)

    unvoiced = jax.random.uniform(ks[10], (B,)) < 0.10
    x = jnp.where(unvoiced[:, None], noise, x)
    target = jnp.where(unvoiced[:, None], 1.0, target)

    x = x * jax.random.uniform(ks[11], (B, 1), minval=0.03, maxval=1.0)
    target = target / jnp.sum(target, axis=1, keepdims=True)
    return x.astype(jnp.float32), target.astype(jnp.float32)


# ----------------------------------------------------------------- train
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="diffsptk_tpu/assets/fcnf0_synth.npz")
    ap.add_argument("--resume", default=None,
                    help="npz checkpoint to continue from")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (cpu/axon)")
    args = ap.parse_args()

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # CNN training wants bf16 MXU throughput (penn trains in bf16/amp);
    # the library no longer mutates the process-global precision, and
    # this training loop calls the network apply directly (not through
    # BaseOp dispatch), so the jax default ('default' = bf16) applies.

    if args.resume:
        params = {k: jnp.asarray(v)
                  for k, v in np.load(args.resume).items()}
    else:
        params = {k: jnp.asarray(v)
                  for k, v in init_fcnf0_params(args.seed).items()}
    m = {k: jnp.zeros_like(v) for k, v in params.items()}
    v = {k: jnp.zeros_like(p) for k, p in params.items()}

    def loss_fn(p, x, target):
        logits = fcnf0_forward(p, x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.sum(target * logp, axis=-1))

    @jax.jit
    def step_fn(p, m, v, x, target, t):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, target)
        b1, b2, eps = 0.9, 0.999, 1e-8
        new_p, new_m, new_v = {}, {}, {}
        for k in p:
            g = grads[k]
            new_m[k] = b1 * m[k] + (1 - b1) * g
            new_v[k] = b2 * v[k] + (1 - b2) * g * g
            mhat = new_m[k] / (1 - b1 ** t)
            vhat = new_v[k] / (1 - b2 ** t)
            new_p[k] = p[k] - args.lr * mhat / (jnp.sqrt(vhat) + eps)
        return new_p, new_m, new_v, loss

    # One dispatch per CHUNK of steps: on the remote-tunnel TPU each
    # dispatch costs ~0.5 s of latency, so the (synth + step) pair is
    # rolled into a lax.scan and launched 100 steps at a time.
    CHUNK = 100

    @functools.partial(jax.jit, static_argnums=(4,))
    def train_chunk(p, m, v, key, n_inner, t0):
        def body(carry, i):
            p, m, v, key = carry
            key, sub = jax.random.split(key)
            x, target = synth_batch_device(sub, args.batch)
            loss, grads = jax.value_and_grad(loss_fn)(p, x, target)
            b1, b2, eps = 0.9, 0.999, 1e-8
            t = (t0 + i).astype(jnp.float32)
            new_p, new_m, new_v = {}, {}, {}
            for k in p:
                g = grads[k]
                new_m[k] = b1 * m[k] + (1 - b1) * g
                new_v[k] = b2 * v[k] + (1 - b2) * g * g
                mhat = new_m[k] / (1 - b1 ** t)
                vhat = new_v[k] / (1 - b2 ** t)
                new_p[k] = p[k] - args.lr * mhat / (jnp.sqrt(vhat) + eps)
            return (new_p, new_m, new_v, key), loss

        (p, m, v, key), losses = jax.lax.scan(
            body, (p, m, v, key), jnp.arange(n_inner))
        return p, m, v, key, losses[-1]

    @jax.jit
    def eval_fn(p, x):
        logits = fcnf0_forward(p, x)
        probs = jax.nn.softmax(logits, axis=-1)
        ent = -jnp.sum(probs * jnp.log(jnp.maximum(probs, 1e-20)), axis=-1)
        periodicity = 1.0 - ent / math.log(PENN_PITCH_BINS)
        return jnp.argmax(probs, axis=-1), periodicity

    rng = np.random.default_rng(args.seed + 1)
    on_device = jax.devices()[0].platform != "cpu"
    if on_device:
        key = jax.random.PRNGKey(args.seed + 99)
    t0 = time.time()
    step = 0
    while step < args.steps:
        if on_device:
            n_inner = min(CHUNK, args.steps - step)
            params, m, v, key, loss = train_chunk(
                params, m, v, key, n_inner, jnp.asarray(step + 1))
            step += n_inner
        else:
            x, target = synth_batch(rng, args.batch)
            step += 1
            params, m, v, loss = step_fn(params, m, v, jnp.asarray(x),
                                         jnp.asarray(target), step)
        if step % 500 == 0 or step == args.steps:
            xe, te = synth_batch(rng, 256)
            bins_hat, period = eval_fn(params, jnp.asarray(xe))
            bins_hat = np.asarray(bins_hat)
            period = np.asarray(period)
            voiced = te.max(axis=1) > 2.0 / PENN_PITCH_BINS
            true_bins = te.argmax(axis=1)
            err_cents = np.abs(bins_hat - true_bins)[voiced] \
                * PENN_CENTS_PER_BIN
            rpa50 = float((err_cents <= 50).mean())
            rate = step * args.batch / (time.time() - t0)
            print(f"step {step:6d} loss {float(loss):.4f} "
                  f"RPA50 {rpa50:.3f} "
                  f"P_v {float(period[voiced].mean()):.2f} "
                  f"P_u {float(period[~voiced].mean()):.2f} "
                  f"({rate:.0f} frames/s)", flush=True)
            # periodic checkpoint: long CPU runs must survive interruption
            np.savez(args.out,
                     **{k: np.asarray(p) for k, p in params.items()})

    np.savez(args.out, **{k: np.asarray(p) for k, p in params.items()})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
