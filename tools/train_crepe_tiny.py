"""Train CREPE-tiny on synthetic pitched audio, producing the bundled
checkpoint ``diffsptk_tpu/assets/crepe_tiny_synth.npz``.

This image has no network egress, so the released torchcrepe weights
cannot be downloaded (reference: diffsptk/modules/pitch.py:228 loads
them via torchcrepe).  Instead the same public architecture [Kim et al.
2018] is trained here, from scratch, on a synthetic corpus of harmonic
signals whose ground-truth f0 is known exactly:

* f0 log-uniform in [50, 1500] Hz with up-to-±2 % linear drift per frame,
* harmonic amplitudes from a random spectral rolloff k^-p shaped by 1-3
  random formant bumps (speech-like envelopes),
* additive white noise at SNR uniform in [0, 40] dB,
* 10 % unvoiced frames (pure noise) with all-zero targets, teaching the
  confidence gate that drives the voicing decision.

Targets follow the CREPE paper: per-bin sigmoid with a Gaussian blur of
25 cents around the true pitch, binary cross-entropy loss.  BatchNorm
runs in batch-stat mode with torch-momentum (0.1) running-stat EMA; the
saved checkpoint stores the running stats the eval-mode forward
(diffsptk_tpu.ops.pitch_nn.crepe_forward) consumes.

Run:  python tools/train_crepe_tiny.py [--steps N] [--batch B] [--out F]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from diffsptk_tpu.ops.pitch_nn import (
    _CREPE_BN_EPS,
    _CREPE_CAPACITY,
    _CREPE_KERNELS,
    _CREPE_PADS,
    _CREPE_STRIDES,
    CREPE_CENTS_OFFSET,
    CREPE_CENTS_PER_BIN,
    CREPE_PITCH_BINS,
    CREPE_WINDOW_SIZE,
    init_crepe_params,
)

SR = 16000
TARGET_STD_CENTS = 25.0  # CREPE paper, section 2


# ------------------------------------------------------------ data synth
def synth_batch(rng: np.random.Generator, batch: int):
    """(frames (B, 1024) float32 normalized, targets (B, 360) float32)."""
    B, W = batch, CREPE_WINDOW_SIZE
    t = np.arange(W) / SR

    f0 = np.exp(rng.uniform(np.log(50.0), np.log(1500.0), B))
    drift = rng.uniform(-0.02, 0.02, B)
    # in-frame vibrato (natural/vocoded speech sweeps f0 within the
    # 64 ms window; see tools/train_fcnf0.py and
    # tests/test_pitch_speech.py)
    vib_depth = rng.uniform(0.0, 0.15, (B, 1))
    vib_rate = np.exp(rng.uniform(np.log(0.5), np.log(8.0), (B, 1)))
    vib_phase = rng.uniform(0, 2 * np.pi, (B, 1))
    tc = t[None, :] - 0.5 * W / SR
    vib = 2.0 ** (vib_depth * np.sin(2 * np.pi * vib_rate * tc + vib_phase))
    inst_f0 = f0[:, None] * (1 + drift[:, None] * (t[None, :] * SR / W))
    inst_f0 = inst_f0 * vib / vib.mean(axis=1, keepdims=True)
    phase = 2 * np.pi * np.cumsum(inst_f0, axis=1) / SR

    K = 30
    k = np.arange(1, K + 1)
    rolloff = k[None, :] ** -rng.uniform(0.3, 2.5, (B, 1))
    env = rolloff.copy()
    n_formants = rng.integers(0, 4, B)
    fc = np.exp(rng.uniform(np.log(200.0), np.log(4000.0), (B, 3)))
    bw = rng.uniform(80.0, 600.0, (B, 3))
    gain = rng.uniform(0.0, 8.0, (B, 3))
    hfreq = f0[:, None] * k[None, :]
    for j in range(3):
        active = (n_formants > j)[:, None]
        bump = gain[:, j:j + 1] * np.exp(
            -0.5 * ((hfreq - fc[:, j:j + 1]) / bw[:, j:j + 1]) ** 2)
        env = env * np.where(active, 1 + bump, 1.0)
    # smooth cepstral spectral coloration (speech-envelope-like)
    C = 8
    cep = rng.standard_normal((B, C)) * (0.8 / np.arange(1, C + 1))
    ang = np.pi * hfreq / (SR / 2)
    env = env * np.exp(np.einsum(
        "bc,bkc->bk", cep, np.cos(ang[:, :, None] * np.arange(1, C + 1))))
    env = env * (hfreq < SR / 2 - 200)         # anti-alias

    phases0 = rng.uniform(0, 2 * np.pi, (B, K))
    x = np.einsum("bk,bkt->bt", env,
                  np.sin(k[None, :, None] * phase[:, None, :]
                         + phases0[:, :, None]))
    x = x / np.maximum(np.abs(x).max(axis=1, keepdims=True), 1e-9)

    snr_db = rng.uniform(0.0, 40.0, B)
    sig_pow = np.mean(x ** 2, axis=1)
    noise_pow = sig_pow / 10 ** (snr_db / 10)
    x = x + rng.standard_normal((B, W)) * np.sqrt(noise_pow)[:, None]

    cents = 1200 * np.log2(f0 / 10.0)
    bins = (cents - CREPE_CENTS_OFFSET) / CREPE_CENTS_PER_BIN
    bc = np.arange(CREPE_PITCH_BINS)
    target = np.exp(-0.5 * ((bc[None, :] - bins[:, None])
                            * CREPE_CENTS_PER_BIN / TARGET_STD_CENTS) ** 2)

    unvoiced = rng.random(B) < 0.10
    x[unvoiced] = rng.standard_normal((int(unvoiced.sum()), W))
    target[unvoiced] = 0.0

    x = x - x.mean(axis=1, keepdims=True)
    x = x / np.maximum(x.std(axis=1, keepdims=True), 1e-10)
    return x.astype(np.float32), target.astype(np.float32)


# ------------------------------------------------- train-mode forward/BN
def crepe_train_logits(params, x, model="tiny", momentum=0.1):
    """Forward with batch-stat BatchNorm; returns (logits, stat_updates)
    where stat_updates maps running-stat names to their new EMA values."""
    cap = _CREPE_CAPACITY[model]
    h = x[:, None, :]
    updates = {}
    for i in range(1, 7):
        w = params[f"conv{i}.weight"]
        b = params[f"conv{i}.bias"]
        h = jnp.pad(h, [(0, 0), (0, 0), _CREPE_PADS[i - 1]])
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=(_CREPE_STRIDES[i - 1],),
            padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"))
        h = h + b[None, :, None]
        h = jax.nn.relu(h)
        mean = h.mean(axis=(0, 2))
        var = h.var(axis=(0, 2))
        n = h.shape[0] * h.shape[2]
        unbiased = var * n / max(n - 1, 1)
        updates[f"conv{i}_BN.running_mean"] = (
            (1 - momentum) * params[f"conv{i}_BN.running_mean"]
            + momentum * mean)
        updates[f"conv{i}_BN.running_var"] = (
            (1 - momentum) * params[f"conv{i}_BN.running_var"]
            + momentum * unbiased)
        h = ((h - mean[None, :, None])
             * jax.lax.rsqrt(var + _CREPE_BN_EPS)[None, :, None]
             * params[f"conv{i}_BN.weight"][None, :, None]
             + params[f"conv{i}_BN.bias"][None, :, None])
        B, C, T = h.shape
        h = h[:, :, :T - T % 2].reshape(B, C, T // 2, 2).max(-1)
    h = jnp.swapaxes(h, 1, 2).reshape(h.shape[0], cap["in_features"])
    logits = h @ params["classifier.weight"].T + params["classifier.bias"]
    return logits, updates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="diffsptk_tpu/assets/crepe_tiny_synth.npz")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--platform", default=None,
                    help="force jax platform (cpu/axon)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import optax

    rng = np.random.default_rng(args.seed)
    if args.resume:
        params = {k: jnp.asarray(v)
                  for k, v in np.load(args.resume).items()}
        print(f"resumed from {args.resume}")
    else:
        params = {k: jnp.asarray(v)
                  for k, v in init_crepe_params("tiny",
                                                seed=args.seed).items()}

    trainable = [k for k in params if "running_" not in k]
    sched = optax.cosine_decay_schedule(args.lr, args.steps, 0.05)
    opt = optax.adam(sched)
    opt_state = opt.init({k: params[k] for k in trainable})

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(tp):
            p = dict(params)
            p.update(tp)
            logits, updates = crepe_train_logits(p, x)
            # CREPE paper: per-bin binary cross-entropy
            loss = jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))
            return loss, updates

        tp = {k: params[k] for k in trainable}
        (loss, updates), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(tp)
        upd, opt_state = opt.update(grads, opt_state)
        tp = optax.apply_updates(tp, upd)
        new_params = dict(params)
        new_params.update(tp)
        new_params.update(updates)
        return new_params, opt_state, loss

    def evaluate(params, n=512):
        erng = np.random.default_rng(12345)
        x, y = synth_batch(erng, n)
        voiced = y.max(axis=1) > 0.5
        from diffsptk_tpu.ops.pitch_nn import crepe_forward
        probs = np.asarray(crepe_forward(
            {k: np.asarray(v) for k, v in params.items()},
            jnp.asarray(x), "tiny"))
        bins = probs.argmax(axis=1)
        true_bins = y.argmax(axis=1)
        err_cents = np.abs(bins - true_bins) * CREPE_CENTS_PER_BIN
        rpa50 = float((err_cents[voiced] <= 50).mean())
        conf_v = float(probs.max(axis=1)[voiced].mean())
        conf_u = float(probs.max(axis=1)[~voiced].mean()) \
            if (~voiced).any() else 0.0
        return rpa50, conf_v, conf_u

    t0 = time.time()
    for it in range(1, args.steps + 1):
        x, y = synth_batch(rng, args.batch)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(y))
        if it % 500 == 0 or it == 1:
            rpa, cv, cu = evaluate(params)
            rate = it * args.batch / (time.time() - t0)
            print(f"step {it:6d} loss {float(loss):.4f} "
                  f"RPA50 {rpa:.3f} conf_v {cv:.2f} conf_u {cu:.2f} "
                  f"({rate:.0f} frames/s)", flush=True)
            np.savez(args.out,
                     **{k: np.asarray(v) for k, v in params.items()})
    np.savez(args.out, **{k: np.asarray(v) for k, v in params.items()})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
