"""Speech-level pitch accuracy with hermetic ground truth.

The reference wraps speech-corpus-trained trackers (torchcrepe / penn,
diffsptk/modules/pitch.py:208-394); this image has no egress for their
released weights, so the bundled checkpoints are trained on synthetic
corpora (tools/train_fcnf0.py).  This test manufactures speech-like
material with EXACTLY known f0: data.wav's CheapTrick envelope is
WORLD-resynthesized under an imposed vibrato contour, so the tracker's
cents error is measured against ground truth rather than another
tracker.  Bounds are set from the measured accuracy of the bundled
fine-tuned checkpoint (docs/parity.md records the numbers)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

import diffsptk_tpu

SR, P, L = 16000, 80, 1024


@pytest.fixture(scope="module")
def vocoded_speech():
    x, sr = diffsptk_tpu.read("/root/reference/assets/data.wav")
    assert sr == SR
    f0_est = diffsptk_tpu.Pitch(P, SR, algorithm="yin", out_format="f0",
                                f_min=80, f_max=180)(x)
    sp = diffsptk_tpu.PitchAdaptiveSpectralAnalysis(P, SR, L)(x, f0_est)
    N = sp.shape[0]
    t = np.arange(N) * P / SR
    f0_true = 120.0 * 2 ** (0.35 * np.sin(2 * np.pi * 1.3 * t)
                            + 0.1 * np.sin(2 * np.pi * 4.7 * t + 1.0))
    f0_true = np.clip(f0_true, 85.0, 250.0).astype(np.float32)
    ap = jnp.full((N, L // 2 + 1), 0.002, jnp.float32)
    ws = diffsptk_tpu.WorldSynthesis(P, SR, L, f0_ceil=600.0, f0_floor=80.0)
    y = np.asarray(ws(jnp.asarray(f0_true), ap, sp))
    return jnp.asarray(y / (np.abs(y).max() + 1e-9)), f0_true


def _cents(pitch, y, f0_true):
    f0 = np.asarray(pitch(y))
    n = min(len(f0), len(f0_true))
    voiced = f0[:n] > 0
    err = 1200 * np.abs(np.log2(np.maximum(f0[:n], 1e-6) / f0_true[:n]))
    return err[voiced], voiced.mean()


def test_yin_speech_accuracy(vocoded_speech):
    y, f0_true = vocoded_speech
    p = diffsptk_tpu.Pitch(P, SR, algorithm="yin", out_format="f0",
                           f_min=60, f_max=400)
    err, recall = _cents(p, y, f0_true)
    assert recall > 0.5, recall
    assert np.median(err) < 35, np.median(err)        # measured ~21c


def test_fcnf0_speech_accuracy(vocoded_speech):
    """The bundled FCNF0 checkpoint (fine-tuned on the vibrato/cepstral
    corpus, tools/train_fcnf0.py) on vocoded speech: measured median
    ~38 cents, p90 ~120 — bounds with platform margin."""
    y, f0_true = vocoded_speech
    p = diffsptk_tpu.Pitch(P, SR, algorithm="fcnf0", out_format="f0")
    err, recall = _cents(p, y, f0_true)
    assert recall > 0.55, recall
    assert np.median(err) < 55, np.median(err)
    assert np.percentile(err, 90) < 160, np.percentile(err, 90)


def test_crepe_tiny_speech_accuracy(vocoded_speech):
    """The bundled CREPE-tiny (fine-tuned on the vibrato/cepstral
    corpus, tools/train_crepe_tiny.py): measured median 17.4 cents,
    p90 67 on the vocoded-speech ground truth."""
    y, f0_true = vocoded_speech
    p = diffsptk_tpu.Pitch(P, SR, algorithm="crepe", model="tiny",
                           out_format="f0")
    err, recall = _cents(p, y, f0_true)
    assert recall > 0.6, recall
    assert np.median(err) < 40, np.median(err)
    assert np.percentile(err, 90) < 110, np.percentile(err, 90)
