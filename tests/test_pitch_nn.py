"""Neural pitch extractors (CREPE / FCNF0), native JAX implementations
(reference: diffsptk/modules/pitch.py:208-394 wraps torchcrepe/penn).

The pretrained checkpoints are not available in this hermetic image, so
accuracy is not testable; these tests pin the architecture arithmetic
(shape self-consistency), the decoders (viterbi vs brute force), the
voicing/loudness gating plumbing, and checkpoint load/validation.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

import diffsptk_tpu
from diffsptk_tpu.ops.pitch_nn import (
    a_weighting_db,
    crepe_transition,
    init_crepe_params,
    init_fcnf0_params,
    load_params,
    viterbi_decode,
)

SR = 16000


@pytest.fixture(scope="module")
def audio(data_wav):
    return np.asarray(data_wav)[:8000]


@pytest.mark.parametrize("algo,kwargs", [
    ("crepe", {"model": "full"}),
    ("crepe", {"model": "tiny"}),
    ("fcnf0", {}),
])
def test_pipeline_shapes(algo, kwargs, audio):
    n = len(audio) // 80
    pitch = diffsptk_tpu.Pitch(80, SR, algorithm=algo, out_format="f0",
                               **kwargs)
    f0 = np.asarray(pitch(jnp.asarray(audio)))
    assert f0.shape == (n,)
    assert np.isfinite(f0).all()
    v = f0[f0 > 0]
    if v.size:
        assert (v >= 10).all() and (v <= SR / 2).all()
    # batched input
    xb = jnp.stack([jnp.asarray(audio)] * 2)
    f0b = np.asarray(pitch(xb))
    assert f0b.shape == (2, n)
    np.testing.assert_allclose(f0b[0], f0, rtol=1e-5, atol=1e-5)


def test_prob_embed_formats(audio):
    x = jnp.asarray(audio[:4000])
    pr = diffsptk_tpu.Pitch(80, SR, algorithm="crepe", out_format="prob")(x)
    assert pr.shape == (50, 360)
    assert float(pr.min()) >= 0 and float(pr.max()) <= 1
    em = diffsptk_tpu.Pitch(80, SR, algorithm="crepe", out_format="embed")(x)
    assert em.shape == (50, 2048)
    pf = diffsptk_tpu.Pitch(80, SR, algorithm="fcnf0", out_format="prob")(x)
    assert pf.shape == (50, 1440)
    np.testing.assert_allclose(np.asarray(pf.sum(-1)), 1.0, rtol=1e-4)


def test_viterbi_vs_bruteforce():
    rng = np.random.RandomState(0)
    C, N = 5, 7
    probs = rng.rand(N, C)
    probs /= probs.sum(-1, keepdims=True)
    trans = rng.rand(C, C)
    trans /= trans.sum(-1, keepdims=True)
    best, bp = -np.inf, None
    for path in itertools.product(range(C), repeat=N):
        lp = np.log(probs[0, path[0]])
        for i in range(1, N):
            lp += np.log(trans[path[i - 1], path[i]]) \
                + np.log(probs[i, path[i]])
        if lp > best:
            best, bp = lp, path
    got = np.asarray(viterbi_decode(jnp.asarray(probs), jnp.asarray(trans)))
    assert tuple(got) == bp
    # batched agrees
    gb = np.asarray(viterbi_decode(jnp.stack([jnp.asarray(probs)] * 3),
                                   jnp.asarray(trans)))
    assert (gb == np.asarray(bp)).all()


def test_transition_matrix():
    t = crepe_transition()
    assert t.shape == (360, 360)
    np.testing.assert_allclose(t.sum(1), 1.0)
    assert t[0, 30] == 0  # beyond the 12-bin triangle


def test_a_weighting():
    # A-weighting is ~0 dB at 1 kHz and strongly negative at 20 Hz.
    w = a_weighting_db(np.array([20.0, 1000.0]))
    assert abs(w[1]) < 0.2
    assert w[0] < -40


def test_checkpoint_validation(tmp_path):
    par = init_crepe_params("tiny", seed=3)
    path = tmp_path / "crepe_tiny.npz"
    np.savez(path, **par)
    par2 = load_params(str(path), lambda: None,
                       expect=init_crepe_params("tiny"))
    assert all(np.allclose(par[k], par2[k]) for k in par)
    # wrong-capacity checkpoint is rejected with a clear error
    with pytest.raises(ValueError, match="shape mismatch|missing"):
        load_params(str(path), lambda: None,
                    expect=init_crepe_params("full"))


def test_fcnf0_weight_plan():
    par = init_fcnf0_params()
    assert par["head.weight"].shape == (1440, 512, 4)


def test_invalid_configs():
    with pytest.raises(ValueError):
        diffsptk_tpu.Pitch(80, SR, algorithm="crepe", f_min=100, f_max=50)
    with pytest.raises(ValueError):
        diffsptk_tpu.Pitch(80, SR, algorithm="crepe", model="huge")
