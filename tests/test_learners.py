import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffsptk_tpu
from tests import utils as U

RNG = np.random.default_rng(0)


def _two_clusters(n=200, d=3):
    a = RNG.standard_normal((n // 2, d)) * 0.3 + np.array([2.0, 0, 0])
    b = RNG.standard_normal((n // 2, d)) * 0.3 + np.array([-2.0, 1, 0])
    return np.concatenate([a, b])


def test_vq_roundtrip():
    vq = diffsptk_tpu.VectorQuantization(3, 8)
    x = jnp.asarray(RNG.standard_normal((10, 4)))
    xq, idx, loss = vq(x)
    assert xq.shape == x.shape and idx.shape == (10,)
    ivq = diffsptk_tpu.InverseVectorQuantization(vq)
    xq2 = ivq(idx)
    U.assert_close(np.asarray(xq2), np.asarray(xq), rtol=1e-6, atol=1e-8)
    # straight-through gradient passes to input
    g = jax.grad(lambda v: jnp.sum(vq(v)[0]))(x)
    assert np.allclose(np.asarray(g), 1.0)


def test_msvq_improves_with_stages():
    x = jnp.asarray(RNG.standard_normal((64, 4)))
    e_prev = np.inf
    for q in [1, 2, 4]:
        msvq = diffsptk_tpu.MultiStageVectorQuantization(3, 16, q, seed=1)
        xq, idx, _ = msvq(x)
        assert idx.shape == (64, q)
        e = float(jnp.mean(jnp.square(xq - x)))
        assert e <= e_prev + 1e-9
        e_prev = e
        imsvq = diffsptk_tpu.InverseMultiStageVectorQuantization(msvq)
        # quantized output equals the cumulative codebook sum
        U.assert_close(np.asarray(imsvq(idx)), np.asarray(xq), rtol=1e-6,
                       atol=1e-8)


def test_lbg_clusters():
    x = _two_clusters()
    lbg = diffsptk_tpu.LBG(2, 2, n_iter=50)
    codebook, indices, distance = lbg(jnp.asarray(x), return_indices=True)
    cb = np.sort(np.asarray(codebook)[:, 0])
    assert abs(cb[0] + 2.0) < 0.3 and abs(cb[1] - 2.0) < 0.3
    assert float(distance) < 0.5


def test_gmm_em():
    x = _two_clusters(400)
    gmm = diffsptk_tpu.GMM(2, 2, n_iter=50)
    gmm.warmup(jnp.asarray(x))
    (w, mu, sigma), ll = gmm(jnp.asarray(x))
    mus = np.sort(np.asarray(mu)[:, 0])
    assert abs(mus[0] + 2.0) < 0.3 and abs(mus[1] - 2.0) < 0.3
    assert abs(float(jnp.sum(w)) - 1.0) < 1e-6
    # posterior assignment accuracy
    _, idx, _ = gmm.transform(jnp.asarray(x))
    labels = np.asarray(idx)
    first_half = labels[:200]
    acc = max(np.mean(first_half == first_half[0]), 0)
    assert acc > 0.95


def test_gmm_full_cov():
    x = _two_clusters(300)
    gmm = diffsptk_tpu.GMM(2, 2, n_iter=30, var_type="full")
    gmm.warmup(jnp.asarray(x))
    (w, mu, sigma), ll = gmm(jnp.asarray(x))
    assert np.all(np.isfinite(np.asarray(sigma)))


def test_gmm_regression():
    # conditional estimation: y = 2x pattern
    xs = RNG.standard_normal(500)
    ys = 2 * xs + 0.01 * RNG.standard_normal(500)
    data = np.stack([xs, ys], -1)
    gmm = diffsptk_tpu.GMM(1, 2, n_iter=30, var_type="full")
    gmm.warmup(jnp.asarray(data))
    gmm(jnp.asarray(data))
    y_pred, _, _ = gmm.transform(jnp.asarray(xs[:50, None]))
    r = np.corrcoef(np.asarray(y_pred)[:, 0], ys[:50])[0, 1]
    assert r > 0.95, r


def test_pca():
    x = _two_clusters(300)
    pca = diffsptk_tpu.PCA(2, 2)
    s, V, m = pca(jnp.asarray(x))
    # first principal axis dominated by x-dimension separation
    assert abs(np.asarray(V)[0, 0]) > 0.9
    y = pca.transform(jnp.asarray(x))
    assert np.asarray(y).shape == (300, 2)
    # whitened data has unit variance along components
    w = np.asarray(pca.whiten(pca.center(jnp.asarray(x))))
    assert np.allclose(np.var(w, axis=0), 1.0, atol=0.1)


def test_ica_separates():
    t = np.linspace(0, 1, 2000)
    s1 = np.sign(np.sin(2 * np.pi * 13 * t))
    s2 = np.sin(2 * np.pi * 7 * t)
    S = np.stack([s1, s2], -1)
    A = np.array([[1.0, 0.6], [0.4, 1.0]])
    x = S @ A.T
    ica = diffsptk_tpu.ICA(1, 2, n_iter=200, seed=3)
    ica(jnp.asarray(x))
    rec = np.asarray(ica.transform(jnp.asarray(x)))
    # each recovered component correlates strongly with one source
    cors = np.abs(np.corrcoef(rec.T, S.T)[:2, 2:])
    assert cors.max(axis=1).min() > 0.9, cors


@pytest.mark.parametrize("beta", [0, 1, 2])
def test_nmf(beta):
    U_true = RNG.uniform(0.1, 1, (40, 3))
    H_true = RNG.uniform(0.1, 1, (3, 6))
    x = U_true @ H_true
    nmf = diffsptk_tpu.NMF(40, 5, 3, beta=beta, n_iter=200, seed=1)
    (Uf, Hf), div = nmf(jnp.asarray(x))
    recon = np.asarray(Uf) @ np.asarray(Hf)
    rel = np.linalg.norm(recon - x) / np.linalg.norm(x)
    assert rel < 0.05, rel
