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


def test_gmm_batch_size_streams():
    """Chunked EM accumulates the same sufficient statistics as
    full-batch (reference streams via DataLoader, gmm.py:322-358)."""
    x = jnp.asarray(_two_clusters(400))
    full = diffsptk_tpu.GMM(2, 2, n_iter=10, seed=5)
    chunked = diffsptk_tpu.GMM(2, 2, n_iter=10, seed=5, batch_size=96)
    (w0, mu0, s0), ll0 = full(x)
    (w1, mu1, s1), ll1 = chunked(x)
    U.assert_close(np.asarray(w1), np.asarray(w0), rtol=1e-8, atol=1e-10)
    U.assert_close(np.asarray(mu1), np.asarray(mu0), rtol=1e-8, atol=1e-10)
    U.assert_close(np.asarray(s1), np.asarray(s0), rtol=1e-8, atol=1e-10)
    # data larger than any single array: a list of chunks works too
    pieces = [x[:150], x[150:300], x[300:]]
    listed = diffsptk_tpu.GMM(2, 2, n_iter=10, seed=5)
    (w2, mu2, _), _ = listed(pieces)
    U.assert_close(np.asarray(mu2), np.asarray(mu0), rtol=1e-8, atol=1e-10)


def test_gmm_batch_size_map_adaptation():
    x = jnp.asarray(_two_clusters(400))
    ubm = diffsptk_tpu.GMM(2, 2, n_iter=10, seed=5)
    params, _ = ubm(x)
    y = x[:200]
    full = diffsptk_tpu.GMM(2, 2, n_iter=5, ubm=params, alpha=0.3)
    chunked = diffsptk_tpu.GMM(2, 2, n_iter=5, ubm=params, alpha=0.3,
                               batch_size=64)
    (w0, mu0, s0), _ = full(y)
    (w1, mu1, s1), _ = chunked(y)
    U.assert_close(np.asarray(mu1), np.asarray(mu0), rtol=1e-8, atol=1e-10)
    U.assert_close(np.asarray(s1), np.asarray(s0), rtol=1e-8, atol=1e-10)


def test_lbg_batch_size_streams():
    x = jnp.asarray(_two_clusters(300))
    full = diffsptk_tpu.LBG(2, 4, n_iter=20, seed=2)
    chunked = diffsptk_tpu.LBG(2, 4, n_iter=20, seed=2, batch_size=77)
    cb0, idx0, d0 = full(x, return_indices=True)
    cb1, idx1, d1 = chunked(x, return_indices=True)
    U.assert_close(np.asarray(cb1), np.asarray(cb0), rtol=1e-8, atol=1e-10)
    assert np.array_equal(np.asarray(idx1), np.asarray(idx0))
    assert abs(float(d1) - float(d0)) < 1e-10


def test_pca_ica_nmf_batch_size_streams():
    x = jnp.asarray(_two_clusters(300))
    p0 = diffsptk_tpu.PCA(2, 2)
    p1 = diffsptk_tpu.PCA(2, 2, batch_size=50)
    s0, V0, m0 = p0(x)
    s1, V1, m1 = p1(x)
    U.assert_close(np.asarray(s1), np.asarray(s0), rtol=1e-8, atol=1e-10)
    U.assert_close(np.asarray(V1), np.asarray(V0), rtol=1e-6, atol=1e-8)

    t = np.linspace(0, 1, 1000)
    S = np.stack([np.sign(np.sin(26 * np.pi * t)),
                  np.sin(14 * np.pi * t)], -1)
    mix = jnp.asarray(S @ np.array([[1.0, 0.6], [0.4, 1.0]]).T)
    i0 = diffsptk_tpu.ICA(1, 2, n_iter=50, seed=3)
    i1 = diffsptk_tpu.ICA(1, 2, n_iter=50, seed=3, batch_size=256)
    W0 = i0(mix)
    W1 = i1(mix)
    U.assert_close(np.asarray(W1), np.asarray(W0), rtol=1e-6, atol=1e-8)

    z = jnp.asarray(RNG.uniform(0.1, 1, (40, 3))
                    @ RNG.uniform(0.1, 1, (3, 6)))
    n0 = diffsptk_tpu.NMF(40, 5, 3, n_iter=30, seed=1)
    n1 = diffsptk_tpu.NMF(40, 5, 3, n_iter=30, seed=1, batch_size=16)
    (Uf0, Hf0), div0 = n0(z)
    (Uf1, Hf1), div1 = n1(z)
    U.assert_close(np.asarray(Uf1), np.asarray(Uf0), rtol=1e-7, atol=1e-9)
    U.assert_close(np.asarray(Hf1), np.asarray(Hf0), rtol=1e-7, atol=1e-9)


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


def test_gmm_interrupt_resume(tmp_path):
    """A fit interrupted by its callback resumes exactly: checkpoint the
    params mid-run, rebuild, set_params, continue — the EM recursion is
    Markov in the parameters so the resumed trajectory equals the
    uninterrupted one (SURVEY §5.3 restartable learner loops)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(np.concatenate([rng.normal(-2, 0.5, (80, 3)),
                                    rng.normal(+2, 0.8, (80, 3))]))

    full = diffsptk_tpu.GMM(2, 2, n_iter=10, eps=0, seed=5)
    (w_ref, mu_ref, s_ref), _ = full(x)

    from diffsptk_tpu.utils.checkpoint import load, save

    part = diffsptk_tpu.GMM(2, 2, n_iter=10, eps=0, seed=5)
    path = str(tmp_path / "gmm_ckpt.npz")

    def stop_after_4(iteration, params, **kv):
        if iteration == 3:                  # 4 iterations ran (0..3)
            save(path, {"w": params[0], "mu": params[1],
                        "sigma": params[2]})
            return False
        return True

    part(x, callback=stop_after_4)

    resumed = diffsptk_tpu.GMM(2, 2, n_iter=6, eps=0, seed=99)
    ckpt = load(path, {"w": resumed.w, "mu": resumed.mu,
                       "sigma": resumed.sigma})
    resumed.set_params((ckpt["w"], ckpt["mu"], ckpt["sigma"]))
    (w, mu, s), _ = resumed(x)

    np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref),
                               rtol=1e-9)


def test_learner_metrics_logger(tmp_path):
    """The JSONL metrics callback records one scalar event per
    iteration for every learner that loops (SURVEY §5.5)."""
    import json

    from diffsptk_tpu.utils.metrics import JsonlMetricsLogger

    rng = np.random.default_rng(4)
    x = jnp.asarray(np.abs(rng.normal(1, 0.2, (32, 4))) + 0.1)
    path = str(tmp_path / "metrics.jsonl")
    log = JsonlMetricsLogger(path)

    diffsptk_tpu.GMM(3, 2, n_iter=3, eps=0, seed=0)(
        x, callback=log.as_callback())
    diffsptk_tpu.NMF(32, 3, 2, n_iter=3)(
        x, callback=log.as_callback())
    diffsptk_tpu.LBG(3, 2, n_iter=3)(x, callback=log.as_callback())
    log.close()

    events = [json.loads(l) for l in open(path)]
    assert len(events) >= 9
    assert all("t" in e and "iteration" in e for e in events)
    assert any("log_likelihood" in e for e in events)
    assert any("distance" in e for e in events)
