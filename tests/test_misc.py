import jax.numpy as jnp
import numpy as np
import pytest
import torch

import diffsptk_tpu
from tests import utils as U
from tests.oracle import reference

RNG = np.random.default_rng(0)


def test_decimate_interpolate_delay():
    x = RNG.standard_normal((3, 20))
    U.check_parity(diffsptk_tpu.Decimation(3, 1),
                   reference.Decimation(3, 1), x)
    U.check_parity(diffsptk_tpu.Interpolation(3, 1),
                   reference.Interpolation(3, 1), x)
    for start, keeplen in [(4, False), (4, True), (-4, False), (-4, True)]:
        U.check_parity(diffsptk_tpu.Delay(start, keeplen),
                       reference.Delay(start, keeplen), x)


def test_entropy():
    p = RNG.uniform(0.01, 1, (4, 16))
    p = p / p.sum(-1, keepdims=True)
    for fmt in ["bit", "nat", "dit"]:
        U.check_parity(diffsptk_tpu.Entropy(fmt), reference.Entropy(fmt), p)


def test_histogram():
    x = RNG.uniform(-1, 1, 100)
    kw = dict(n_bin=8, lower_bound=-1, upper_bound=1, norm=True,
              softness=5e-3)
    U.check_parity(diffsptk_tpu.Histogram(**kw), reference.Histogram(**kw),
                   x)


def test_snr_rmse():
    s = RNG.standard_normal((2, 64))
    n = s + 0.1 * RNG.standard_normal((2, 64))
    for red in ["none", "mean", "sum"]:
        ours = diffsptk_tpu.SignalToNoiseRatio(16, full=True, reduction=red)
        ref = reference.SignalToNoiseRatio(16, full=True, reduction=red)
        U.check_parity(lambda a, b: ours(a, b), lambda a, b: ref(a, b), s, n)
        ours2 = diffsptk_tpu.RootMeanSquareError(reduction=red)
        ref2 = reference.RootMeanSquareError(reduction=red)
        U.check_parity(lambda a, b: ours2(a, b), lambda a, b: ref2(a, b),
                       s, n)


def test_flux():
    x = RNG.standard_normal((5, 8))
    y = RNG.standard_normal((5, 8))
    for lag in [1, -1, 0]:
        ours = diffsptk_tpu.Flux(lag=lag, reduction="mean")
        ref = reference.Flux(lag=lag, reduction="mean")
        U.check_parity(lambda a, b: ours(a, b), lambda a, b: ref(a, b), x, y)


def test_zcross():
    x = RNG.standard_normal(64)
    for norm in [False, True]:
        U.check_parity(diffsptk_tpu.ZeroCrossingAnalysis(16, norm=norm),
                       reference.ZeroCrossingAnalysis(16, norm=norm), x)


def test_grpdelay_phase():
    b = RNG.standard_normal(8)
    a = np.concatenate([[1.0], 0.3 * RNG.standard_normal(4)])
    ours = diffsptk_tpu.GroupDelay(64, alpha=0.4, gamma=0.9)
    ref = reference.GroupDelay(64, alpha=0.4, gamma=0.9)
    U.check_parity(lambda bb, aa: ours(bb, aa),
                   lambda bb, aa: ref(bb, aa), b, a)
    for unwrap in [False, True]:
        oursp = diffsptk_tpu.Phase(64, unwrap=unwrap)
        refp = reference.Phase(64, unwrap=unwrap)
        U.check_parity(lambda bb, aa: oursp(bb, aa),
                       lambda bb, aa: refp(bb, aa), b, a)


def test_yingram():
    x = RNG.standard_normal(400)
    ours = diffsptk_tpu.Yingram(400, 16000)
    ref = reference.Yingram(400, 16000)
    U.check_parity(ours, ref, x)


def test_medfilt():
    x = RNG.standard_normal((12, 3))
    for L, af in [(5, False), (4, False), (5, True)]:
        U.check_parity(diffsptk_tpu.MedianFilter(L, across_features=af),
                       reference.MedianFilter(L, across_features=af), x)


def test_medfilt_magic():
    x = RNG.standard_normal((12, 2))
    x[3:6, 0] = -99
    U.check_parity(diffsptk_tpu.MedianFilter(5, magic_number=-99),
                   reference.MedianFilter(5, magic_number=-99), x)


def test_magic_intpl():
    x = RNG.standard_normal((12, 2))
    x[0, 0] = 0
    x[3:6, 0] = 0
    x[-1, 1] = 0
    U.check_parity(diffsptk_tpu.MagicNumberInterpolation(0),
                   reference.MagicNumberInterpolation(0), x)


def test_delta_mlpg():
    x = RNG.standard_normal((10, 3))
    seed = [[-0.5, 0.0, 0.5], [1.0, -2.0, 1.0]]
    U.check_parity(diffsptk_tpu.Delta(seed), reference.Delta(seed), x)
    U.check_parity(diffsptk_tpu.Delta([2, 3]), reference.Delta([2, 3]), x)
    mean = RNG.standard_normal((10, 9))
    U.check_parity(diffsptk_tpu.MLPG(10, seed),
                   reference.MaximumLikelihoodParameterGeneration(10, seed),
                   mean)


@pytest.mark.parametrize("p", [0, 1, 2, 3, 4, 5, 6])
def test_dtw(p):
    x = RNG.standard_normal((6, 2))
    y = RNG.standard_normal((8, 2))
    ours = diffsptk_tpu.DTW(p=p, softness=1e-3)
    ref = reference.DTW(p=p, softness=1e-3)
    d_ours = np.asarray(ours(U.to_jax(x), U.to_jax(y)))
    with torch.no_grad():
        d_ref = ref(U.to_torch(x), U.to_torch(y)).numpy()
    np.testing.assert_allclose(d_ours, d_ref, rtol=1e-6, atol=1e-8)


def test_dtw_indices():
    x = np.array([1.0, 3.0, 6.0, 9.0])
    y = np.array([2.0, 3.0, 8.0, 8.0])
    dtw = diffsptk_tpu.DTW(p=1)
    d, idx = dtw(U.to_jax(x), U.to_jax(y), return_indices=True)
    ref = reference.DTW(p=1)
    with torch.no_grad():
        d_ref, idx_ref = ref(U.to_torch(x), U.to_torch(y),
                             return_indices=True)
    np.testing.assert_allclose(np.asarray(d), d_ref.numpy(), rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_array_equal(np.asarray(idx[0]), idx_ref[0].numpy())
    z = dtw.merge(U.to_jax(x), U.to_jax(y), idx[0])
    z_ref = ref.merge(U.to_torch(x), U.to_torch(y), idx_ref[0])
    U.assert_close(np.asarray(z), z_ref)


def test_csm_roundtrip():
    # valid autocorrelation from a random signal
    import diffsptk_tpu.functional as F
    x = RNG.standard_normal(64)
    r = np.asarray(F.acorr(U.to_jax(x), 7))
    ours = diffsptk_tpu.AutocorrelationToCompositeSinusoidalModelCoefficients(7)
    ref = reference.AutocorrelationToCompositeSinusoidalModelCoefficients(7)
    U.check_parity(ours, ref, r, rtol=1e-4, atol=1e-6)
    c = np.asarray(ours(U.to_jax(r)))
    ours_i = diffsptk_tpu.CompositeSinusoidalModelCoefficientsToAutocorrelation(7)
    ref_i = reference.CompositeSinusoidalModelCoefficientsToAutocorrelation(7)
    U.check_parity(ours_i, ref_i, c)
    U.assert_close(np.asarray(ours_i(U.to_jax(c))), r, rtol=1e-5, atol=1e-7)


def test_drc():
    # golden value from the reference docstring (drc.py:100-113)
    import diffsptk_tpu
    x = diffsptk_tpu.sin(8000)
    drc = diffsptk_tpu.DRC(sample_rate=8000, threshold=-20, ratio=2,
                           makeup_gain=10)
    y = np.asarray(drc(x))
    var = np.var(y)
    assert abs(var - 0.5651) < 0.02, var


def test_f0eval_mixed_voicing():
    x = np.array([100.0, 0.0, 120.0, 130.0, 0.0, 140.0])
    y = np.array([101.0, 0.0, 0.0, 128.0, 110.0, 142.0])
    for fmt in ["f0-rmse-hz", "f0-rmse-cent", "f0-rmse-semitone",
                "vuv-error-rate", "vuv-error-percent",
                "vuv-macro-f1-score"]:
        ours = diffsptk_tpu.F0Evaluation(out_format=fmt)
        ref = reference.F0Evaluation(out_format=fmt)
        U.check_parity(lambda a, b: ours(a, b), lambda a, b: ref(a, b), x, y)


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from diffsptk_tpu.utils import checkpoint

    op = diffsptk_tpu.Window(16, learnable=True)
    p = op.trainable_params
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, p)
    p2 = checkpoint.load(path, jax.tree.map(jnp.zeros_like, p))
    for k in p:
        np.testing.assert_allclose(np.asarray(p[k]), np.asarray(p2[k]))


def test_checkpoint_npz_roundtrip(tmp_path):
    """The dependency-free npz backend must round-trip pytrees exactly
    (the orbax path is covered by test_checkpoint_roundtrip)."""
    import jax

    from diffsptk_tpu.utils import checkpoint

    op = diffsptk_tpu.Window(16, learnable=True)
    p = op.trainable_params
    path = str(tmp_path / "ckpt_npz")
    checkpoint.save(path, p, backend="npz")
    assert (tmp_path / "ckpt_npz.npz").is_file()
    p2 = checkpoint.load(path, jax.tree.map(jnp.zeros_like, p),
                         backend="npz")
    for k in p:
        np.testing.assert_allclose(np.asarray(p[k]), np.asarray(p2[k]))


@pytest.mark.parametrize("out_format", [
    "f0-rmse-hz", "f0-rmse-cent", "f0-rmse-semitone",
    "vuv-error-rate", "vuv-error-percent", "vuv-macro-f1-score"])
@pytest.mark.parametrize("reduction", ["none", "mean", "sum"])
def test_f0eval(out_format, reduction):
    """Parity with the reference on its own fixture values
    (reference: tests/test_f0eval.py)."""
    x = np.array([0, 0, 200, 210, 0, 200, 0], dtype=np.float64)
    y = np.array([0, 0, 190, 180, 180, 0, 0], dtype=np.float64)
    ours = diffsptk_tpu.F0Evaluation(reduction=reduction,
                                     out_format=out_format)
    ref = reference.F0Evaluation(reduction=reduction,
                                 out_format=out_format)
    U.check_parity(lambda a, b: ours(a, b), lambda a, b: ref(a, b), x, y)
    # functional wrapper agrees with the class path
    f = diffsptk_tpu.functional.f0eval(U.to_jax(x), U.to_jax(y),
                                       reduction=reduction,
                                       out_format=out_format)
    U.assert_close(np.asarray(f), np.asarray(ours(U.to_jax(x),
                                                  U.to_jax(y))))


def test_f0eval_f1_score():
    """Reference's own macro-F1 fixture (tests/test_f0eval.py:74-80)."""
    f0eval = diffsptk_tpu.F0Evaluation(out_format="vuv-macro-f1-score")
    x = jnp.asarray([0.0, 1, 1, 0, 0, 1, 0, 1, 0])
    y = jnp.asarray([0.0, 1, 0, 0, 1, 0, 0, 1, 1])
    assert abs(float(f0eval(x, y)) - 0.55) < 1e-6


def test_dtw_merge_functional():
    """functional.dtw_merge joins aligned pairs like the reference
    (reference: functional.py:575-595)."""
    x = RNG.standard_normal((6, 2))
    y = RNG.standard_normal((8, 2))
    dtw = diffsptk_tpu.DTW(p=1)
    _, idx = dtw(U.to_jax(x), U.to_jax(y), return_indices=True)
    z = diffsptk_tpu.functional.dtw_merge(U.to_jax(x), U.to_jax(y), idx[0])
    import diffsptk as ref_pkg
    ref_dtw = reference.DTW(p=1)
    with torch.no_grad():
        _, idx_ref = ref_dtw(U.to_torch(x), U.to_torch(y),
                             return_indices=True)
        z_ref = ref_pkg.functional.dtw_merge(U.to_torch(x), U.to_torch(y),
                                             idx_ref[0])
    assert np.asarray(z).shape == (idx[0].shape[0], 4)
    U.assert_close(np.asarray(z), z_ref)
    # 1D inputs produce (T, 2) pairs
    x1 = np.array([1.0, 3.0, 6.0, 9.0])
    y1 = np.array([2.0, 3.0, 8.0, 8.0])
    _, idx1 = diffsptk_tpu.DTW(p=1)(U.to_jax(x1), U.to_jax(y1),
                                    return_indices=True)
    z1 = diffsptk_tpu.functional.dtw_merge(U.to_jax(x1), U.to_jax(y1),
                                           idx1[0])
    assert np.asarray(z1).shape == (idx1[0].shape[0], 2)


def test_learnable_dfs():
    import jax

    op = diffsptk_tpu.IIR(b=[1.0, -0.97], a=[1.0, 0.5], learnable=True)
    assert set(op.learnable) == {"a", "b"}
    x = jnp.asarray(np.random.default_rng(0).standard_normal(64))

    def loss(p):
        return jnp.sum(op.apply({**op.params, **p}, x) ** 2)

    g = jax.grad(loss)(op.trainable_params)
    assert all(float(jnp.abs(v).max()) > 0 for v in g.values())
