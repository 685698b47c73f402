import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffsptk_tpu
from diffsptk_tpu.parallel import ShardedSTFT, make_mesh, sharded_frame
from tests import utils as U


def _mesh_1d(n, name="tp"):
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:n]), (name,))


@pytest.mark.parametrize("center", [True, False])
@pytest.mark.parametrize("ntp", [2, 4])
def test_sharded_frame_matches_single(center, ntp):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(1600))
    mesh = _mesh_1d(ntp)
    y_ref = diffsptk_tpu.Frame(50, 10, center=center)(x)
    y = sharded_frame(x, 50, 10, mesh, batch_axis_name=None, center=center)
    U.assert_close(np.asarray(y), np.asarray(y_ref), rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("ntp", [2, 4])
def test_sharded_stft_matches_single(ntp):
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 1600)))
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:2 * ntp]).reshape(2, ntp),
                ("dp", "tp"))
    single = diffsptk_tpu.STFT(400, 80, 512)
    sharded = ShardedSTFT(mesh, 400, 80, 512)
    y_ref = single(x)
    y = sharded(x)
    U.assert_close(np.asarray(y), np.asarray(y_ref), rtol=1e-10, atol=1e-12)


def test_sharded_stft_jit_grad():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 800)))
    from jax.sharding import Mesh
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("dp", "tp"))
    sharded = ShardedSTFT(mesh, 100, 50, 128, eps=1e-8)

    def loss(x):
        return jnp.mean(sharded(x))

    g = jax.jit(jax.grad(loss))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_make_mesh():
    m = make_mesh(4, axis_names=("tp",))
    assert m.shape["tp"] == 4
    m2 = make_mesh((2, 4))
    assert m2.shape == {"dp": 2, "tp": 4}


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_vocoder_matches_single(mesh_shape, data_wav):
    """Sequence-parallel mel-cepstral vocoder is exact (halo exchange, no
    warmup approximation): N-shard output == single-device output."""
    from jax.sharding import Mesh

    from diffsptk_tpu.models.mcep_vocoder import MelCepstralVocoder
    from diffsptk_tpu.parallel.vocoder import ShardedMelCepstralVocoder

    x = jnp.asarray(np.asarray(data_wav)[:9600])
    xb = jnp.tile(x[None, :], (2, 1))
    dp, tp = mesh_shape
    mesh = Mesh(np.array(jax.devices()[:dp * tp]).reshape(dp, tp),
                ("dp", "tp"))
    kw = dict(frame_length=400, frame_period=80, fft_length=512,
              cep_order=24, alpha=0.42, n_iter=3)
    single = MelCepstralVocoder(**kw)
    sharded = ShardedMelCepstralVocoder(mesh, **kw)
    y_ref = single.analysis_synthesis(xb)
    y = jax.jit(sharded.analysis_synthesis)(xb)
    U.assert_close(np.asarray(y), np.asarray(y_ref), rtol=1e-8, atol=1e-10)


def test_sharded_vocoder_grad_flows():
    """Gradients flow through the sharded synthesis (train-step path)."""
    from jax.sharding import Mesh

    from diffsptk_tpu.parallel.vocoder import ShardedMelCepstralVocoder

    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("dp", "tp"))
    voc = ShardedMelCepstralVocoder(
        mesh, frame_length=32, frame_period=8, fft_length=32, cep_order=4,
        cep_order_mlsa=16, taylor_order=4, n_iter=2)
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.standard_normal((2, 512)))
    mc = jnp.asarray(0.01 * rng.standard_normal((2, 64, 5)))
    target = jnp.asarray(rng.standard_normal((2, 512)))

    def loss(mc):
        y = voc.synthesize(e, mc)
        return jnp.mean((y - target) ** 2)

    g = jax.jit(jax.grad(loss))(mc)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0


def test_data_parallel_gmm_matches_single():
    """dp-sharded GMM EM == single-device EM (GSPMD psum reductions)."""
    from jax.sharding import Mesh

    from diffsptk_tpu.parallel.learners import DataParallelGMM

    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(-2, 0.5, (64, 3)),
                        rng.normal(+2, 0.8, (64, 3))])
    single = diffsptk_tpu.GMM(2, 2, n_iter=10, seed=1)
    (w1, mu1, s1), ll1 = single(jnp.asarray(x))

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("dp",))
    dp = DataParallelGMM(mesh, 2, 2, n_iter=10, seed=1)
    (w2, mu2, s2), ll2 = dp(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-7)
    assert abs(float(ll1) - float(ll2)) < 1e-6

    with pytest.raises(ValueError, match="divisible"):
        dp(jnp.asarray(x[:127]))


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_world_matches_single(mesh_shape, data_wav):
    """Sharded WORLD chain (halo'd YIN/TANDEM/CheapTrick analysis, global
    phase prefix + OLA spill exchange in synthesis) matches the
    single-device chain; noise is position-keyed so the streams agree."""
    from jax.sharding import Mesh

    from diffsptk_tpu.models.world_vocoder import WorldVocoder
    from diffsptk_tpu.parallel.world import ShardedWorldVocoder

    x = jnp.asarray(np.asarray(data_wav))
    xb = jnp.tile(x[None, :], (2, 1))
    dp, tp = mesh_shape
    mesh = Mesh(np.array(jax.devices()[:dp * tp]).reshape(dp, tp),
                ("dp", "tp"))
    single = WorldVocoder(80, 16000, 1024)
    sharded = ShardedWorldVocoder(mesh, 80, 16000, 1024)

    # even_frames: the sharded layout carries T//P frames per device
    # uniformly; the single-device chain's extra edge frame (reference
    # hop-framing) is dropped for the comparison
    f0_ref, ap_ref, sp_ref = single.analyze(xb, even_frames=True)
    f0, ap, sp = jax.jit(sharded.analyze)(xb)
    U.assert_close(np.asarray(f0), np.asarray(f0_ref), rtol=1e-6, atol=1e-8)
    U.assert_close(np.asarray(ap), np.asarray(ap_ref), rtol=1e-4, atol=1e-6)
    U.assert_close(np.asarray(sp), np.asarray(sp_ref), rtol=1e-4, atol=1e-6)

    y_ref = single.synthesize(f0_ref, ap_ref, sp_ref)
    y = jax.jit(sharded.synthesize)(f0, ap, sp)
    U.assert_close(np.asarray(y), np.asarray(y_ref), rtol=1e-4,
                   atol=1e-6 * float(np.abs(np.asarray(y_ref)).max()))

    y2 = jax.jit(sharded.analysis_synthesis)(xb)
    assert y2.shape == xb.shape


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_poledf_matches_single(mesh_shape):
    """Sequence-parallel all-pole recurrence is exact: the cross-shard
    M-state handoff (all-gathered affine block summaries) reproduces the
    single-device blocked filter."""
    from jax.sharding import Mesh

    from diffsptk_tpu.ops.poledf import AllPoleDigitalFilter
    from diffsptk_tpu.parallel.filters import ShardedAllPoleDigitalFilter

    M, Pd, T, B = 6, 80, 6400, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T)))
    # stable-ish coefficients: small, smooth
    a = jnp.asarray(np.concatenate(
        [np.ones((B, T // Pd, 1)),
         0.2 * rng.standard_normal((B, T // Pd, M)) / np.arange(1, M + 1)],
        axis=-1))
    dp, tp = mesh_shape
    mesh = Mesh(np.array(jax.devices()[:dp * tp]).reshape(dp, tp),
                ("dp", "tp"))
    single = AllPoleDigitalFilter(M, Pd)
    sharded = ShardedAllPoleDigitalFilter(mesh, M, Pd)
    y_ref = single(x, a)
    y = jax.jit(sharded)(x, a)
    U.assert_close(np.asarray(y), np.asarray(y_ref), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_mlsa_bulk_halo_matches_per_stage(mesh_shape):
    """The bulk-halo MLSA (one exchange for all S stages +
    shrink-validity recompute) equals the per-stage-halo path and the
    single-device op (parallel/vocoder.py:_local_mlsa_bulk)."""
    from jax.sharding import Mesh

    from diffsptk_tpu.models.mcep_vocoder import MelCepstralVocoder
    from diffsptk_tpu.parallel.vocoder import ShardedMelCepstralVocoder

    rng = np.random.default_rng(9)
    dp, tp = mesh_shape
    # block must exceed the bulk halo: S * ceil((P+M)/P) = 12 frames left
    T = 80 * tp * 16                        # 16 frames per time shard
    e = jnp.asarray(rng.standard_normal((2, T)))
    mesh = Mesh(np.array(jax.devices()[:dp * tp]).reshape(dp, tp),
                ("dp", "tp"))
    sharded = ShardedMelCepstralVocoder(mesh, taylor_order=4,
                                        cep_order_mlsa=99)
    single = MelCepstralVocoder(taylor_order=4, cep_order_mlsa=99)
    mc = np.asarray(single.analyze(e))      # any realistic mel-cepstra
    mc = jnp.asarray(mc)

    y_stage = jax.jit(lambda a, b: sharded.synthesize(a, b))(e, mc)
    y_bulk = jax.jit(
        lambda a, b: sharded.synthesize(a, b, halo="bulk"))(e, mc)
    U.assert_close(np.asarray(y_bulk), np.asarray(y_stage), rtol=1e-10,
                   atol=1e-12 * float(np.abs(np.asarray(y_stage)).max()))

    y_single = single.synthesize(e, mc)
    U.assert_close(np.asarray(y_bulk), np.asarray(y_single), rtol=1e-8,
                   atol=1e-10 * float(np.abs(np.asarray(y_single)).max()))
