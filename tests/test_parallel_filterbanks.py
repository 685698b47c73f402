"""Sharded filterbank battery (parallel/filterbanks.py) vs the
single-device ops: N-shard output must equal the unsharded graph
(BASELINE config #5; reference ops: diffsptk/modules/pqmf.py:255,
mdct.py:166-175, cqt.py:202-298, icqt.py:100-271 — the reference is
single-device, the sharding layer is this repo's design)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import diffsptk_tpu as dsp
from diffsptk_tpu.parallel.filterbanks import (
    ShardedCQT,
    ShardedICQT,
    ShardedIMDCT,
    ShardedIPQMF,
    ShardedMDCT,
    ShardedPQMF,
)

RNG = np.random.default_rng(11)


def _mesh(dp, tp):
    dev = np.asarray(jax.devices()[:dp * tp]).reshape(dp, tp)
    return Mesh(dev, ("dp", "tp"))


MESHES = [(1, 8), (2, 4), (4, 2)]


@pytest.mark.parametrize("dp,tp", MESHES)
def test_sharded_pqmf_roundtrip_exact(dp, tp):
    K, M, T, B = 4, 47, 4096, 4
    x = jnp.asarray(RNG.standard_normal((B, T)).astype(np.float64))
    mesh = _mesh(dp, tp)
    ref_a = dsp.PQMF(K, M)(x)
    ref_s = dsp.IPQMF(K, M)(ref_a)
    got_a = ShardedPQMF(mesh, K, M)(x)
    got_s = ShardedIPQMF(mesh, K, M)(jnp.asarray(np.asarray(got_a)))
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(ref_a),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("dp,tp", MESHES)
def test_sharded_mdct_imdct_exact(dp, tp):
    L, T, B = 256, 4096, 4
    x = jnp.asarray(RNG.standard_normal((B, T)).astype(np.float64))
    mesh = _mesh(dp, tp)
    ref_c = dsp.MDCT(L)(x)
    ref_x = dsp.IMDCT(L)(ref_c)
    got_c = ShardedMDCT(mesh, L)(x)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                               rtol=1e-12, atol=1e-12)
    got_x = ShardedIMDCT(mesh, L)(jnp.asarray(np.asarray(got_c)))
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref_x),
                               rtol=1e-12, atol=1e-12)
    # round trip is perfect reconstruction
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(x),
                               rtol=1e-10, atol=1e-10)


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2)])
def test_sharded_cqt_exact(dp, tp):
    # shorter wavelets (higher f_min) keep the receptive-field halo
    # below the per-shard block at test scale
    fp, sr, K = 64, 16000, 24
    mesh = _mesh(dp, tp)
    cq = ShardedCQT(mesh, fp, sr, f_min=200.0, n_bin=K)
    align = np.lcm(fp, cq.dec_total) * tp
    T = int(-(-(2 * cq.halo * tp + 8 * fp * tp) // align) * align)
    x = jnp.asarray(RNG.standard_normal((2, T)).astype(np.float64))
    ref = dsp.CQT(fp, sr, f_min=200.0, n_bin=K)(x)
    got = cq(x)
    n = got.shape[-2]
    assert n == T // fp
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ref)[..., :n, :],
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2)])
def test_sharded_icqt_exact(dp, tp):
    fp, sr, K = 64, 16000, 24
    mesh = _mesh(dp, tp)
    icq = ShardedICQT(mesh, fp, sr, f_min=200.0, n_bin=K)
    N = max(2 * icq.Hf + 8, 64)
    N = -(-N // tp) * tp
    c = jnp.asarray(
        (RNG.standard_normal((2, N, K))
         + 1j * RNG.standard_normal((2, N, K))).astype(np.complex128))
    ref = dsp.ICQT(fp, sr, f_min=200.0, n_bin=K)(c, out_length=N * fp)
    got = icq(c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("dp,tp", [(2, 4)])
def test_sharded_battery_float32(dp, tp):
    """The config-#5 battery composed at f32 (the TPU dtype): sharded
    equals unsharded to f32 tolerance."""
    mesh = _mesh(dp, tp)
    L, K, M, T, B = 256, 4, 47, 4096, 4
    x = jnp.asarray(RNG.standard_normal((B, T)).astype(np.float32))
    got = ShardedIMDCT(mesh, L)(ShardedMDCT(mesh, L)(x))
    ref = dsp.IMDCT(L)(dsp.MDCT(L)(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    ga = ShardedPQMF(mesh, K, M)(x)
    gs = ShardedIPQMF(mesh, K, M)(jnp.asarray(np.asarray(ga)))
    ra = dsp.PQMF(K, M)(x)
    rs = dsp.IPQMF(K, M)(ra)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs),
                               rtol=1e-5, atol=1e-5)
