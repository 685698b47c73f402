import numpy as np
import pytest

import diffsptk_tpu
import diffsptk_tpu.functional as F
from tests import utils as U
from tests.oracle import reference


@pytest.mark.parametrize("center", [True, False])
@pytest.mark.parametrize("zmean", [False, True])
@pytest.mark.parametrize("mode", ["constant", "reflect", "replicate",
                                  "circular"])
def test_parity(center, zmean, mode):
    x = np.random.default_rng(0).standard_normal(40)
    ref = reference.Frame(5, 2, center=center, zmean=zmean, mode=mode)
    ours = diffsptk_tpu.Frame(5, 2, center=center, zmean=zmean, mode=mode)
    U.check_parity(ours, ref, x)


@pytest.mark.parametrize("module", [True, False])
def test_functional_matches_module(module):
    x = np.random.default_rng(1).standard_normal(64)
    if module:
        y = diffsptk_tpu.Frame(10, 3)(U.to_jax(x))
    else:
        y = F.frame(U.to_jax(x), 10, 3)
    ref = reference.Frame(10, 3)(U.to_torch(x))
    U.assert_close(y, ref)


def test_various_shape():
    x = np.random.default_rng(2).standard_normal(32)
    U.check_various_shape(diffsptk_tpu.Frame(8, 4), x)


def test_differentiable():
    U.check_differentiability(diffsptk_tpu.Frame(8, 4), (32,))


def test_invalid():
    with pytest.raises(ValueError):
        diffsptk_tpu.Frame(0, 1)
    with pytest.raises(ValueError):
        diffsptk_tpu.Frame(5, 0)


# ---------------------------------------------------------------- unframe
@pytest.mark.parametrize("fl,fp", [(1, 1), (3, 2), (5, 2), (5, 5), (4, 3)])
@pytest.mark.parametrize("center", [False, True])
def test_unframe_roundtrip(fl, fp, center, T=20):
    """frame -> unframe recovers the ramp exactly
    (reference: tests/test_unframe.py:28-56)."""
    x = diffsptk_tpu.ramp(T)
    y = diffsptk_tpu.Frame(fl, fp, center=center)(x)
    n = int(np.max(np.asarray(y)))
    want = diffsptk_tpu.ramp(n)
    got = diffsptk_tpu.Unframe(fl, fp, center=center)(
        y, out_length=want.shape[-1])
    U.assert_close(got, np.asarray(want))


def test_unframe_parity():
    """Against the reference Unframe on a window-framed signal
    (reference: tests/test_unframe.py)."""
    x = np.random.default_rng(3).standard_normal(40)
    y = np.asarray(diffsptk_tpu.Frame(5, 2)(U.to_jax(x)))
    ref = reference.Unframe(5, 2)
    ours = diffsptk_tpu.Unframe(5, 2)
    U.check_parity(lambda v: ours(v, out_length=40),
                   lambda v: ref(v, out_length=40), y)


def test_unframe_functional_and_grad():
    x = np.random.default_rng(4).standard_normal((2, 3, 20))
    y = F.frame(U.to_jax(x), 5, 3)
    z = F.unframe(y, out_length=20, frame_period=3)
    U.assert_close(z, x)
    U.check_differentiability(
        lambda v: diffsptk_tpu.Unframe(5, 3)(v, out_length=20), (7, 5))
