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
