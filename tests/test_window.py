import numpy as np
import pytest

import diffsptk_tpu
from tests import utils as U
from tests.oracle import reference

WINDOWS = ["blackman", "hamming", "hanning", "bartlett", "trapezoidal",
           "rectangular", "nuttall", "povey", "sine", "vorbis", "kbd"]


@pytest.mark.parametrize("window", WINDOWS)
@pytest.mark.parametrize("norm", ["none", "power", "magnitude"])
def test_parity(window, norm):
    x = np.random.default_rng(0).standard_normal(16)
    ref = reference.Window(16, window=window, norm=norm)
    ours = diffsptk_tpu.Window(16, window=window, norm=norm)
    U.check_parity(ours, ref, x)


@pytest.mark.parametrize("window", ["blackman", "sine", "vorbis"])
def test_periodic(window):
    x = np.random.default_rng(0).standard_normal(16)
    ref = reference.Window(16, window=window, symmetric=False)
    ours = diffsptk_tpu.Window(16, window=window, symmetric=False)
    U.check_parity(ours, ref, x)


def test_out_length():
    x = np.random.default_rng(1).standard_normal(5)
    ref = reference.Window(5, out_length=8, window="hamming", norm="none")
    ours = diffsptk_tpu.Window(5, out_length=8, window="hamming", norm="none")
    U.check_parity(ours, ref, x)


def test_learnable():
    op = diffsptk_tpu.Window(16, learnable=True)
    U.check_learnable(op, (16,))


def test_various_shape():
    x = np.random.default_rng(2).standard_normal(16)
    U.check_various_shape(diffsptk_tpu.Window(16), x)
