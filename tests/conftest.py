# Test environment: CPU backend with 8 virtual devices for sharding tests,
# x64 enabled to hit the reference's float64 parity tolerances
# (reference tolerances: /root/reference/tests/utils.py:66-72).
import os

# The site hook forces JAX_PLATFORMS=axon; override via jax.config (which
# wins over the env var) and request 8 virtual CPU devices before the
# backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


def pytest_addoption(parser):
    # Mirror of the reference's --dtype sweep
    # (/root/reference/tests/conftest.py:21-50): "float" re-runs every
    # check_parity-based test with float32 inputs at the reference's
    # float tolerances (rtol 1e-4 / atol 1e-6,
    # /root/reference/tests/utils.py:66-72) — the dtype the TPU product
    # actually computes in.
    parser.addoption("--dtype", default="double",
                     choices=("double", "float"),
                     help="parity-test input dtype")


def pytest_configure(config):
    from tests import utils
    utils.set_default_dtype(config.getoption("--dtype"))
    if config.getoption("--dtype") == "float":
        # the torch reference builds its buffers in the default dtype
        # (same switch the reference's own conftest performs)
        import torch
        torch.set_default_dtype(torch.float32)


@pytest.fixture(scope="session")
def data_wav():
    """The reference 16 kHz speech fixture (mono, 19200 samples)."""
    import diffsptk_tpu
    x, sr = diffsptk_tpu.read("/root/reference/assets/data.wav")
    assert sr == 16000
    return x
