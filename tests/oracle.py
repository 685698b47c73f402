"""Import the PyTorch reference (read-only at /root/reference) as a numeric
oracle for tests.

Several of the reference's external kernels are not installed in this image
(torchaudio, torchlpc, soundfile, ...).  Only torchaudio and soundfile are
imported at module scope by the reference, so we install minimal stand-ins in
``sys.modules`` before importing it.  The stand-ins implement the *documented
interfaces* our oracle tests actually exercise (lfilter, sample_wise_lpc)
with straightforward pure-torch/scipy code written here — nothing is copied
from those packages.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch

# Match the reference CI's dtype sweep (its conftest sets the torch
# default dtype): float64 oracle constants under the default
# `--dtype double`, float32 under `--dtype float`.
try:
    from tests.utils import DEFAULT_DTYPE as _TEST_DTYPE
except Exception:                                    # direct script use
    _TEST_DTYPE = "double"
torch.set_default_dtype(
    torch.float32 if _TEST_DTYPE == "float" else torch.float64)


# ---------------------------------------------------------------- torchaudio
def _lfilter(waveform: torch.Tensor, a_coeffs: torch.Tensor,
             b_coeffs: torch.Tensor, clamp: bool = True,
             batching: bool = True) -> torch.Tensor:
    """Direct-form-II IIR filter matching torchaudio.functional.lfilter
    semantics (coefficients normalized by a[0]); scipy does the recursion."""
    from scipy.signal import lfilter as sp_lfilter

    x = waveform.detach().cpu().numpy()
    a = a_coeffs.detach().cpu().numpy()
    b = b_coeffs.detach().cpu().numpy()
    if a.ndim == 1:
        y = sp_lfilter(b, a, x, axis=-1)
    else:
        xb = x.reshape(-1, x.shape[-1])
        ab = np.broadcast_to(a, (xb.shape[0], a.shape[-1])) if a.ndim == 2 else a
        bb = np.broadcast_to(b, (xb.shape[0], b.shape[-1])) if b.ndim == 2 else b
        y = np.stack([sp_lfilter(bb[i], ab[i], xb[i]) for i in range(xb.shape[0])])
        y = y.reshape(x.shape)
    y = torch.from_numpy(np.ascontiguousarray(y)).to(waveform.dtype)
    if clamp:
        y = y.clamp(-1.0, 1.0)
    return y


def _install_torchaudio_stub() -> None:
    if "torchaudio" in sys.modules:
        return
    ta = types.ModuleType("torchaudio")
    func = types.ModuleType("torchaudio.functional")
    func.lfilter = _lfilter
    trans = types.ModuleType("torchaudio.transforms")

    class Resample(torch.nn.Module):
        def __init__(self, orig_freq, new_freq, **kwargs):
            super().__init__()
            self.orig_freq, self.new_freq = orig_freq, new_freq

        def forward(self, x):
            from scipy.signal import resample_poly
            import math
            g = math.gcd(int(self.orig_freq), int(self.new_freq))
            up, down = int(self.new_freq) // g, int(self.orig_freq) // g
            y = resample_poly(x.detach().cpu().numpy(), up, down, axis=-1)
            return torch.from_numpy(np.ascontiguousarray(y)).to(x.dtype)

    trans.Resample = Resample
    ta.functional = func
    ta.transforms = trans
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = func
    sys.modules["torchaudio.transforms"] = trans


# ----------------------------------------------------------------- torchlpc
def _sample_wise_lpc(x: torch.Tensor, a: torch.Tensor,
                     zi: torch.Tensor | None = None) -> torch.Tensor:
    """Time-varying all-pole recurrence: y[t] = x[t] - sum_k a[t,k] y[t-k].

    x: (B, T), a: (B, T, M).  Reference loop implementation (slow; oracle
    use only).  Supports complex dtypes.
    """
    B, T = x.shape
    M = a.shape[-1]
    y = torch.zeros_like(x)
    hist = torch.zeros(B, M, dtype=x.dtype)
    if zi is not None:
        hist = zi.clone()
    for t in range(T):
        acc = x[:, t] - (a[:, t, :] * hist).sum(-1)
        y[:, t] = acc
        if M > 0:
            hist = torch.cat([acc.unsqueeze(-1), hist[:, :-1]], dim=-1)
    return y


def _install_torchlpc_stub() -> None:
    if "torchlpc" in sys.modules:
        return
    tl = types.ModuleType("torchlpc")
    tl.sample_wise_lpc = _sample_wise_lpc
    sys.modules["torchlpc"] = tl


# ---------------------------------------------------------------- soundfile
def _install_soundfile_stub() -> None:
    if "soundfile" in sys.modules:
        return
    sf = types.ModuleType("soundfile")

    def read(filename, always_2d=False, **kwargs):
        from scipy.io import wavfile
        sr, data = wavfile.read(filename)
        if data.dtype == np.int16:
            data = data.astype(np.float64) / 32768.0
        if always_2d and data.ndim == 1:
            data = data[:, None]
        return data, sr

    def write(filename, data, samplerate, **kwargs):
        from scipy.io import wavfile
        data = np.asarray(data)
        wavfile.write(filename, samplerate,
                      np.clip(np.round(data * 32768.0), -32768, 32767)
                      .astype(np.int16))

    sf.read = read
    sf.write = write
    sys.modules["soundfile"] = sf


def load_reference():
    """Import and return the reference diffsptk package."""
    _install_torchaudio_stub()
    _install_torchlpc_stub()
    _install_soundfile_stub()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import diffsptk  # noqa: PLC0415
    return diffsptk


reference = load_reference()
