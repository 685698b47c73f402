"""Mel-cepstral analysis-synthesis of a speech file (BASELINE config #3).

    python examples/analysis_synthesis.py [in.wav] [out.wav]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import sys

import jax
import numpy as np

import diffsptk_tpu as dsp
from diffsptk_tpu.models import MelCepstralVocoder


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/assets/data.wav"
    x, sr = dsp.read(path)
    voc = MelCepstralVocoder(frame_length=400, frame_period=80,
                             fft_length=512, cep_order=24,
                             alpha=dsp.get_alpha(sr), n_iter=10)
    y = jax.jit(voc.analysis_synthesis)(x)
    n = min(x.shape[-1], y.shape[-1])
    err = np.asarray(x[:n] - y[:n], np.float64)
    snr = 10 * np.log10(np.sum(np.asarray(x[:n], np.float64) ** 2)
                        / np.sum(err ** 2))
    print(f"round-trip SNR: {snr:.1f} dB")
    if len(sys.argv) > 2:
        dsp.write(sys.argv[2], np.asarray(y), sr)


if __name__ == "__main__":
    main()
