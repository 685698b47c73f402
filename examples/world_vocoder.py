"""WORLD analysis-synthesis (BASELINE config #4).

    python examples/world_vocoder.py [in.wav] [out.wav]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import sys

import jax
import numpy as np

import diffsptk_tpu as dsp
from diffsptk_tpu.models import WorldVocoder


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/assets/data.wav"
    x, sr = dsp.read(path)
    voc = WorldVocoder(80, sr, 1024, f_min=80, f_max=400)
    y = jax.jit(voc.analysis_synthesis)(x)
    spec = dsp.STFT(400, 80, 512, out_format="db")
    Sx, Sy = np.asarray(spec(x)), np.asarray(spec(y))
    n = min(Sx.shape[0], Sy.shape[0])
    corr = np.corrcoef(Sx[:n].ravel(), Sy[:n].ravel())[0, 1]
    print(f"magnitude-spectrogram correlation: {corr:.3f}")
    if len(sys.argv) > 2:
        dsp.write(sys.argv[2], np.asarray(y), sr)


if __name__ == "__main__":
    main()
