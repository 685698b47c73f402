"""Neural pitch tracking with the bundled CREPE-tiny checkpoint.

    python examples/neural_pitch.py [in.wav]

Compares the CREPE track against YIN on the same audio and reports
voiced-frame agreement in cents (the bundled checkpoint is trained
in-repo on synthetic pitched audio; see tools/train_crepe_tiny.py).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import diffsptk_tpu as dsp


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/assets/data.wav"
    x, sr = dsp.read(path)
    kwargs = dict(out_format="f0", f_min=60, f_max=400)
    crepe = np.asarray(dsp.Pitch(80, sr, algorithm="crepe", model="tiny",
                                 **kwargs)(x))
    yin = np.asarray(dsp.Pitch(80, sr, algorithm="yin", **kwargs)(x))
    n = min(len(crepe), len(yin))
    both = (crepe[:n] > 0) & (yin[:n] > 0)
    cents = 1200 * np.abs(np.log2(crepe[:n][both] / yin[:n][both]))
    print(f"{n} frames; voiced (both trackers): {int(both.sum())}")
    print(f"crepe-vs-yin median |error|: {np.median(cents):.1f} cents")
    print("crepe f0 (Hz), every 10th frame:")
    print(np.round(crepe[::10], 1))


if __name__ == "__main__":
    main()
