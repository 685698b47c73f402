import time, numpy as np, jax, jax.numpy as jnp
import diffsptk_tpu as dsp
from diffsptk_tpu.models.mcep_vocoder import MelCepstralVocoder

x, sr = dsp.read("/root/reference/assets/data.wav")
B = 64
xb = jnp.tile(x[None, :], (B, 1))
ys = {}
for cascade in ("fused", "stages"):
    voc = MelCepstralVocoder(frame_length=400, frame_period=80,
                             fft_length=512, cep_order=24, alpha=0.42,
                             n_iter=10, cascade=cascade)
    f = jax.jit(voc.analysis_synthesis)
    try:
        y = f(xb); float(jnp.sum(y))
    except Exception as e:
        print(f"{cascade} FAILED: {type(e).__name__}: {str(e)[:200]}")
        continue
    t0 = time.perf_counter()
    for _ in range(10):
        y = f(xb)
    float(jnp.sum(y))
    dt = (time.perf_counter() - t0) / 10
    ys[cascade] = np.asarray(y)
    print(f"{cascade}: {xb.size/dt/1e6:.2f} Msamples/s")
if len(ys) == 2:
    a, b = ys["stages"], ys["fused"]
    n = min(a.shape[-1], b.shape[-1])
    print(f"max|diff|={np.max(np.abs(a[...,:n]-b[...,:n])):.3e}")
