"""Stateless functional API (reference: diffsptk/functional.py).

Each wrapper designs fresh state (LRU-cached on host) and forwards; under
``jax.jit`` the design constants fold away, so this path costs the same as
the class path.
"""

from __future__ import annotations

from .ops.companding import (
    ALawCompression,
    ALawExpansion,
    InverseUniformQuantization,
    MuLawCompression,
    MuLawExpansion,
    UniformQuantization,
)
from .ops.dct import (
    DiscreteCosineTransform,
    DiscreteHartleyTransform,
    DiscreteSineTransform,
    InverseDiscreteCosineTransform,
    InverseDiscreteHartleyTransform,
    InverseDiscreteSineTransform,
    WalshHadamardTransform,
)
from .ops.fftr import (
    RealValuedFastFourierTransform,
    RealValuedInverseFastFourierTransform,
)
from .ops.frame import Frame
from .ops.freqt import FrequencyTransform
from .ops.gnorm import (
    GeneralizedCepstrumGainNormalization,
    GeneralizedCepstrumInverseGainNormalization,
)
from .ops.mc2b import (
    MelCepstrumToMLSADigitalFilterCoefficients,
    MLSADigitalFilterCoefficientsToMelCepstrum,
)
from .ops.parcor import (
    AllPoleToAllZeroDigitalFilterCoefficients,
    InverseSineToParcorCoefficients,
    LinearPredictiveCoefficientsToParcorCoefficients,
    LogAreaRatioToParcorCoefficients,
    ParcorCoefficientsToInverseSine,
    ParcorCoefficientsToLinearPredictiveCoefficients,
    ParcorCoefficientsToLogAreaRatio,
)
from .ops.spec import Spectrum
from .ops.stft import (
    InverseShortTimeFourierTransform,
    ShortTimeFourierTransform,
)
from .ops.unframe import Unframe
from .ops.window import Window


def frame(x, frame_length=400, frame_period=80, center=True, zmean=False,
          mode="constant"):
    """Perform framing: (..., T) -> (..., T/P, L)."""
    return Frame._func(x, frame_length=frame_length,
                       frame_period=frame_period, center=center,
                       zmean=zmean, mode=mode)


def window(x, out_length=None, *, window="blackman", norm="power",
           symmetric=True):
    """Apply a window function to the framed input."""
    return Window._func(x, in_length=x.shape[-1], out_length=out_length,
                        window=window, norm=norm, symmetric=symmetric)


def unframe(y, out_length=None, *, frame_period=80, center=True,
            window="rectangular", norm="none", symmetric=True):
    """Revert framed waveform by overlap-add."""
    return Unframe._func(y, out_length, frame_length=y.shape[-1],
                         frame_period=frame_period, center=center,
                         window=window, norm=norm, symmetric=symmetric)


def fftr(x, fft_length=None, out_format="complex"):
    """Real-valued FFT."""
    return RealValuedFastFourierTransform._func(
        x, fft_length=fft_length, out_format=out_format)


def ifftr(y, out_length=None):
    """Inverse of fftr."""
    return RealValuedInverseFastFourierTransform._func(
        y, fft_length=2 * (y.shape[-1] - 1), out_length=out_length)


def spec(b=None, a=None, *, fft_length=512, eps=0.0, relative_floor=None,
         out_format="power"):
    """Spectrum from numerator b and/or denominator a."""
    return Spectrum._func(b, a, fft_length=fft_length, eps=eps,
                          relative_floor=relative_floor,
                          out_format=out_format, module=False)


def stft(x, *, frame_length=400, frame_period=80, fft_length=512,
         center=True, zmean=False, mode="constant", window="blackman",
         norm="power", symmetric=True, eps=1e-9, relative_floor=None,
         out_format="power"):
    """Short-time Fourier transform."""
    return ShortTimeFourierTransform._func(
        x, frame_length=frame_length, frame_period=frame_period,
        fft_length=fft_length, center=center, zmean=zmean, mode=mode,
        window=window, norm=norm, symmetric=symmetric, eps=eps,
        relative_floor=relative_floor, out_format=out_format, module=False)


def istft(y, *, out_length=None, frame_length=400, frame_period=80,
          fft_length=512, center=True, window="blackman", norm="power",
          symmetric=True):
    """Inverse short-time Fourier transform."""
    return InverseShortTimeFourierTransform._func(
        y, out_length, frame_length=frame_length, frame_period=frame_period,
        fft_length=fft_length, center=center, window=window, norm=norm,
        symmetric=symmetric, module=False)


def dct(x, dct_type=2):
    """Discrete cosine transform."""
    return DiscreteCosineTransform._func(x, dct_length=x.shape[-1],
                                         dct_type=dct_type)


def idct(y, dct_type=2):
    """Inverse discrete cosine transform."""
    return InverseDiscreteCosineTransform._func(y, dct_length=y.shape[-1],
                                                dct_type=dct_type)


def dst(x, dst_type=2):
    """Discrete sine transform."""
    return DiscreteSineTransform._func(x, dst_length=x.shape[-1],
                                       dst_type=dst_type)


def idst(y, dst_type=2):
    """Inverse discrete sine transform."""
    return InverseDiscreteSineTransform._func(y, dst_length=y.shape[-1],
                                              dst_type=dst_type)


def dht(x, dht_type=2):
    """Discrete Hartley transform."""
    return DiscreteHartleyTransform._func(x, dht_length=x.shape[-1],
                                          dht_type=dht_type)


def idht(y, dht_type=2):
    """Inverse discrete Hartley transform."""
    return InverseDiscreteHartleyTransform._func(y, dht_length=y.shape[-1],
                                                 dht_type=dht_type)


def wht(x, wht_type="natural"):
    """Walsh-Hadamard transform."""
    return WalshHadamardTransform._func(x, wht_length=x.shape[-1],
                                        wht_type=wht_type)


iwht = wht


def freqt(c, out_order, alpha=0.0):
    """Frequency transform (all-pass warping)."""
    return FrequencyTransform._func(c, in_order=c.shape[-1] - 1,
                                    out_order=out_order, alpha=alpha)


def mc2b(mc, alpha=0.0):
    """Mel-cepstrum to MLSA filter coefficients."""
    return MelCepstrumToMLSADigitalFilterCoefficients._func(
        mc, cep_order=mc.shape[-1] - 1, alpha=alpha)


def b2mc(b, alpha=0.0):
    """MLSA filter coefficients to mel-cepstrum."""
    return MLSADigitalFilterCoefficientsToMelCepstrum._func(
        b, cep_order=b.shape[-1] - 1, alpha=alpha)


def gnorm(x, gamma=0.0, c=None):
    """Gain normalization of generalized cepstrum."""
    return GeneralizedCepstrumGainNormalization._func(
        x, cep_order=x.shape[-1] - 1, gamma=gamma, c=c)


def ignorm(y, gamma=0.0, c=None):
    """Inverse gain normalization."""
    return GeneralizedCepstrumInverseGainNormalization._func(
        y, cep_order=y.shape[-1] - 1, gamma=gamma, c=c)


def alaw(x, abs_max=1.0, a=87.6):
    """A-law compression."""
    return ALawCompression._func(x, abs_max=abs_max, a=a)


def ialaw(y, abs_max=1.0, a=87.6):
    """A-law expansion."""
    return ALawExpansion._func(y, abs_max=abs_max, a=a)


def ulaw(x, abs_max=1.0, mu=255):
    """Mu-law compression."""
    return MuLawCompression._func(x, abs_max=abs_max, mu=mu)


def iulaw(y, abs_max=1.0, mu=255):
    """Mu-law expansion."""
    return MuLawExpansion._func(y, abs_max=abs_max, mu=mu)


def quantize(x, abs_max=1.0, n_bit=8, quantizer="mid-rise"):
    """Uniform quantization."""
    return UniformQuantization._func(x, abs_max=abs_max, n_bit=n_bit,
                                     quantizer=quantizer)


def dequantize(y, abs_max=1.0, n_bit=8, quantizer="mid-rise"):
    """Inverse uniform quantization."""
    return InverseUniformQuantization._func(y, abs_max=abs_max, n_bit=n_bit,
                                            quantizer=quantizer)


def lpc2par(a, gamma=1.0, c=None):
    """LPC to PARCOR."""
    return LinearPredictiveCoefficientsToParcorCoefficients._func(
        a, lpc_order=a.shape[-1] - 1, gamma=gamma, c=c)


def par2lpc(k, gamma=1.0, c=None):
    """PARCOR to LPC."""
    return ParcorCoefficientsToLinearPredictiveCoefficients._func(
        k, par_order=k.shape[-1] - 1, gamma=gamma, c=c)


def par2is(k):
    """PARCOR to inverse sine."""
    return ParcorCoefficientsToInverseSine._func(k,
                                                 par_order=k.shape[-1] - 1)


def is2par(s):
    """Inverse sine to PARCOR."""
    return InverseSineToParcorCoefficients._func(s,
                                                 par_order=s.shape[-1] - 1)


def par2lar(k):
    """PARCOR to log area ratio."""
    return ParcorCoefficientsToLogAreaRatio._func(k,
                                                  par_order=k.shape[-1] - 1)


def lar2par(g):
    """Log area ratio to PARCOR."""
    return LogAreaRatioToParcorCoefficients._func(g,
                                                  par_order=g.shape[-1] - 1)


def norm0(a):
    """All-pole to all-zero filter coefficients (self-inverse)."""
    return AllPoleToAllZeroDigitalFilterCoefficients._func(
        a, filter_order=a.shape[-1] - 1)


def acorr(x, acr_order, out_format="naive"):
    """Autocorrelation of a framed waveform."""
    from .ops.acorr import Autocorrelation
    return Autocorrelation._func(x, frame_length=x.shape[-1],
                                 acr_order=acr_order, out_format=out_format)


def levdur(r, eps=None):
    """Levinson-Durbin: autocorrelation -> LPC."""
    from .ops.levdur import LevinsonDurbin
    return LevinsonDurbin._func(r, lpc_order=r.shape[-1] - 1, eps=eps)


def rlevdur(a, n_fft=512):
    """Reverse Levinson-Durbin: LPC -> autocorrelation."""
    from .ops.levdur import ReverseLevinsonDurbin
    return ReverseLevinsonDurbin._func(a, lpc_order=a.shape[-1] - 1,
                                       n_fft=n_fft)


def lpc(x, lpc_order, eps=None):
    """LPC analysis of a framed waveform."""
    from .ops.lpc import LinearPredictiveCodingAnalysis
    return LinearPredictiveCodingAnalysis._func(
        x, frame_length=x.shape[-1], lpc_order=lpc_order, eps=eps,
        module=False)


def linear_intpl(x, upsampling_factor):
    """Linear interpolation from frame rate to sample rate."""
    from .ops.linear_intpl import LinearInterpolation
    return LinearInterpolation._func(x, upsampling_factor=upsampling_factor)


def poledf(x, a, frame_period, ignore_gain=False):
    """All-pole digital filtering with frame-rate coefficients."""
    from .ops.poledf import AllPoleDigitalFilter
    return AllPoleDigitalFilter._func(
        x, a, filter_order=a.shape[-1] - 1, frame_period=frame_period,
        ignore_gain=ignore_gain)


def zerodf(x, b, frame_period, ignore_gain=False):
    """All-zero digital filtering with frame-rate coefficients."""
    from .ops.zerodf import AllZeroDigitalFilter
    return AllZeroDigitalFilter._func(
        x, b, filter_order=b.shape[-1] - 1, frame_period=frame_period,
        ignore_gain=ignore_gain)


def dfs(x, b=None, a=None, ir_length=None):
    """Static digital filtering."""
    from .ops.dfs import InfiniteImpulseResponseDigitalFilter
    return InfiniteImpulseResponseDigitalFilter._func(
        x, b=b, a=a, ir_length=ir_length)


def df2(x, sample_rate, **kwargs):
    """Second-order digital filtering."""
    from .ops.dfs import SecondOrderDigitalFilter
    return SecondOrderDigitalFilter._func(x, sample_rate=sample_rate,
                                          module=False, **kwargs)
