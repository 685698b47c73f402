"""diffsptk_tpu: a TPU-native differentiable-SPTK framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of
sp-nitech/diffsptk.  See SURVEY.md for the blueprint.
"""

import jax as _jax

# On TPU, JAX's DEFAULT matmul precision rounds inputs to bfloat16.
# This library's operators assemble solver systems and basis transforms
# by matmul (Newton Hessians, freqt warps, DFT plans); 1e-3-relative
# rounding there silently breaks f32 parity — and makes the
# mgcep Newton Hessian lose positive-definiteness outright (NaN).
# Default to full f32; hot paths that have an accuracy budget opt into
# lower precision explicitly (kernels/mlsa_cascade.py uses HIGH).
# Users can override after import via jax.default_matmul_precision.
_jax.config.update("jax_default_matmul_precision", "highest")

from . import functional
from .core import BaseLearnerOp, BaseNonFunctionalOp, BaseOp, Design
from .signals import (
    impulse,
    mseq,
    mseq_like,
    nrand,
    nrand_like,
    ramp,
    rand,
    rand_like,
    sin,
    step,
    train,
)
from .utils import get_alpha, read, write
from .version import __version__

# Short aliases mirroring the reference's public names
# (reference: diffsptk/modules/__init__.py:17-175).
from .ops import *  # noqa: F401,F403
from .ops import (
    DiscreteCosineTransform,
    DiscreteHartleyTransform,
    DiscreteSineTransform,
    InverseDiscreteCosineTransform,
    InverseDiscreteHartleyTransform,
    InverseDiscreteSineTransform,
    InverseShortTimeFourierTransform,
    InverseWalshHadamardTransform,
    RealValuedFastFourierTransform,
    RealValuedInverseFastFourierTransform,
    ShortTimeFourierTransform,
    WalshHadamardTransform,
)

STFT = ShortTimeFourierTransform
ISTFT = InverseShortTimeFourierTransform
FFTR = RealValuedFastFourierTransform
IFFTR = RealValuedInverseFastFourierTransform
DCT = DiscreteCosineTransform
IDCT = InverseDiscreteCosineTransform
DST = DiscreteSineTransform
IDST = InverseDiscreteSineTransform
DHT = DiscreteHartleyTransform
IDHT = InverseDiscreteHartleyTransform
WHT = WalshHadamardTransform
IWHT = InverseWalshHadamardTransform

from .ops import (
    AllPoleDigitalFilter,
    AllZeroDigitalFilter,
    Autocorrelation,
    InfiniteImpulseResponseDigitalFilter,
    LevinsonDurbin,
    LinearInterpolation,
    LinearPredictiveCodingAnalysis,
    ReverseLevinsonDurbin,
    SecondOrderDigitalFilter,
)

LPC = LinearPredictiveCodingAnalysis
IIR = InfiniteImpulseResponseDigitalFilter

from .ops import (
    CepstralAnalysis,
    CepstralDistance,
    CepstrumToAutocorrelation,
    CepstrumToMinimumPhaseImpulseResponse,
    CepstrumToNegativeDerivativeOfPhaseSpectrum,
    MelCepstralAnalysis,
    MelGeneralizedCepstrumToMelGeneralizedCepstrum,
    MelGeneralizedCepstrumToSpectrum,
    MinimumPhaseImpulseResponseToCepstrum,
    NegativeDerivativeOfPhaseSpectrumToCepstrum,
    PseudoInverseMGLSADigitalFilter,
    PseudoMGLSADigitalFilter,
)

MLSA = PseudoMGLSADigitalFilter
IMLSA = PseudoInverseMGLSADigitalFilter

from .ops import (
    GriffinLim,
    HilbertTransform,
    InverseMelFilterBankAnalysis,
    InverseModifiedDiscreteCosineTransform,
    InverseModifiedDiscreteSineTransform,
    MelFilterBankAnalysis,
    MelFrequencyCepstralCoefficientsAnalysis,
    ModifiedDiscreteCosineTransform,
    ModifiedDiscreteSineTransform,
    PerceptualLinearPredictiveCoefficientsAnalysis,
)

MDCT = ModifiedDiscreteCosineTransform
IMDCT = InverseModifiedDiscreteCosineTransform
MDST = ModifiedDiscreteSineTransform
IMDST = InverseModifiedDiscreteSineTransform
FBANK = MelFilterBankAnalysis
IFBANK = InverseMelFilterBankAnalysis
MFCC = MelFrequencyCepstralCoefficientsAnalysis
PLP = PerceptualLinearPredictiveCoefficientsAnalysis

from .ops import (
    LinearPredictiveCoefficientsStabilityCheck,
    LinearPredictiveCoefficientsToLineSpectralPairs,
    LineSpectralPairsStabilityCheck,
    LineSpectralPairsToLinearPredictiveCoefficients,
    LineSpectralPairsToSpectrum,
    PolynomialToRoots,
    RootsToPolynomial,
)

from .ops import (
    MelCepstrumInversePowerNormalization,
    MelCepstrumPostfiltering,
    MelCepstrumPowerNormalization,
    MelGeneralizedCepstralAnalysis,
    MLSADigitalFilterStabilityCheck,
    SecondOrderAllPassFrequencyTransform,
    SecondOrderAllPassInverseFrequencyTransform,
    SecondOrderAllPassMelCepstralAnalysis,
)

from .ops import (
    Aperiodicity,
    ExcitationGeneration,
    Pitch,
    PitchAdaptiveSpectralAnalysis,
    WorldSynthesis,
)

from .ops import (
    ChromaFilterBankAnalysis,
    ConstantQTransform,
    FractionalOctaveBandAnalysis,
    GammatoneFilterBankAnalysis,
    GammatoneFilterBankSynthesis,
    InverseConstantQTransform,
    PseudoQuadratureMirrorFilterBankAnalysis,
    PseudoQuadratureMirrorFilterBankSynthesis,
)

CQT = ConstantQTransform
ICQT = InverseConstantQTransform
PQMF = PseudoQuadratureMirrorFilterBankAnalysis
IPQMF = PseudoQuadratureMirrorFilterBankSynthesis

from .ops import (
    AutocorrelationToCompositeSinusoidalModelCoefficients,
    F0Evaluation,
    CompositeSinusoidalModelCoefficientsToAutocorrelation,
    Decimation,
    Delay,
    Delta,
    DynamicRangeCompression,
    DynamicTimeWarping,
    Entropy,
    Flux,
    GroupDelay,
    Histogram,
    Interpolation,
    MagicNumberInterpolation,
    MaximumLikelihoodParameterGeneration,
    MedianFilter,
    Phase,
    RootMeanSquareError,
    SignalToNoiseRatio,
    Yingram,
    ZeroCrossingAnalysis,
)

DRC = DynamicRangeCompression
DTW = DynamicTimeWarping
MLPG = MaximumLikelihoodParameterGeneration
RMSE = RootMeanSquareError
SNR = SignalToNoiseRatio

from .ops import (
    GaussianMixtureModeling,
    IndependentComponentAnalysis,
    InverseMultiStageVectorQuantization,
    InverseVectorQuantization,
    LindeBuzoGrayAlgorithm,
    MultiStageVectorQuantization,
    NonnegativeMatrixFactorization,
    PrincipalComponentAnalysis,
    VectorQuantization,
)

GMM = GaussianMixtureModeling
LBG = LindeBuzoGrayAlgorithm
PCA = PrincipalComponentAnalysis
ICA = IndependentComponentAnalysis
NMF = NonnegativeMatrixFactorization
