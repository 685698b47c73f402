"""diffsptk_tpu: a TPU-native differentiable-SPTK framework.

Built from scratch in JAX/XLA/Pallas with the capability surface of
sp-nitech/diffsptk.  See SURVEY.md for the blueprint.
"""

# Matmul precision: on TPU, JAX's DEFAULT matmul precision rounds
# inputs to bfloat16, which breaks f32 solver parity.  The library pins
# its OWN dispatch points (BaseOp.apply / the functional path / learner
# entries) to full-f32 matmuls via core.full_precision — it does NOT
# mutate the process-global jax config, so user code sharing the
# process keeps whatever precision it configured.  Hot paths with an
# accuracy budget opt down via explicit precision= arguments.

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
