from .fftr import (
    RealValuedFastFourierTransform,
    RealValuedInverseFastFourierTransform,
)
from .frame import Frame
from .spec import Spectrum
from .stft import InverseShortTimeFourierTransform, ShortTimeFourierTransform
from .unframe import Unframe
from .window import Window
