from .halo import exchange_halo
from .mesh import make_mesh
from .sharded import ShardedSTFT, sharded_frame
from .filters import ShardedAllPoleDigitalFilter
from .vocoder import ShardedMelCepstralVocoder
from .world import ShardedWorldVocoder
from .learners import DataParallelGMM
