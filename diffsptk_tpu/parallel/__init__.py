from .halo import exchange_halo
from .mesh import make_mesh
from .sharded import ShardedSTFT, sharded_frame
from .vocoder import ShardedMelCepstralVocoder
from .learners import DataParallelGMM
