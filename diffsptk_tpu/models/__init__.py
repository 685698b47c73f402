from .mcep_vocoder import MelCepstralVocoder
