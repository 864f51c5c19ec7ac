# coding: utf-8
from . import stft  # noqa: F401
from .audio import AudioProcessor  # noqa: F401
