# coding: utf-8
from . import core, conv_blocks, attention, positional  # noqa: F401
