# coding: utf-8
"""Spanish frontend: basic_cleaners over the shared symbol set
(reference frontend/es/__init__.py). To keep accented characters instead of
transliterating, extend _characters in text/symbols.py."""

from ..text.symbols import symbols
from ..text import text_to_sequence as _base_text_to_sequence
from ..text import sequence_to_text  # noqa: F401

n_vocab = len(symbols)


def text_to_sequence(text, p=0.0):
    return _base_text_to_sequence(text, ["basic_cleaners"])
