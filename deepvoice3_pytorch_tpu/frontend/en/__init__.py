# coding: utf-8
"""English frontend: char + CMUdict-mixed ARPAbet input
(reference frontend/en/__init__.py).

Pronunciation mixing sources, in priority order:
  1. a user-supplied cmudict file via `set_cmudict_path`
  2. the nltk cmudict corpus if its data is installed
  3. none (p is effectively 0 — plain character input)
"""

from random import random

from ..text.symbols import symbols
from ..text import text_to_sequence as _base_text_to_sequence
from ..text import sequence_to_text  # noqa: F401  (re-export)
from ..text.cmudict import CMUDict

n_vocab = len(symbols)

_arpabet = None
_arpabet_loaded = False


def set_cmudict_path(path):
    """Point pronunciation mixing at a cmudict-format file."""
    global _arpabet, _arpabet_loaded
    d = CMUDict(path)
    _arpabet = {w.lower(): [p.split() for p in prons]
                for w, prons in d._entries.items()}
    _arpabet_loaded = True


def _load_default_arpabet():
    global _arpabet, _arpabet_loaded
    if _arpabet_loaded:
        return
    _arpabet_loaded = True
    try:
        import nltk
        _arpabet = nltk.corpus.cmudict.dict()
    except Exception:
        _arpabet = None


def _maybe_get_arpabet(word, p):
    _load_default_arpabet()
    if _arpabet is None:
        return word
    try:
        phonemes = _arpabet[word][0]
        phonemes = " ".join(ph.upper() for ph in phonemes)
    except KeyError:
        return word
    return '{%s}' % phonemes if random() < p else word


def mix_pronunciation(text, p):
    return ' '.join(_maybe_get_arpabet(word, p) for word in text.split(' '))


def text_to_sequence(text, p=0.0):
    if p >= 0:
        text = mix_pronunciation(text, p)
    return _base_text_to_sequence(text, ["english_cleaners"])
