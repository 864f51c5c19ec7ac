# coding: utf-8
"""Text cleaner pipelines (reference frontend/text/cleaners.py:85-97):
english_cleaners / transliteration_cleaners / basic_cleaners.

ASCII transliteration uses Unidecode when available and falls back to
NFKD-decomposition stripping otherwise (covers Latin-script accents, the
common case for LJSpeech/VCTK-style corpora).
"""

import re
import unicodedata

try:
    from unidecode import unidecode as _unidecode
except ImportError:  # zero-dep fallback
    def _unidecode(text):
        out = unicodedata.normalize('NFKD', text)
        return out.encode('ascii', 'ignore').decode('ascii')

from .numbers import normalize_numbers

_whitespace_re = re.compile(r'\s+')

_abbreviations = [(re.compile('\\b%s\\.' % x[0], re.IGNORECASE), x[1]) for x in [
    ('mrs', 'misess'),
    ('mr', 'mister'),
    ('dr', 'doctor'),
    ('st', 'saint'),
    ('co', 'company'),
    ('jr', 'junior'),
    ('maj', 'major'),
    ('gen', 'general'),
    ('drs', 'doctors'),
    ('rev', 'reverend'),
    ('lt', 'lieutenant'),
    ('hon', 'honorable'),
    ('sgt', 'sergeant'),
    ('capt', 'captain'),
    ('esq', 'esquire'),
    ('ltd', 'limited'),
    ('col', 'colonel'),
    ('ft', 'fort'),
]]


def expand_abbreviations(text):
    for regex, replacement in _abbreviations:
        text = re.sub(regex, replacement, text)
    return text


def expand_numbers(text):
    return normalize_numbers(text)


def lowercase(text):
    return text.lower()


def collapse_whitespace(text):
    return re.sub(_whitespace_re, ' ', text)


def convert_to_ascii(text):
    return _unidecode(text)


def add_punctuation(text):
    """Terminal punctuation keeps the decoder's EOS prediction stable."""
    if len(text) == 0:
        return text
    if text[-1] not in '!,.:;?':
        text = text + '.'
    return text


def basic_cleaners(text):
    text = lowercase(text)
    text = collapse_whitespace(text)
    return text


def transliteration_cleaners(text):
    text = convert_to_ascii(text)
    text = lowercase(text)
    text = collapse_whitespace(text)
    return text


def english_cleaners(text):
    text = convert_to_ascii(text)
    text = add_punctuation(text)
    text = lowercase(text)
    text = expand_numbers(text)
    text = expand_abbreviations(text)
    text = collapse_whitespace(text)
    return text
