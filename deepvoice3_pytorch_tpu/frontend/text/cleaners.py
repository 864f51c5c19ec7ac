# coding: utf-8
"""Text cleaner pipelines: english_cleaners / transliteration_cleaners /
basic_cleaners.

Behavior-compatible with the reference cleaner contract (reference
frontend/text/cleaners.py:85-97 and keithito/tacotron before it) — the
contract is enforced byte-for-byte by tests/test_frontend.py — but built as
a declarative stage table: each named cleaner is a composition of small
string transforms, and the abbreviation expander is one alternation regex
over a table instead of a per-pattern substitution loop.

ASCII transliteration uses Unidecode when available and falls back to
NFKD-decomposition stripping otherwise (covers Latin-script accents, the
common case for LJSpeech/VCTK-style corpora).
"""

import re
import unicodedata

from .numbers import normalize_numbers

try:
    from unidecode import unidecode as _unidecode
except ImportError:  # zero-dep fallback
    def _unidecode(text):
        out = unicodedata.normalize('NFKD', text)
        return out.encode('ascii', 'ignore').decode('ascii')


# Title/abbreviation expansions. Written "mrs" before "mr" so the alternation
# prefers the longer form at the same position (regex alternatives are tried
# left to right); expansions contain no '.' so no cascading re-expansion can
# occur.
_ABBREVIATIONS = {
    'mrs': 'misess',
    'mr': 'mister',
    'dr': 'doctor',
    'st': 'saint',
    'co': 'company',
    'jr': 'junior',
    'maj': 'major',
    'gen': 'general',
    'drs': 'doctors',
    'rev': 'reverend',
    'lt': 'lieutenant',
    'hon': 'honorable',
    'sgt': 'sergeant',
    'capt': 'captain',
    'esq': 'esquire',
    'ltd': 'limited',
    'col': 'colonel',
    'ft': 'fort',
}

_ABBREV_RE = re.compile(
    r'\b(%s)\.' % '|'.join(_ABBREVIATIONS), re.IGNORECASE)

# Sentence-final characters after which no terminal '.' is appended.
_TERMINALS = frozenset('!,.:;?')

_WS_RE = re.compile(r'\s+')


# --- stage functions ---------------------------------------------------------

def convert_to_ascii(text):
    return _unidecode(text)


def add_punctuation(text):
    """Ensure terminal punctuation; keeps the decoder's EOS prediction
    stable."""
    if text and text[-1] not in _TERMINALS:
        return text + '.'
    return text


def lowercase(text):
    return text.lower()


def expand_numbers(text):
    return normalize_numbers(text)


def expand_abbreviations(text):
    return _ABBREV_RE.sub(
        lambda m: _ABBREVIATIONS[m.group(1).lower()], text)


def collapse_whitespace(text):
    return _WS_RE.sub(' ', text)


# --- pipelines ---------------------------------------------------------------

def _compose(*stages):
    def run(text):
        for stage in stages:
            text = stage(text)
        return text
    return run


basic_cleaners = _compose(lowercase, collapse_whitespace)

transliteration_cleaners = _compose(
    convert_to_ascii, lowercase, collapse_whitespace)

english_cleaners = _compose(
    convert_to_ascii, add_punctuation, lowercase, expand_numbers,
    expand_abbreviations, collapse_whitespace)
