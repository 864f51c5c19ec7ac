# coding: utf-8
"""ARPAbet phone inventory + CMU Pronouncing Dictionary file parser
(capability parity with reference frontend/text/cmudict.py:20-61)."""

import re

# Standard ARPAbet: 24 consonants + 15 vowels x {bare, 0, 1, 2 stress} = 84.
_vowels = ['AA', 'AE', 'AH', 'AO', 'AW', 'AY', 'EH', 'ER', 'EY', 'IH', 'IY',
           'OW', 'OY', 'UH', 'UW']
_consonants = ['B', 'CH', 'D', 'DH', 'F', 'G', 'HH', 'JH', 'K', 'L', 'M',
               'N', 'NG', 'P', 'R', 'S', 'SH', 'T', 'TH', 'V', 'W', 'Y',
               'Z', 'ZH']

valid_symbols = sorted(
    _consonants + [v + s for v in _vowels for s in ('', '0', '1', '2')])

_valid_symbol_set = set(valid_symbols)

_alt_re = re.compile(r'\([0-9]+\)')


def _parse_entry_line(line):
    if len(line) == 0 or not line[0].isalpha() or line[0].islower():
        return None
    parts = line.split('  ')
    if len(parts) != 2:
        return None
    word = re.sub(_alt_re, '', parts[0])
    pron = parts[1].strip().split(' ')
    if any(p not in _valid_symbol_set for p in pron):
        return None
    return word, ' '.join(pron)


def parse_cmudict(lines):
    """Iterable of cmudict-format lines -> {WORD: [pron, ...]}."""
    entries = {}
    for line in lines:
        parsed = _parse_entry_line(line.rstrip())
        if parsed is None:
            continue
        word, pron = parsed
        entries.setdefault(word, []).append(pron)
    return entries


class CMUDict:
    """Pronunciation lookup over a cmudict-format file or file object."""

    def __init__(self, file_or_path, keep_ambiguous=True):
        if isinstance(file_or_path, str):
            with open(file_or_path, encoding='latin-1') as f:
                entries = parse_cmudict(f)
        else:
            entries = parse_cmudict(file_or_path)
        if not keep_ambiguous:
            entries = {w: p for w, p in entries.items() if len(p) == 1}
        self._entries = entries

    def __len__(self):
        return len(self._entries)

    def lookup(self, word):
        """Word -> list of ARPAbet pronunciation strings, or None."""
        return self._entries.get(word.upper())
