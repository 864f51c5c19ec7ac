# coding: utf-8
"""Model input symbol inventory — MUST match the reference vocabulary
(reference frontend/text/symbols.py: 149 symbols) so token ids line up with
imported checkpoints: [pad, eos] + ASCII charset + '@'-prefixed ARPAbet.
"""

from .cmudict import valid_symbols

_pad = '_'
_eos = '~'
_characters = 'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz!\'(),-.:;? '

# '@'-prefix keeps ARPAbet symbols distinct from uppercase letters
_arpabet = ['@' + s for s in valid_symbols]

symbols = [_pad, _eos] + list(_characters) + _arpabet
