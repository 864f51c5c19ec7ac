# coding: utf-8
"""Korean frontend: raw character-ordinal encoding
(reference frontend/ko/__init__.py)."""

n_vocab = 0xffff

_eos = 1
_pad = 0


def text_to_sequence(text, p=0.0):
    return [ord(c) for c in text] + [_eos]


def sequence_to_text(seq):
    return "".join(chr(int(n)) for n in seq)
