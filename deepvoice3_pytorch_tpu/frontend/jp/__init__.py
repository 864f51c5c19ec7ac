# coding: utf-8
"""Japanese frontend: yomi mixing + katakana normalization +
character-ordinal encoding (reference frontend/jp/__init__.py behavior).

Unlike the reference (which hard-imports MeCab and jaconv at module import,
reference frontend/jp/__init__.py:4), the common path here is dependency
free: NFKC normalization via unicodedata and hiragana->katakana as the
U+3041..U+3096 -> U+30A1..U+30F6 codepoint shift (exactly what
jaconv.hira2kata does). MeCab is imported lazily and only required for
pronunciation mixing (p > 0); jaconv is used when installed.
"""

import unicodedata
from random import random

n_vocab = 0xffff

_eos = 1
_pad = 0
_tagger = None


def hira2kata(text):
    """ぁ(U+3041)..ゖ(U+3096) -> ァ..ヶ; everything else unchanged."""
    try:
        import jaconv
        return jaconv.hira2kata(text)
    except ImportError:
        return "".join(chr(ord(c) + 0x60) if 0x3041 <= ord(c) <= 0x3096
                       else c for c in text)


def normalize(text):
    try:
        import jaconv
        return jaconv.normalize(text)
    except ImportError:
        # jaconv.normalize semantics: tildes become the long-vowel mark,
        # dash/hyphen variants become ASCII '-' (ASCII hyphen-minus itself is
        # left unchanged), curly quotes are straightened, then NFKC — so
        # token ids match between hosts with and without jaconv installed.
        text = text.replace("〜", "ー").replace("～", "ー")
        text = text.replace("’", "'").replace("”", '"').replace("“", "``")
        text = text.replace("―", "-").replace("‐", "-")
        return unicodedata.normalize("NFKC", text)


def _yomi(mecab_result):
    tokens, yomis = [], []
    for line in mecab_result.split("\n")[:-1]:
        s = line.split("\t")
        if len(s) == 1:
            break
        token, rest = s
        rest = rest.split(",")
        tokens.append(token)
        yomi = rest[7] if len(rest) > 7 else None
        yomis.append(None if yomi == "*" else yomi)
    return tokens, yomis


def _mix_pronunciation(tokens, yomis, p):
    return "".join(
        yomis[idx] if yomis[idx] is not None and random() < p else tokens[idx]
        for idx in range(len(tokens)))


def mix_pronunciation(text, p):
    global _tagger
    if _tagger is None:
        import MeCab
        _tagger = MeCab.Tagger("")
    tokens, yomis = _yomi(_tagger.parse(text))
    return _mix_pronunciation(tokens, yomis, p)


def add_punctuation(text):
    last = text[-1]
    if last not in [".", ",", "、", "。", "！", "？", "!", "?"]:
        text = text + "。"
    return text


def normalize_delimitor(text):
    text = text.replace(",", "、")
    text = text.replace(".", "。")
    text = text.replace("，", "、")
    text = text.replace("．", "。")
    return text


def text_to_sequence(text, p=0.0):
    for c in [" ", "　", "「", "」", "『", "』", "・", "【", "】",
              "（", "）", "(", ")"]:
        text = text.replace(c, "")
    text = text.replace("!", "！")
    text = text.replace("?", "？")

    text = normalize_delimitor(text)
    text = normalize(text)
    if p > 0:
        text = mix_pronunciation(text, p)
    text = hira2kata(text)
    text = add_punctuation(text)

    return [ord(c) for c in text] + [_eos]


def sequence_to_text(seq):
    return "".join(chr(int(n)) for n in seq)
