# coding: utf-8
"""Frontend tests: vocabulary identity vs reference, cleaner pipelines,
roundtrips (reference tests/test_frontend.py)."""
import numpy as np

from deepvoice3_pytorch_tpu import frontend
from deepvoice3_pytorch_tpu.frontend import en
from deepvoice3_pytorch_tpu.frontend.text.symbols import symbols as my_symbols
from deepvoice3_pytorch_tpu.frontend.text import numbers

from reference_util import import_reference

import_reference()


def test_symbols_match_reference_exactly():
    """Token ids are the checkpoint contract — must be identical."""
    from deepvoice3_pytorch.frontend.text.symbols import symbols as ref_syms
    assert my_symbols == ref_syms
    assert len(my_symbols) == 149


def test_en_eos_and_roundtrip():
    seq = en.text_to_sequence("hello world.")
    assert seq[-1] == 1  # EOS '~'
    assert en.sequence_to_text(seq) == "hello world.~"


def test_en_matches_reference_cleaning():
    """Same cleaned sequences as the reference for p=0 (no pronunciation
    randomness)."""
    texts = [
        "Hello,   World!",
        "DR. Smith lives at 221 Baker St.",
        "I have $1.50 and 3 apples.",
        "The year 1984 was 42 years ago.",
        "2nd place on March 3rd, 2003.",
    ]
    # reference_util stubs unidecode/inflect with our implementations when
    # absent, so this compares the full regex/cleaner pipelines
    from deepvoice3_pytorch.frontend.text import text_to_sequence as ref_tts
    for t in texts:
        assert en.text_to_sequence(t, p=0) == ref_tts(t, ["english_cleaners"])


def test_arpabet_curly_braces():
    seq = en.text_to_sequence("hi {HH AH0 L OW1} there")
    txt = en.sequence_to_text(seq)
    assert "{HH AH0 L OW1}" in txt
    assert txt.endswith("~")


def test_number_expansion():
    cases = {
        "1984": "nineteen eighty-four",
        "2000": "two thousand",
        "2008": "two thousand eight",
        "1900": "nineteen hundred",
        "42": "forty-two",
        "7": "seven",
        "100": "one hundred",
        "1906": "nineteen oh six",
        "3000000": "three million",
    }
    for num, words in cases.items():
        assert numbers.normalize_numbers(num) == words, num


def test_ordinals_and_currency():
    assert numbers.normalize_numbers("1st") == "first"
    assert numbers.normalize_numbers("2nd") == "second"
    assert numbers.normalize_numbers("3rd") == "third"
    assert numbers.normalize_numbers("21st") == "twenty-first"
    assert numbers.normalize_numbers("20th") == "twentieth"
    assert numbers.normalize_numbers("$1.50") == "one dollar, fifty cents"
    assert numbers.normalize_numbers("$2") == "two dollars"
    assert numbers.normalize_numbers("1.5") == "one point five"
    assert numbers.normalize_numbers("£5") == "five pounds"


def test_jp_frontend():
    from deepvoice3_pytorch_tpu.frontend import jp
    assert jp is not None, "jp frontend should import without MeCab/jaconv"
    seq = jp.text_to_sequence("こんにちは、世界")
    # hiragana converted to katakana, punctuation appended, EOS last
    text = jp.sequence_to_text(seq[:-1])
    assert text == "コンニチハ、世界。"
    assert seq[-1] == 1
    assert jp.hira2kata("がぎぐ") == "ガギグ"
    assert jp.n_vocab == 0xffff


def test_ko_frontend():
    ko = frontend.ko
    text = "안녕하세요"
    seq = ko.text_to_sequence(text)
    assert seq[-1] == 1
    assert ko.sequence_to_text(seq[:-1]) == text


def test_es_frontend():
    es = frontend.es
    seq = es.text_to_sequence("hola mundo.")
    assert seq[-1] == 1


def test_get_frontend_dispatch():
    assert frontend.get_frontend("en") is en
    assert frontend.en.n_vocab == 149
