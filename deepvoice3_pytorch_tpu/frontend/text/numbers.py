# coding: utf-8
"""English number normalization (reference frontend/text/numbers.py:62-71)
without the inflect dependency: a self-contained number-to-words engine
covering cardinals, ordinals, currency, decimals, and the year-style
two-digit grouping the reference uses for 1001-2999.
"""

import re

_comma_number_re = re.compile(r'([0-9][0-9\,]+[0-9])')
_decimal_number_re = re.compile(r'([0-9]+\.[0-9]+)')
_pounds_re = re.compile(r'£([0-9\,]*[0-9]+)')
_dollars_re = re.compile(r'\$([0-9\.\,]*[0-9]+)')
_ordinal_re = re.compile(r'[0-9]+(st|nd|rd|th)')
_number_re = re.compile(r'[0-9]+')

_UNITS = ['zero', 'one', 'two', 'three', 'four', 'five', 'six', 'seven',
          'eight', 'nine', 'ten', 'eleven', 'twelve', 'thirteen', 'fourteen',
          'fifteen', 'sixteen', 'seventeen', 'eighteen', 'nineteen']
_TENS = ['', '', 'twenty', 'thirty', 'forty', 'fifty', 'sixty', 'seventy',
         'eighty', 'ninety']
_SCALES = [(10 ** 9, 'billion'), (10 ** 6, 'million'), (10 ** 3, 'thousand')]

_ORDINAL_IRREGULAR = {
    'one': 'first', 'two': 'second', 'three': 'third', 'five': 'fifth',
    'eight': 'eighth', 'nine': 'ninth', 'twelve': 'twelfth',
}


def _under_100(n):
    if n < 20:
        return _UNITS[n]
    tens, units = divmod(n, 10)
    return _TENS[tens] + ('-' + _UNITS[units] if units else '')


def _under_1000(n):
    hundreds, rest = divmod(n, 100)
    parts = []
    if hundreds:
        parts.append(_UNITS[hundreds] + ' hundred')
    if rest:
        parts.append(_under_100(rest))
    return ' '.join(parts) if parts else _UNITS[0]


def number_to_words(n):
    """Cardinal words, no 'and' (inflect andword='' style)."""
    n = int(n)
    if n < 0:
        return 'minus ' + number_to_words(-n)
    if n < 1000:
        return _under_1000(n)
    parts = []
    for scale, name in _SCALES:
        q, n = divmod(n, scale)
        if q:
            parts.append(_under_1000(q) + ' ' + name)
    if n:
        parts.append(_under_1000(n))
    return ' '.join(parts)


def number_to_words_grouped2(n, zero='oh'):
    """Two-digit grouping for year-like reading: 1945 -> nineteen forty-five,
    1906 -> nineteen oh six (inflect group=2, zero='oh' after the
    reference's ', '->' ' replacement)."""
    s = str(int(n))
    if len(s) % 2 == 1:
        s = '0' + s
    words = []
    for i in range(0, len(s), 2):
        pair = int(s[i:i + 2])
        if pair == 0:
            words.append(zero + ' ' + zero)
        elif pair < 10:
            words.append(zero + ' ' + _UNITS[pair])
        else:
            words.append(_under_100(pair))
    return ' '.join(words)


def ordinal_to_words(n):
    words = number_to_words(n)
    pieces = words.rsplit(' ', 1)
    last = pieces[-1]
    if '-' in last:
        head, unit = last.rsplit('-', 1)
        last = head + '-' + _ordinalize_word(unit)
    else:
        last = _ordinalize_word(last)
    pieces[-1] = last
    return ' '.join(pieces)


def _ordinalize_word(w):
    if w in _ORDINAL_IRREGULAR:
        return _ORDINAL_IRREGULAR[w]
    if w.endswith('y'):
        return w[:-1] + 'ieth'
    if w.endswith(('hundred', 'thousand', 'million', 'billion')) or \
            w in _UNITS or w in _TENS or True:
        return w + 'th'


def _remove_commas(m):
    return m.group(1).replace(',', '')


def _expand_decimal_point(m):
    return m.group(1).replace('.', ' point ')


def _expand_dollars(m):
    match = m.group(1)
    parts = match.split('.')
    if len(parts) > 2:
        return match + ' dollars'  # unexpected format
    dollars = int(parts[0]) if parts[0] else 0
    cents = int(parts[1]) if len(parts) > 1 and parts[1] else 0
    if dollars and cents:
        dollar_unit = 'dollar' if dollars == 1 else 'dollars'
        cent_unit = 'cent' if cents == 1 else 'cents'
        return '%s %s, %s %s' % (dollars, dollar_unit, cents, cent_unit)
    elif dollars:
        return '%s %s' % (dollars, 'dollar' if dollars == 1 else 'dollars')
    elif cents:
        return '%s %s' % (cents, 'cent' if cents == 1 else 'cents')
    return 'zero dollars'


def _expand_ordinal(m):
    return ordinal_to_words(int(m.group(0)[:-2]))


def _expand_number(m):
    num = int(m.group(0))
    if 1000 < num < 3000:
        if num == 2000:
            return 'two thousand'
        elif 2000 < num < 2010:
            return 'two thousand ' + number_to_words(num % 100)
        elif num % 100 == 0:
            return number_to_words(num // 100) + ' hundred'
        else:
            return number_to_words_grouped2(num)
    return number_to_words(num)


def normalize_numbers(text):
    text = re.sub(_comma_number_re, _remove_commas, text)
    text = re.sub(_pounds_re, r'\1 pounds', text)
    text = re.sub(_dollars_re, _expand_dollars, text)
    text = re.sub(_decimal_number_re, _expand_decimal_point, text)
    text = re.sub(_ordinal_re, _expand_ordinal, text)
    text = re.sub(_number_re, _expand_number, text)
    return text
