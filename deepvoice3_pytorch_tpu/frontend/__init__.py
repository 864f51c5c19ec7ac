# coding: utf-8
"""Text processing frontends (reference frontend/__init__.py contract).

Every frontend module exposes:
  - text_to_sequence(text, p) -> list of int ids (EOS appended)
  - sequence_to_text(sequence) -> str
  - n_vocab
"""

from . import en  # always available

try:
    from . import jp
except ImportError:
    jp = None

try:
    from . import ko
except ImportError:
    ko = None

try:
    from . import es
except ImportError:
    es = None


def get_frontend(name):
    mod = globals().get(name)
    if mod is None:
        raise ValueError(
            "Frontend %r unavailable (missing optional dependency?)" % name)
    return mod
