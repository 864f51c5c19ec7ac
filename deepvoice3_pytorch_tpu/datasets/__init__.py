# coding: utf-8
from . import ljspeech, vctk, jsut, nikl_s, nikl_m, json_meta, common  # noqa: F401

SUPPORTED = ["ljspeech", "vctk", "jsut", "nikl_m", "nikl_s", "json_meta"]


def get_preprocessor(name):
    if name not in SUPPORTED:
        raise ValueError("Unknown dataset %r (supported: %s)"
                         % (name, SUPPORTED))
    return globals()[name]
