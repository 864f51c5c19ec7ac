# coding: utf-8
from . import deepvoice3, nyanko, decode  # noqa: F401
