# coding: utf-8
from . import losses, lrschedule, trainer, dataset, checkpoint  # noqa: F401
