# coding: utf-8
"""Typed hyperparameter registry, API-compatible with the TF-1.x HParams the
reference vendors (reference tfcompat/hparam.py — clean-room reimplementation
of the documented surface: typed keys, `parse("a=1,b=[2,3]")` CLI strings,
`parse_json`, `override_from_dict`, `values`, `get`, attribute access).
"""

import json
import re

# value grammar for parse(): name=value pairs, value may be a []-list
_PARAM_RE = re.compile(r"""
  (?P<name>[a-zA-Z][\w\.]*)      # variable name
  \s*=\s*
  ((?P<val>[^,\[]*)              # single value
   |
   \[(?P<vals>[^\]]*)\])         # or a [list]
  ($|,\s*)""", re.VERBOSE)


def _cast(value, ptype, name):
    if ptype is bool:
        if isinstance(value, bool):
            return value
        v = str(value).strip().lower()
        if v in ("true", "1"):
            return True
        if v in ("false", "0"):
            return False
        raise ValueError("Could not parse bool for %s: %r" % (name, value))
    if ptype is int:
        f = float(value)
        if f != int(f):
            raise ValueError("Expected int for %s, got %r" % (name, value))
        return int(f)
    if ptype is float:
        return float(value)
    if ptype is str:
        return str(value)
    return value


class HParams(object):
    """hp = HParams(a=1, b="x"); hp.a; hp.parse("a=2"); hp.values()"""

    def __init__(self, **kwargs):
        self._types = {}
        self._list = {}
        for name, value in kwargs.items():
            self.add_hparam(name, value)

    def add_hparam(self, name, value):
        if getattr(self, name, None) is not None or name in self._types:
            raise ValueError("Hyperparameter name is reserved: %s" % name)
        if isinstance(value, (list, tuple)):
            if not value:
                raise ValueError(
                    "Empty list not allowed for hyperparameter: %s" % name)
            self._types[name] = type(value[0])
            self._list[name] = True
            value = list(value)
        else:
            self._types[name] = type(value)
            self._list[name] = False
        setattr(self, name, value)

    def set_hparam(self, name, value):
        if name not in self._types:
            raise ValueError("Unknown hyperparameter: %s" % name)
        ptype = self._types[name]
        if self._list[name]:
            if not isinstance(value, (list, tuple)):
                value = [value]
            value = [_cast(v, ptype, name) for v in value]
        else:
            if isinstance(value, (list, tuple)):
                raise ValueError(
                    "Must not pass a list for single-valued parameter: %s"
                    % name)
            # dict values (e.g. lr_schedule_kwargs) pass through
            if ptype is not dict:
                value = _cast(value, ptype, name)
        setattr(self, name, value)

    def del_hparam(self, name):
        if name in self._types:
            delattr(self, name)
            del self._types[name]
            del self._list[name]

    def parse(self, values):
        """Override from a 'name=value,name=[v1,v2]' string."""
        if not values:
            return self
        pos = 0
        results = {}
        while pos < len(values):
            m = _PARAM_RE.match(values, pos)
            if not m:
                raise ValueError(
                    "Malformed hyperparameter value: %s" % values[pos:])
            pos = m.end()
            name = m.group("name")
            if m.group("vals") is not None:
                results[name] = [v.strip()
                                 for v in m.group("vals").split(",") if v.strip()]
            else:
                results[name] = m.group("val").strip()
        return self.override_from_dict(results)

    def parse_json(self, values_json):
        return self.override_from_dict(json.loads(values_json))

    def override_from_dict(self, values_dict):
        for name, value in values_dict.items():
            self.set_hparam(name, value)
        return self

    def values(self):
        return {n: getattr(self, n) for n in self._types}

    def get(self, name, default=None):
        if name in self._types:
            return getattr(self, name)
        return default

    def __contains__(self, name):
        return name in self._types

    def to_json(self, indent=None, separators=None, sort_keys=False):
        return json.dumps(self.values(), indent=indent,
                          separators=separators, sort_keys=sort_keys)

    def __str__(self):
        return str(sorted(self.values().items()))
