"""Config system: JSON/YAML -> attribute-access dict, exact reference schema.

Accepts the reference's config files unchanged (see
``/root/reference/config/vqreptunet1x1v2.json`` and
``utils/load_config.py:5-13`` for the loader it replaces).  A ``Config`` is a
recursive attribute-access mapping (the reference used ``EasyDict``).
"""
from __future__ import annotations

import copy
import json
import os
from typing import Any, Mapping


class Config(dict):
    """Recursive attribute-access dict (drop-in for the reference's EasyDict)."""

    def __init__(self, d: Mapping[str, Any] | None = None, **kwargs):
        super().__init__()
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(v):
        if isinstance(v, Config):
            return v
        if isinstance(v, Mapping):
            return Config(v)
        if isinstance(v, (list, tuple)):
            return type(v)(Config._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, Config._wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __delattr__(self, k):
        try:
            del self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    def to_dict(self) -> dict:
        def unwrap(v):
            if isinstance(v, Config):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return type(v)(unwrap(x) for x in v)
            return v

        return unwrap(self)


def load_config(path: str) -> Config:
    """Load a config file (.json or .yaml/.yml) into a Config.

    Mirrors ``utils/load_config.py:5-23`` of the reference (JSON + YAML).
    """
    ext = os.path.splitext(path)[1].lower()
    with open(path, "r") as f:
        if ext == ".json":
            raw = json.load(f)
        elif ext in (".yaml", ".yml"):
            import yaml  # optional dep; present in most images

            raw = yaml.safe_load(f)
        else:
            raise ValueError(f"unsupported config extension: {ext}")
    return Config(raw)


# Back-compat alias matching the reference public name
# (`get_config_from_json`, utils/load_config.py:5).
get_config_from_json = load_config


def pixel_to_label_lut(pixel_to_label: Mapping[str, int], num_entries: int = 256):
    """Build a 256-entry grayscale-pixel -> class-id lookup table.

    The reference remaps mask pixel values {0:bg, 128:weed, 255:crop} with a
    chain of `torch.where` (utils/seg_tools.py:3-8); on TPU a LUT + take is a
    single gather.  Unlisted pixel values map to themselves (reference
    behaviour: values not in the dict are left unchanged).
    """
    import numpy as np

    lut = np.arange(num_entries, dtype=np.int32)
    for k, v in pixel_to_label.items():
        lut[int(k)] = int(v)
    return lut
