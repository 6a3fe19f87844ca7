"""Network registry. Mirrors the reference ``models/networks/__init__.py:9-51``
``network_dict`` + ``make_model`` public surface; entries are registered by
each network module at import time via ``register``."""
from __future__ import annotations

network_dict: dict = {}


def register(name: str):
    def deco(ctor):
        network_dict[name] = ctor
        return ctor

    return deco


def make_model(model_cfg):
    """Instantiate a network by registry name (reference
    models/networks/__init__.py:48-51)."""
    _load_all()
    name = model_cfg["name"] if isinstance(model_cfg, dict) else model_cfg.name
    params = model_cfg["params"] if isinstance(model_cfg, dict) else model_cfg.params
    return network_dict[name](**dict(params))


_LOADED = False


def _load_all():
    """Import all network modules so their registry entries exist."""
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    import importlib

    for mod in (
        "unet",
        "vq_unet",
        "deeplabv3",
        "fcn",
        "semiweednet",
        "vqseghead",
        "vqvae",
        "ablation",
    ):
        importlib.import_module(f"vq_seg_tpu.models.networks.{mod}")
