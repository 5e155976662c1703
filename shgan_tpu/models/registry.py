"""Model registry: build models from config dicts, by the same type names
as the reference registry.

Reference: ``get_model`` / ``@register`` at
`/root/reference/lib/model_zoo/common/get_model.py:53-118`.  A model config
is ``{'type': <registered name>, 'args': {...}, 'pretrained': path|None}``;
nested sub-model configs (mapping/encoder/synthesis) appear as such dicts
inside ``args`` (comodgan.py:440-446 resolves them recursively).
"""

from __future__ import annotations

from .mapping import Mapping
from .synthesis import (StyleGANSynthesis, CoModSynthesis, CoModSynthesisPlur)
from .encoder import Encoder
from .discriminator import Discriminator
from .generator import StyleGANGenerator, CoModGANGenerator
from .shgan_encoder import ShganEncoder

MODEL_REGISTRY = {}


def register(name):
    def wrap(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return wrap


def _is_model_cfg(v):
    return isinstance(v, dict) and "type" in v


def get_model(cfg):
    """Instantiate a model (module object, not params) from a config dict."""
    if not _is_model_cfg(cfg):
        raise ValueError(f"not a model config: {cfg!r}")
    typ = cfg["type"]
    if typ not in MODEL_REGISTRY:
        raise KeyError(f"unknown model type {typ!r}; "
                       f"known: {sorted(MODEL_REGISTRY)}")
    args = dict(cfg.get("args") or {})
    # recursively build nested sub-models
    for k, v in list(args.items()):
        if _is_model_cfg(v):
            args[k] = get_model(v)
    return MODEL_REGISTRY[typ](**args)


@register("stylegan2_mapping")
@register("comodgan_mapping")
def _mapping(**kw):
    return Mapping(**kw)


@register("stylegan2_synthesis")
def _sg2_synthesis(**kw):
    return StyleGANSynthesis(**kw)


@register("comodgan_synthesis")
def _comod_synthesis(**kw):
    return CoModSynthesis(**kw)


@register("comodgan_synthesis_plur")
def _comod_synthesis_plur(**kw):
    return CoModSynthesisPlur(**kw)


@register("comodgan_encoder")
def _comod_encoder(**kw):
    return Encoder(**kw)


@register("shgan_encoder")
def _shgan_encoder(**kw):
    return ShganEncoder(**kw)


@register("stylegan2_discriminator")
@register("comodgan_discriminator")
def _discriminator(**kw):
    return Discriminator(**kw)


@register("stylegan2_generator")
def _sg2_generator(mapping, synthesis):
    return StyleGANGenerator(mapping, synthesis)


@register("comodgan_generator")
def _comod_generator(mapping, encoder, synthesis):
    return CoModGANGenerator(mapping, encoder, synthesis)
