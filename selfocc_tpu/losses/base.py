"""Loss registry + base class (behavioral rewrite of ``loss/base_loss.py`` and
``loss/__init__.py``'s ``OPENOCC_LOSS`` registry, without mm globals).

Losses are pure callables ``loss(inputs: dict) -> scalar`` usable inside
``jax.jit``; the ``input_dict`` remapping mirrors the reference so config
recipes translate one-to-one.
"""
from __future__ import annotations

from typing import Callable, Dict

OPENOCC_LOSS: Dict[str, Callable] = {}


def register(cls):
    OPENOCC_LOSS[cls.__name__] = cls
    return cls


def build_loss(cfg: dict):
    cfg = dict(cfg)
    name = cfg.pop("type")
    return OPENOCC_LOSS[name](**cfg)


class BaseLoss:
    """Remaps ``inputs`` through ``input_dict`` then calls ``loss_func``
    (reference ``base_loss.py:8-39``)."""

    def __init__(self, weight=1.0, input_dict=None, **kwargs):
        self.weight = weight
        self.input_dict = input_dict or {"input": "input"}

    def loss_func(self, **kwargs):  # pragma: no cover - overridden
        raise NotImplementedError

    def __call__(self, inputs):
        actual = {k: inputs[v] for k, v in self.input_dict.items()}
        return self.weight * self.loss_func(**actual)


@register
class MultiLoss:
    """Weighted sum container (reference ``loss/multi_loss.py:10-44``).

    Returns ``(total, per_loss_dict)``; per-loss scalars are traced values the
    train driver logs after ``device_get``.
    """

    def __init__(self, loss_cfgs):
        assert isinstance(loss_cfgs, (list, tuple))
        self.losses = [build_loss(c) for c in loss_cfgs]

    def __call__(self, inputs):
        tot = 0.0
        loss_dict = {}
        for fn in self.losses:
            val = fn(inputs)
            tot = tot + val
            loss_dict[type(fn).__name__] = val
        return tot, loss_dict
