"""Factory registry: ``eds.*`` pipe names -> Transformer factories.

Parity with the reference's catalogue registry
(edsnlp/core/registries.py:318-457): pipes are looked up by name and
instantiated from config.  Registration is a decorator; ``create`` builds
a pipe from (name, **config).
"""

from __future__ import annotations

from typing import Callable

_FACTORIES: dict[str, Callable] = {}


def register(name: str) -> Callable:
    def deco(fn: Callable) -> Callable:
        _FACTORIES[name] = fn
        return fn
    return deco


def create(name: str, **config):
    if name not in _FACTORIES:
        raise KeyError(
            f"unknown pipe '{name}'; known: {sorted(_FACTORIES)}"
        )
    pipe = _FACTORIES[name](**config)
    pipe.name = name
    return pipe


def available() -> list[str]:
    return sorted(_FACTORIES)
