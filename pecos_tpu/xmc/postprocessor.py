"""Beam-search score post-processors.

Parity with the reference's Transform x Combiner registry
(pecos/xmc/base.py:241-485): names noop, sigmoid, log-sigmoid, l1..l4-hinge,
log-l1..l4-hinge.  Each post-processor is (transform, combiner, init) where
``init`` is the combiner's identity element used to seed the root of the beam
search (1.0 for multiplies, 0.0 for plus/noop).

Both numpy (host reference path) and jax.numpy (device path) callables are
provided; the device ones are pure functions safe under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, ClassVar, Dict, Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PostProcessor:
    name: str
    transform_np: Callable
    combiner_np: Callable
    transform_jnp: Callable
    combiner_jnp: Callable
    init_value: float

    _registry: ClassVar[Optional[Dict[str, "PostProcessor"]]] = None

    @classmethod
    def _build(cls) -> Dict[str, "PostProcessor"]:
        reg: Dict[str, PostProcessor] = {}

        def add(name, t_np, c_np, t_j, c_j, init):
            reg[name] = cls(name, t_np, c_np, t_j, c_j, init)

        ident = lambda v: v
        noopc = lambda x, y: x
        plus = lambda x, y: x + y
        mult = lambda x, y: x * y
        maxc = lambda x, y: np.maximum(x, y)

        add("noop", ident, noopc, ident, noopc, 0.0)
        add(
            "sigmoid",
            lambda v: 1.0 / (1.0 + np.exp(-v)),
            mult,
            lambda v: jnp.reciprocal(1.0 + jnp.exp(-v)),
            mult,
            1.0,
        )
        add(
            "log-sigmoid",
            lambda v: -np.log1p(np.exp(-v)),
            plus,
            lambda v: -jnp.log1p(jnp.exp(-v)),
            plus,
            0.0,
        )
        for p in range(1, 5):
            # log-lp-hinge(v) = -max(1 - v, 0)^p ; lp-hinge = exp(log-lp-hinge)
            def t_log_np(v, p=p):
                return -(np.maximum(1.0 - v, 0.0) ** p)

            def t_log_j(v, p=p):
                return -(jnp.maximum(1.0 - v, 0.0) ** p)

            def t_np(v, p=p):
                return np.exp(-(np.maximum(1.0 - v, 0.0) ** p))

            def t_j(v, p=p):
                return jnp.exp(-(jnp.maximum(1.0 - v, 0.0) ** p))

            add(f"l{p}-hinge", t_np, mult, t_j, mult, 1.0)
            add(f"log-l{p}-hinge", t_log_np, plus, t_log_j, plus, 0.0)
        return reg

    @classmethod
    def get(cls, name) -> "PostProcessor":
        if isinstance(name, cls):
            return name
        if cls._registry is None:
            cls._registry = cls._build()
        if name is None or name is False:
            name = "noop"
        elif name is True:
            name = "l3-hinge"
        if name not in cls._registry:
            raise ValueError(
                f"unknown post_processor {name!r}; valid: {sorted(cls._registry)}"
            )
        return cls._registry[name]

    @classmethod
    def valid_list(cls):
        if cls._registry is None:
            cls._registry = cls._build()
        return list(cls._registry.keys())
