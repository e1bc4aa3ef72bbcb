"""PECOS-TPU: TPU-native extreme multi-label classification and retrieval.

A from-scratch rebuild of the capabilities of amzn/pecos (reference:
/root/reference) designed TPU-first on JAX/XLA/Pallas/pjit:

- ``pecos_tpu.xmc``      — XR-Linear: hierarchical label trees, batched linear
  solvers on the MXU, beam-search inference as masked block matmuls.
- ``pecos_tpu.ann``      — ANN: padded fixed-degree HNSW graphs with batched
  distance kernels, PairwiseANN, PQ4 LUT scoring.
- ``pecos_tpu.utils``    — sparse-matrix toolkit, cluster chains, featurization,
  metrics.
- ``pecos_tpu.parallel`` — device-mesh sharding helpers and a host-level
  comm layer (DistComm-shaped) for multi-host tree-partitioned builds.

Config-system parity notes (reference: pecos/__init__.py:21-100): every model
class derives from :class:`BaseClass` whose nested ``TrainParams``/``PredParams``
dataclasses derive from :class:`BaseParams`.  Params round-trip through JSON
with an embedded ``__meta__.class_fullname`` so that polymorphic configs can be
reconstructed without knowing the concrete class up front.
"""

from __future__ import annotations

import copy
import dataclasses as dc
import json
from typing import Any, Dict, Optional, Type

__version__ = "0.1.0"


class _ClassRegistry(type):
    """Metaclass registering every BaseClass/BaseParams subclass by full name.

    Mirrors the behavior of the reference's MetaClass registry
    (pecos/__init__.py:21-38) so that ``__meta__.class_fullname`` strings in
    saved JSON params can be resolved back to classes.
    """

    _registry: Dict[str, type] = {}

    def __new__(mcs, name, bases, namespace):
        cls = super().__new__(mcs, name, bases, namespace)
        fullname = f"{cls.__module__}###{cls.__qualname__}"
        _ClassRegistry._registry[fullname] = cls
        return cls

    @staticmethod
    def lookup(fullname: str) -> type:
        try:
            return _ClassRegistry._registry[fullname]
        except KeyError:
            # Attempt to import the defining module, then retry.
            mod = fullname.split("###", 1)[0]
            __import__(mod)
            return _ClassRegistry._registry[fullname]


def class_fullname(cls: type) -> str:
    return f"{cls.__module__}###{cls.__qualname__}"


class BaseParams(metaclass=_ClassRegistry):
    """Base for all (dataclass) parameter containers.

    Subclasses are expected to be ``@dataclasses.dataclass`` types.  Provides
    recursive ``from_dict``/``to_dict`` with polymorphic ``__meta__`` blocks,
    matching the reference semantics (pecos/__init__.py:40-100).
    """

    @classmethod
    def from_dict(cls, param: Optional[Dict[str, Any]] = None, recursive: bool = True):
        if param is None:
            return cls()
        if isinstance(param, cls):
            return copy.deepcopy(param)
        if not isinstance(param, dict):
            raise ValueError(f"expect param to be {cls} or dict, got {type(param)}")
        meta = param.get("__meta__", None)
        target_cls: Type[BaseParams] = cls
        if meta and "class_fullname" in meta:
            target_cls = _ClassRegistry.lookup(meta["class_fullname"])  # type: ignore[assignment]
            if not issubclass(target_cls, cls):
                raise ValueError(
                    f"params __meta__ says {target_cls}, which is not a subclass of {cls}"
                )
        field_types = {f.name: f.type for f in dc.fields(target_cls)}  # type: ignore[arg-type]
        kwargs: Dict[str, Any] = {}
        for key, val in param.items():
            if key == "__meta__":
                continue
            if key not in field_types:
                raise ValueError(f"unknown param field {key!r} for {target_cls}")
            kwargs[key] = val
        obj = target_cls(**kwargs)
        if recursive:
            for f in dc.fields(obj):  # type: ignore[arg-type]
                v = getattr(obj, f.name)
                if isinstance(v, dict) and "__meta__" in v:
                    sub_cls = _ClassRegistry.lookup(v["__meta__"]["class_fullname"])
                    setattr(obj, f.name, sub_cls.from_dict(v))
        return obj

    def to_dict(self, with_meta: bool = True) -> Dict[str, Any]:
        d: Dict[str, Any] = {}
        for f in dc.fields(self):  # type: ignore[arg-type]
            v = getattr(self, f.name)
            if isinstance(v, BaseParams):
                d[f.name] = v.to_dict(with_meta=with_meta)
            elif isinstance(v, (list, tuple)):
                d[f.name] = [
                    x.to_dict(with_meta=with_meta) if isinstance(x, BaseParams) else x
                    for x in v
                ]
                if isinstance(v, tuple):
                    d[f.name] = d[f.name]
            else:
                d[f.name] = copy.deepcopy(v)
        if with_meta:
            d["__meta__"] = {"class_fullname": class_fullname(type(self))}
        return d

    def to_json(self, with_meta: bool = True, indent: int = 2) -> str:
        return json.dumps(self.to_dict(with_meta=with_meta), indent=indent)

    @classmethod
    def from_json(cls, s: str):
        return cls.from_dict(json.loads(s))

    def override_with_kwargs(self, pred_kwargs: Optional[Dict[str, Any]]):
        """In-place override of fields from a plain kwargs dict (ignores None).

        Mirrors reference runtime-override idiom (pecos/xmc/base.py:1140-1173).
        """
        if pred_kwargs is not None:
            if not isinstance(pred_kwargs, dict):
                raise ValueError("pred_kwargs should be a dict")
            names = {f.name for f in dc.fields(self)}  # type: ignore[arg-type]
            for k, v in pred_kwargs.items():
                if k in names and v is not None:
                    setattr(self, k, v)
        return self


class BaseClass(metaclass=_ClassRegistry):
    """Base for all model classes; pairs with nested TrainParams/PredParams."""

    @classmethod
    def append_meta(cls, d: Dict[str, Any]) -> Dict[str, Any]:
        d = dict(d)
        d["__meta__"] = {"class_fullname": class_fullname(cls)}
        return d


# -- process-level runtime tuning (idempotent, opt-out via env) --------------
# 1. malloc: keep freed large blocks in-heap — first-touch page faults on the
#    target VMs cost ~250 us/page, so buffer reuse is a >100x win for the
#    host-side pipelines (see utils/jax_util.tune_host_allocator).
# 2. persistent XLA compilation cache: remote TPU compiles cost minutes; a
#    cache hit loads in seconds.  Respects any user-configured cache dir.
from pecos_tpu.utils import jax_util as _jax_util  # noqa: E402

_jax_util.tune_host_allocator()
try:
    _jax_util.enable_compilation_cache()
except Exception:  # pragma: no cover - jax unavailable/misconfigured
    pass
