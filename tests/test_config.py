import pytest

import pecos_tpu
from pecos_tpu.xmc import MLModel


def test_params_roundtrip():
    p = MLModel.TrainParams(Cp=2.0, threshold=0.05)
    d = p.to_dict()
    assert d["Cp"] == 2.0
    assert "__meta__" in d
    p2 = pecos_tpu.BaseParams.from_dict(d)
    assert isinstance(p2, MLModel.TrainParams)
    assert p2.Cp == 2.0 and p2.threshold == 0.05


def test_params_json_polymorphic():
    p = MLModel.PredParams(only_topk=7, post_processor="sigmoid")
    s = p.to_json()
    p2 = pecos_tpu.BaseParams.from_json(s)
    assert isinstance(p2, MLModel.PredParams)
    assert p2.only_topk == 7
    assert p2.post_processor == "sigmoid"


def test_unknown_field_raises():
    with pytest.raises(ValueError):
        MLModel.TrainParams.from_dict({"nonexistent_field": 1})


def test_override_with_kwargs():
    p = MLModel.PredParams()
    p.override_with_kwargs({"only_topk": 3, "ignored": 9, "post_processor": None})
    assert p.only_topk == 3
    assert p.post_processor == "l3-hinge"
