"""Model-family registry.

Replaces the reference's import-by-dotted-path mechanism
(main.py:558-563, ``model: model.shift_gcn.Model``) with an explicit
registry: each family provides ``build_config(model_args)``,
``init(key, config)`` and ``apply(params, state, x, config, ...)``.
Reference dotted paths alias to the shift_gcn family so reference YAML
configs work unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple

from shift_gcn_tpu.graphs import get_graph
from shift_gcn_tpu.models import ring_gnn, shift_gcn, stgcn


class ModelFamily(NamedTuple):
    name: str
    build_config: Callable[[Dict[str, Any]], Any]
    init: Callable[..., Any]
    apply: Callable[..., Any]


def _stgcn_config(model_args: Dict[str, Any]):
    graph = get_graph(model_args.get("graph", "ntu_rgb_d"))
    kwargs = {}
    for key in ("channels", "strides"):
        if key in model_args:
            kwargs[key] = tuple(model_args[key])
    return stgcn.STGCNConfig(
        num_class=model_args.get("num_class", 60),
        num_point=model_args.get("num_point", graph.num_nodes),
        num_person=model_args.get("num_person", 2),
        graph=graph.name,
        in_channels=model_args.get("in_channels", 3),
        adaptive=model_args.get("adaptive", True),
        adaptive_embed=model_args.get("adaptive_embed", 0),
        **kwargs,
    )


_REGISTRY: Dict[str, ModelFamily] = {}


def register_model(family: ModelFamily) -> None:
    _REGISTRY[family.name] = family


register_model(ModelFamily(
    name="shift_gcn",
    build_config=shift_gcn.config_from_reference_args,
    init=shift_gcn.init_params,
    apply=shift_gcn.apply,
))
register_model(ModelFamily(
    name="stgcn",
    build_config=_stgcn_config,
    init=stgcn.init_params,
    apply=stgcn.apply,
))
register_model(ModelFamily(
    name="ring_gnn",
    build_config=ring_gnn.config_from_args,
    init=ring_gnn.init_params,
    apply=ring_gnn.apply,
))

_ALIASES = {
    "model.shift_gcn.Model": "shift_gcn",
    "shift_gcn_tpu.models.shift_gcn": "shift_gcn",
    "shift_gcn_tpu.models.stgcn": "stgcn",
    "shift_gcn_tpu.models.ring_gnn": "ring_gnn",
    "agcn": "stgcn",
}


def get_model(name: str) -> ModelFamily:
    key = _ALIASES.get(name, name)
    if key not in _REGISTRY:
        raise KeyError(
            f"unknown model family {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[key]
