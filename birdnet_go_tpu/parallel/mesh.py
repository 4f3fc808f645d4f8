"""Mesh construction and parameter sharding rules."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data_axis: int | None = None,
              model_axis: int | None = None) -> Mesh:
    """Build a ("data", "model") mesh over the first n_devices devices.

    Default split: the model axis gets the largest power-of-two ≤ 2 that
    divides the device count (classifier heads are small; most capacity goes
    to the data/stream axis).
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} visible")
        devices = devices[:n_devices]
    n = len(devices)
    if model_axis is None:
        model_axis = 2 if n % 2 == 0 and n >= 2 else 1
    if data_axis is None:
        data_axis = n // model_axis
    if data_axis * model_axis != n:
        raise ValueError(f"mesh {data_axis}x{model_axis} != {n} devices")
    arr = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (stream batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _pspec_for_param(path: str, leaf) -> P:
    """Sharding rule for one parameter tensor.

    The classifier head (name contains "classifier" or is the bat regional
    "head") is tensor-parallel over its output/species axis; everything else
    (convs, BN, small denses) is replicated — at these sizes replication
    beats the collective traffic sharding would add.
    """
    is_head = ("classifier" in path) or path.endswith("head/w") \
        or path.endswith("head/b")
    if is_head and hasattr(leaf, "ndim"):
        if leaf.ndim == 2:     # dense kernel [in, species]
            return P(None, "model")
        if leaf.ndim == 1:     # dense bias [species]
            return P("model")
    return P()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_pspec_tree(params: Any) -> Any:
    """PartitionSpec pytree matching `params` (head → tp, rest replicated)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _pspec_for_param(_path_str(path), leaf), params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree on the mesh per the sharding rules."""
    specs = param_pspec_tree(params)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs)
