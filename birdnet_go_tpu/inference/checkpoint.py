"""Param pytree persistence (orbax).

The reference persists model artifacts as .tflite/.onnx files installed by
the model manager (internal/classifier/model_manager.go); converted weights
live as orbax checkpoints here.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


def save_params(params: Any, path: str | Path) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str | Path, like: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like)
        return ckptr.restore(path, shapes)
    return ckptr.restore(path)
