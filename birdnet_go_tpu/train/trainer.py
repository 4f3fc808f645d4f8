"""Training step for classifier models (multi-label sigmoid objective).

Bioacoustic classifiers are multi-label (overlapping vocalizations), trained
with per-species sigmoid binary cross-entropy — the reference consumes such
models (sigmoid confidences, analyze.go:115); training custom classifiers is
the capability behind its CustomClassifier backends.

The step is a pure function jitted over a ("data", "model") mesh: batch
sharded over "data", classifier-head params over "model"; XLA inserts the
psum for gradient reduction — no hand-written collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def multilabel_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean sigmoid binary cross-entropy over [B, S] logits/labels."""
    return optax.sigmoid_binary_cross_entropy(logits, labels).mean()


def make_train_step(apply_fn: Callable, optimizer: optax.GradientTransformation,
                    train: bool = True):
    """Build a pure train_step(state, pcm, labels) -> (state, metrics).

    `apply_fn(params, pcm, train)` must return {"logits": [B, S], ...}.
    """

    def loss_fn(params, pcm, labels):
        out = apply_fn(params, pcm, train)
        loss = multilabel_loss(out["logits"], labels)
        return loss, out["logits"]

    def train_step(state: TrainState, pcm: jnp.ndarray, labels: jnp.ndarray):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, pcm, labels)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "mean_confidence": jnp.mean(jax.nn.sigmoid(logits)),
        }
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def init_train_state(params, optimizer: optax.GradientTransformation
                     ) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def make_eval_step(apply_fn: Callable) -> Callable:
    """Jittable evaluation: top-1 accuracy + mean multilabel loss over a
    batch (custom-classifier validation — the reference consumes such
    classifiers but trains them externally; here training AND validation
    are on-device)."""

    def eval_step(params, pcm: jnp.ndarray, labels: jnp.ndarray):
        out = apply_fn(params, pcm, train=False)
        logits = out["logits"] if isinstance(out, dict) else out
        top1 = jnp.argmax(logits, axis=-1) == jnp.argmax(labels, axis=-1)
        return {"accuracy": jnp.mean(top1.astype(jnp.float32)),
                "loss": multilabel_loss(logits, labels)}

    return eval_step


def evaluate(eval_step: Callable, params, dataset,
             batch_size: int = 64) -> dict[str, float]:
    """Run eval_step over every full batch of a WindowDataset."""
    import numpy as np

    accs, losses, n = [], [], 0
    for pcm, labels in dataset.batches(batch_size, epochs=1):
        m = eval_step(params, jnp.asarray(pcm), jnp.asarray(labels))
        accs.append(float(m["accuracy"]) * len(pcm))
        losses.append(float(m["loss"]) * len(pcm))
        n += len(pcm)
    if n == 0:
        return {"accuracy": float("nan"), "loss": float("nan"), "n": 0}
    return {"accuracy": sum(accs) / n, "loss": sum(losses) / n, "n": n}


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[])
