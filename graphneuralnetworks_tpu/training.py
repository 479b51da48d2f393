"""Training utilities: pure-functional nnx train steps, losses, metrics.

The reference trains with Zygote + Flux.update!
(examples/node_classification_cora.jl:71-80). The TPU-native equivalent is a
jitted pure train step over the nnx (graphdef, params, rest) split — the same
function works under `jax.jit` single-chip and under `shard_map`/pjit on a
mesh (parallel/).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import nnx

__all__ = ["masked_cross_entropy", "masked_accuracy", "TrainState",
           "make_train_step"]


def masked_cross_entropy(logits, labels, mask):
    """Mean softmax cross-entropy over ``mask`` (counts true entries only)."""
    ls = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(ls, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    m = mask.astype(ls.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1)


def masked_accuracy(logits, labels, mask):
    pred = jnp.argmax(logits, -1)
    m = mask.astype(jnp.float32)
    return jnp.sum((pred == labels) * m) / jnp.maximum(jnp.sum(m), 1)


class TrainState:
    """Minimal functional train state around an nnx model + optax tx."""

    def __init__(self, model: nnx.Module, tx: optax.GradientTransformation):
        self.graphdef, self.params, self.rest = nnx.split(model, nnx.Param,
                                                          ...)
        self.tx = tx
        self.opt_state = tx.init(self.params)

    def model(self, params=None):
        return nnx.merge(self.graphdef, params if params is not None
                         else self.params, self.rest)


def make_train_step(state: TrainState, loss_fn: Callable, *,
                    donate: bool = True):
    """Build a jitted ``(params, opt_state, *batch) -> (params, opt_state,
    loss)`` step. ``loss_fn(model, *batch) -> scalar``.

    ``donate=True`` (default) donates the params/opt-state input buffers to
    the step so XLA updates them in place — no per-step re-allocation of
    the model+Adam state (2x params HBM at production sizes). Callers must
    not reuse the donated arrays after the call (rebind, as the usual
    ``params, opt_state, loss = step(params, opt_state, ...)`` does).
    """

    graphdef, rest, tx = state.graphdef, state.rest, state.tx

    @functools.partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, *batch):
        def lf(p):
            m = nnx.merge(graphdef, p, rest)
            return loss_fn(m, *batch)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
