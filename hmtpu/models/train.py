"""NN-FME training loop (JAX re-implementation of NN_training.ipynb:
FastAI 0.7 tabular learner, cells 3-18 — embeddings + BN + dropout,
49-way softmax, Adam, lr 3e-3, bs 1024).

Dataset rows follow the SSE.csv schema emitted by the encoder's
extraction mode (TEncSearch.cpp:4561-4582): 9 costs, Height, Width,
ground-truth class from the standard fractional search.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hmtpu.models.nnfme import NnFmeParams, forward, init_random


class TrainState(NamedTuple):
    params: NnFmeParams
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(lr: float = 3e-3):
    return optax.adam(lr)


def init_train_state(key: jax.Array, lr: float = 3e-3) -> TrainState:
    params = init_random(key)
    opt = make_optimizer(lr)
    return TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))


def loss_fn(params: NnFmeParams, costs9, heights, widths, labels,
            dropout_key=None, dropout_rates=(0.001, 0.01)):
    logits = forward(params, costs9, heights, widths)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    acc = (jnp.argmax(logits, -1) == labels).mean()
    return ce.mean(), acc


@partial(jax.jit, static_argnames=("lr",))
def train_step(state: TrainState, costs9, heights, widths, labels,
               lr: float = 3e-3):
    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, costs9, heights, widths, labels)
    updates, opt_state = make_optimizer(lr).update(grads, state.opt_state,
                                                   state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), loss, acc


def standardize_fit(costs9: np.ndarray):
    """Per-feature mean/std (the notebook's sklearn mapper export)."""
    return costs9.mean(axis=0), costs9.std(axis=0) + 1e-8


def train(costs9: np.ndarray, heights: np.ndarray, widths: np.ndarray,
          labels: np.ndarray, epochs: int = 200, batch_size: int = 1024,
          lr: float = 3e-3, val_split: float = 0.2, seed: int = 0,
          log_every: int = 0):
    """Returns (params with fitted mean/std folded in, val accuracy)."""
    rng = np.random.RandomState(seed)
    n = len(labels)
    perm = rng.permutation(n)
    n_val = max(1, int(n * val_split))
    vi, ti = perm[:n_val], perm[n_val:]
    mean, std = standardize_fit(costs9[ti])

    state = init_train_state(jax.random.PRNGKey(seed), lr)
    state = state._replace(params=state.params._replace(
        mean=jnp.asarray(mean, jnp.float32), std=jnp.asarray(std, jnp.float32)))

    c9 = jnp.asarray(costs9, jnp.float32)
    hh = jnp.asarray(heights, jnp.int32)
    ww = jnp.asarray(widths, jnp.int32)
    ll = jnp.asarray(labels, jnp.int32)
    for ep in range(epochs):
        order = rng.permutation(ti)
        for s in range(0, len(order), batch_size):
            b = order[s:s + batch_size]
            state, loss, acc = train_step(state, c9[b], hh[b], ww[b], ll[b],
                                          lr=lr)
        if log_every and (ep + 1) % log_every == 0:
            _, vacc = loss_fn(state.params, c9[vi], hh[vi], ww[vi], ll[vi])
            print(f"epoch {ep + 1}: val acc {float(vacc):.4f}")
    _, vacc = loss_fn(state.params, c9[vi], hh[vi], ww[vi], ll[vi])
    return state.params, float(vacc)
