"""NN-FME: the per-QP MLP that replaces DCT-IF fractional-pel motion
search (the fork's headline contribution).

Behavioural parity with NN_pred() at TEncSearch.cpp:85-204 and the
per-QP Eigen weight blocks at TEncSearch.cpp:470-1075, re-designed
TPU-first: instead of one 17-feature MLP call per PU inside the ME
recursion, we run the whole PU population of a frame (or GOP) through
one fused matmul stack — (B,17) x (17->22->20->49) is an ideal MXU
shape when B is thousands.

Weights load from the reference's exported-CSV format
(DL/blowing/<qp>/*.csv, produced by DL/edit.sh) or from our own trainer
(models/train.py); a deterministic random init covers tests.

Architecture (TEncSearch.cpp:85-131):
  x = (costs9 - mean) / std * bn_gamma_in
  e0 = emb_h[row(height)], e1 = emb_w[row(width)]     (8x4 tables)
  h1 = relu(W1 @ [e0,e1,x] + b1) * g1 + beta1          (22)
  h2 = relu(W2 @ h1 + b2) * g2 + beta2                 (20)
  logits = W3 @ h2 + b3                                (49)
  class -> quarter-pel offsets: qx = cls%7-3, qy = cls//7-3
Cost stencil order: [TL, T, TR, L, C, R, BL, B, BR].
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class NnFmeParams(NamedTuple):
    emb_h: jax.Array      # (8, 4)
    emb_w: jax.Array      # (8, 4)
    w1: jax.Array         # (22, 17)
    b1: jax.Array         # (22,)
    g1: jax.Array         # (22,)
    beta1: jax.Array      # (22,)
    w2: jax.Array         # (20, 22)
    b2: jax.Array         # (20,)
    g2: jax.Array         # (20,)
    beta2: jax.Array      # (20,)
    w3: jax.Array         # (49, 20)
    b3: jax.Array         # (49,)
    gin: jax.Array        # (9,) input BN scale
    mean: jax.Array       # (9,)
    std: jax.Array        # (9,)


# size -> embedding row; the height table's 16-before-12 quirk is the
# reference's (TEncSearch.cpp:93-113) and must be preserved for parity
_H_ROWS = {4: 1, 8: 2, 16: 3, 12: 4, 24: 5, 32: 6, 64: 7}
_W_ROWS = {4: 1, 8: 2, 12: 3, 16: 4, 24: 5, 32: 6, 64: 7}
_SIZE_LUT_H = np.zeros(65, dtype=np.int32)
_SIZE_LUT_W = np.zeros(65, dtype=np.int32)
for _s, _r in _H_ROWS.items():
    _SIZE_LUT_H[_s] = _r
for _s, _r in _W_ROWS.items():
    _SIZE_LUT_W[_s] = _r


def _read_csv(path: str) -> np.ndarray:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip().rstrip(";").rstrip(",")
            if not line:
                continue
            rows.append([float(v) for v in line.split(",") if v.strip()])
    return np.array(rows, dtype=np.float32)


def load_reference_csv(dirpath: str) -> NnFmeParams:
    """Load the DL/edit.sh CSV export layout (e.g.
    /root/reference/DL/blowing/27)."""
    qp = os.path.basename(dirpath.rstrip("/"))
    f = lambda name: _read_csv(os.path.join(dirpath, name))
    mapper = f(f"14.mapper_{qp}.csv")
    return NnFmeParams(
        emb_h=jnp.asarray(f("1.emb0-weight.csv")),
        emb_w=jnp.asarray(f("2.emb1-weight.csv")),
        w1=jnp.asarray(f("3.lins0-weight.csv")),
        b1=jnp.asarray(f("6.lins0-bias.csv")).reshape(-1),
        g1=jnp.asarray(f("10.bns0-weight.csv")).reshape(-1),
        beta1=jnp.asarray(f("12.bns0-bias.csv")).reshape(-1),
        w2=jnp.asarray(f("4.lins1-weight.csv")),
        b2=jnp.asarray(f("7.lins1-bias.csv")).reshape(-1),
        g2=jnp.asarray(f("11.bns1-weight.csv")).reshape(-1),
        beta2=jnp.asarray(f("13.bns1-bias.csv")).reshape(-1),
        w3=jnp.asarray(f("5.outp-weight.csv")),
        b3=jnp.asarray(f("8.outp-bias.csv")).reshape(-1),
        gin=jnp.asarray(f("9.bn-weight.csv")).reshape(-1),
        mean=jnp.asarray(mapper[0]),
        std=jnp.asarray(mapper[1]),
    )


def save_npz(path: str, params: NnFmeParams) -> None:
    np.savez(path, **{k: np.asarray(v)
                      for k, v in params._asdict().items()})


def load_npz(path: str) -> NnFmeParams:
    with np.load(path) as z:
        return NnFmeParams(**{k: jnp.asarray(z[k])
                              for k in NnFmeParams._fields})


def init_random(key: jax.Array) -> NnFmeParams:
    ks = jax.random.split(key, 8)
    g = jax.nn.initializers.glorot_uniform()
    return NnFmeParams(
        emb_h=jax.random.normal(ks[0], (8, 4)) * 0.1,
        emb_w=jax.random.normal(ks[1], (8, 4)) * 0.1,
        w1=g(ks[2], (22, 17)), b1=jnp.zeros(22),
        g1=jnp.ones(22), beta1=jnp.zeros(22),
        w2=g(ks[3], (20, 22)), b2=jnp.zeros(20),
        g2=jnp.ones(20), beta2=jnp.zeros(20),
        w3=g(ks[4], (49, 20)), b3=jnp.zeros(49),
        gin=jnp.ones(9),
        mean=jnp.full(9, 5e4), std=jnp.full(9, 1.5e5),
    )


def forward(params: NnFmeParams, costs9: jax.Array, heights: jax.Array,
            widths: jax.Array) -> jax.Array:
    """(B,9) float costs [TL,T,TR,L,C,R,BL,B,BR], (B,) pel sizes ->
    (B,49) logits.  One fused matmul stack for the whole PU batch."""
    x = (costs9 - params.mean) / params.std * params.gin
    e0 = params.emb_h[jnp.asarray(_SIZE_LUT_H)[heights]]
    e1 = params.emb_w[jnp.asarray(_SIZE_LUT_W)[widths]]
    feat = jnp.concatenate([e0, e1, x], axis=-1)          # (B,17)
    h1 = jnp.maximum(feat @ params.w1.T + params.b1, 0.0)
    h1 = h1 * params.g1 + params.beta1
    h2 = jnp.maximum(h1 @ params.w2.T + params.b2, 0.0)
    h2 = h2 * params.g2 + params.beta2
    return h2 @ params.w3.T + params.b3


@jax.jit
def predict_offsets(params: NnFmeParams, costs9: jax.Array,
                    heights: jax.Array, widths: jax.Array):
    """-> (classes (B,), qpel offsets (B,2) [x,y] in quarter-pel)."""
    logits = forward(params, costs9, heights, widths)
    cls = jnp.argmax(logits, axis=-1)
    qx = cls % 7 - 3
    qy = cls // 7 - 3
    return cls, jnp.stack([qx, qy], axis=-1).astype(jnp.int32)


def class_of_offsets(qx: np.ndarray, qy: np.ndarray) -> np.ndarray:
    """Ground-truth class from true fractional MV (dataset extraction,
    inverse of the 49-case switch)."""
    return (qy + 3) * 7 + (qx + 3)
