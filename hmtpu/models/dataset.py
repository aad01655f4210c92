"""NN-FME dataset extraction: the training-data half of the fork's
offline loop.

Capability parity with the reference's commented-out extraction block
(TEncSearch.cpp:4561-4582 writing SSE.csv: 9 integer-ME costs, PU
Height/Width, ground-truth class from the standard DCT-IF fractional
search) and DL/Extract_data.sh (per-QP loop).  TPU-native shape: the
batched integer ME already produces every PU's 3x3 cost stencil in one
tensor, and the ground truth comes from the batched DCT-IF refinement
(search/me.py frac_refine_batch) over the same population — no
per-PU hooks, one pass per frame.
"""
from __future__ import annotations

import numpy as np

from hmtpu.io.yuv import Frame
from hmtpu.models.nnfme import class_of_offsets


def extract_frame_records(frame: Frame, ref: Frame, qp: int,
                          search_range: int = 16, bd: int = 8):
    """One P frame -> (costs9 (B,9), heights (B,), widths (B,),
    labels (B,)).  Stencil order [TL,T,TR,L,C,R,BL,B,BR]
    (TEncSearch.cpp:88)."""
    import jax.numpy as jnp

    from hmtpu.search.me import frac_refine_batch, integer_me

    h, w = frame.y.shape
    lam_sqrt = np.sqrt(0.57 * 2.0 ** ((qp - 12) / 3.0))
    org = jnp.asarray(frame.y.astype(np.int32))
    refy = jnp.asarray(ref.y.astype(np.int32))
    zeros = jnp.zeros((h // 8, w // 8), jnp.int32)
    (mvx, mvy), stencil, _ = integer_me(refy, org, 8, search_range,
                                        jnp.float32(lam_sqrt), zeros, zeros)

    by, bx = h // 8, w // 8
    ys, xs = np.mgrid[0:by, 0:bx] * 8
    org_blocks = frame.y.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) \
        .reshape(-1, 8, 8).astype(np.int32)
    mvq_x, mvq_y = frac_refine_batch(
        refy, jnp.asarray(xs.reshape(-1)), jnp.asarray(ys.reshape(-1)),
        jnp.asarray(org_blocks), jnp.asarray(mvx).reshape(-1),
        jnp.asarray(mvy).reshape(-1), 8, bd)

    qx = np.asarray(mvq_x) - np.asarray(mvx).reshape(-1) * 4
    qy = np.asarray(mvq_y) - np.asarray(mvy).reshape(-1) * 4
    labels = class_of_offsets(qx, qy)
    costs9 = np.asarray(stencil).reshape(-1, 9).astype(np.float32)
    n = costs9.shape[0]
    sizes = np.full(n, 8, np.int32)
    return costs9, sizes, sizes, labels.astype(np.int32)


def extract_clip(frames: list[Frame], qp: int, search_range: int = 16,
                 bd: int = 8):
    """IPPP extraction over a clip: each frame predicts from the
    previous original (matching the extraction encoder's low-delay use;
    recon/original difference is below the label noise floor)."""
    cs, hs, ws, ls = [], [], [], []
    for i in range(1, len(frames)):
        c, hh, ww, ll = extract_frame_records(frames[i], frames[i - 1],
                                              qp, search_range, bd)
        cs.append(c), hs.append(hh), ws.append(ww), ls.append(ll)
    return (np.concatenate(cs), np.concatenate(hs),
            np.concatenate(ws), np.concatenate(ls))


# -- SSE.csv format parity (DL/Extract_data.sh renames per QP) -------------

_HEADER = ("TL,T,TR,L,C,R,BL,B,BR,Height,Width,class")


def write_sse_csv(path: str, costs9, heights, widths, labels) -> None:
    rows = np.column_stack([costs9, heights, widths, labels])
    np.savetxt(path, rows, delimiter=",", header=_HEADER, comments="",
               fmt=["%.0f"] * 9 + ["%d"] * 3)


def read_sse_csv(path: str):
    data = np.loadtxt(path, delimiter=",", skiprows=1)
    data = np.atleast_2d(data)
    return (data[:, :9].astype(np.float32), data[:, 9].astype(np.int32),
            data[:, 10].astype(np.int32), data[:, 11].astype(np.int32))
