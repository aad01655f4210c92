"""Segment-parallel encoding: the encoder's primary scale-out axis
(SURVEY.md 2.4 — GOP/frame parallelism over hosts/chips).

The sequence is split into closed segments, each beginning with an IDR
so segments share no reference pictures.  Each segment is encoded by
its own Encoder with its device work pinned to one device of the local
mesh (jax.default_device), and segments run on host threads so device
dispatch overlaps.  Bitstreams concatenate into one conformant stream
(each segment re-emits parameter sets; HEVC decoders re-activate them
at every IDR).

On a multi-host deployment the same structure shards segments over
hosts (DCN ships the input frames; no cross-segment state exists).
"""
from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import replace


def split_segments(n_frames: int, n_segments: int) -> list[range]:
    """Contiguous near-equal frame ranges, one per segment."""
    n_segments = max(1, min(n_segments, n_frames))
    base = n_frames // n_segments
    rem = n_frames % n_segments
    out, start = [], 0
    for i in range(n_segments):
        ln = base + (1 if i < rem else 0)
        out.append(range(start, start + ln))
        start += ln
    return out


def encode_parallel_segments(frames, cfg, n_segments: int | None = None):
    """Encode `frames` as independent segments in parallel.

    Returns (bytes, list[Encoder]) — the concatenated bitstream and the
    per-segment encoders (for stats).  With one device this degrades to
    sequential encoding of independent segments."""
    import jax

    from hmtpu.encoder.top import Encoder

    devices = jax.devices()
    if n_segments is None:
        n_segments = len(devices)
    segs = split_segments(len(frames), n_segments)

    def encode_one(i: int):
        dev = devices[i % len(devices)]
        enc = Encoder(replace(cfg))
        with jax.default_device(dev):
            bs = enc.encode_sequence([frames[k] for k in segs[i]])
        return bs, enc

    with ThreadPoolExecutor(max_workers=len(segs)) as pool:
        results = list(pool.map(encode_one, range(len(segs))))
    stream = b"".join(bs for bs, _ in results)
    return stream, [enc for _, enc in results]
