"""64x64 inter CUs with residual (four 32x32 TBs, split inferred —
H.265 7.3.8.8 interSplitFlag; reference: TEncCu.cpp:352 depth-0
xCompressCU + the TU recursion of TEncSearch.cpp:5273).

The encoder reaches depth-0 residual CUs by an entropy-level collapse
of uniform-motion CTUs (pframe_dev.finish collapse64_residual): the
reconstruction is untouched, only the syntax changes, so the streams
must round-trip through our decoder bit-exactly and through the HM
oracle when present."""
import os
import subprocess

import numpy as np
import pytest

from hmtpu.decoder.core import Decoder
from hmtpu.encoder import pframe_dev
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame

W, H = 128, 128          # two CTUs per axis


def _pan_clip(n, amp=8):
    """Global pan over a fine texture: uniform motion field with real
    residual energy — the collapse64 trigger case."""
    rng = np.random.default_rng(7)
    big = rng.integers(0, 256, (H + 64, W + 64)).astype(np.float64)
    # low-pass so prediction is good but not perfect
    for _ in range(2):
        big = (big + np.roll(big, 1, 0) + np.roll(big, 1, 1)
               + np.roll(big, 1, (0, 1))) / 4.0
    out = []
    for t in range(n):
        dx, dy = (t * 3) % amp, (t * 2) % amp
        y = big[dy:dy + H, dx:dx + W]
        u = y[::2, ::2] * 0.5 + 64
        v = y[::2, ::2] * 0.25 + 96
        out.append(Frame(y.astype(np.int32), u.astype(np.int32),
                         v.astype(np.int32)))
    return out


@pytest.fixture(scope="module")
def encoded():
    for k in pframe_dev.DBG_COUNTERS:
        pframe_dev.DBG_COUNTERS[k] = 0
    frames = _pan_clip(5)
    enc = Encoder(EncoderConfig(width=W, height=H, qp=27, gop="ldp",
                                subpel="none", search_range=16))
    bs = enc.encode_sequence(frames)
    return bs, dict(pframe_dev.DBG_COUNTERS)


def test_collapse64_triggers(encoded):
    _, counters = encoded
    assert counters["cu64_merge"] + counters["cu64_amvp"] > 0, \
        "pan clip produced no 64x64 residual CUs"


def test_cu64_stream_self_decodes(encoded):
    bs, _ = encoded
    pics = Decoder().decode_annexb(bs)    # hash SEI asserted inside
    assert len(pics) == 5


def test_cu64_stream_hm_decodes(encoded, tmp_path):
    dec = "/tmp/hm_oracle/bin/TAppDecoderStatic"
    if not os.path.exists(dec):
        pytest.skip("HM oracle decoder not built")
    bs, _ = encoded
    p = tmp_path / "cu64.hevc"
    p.write_bytes(bs)
    out = subprocess.run(
        [dec, "-b", str(p), "-o", str(tmp_path / "rec.yuv")],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr
    assert out.stdout.count("(OK)") == 5, out.stdout
