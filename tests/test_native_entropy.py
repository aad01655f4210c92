"""Native C++ entropy engine vs the Python reference: byte-identical
output and identical final context state over randomized command
streams, residual blocks of every size/scan, and a full encode."""
import numpy as np
import pytest

from hmtpu import native
from hmtpu.common.constants import SliceType
from hmtpu.entropy.contexts import NUM_CTX, make_contexts
from hmtpu.entropy.recorder import NativeBackend, PyBackend

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def _run_both(script, qp=32):
    outs = []
    ctxs = []
    for cls in (PyBackend, NativeBackend):
        ctx = make_contexts(SliceType.I, qp)
        be = cls(ctx)
        script(be)
        outs.append(be.finish())
        ctxs.append(ctx.copy())
    assert outs[0] == outs[1], \
        f"byte mismatch: py={outs[0].hex()} native={outs[1].hex()}"
    assert (ctxs[0] == ctxs[1]).all(), "context state mismatch"
    return outs[0]


def test_plain_bins():
    rng = np.random.RandomState(0)
    ops = [(int(rng.randint(NUM_CTX)), int(rng.randint(2)))
           for _ in range(5000)]

    def script(be):
        for idx, v in ops:
            be.encode_bin(idx, v)
    _run_both(script)


def test_bypass_and_trm():
    rng = np.random.RandomState(1)
    seq = rng.randint(0, 4, 3000)

    def script(be):
        for i, s in enumerate(seq):
            if s == 0:
                be.encode_bin(int(i) % NUM_CTX, int(i) & 1)
            elif s == 1:
                be.encode_bin_ep(int(i) & 1)
            elif s == 2:
                be.encode_bins_ep(int(i) & 1023, 10)
            else:
                be.encode_bin_trm(0)
    _run_both(script)


def _random_levels(rng, size, density):
    lev = np.zeros((size, size), dtype=np.int32)
    n = max(1, int(size * size * density))
    ys = rng.randint(0, size, n)
    xs = rng.randint(0, size, n)
    vals = rng.randint(1, 60, n) * rng.choice([-1, 1], n)
    lev[ys, xs] = vals
    return lev


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("scan", [0, 1, 2])
@pytest.mark.parametrize("luma", [True, False])
def test_residual_all_shapes(log2, scan, luma):
    if log2 > 3 and scan != 0:
        pytest.skip("hor/ver scans only for 4x4/8x8")
    if not luma and log2 == 5:
        pytest.skip("no 32x32 chroma TBs in 4:2:0")
    rng = np.random.RandomState(log2 * 10 + scan)
    blocks = [_random_levels(rng, 1 << log2, d)
              for d in (0.02, 0.15, 0.6, 1.0)]

    def script(be):
        for lev in blocks:
            be.residual(lev, log2, luma, scan, False)
            be.encode_bin_trm(0)
    _run_both(script)


def test_residual_sign_hiding():
    rng = np.random.RandomState(9)
    blocks = []
    for _ in range(20):
        lev = _random_levels(rng, 8, 0.4)
        # satisfy the parity constraint the quantiser would enforce
        from hmtpu.common.scan import scan_order
        scans = scan_order(3, 0).reshape(-1)
        flat = lev.reshape(-1)
        for ci in range(4):
            seg = [scans[ci * 16 + p] for p in range(16)]
            nz = [p for p in range(16) if flat[seg[p]]]
            if len(nz) >= 2 and nz[-1] - nz[0] > 3:
                tot = int(np.abs(flat[seg]).sum())
                first_sign = 1 if flat[seg[nz[0]]] < 0 else 0
                if (tot & 1) != first_sign:
                    flat[seg[nz[-1]]] += 1 if flat[seg[nz[-1]]] > 0 else -1
        blocks.append(lev)

    def script(be):
        for lev in blocks:
            be.residual(lev, 3, True, 0, True)
            be.encode_bin_trm(0)
    _run_both(script)


def test_full_frame_native_matches_python(monkeypatch):
    from hmtpu.encoder.top import Encoder, EncoderConfig
    from hmtpu.io.yuv import Frame
    from tools.gen_test_yuv import synth_clip

    frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32))
              for y, u, v in synth_clip(96, 96, 2)]

    streams = []
    import hmtpu.entropy.recorder as rec
    for force_py in (True, False):
        if force_py:
            monkeypatch.setattr(rec, "make_backend",
                                lambda ctx: rec.PyBackend(ctx))
        else:
            monkeypatch.undo()
        enc = Encoder(EncoderConfig(width=96, height=96, qp=30, gop="ai"))
        streams.append(enc.encode_sequence(frames))
    assert streams[0] == streams[1]


def test_pslice_native_writer_matches_python_walk():
    """The one-call native slice serialiser (hmtpu_encode_pslice) must
    be byte-identical to the Python CU-tree walk over the same
    wavefront decision tensors, with SAO syntax."""
    import pytest

    from hmtpu import native
    if not native.available():
        pytest.skip("native engine unavailable")

    from hmtpu.encoder.pframe import PFrameEncoder
    from hmtpu.encoder.pframe_dev import PFrameDeviceEncoder
    from hmtpu.encoder.top import Encoder, EncoderConfig
    from hmtpu.io.yuv import Frame
    from tools.gen_test_yuv import synth_clip

    frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32))
              for y, u, v in synth_clip(176, 144, 3)]

    seen = []

    class Cmp(PFrameDeviceEncoder):
        def _entropy_pass(self, qp, modes, skip_map, intra_map,
                          decisions, sh, sao=None):
            nat = super()._entropy_pass(qp, modes, skip_map, intra_map,
                                        decisions, sh, sao=sao)
            sao_py = sao
            if isinstance(sao, tuple) and sao[0] == "packed":
                from hmtpu.ops.sao import grid_from_packed
                ny = self.sps.pic_height_in_ctus
                nx = self.sps.pic_width_in_ctus
                sao_py = (grid_from_packed(
                    sao[1].reshape(ny, nx, 3, 7)), True, True)
            py = PFrameEncoder._entropy_pass(
                self, qp, modes, skip_map, intra_map, decisions, sh,
                sao=sao_py, depth8=self._depth8)
            assert nat == py
            seen.append(len(nat))
            return nat

    import hmtpu.encoder.pframe_dev as pd
    orig = pd.PFrameDeviceEncoder
    pd.PFrameDeviceEncoder = Cmp
    try:
        enc = Encoder(EncoderConfig(width=176, height=144, qp=30,
                                    gop="ldp", subpel="dctif",
                                    search_range=8))
        enc.encode_sequence(frames)
    finally:
        pd.PFrameDeviceEncoder = orig
    assert len(seen) == 2 and all(n > 0 for n in seen)
