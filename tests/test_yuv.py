import numpy as np

from hmtpu.common.constants import ChromaFormat
from hmtpu.io.yuv import Frame, YuvReader, YuvWriter, frame_bytes
from hmtpu.io.hashsei import plane_md5, parse_sei_messages, make_hash_sei_nal
from hmtpu.common.constants import SEI_DECODED_PICTURE_HASH


def _write_random_yuv(path, w, h, n, rng):
    frames = []
    with open(path, "wb") as f:
        for _ in range(n):
            y = rng.randint(0, 256, (h, w), dtype=np.uint8)
            u = rng.randint(0, 256, (h // 2, w // 2), dtype=np.uint8)
            v = rng.randint(0, 256, (h // 2, w // 2), dtype=np.uint8)
            f.write(y.tobytes() + u.tobytes() + v.tobytes())
            frames.append((y, u, v))
    return frames


def test_yuv_read(tmp_path):
    rng = np.random.RandomState(3)
    p = str(tmp_path / "a.yuv")
    frames = _write_random_yuv(p, 32, 16, 3, rng)
    r = YuvReader(p, 32, 16)
    for y, u, v in frames:
        fr = r.read_frame()
        assert np.array_equal(fr.y, y.astype(np.int32))
        assert np.array_equal(fr.u, u.astype(np.int32))
        assert np.array_equal(fr.v, v.astype(np.int32))
    assert r.read_frame() is None
    r.close()


def test_yuv_skip_and_bitdepth(tmp_path):
    rng = np.random.RandomState(4)
    p = str(tmp_path / "b.yuv")
    frames = _write_random_yuv(p, 16, 8, 4, rng)
    r = YuvReader(p, 16, 8, internal_bit_depth=10)
    r.skip_frames(2)
    fr = r.read_frame()
    assert np.array_equal(fr.y, frames[2][0].astype(np.int32) << 2)
    r.close()
    assert frame_bytes(16, 8, ChromaFormat.C420, 8) == 16 * 8 * 3 // 2


def test_yuv_write_roundtrip(tmp_path):
    rng = np.random.RandomState(5)
    y = rng.randint(0, 256, (16, 32)).astype(np.int32)
    u = rng.randint(0, 256, (8, 16)).astype(np.int32)
    v = rng.randint(0, 256, (8, 16)).astype(np.int32)
    p = str(tmp_path / "c.yuv")
    w = YuvWriter(p)
    w.write_frame(Frame(y, u, v))
    w.close()
    r = YuvReader(p, 32, 16)
    fr = r.read_frame()
    assert np.array_equal(fr.y, y) and np.array_equal(fr.u, u)
    r.close()


def test_hash_sei():
    rng = np.random.RandomState(6)
    y = rng.randint(0, 256, (16, 16)).astype(np.int32)
    import hashlib
    assert plane_md5(y, 8) == hashlib.md5(y.astype(np.uint8).tobytes()).digest()
    # 10-bit: little endian 2 bytes
    y10 = y << 2
    assert plane_md5(y10, 10) == hashlib.md5(y10.astype("<u2").tobytes()).digest()
    nal = make_hash_sei_nal([b"\x01" * 16, b"\x02" * 16, b"\x03" * 16])
    msgs = parse_sei_messages(nal.rbsp)
    assert msgs == [(SEI_DECODED_PICTURE_HASH, bytes([0]) + b"\x01" * 16 + b"\x02" * 16 + b"\x03" * 16)]
