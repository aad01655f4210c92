import numpy as np
import pytest

from hmtpu.io.bitstream import (
    BitReader,
    BitWriter,
    insert_emulation_prevention,
    strip_emulation_prevention,
)
from hmtpu.io.nal import NalUnit, split_annexb, write_annexb
from hmtpu.common.constants import NalUnitType


def test_bitwriter_basic():
    bw = BitWriter()
    bw.write(0b101, 3)
    bw.write(0b11111, 5)
    assert bw.get_bytes() == bytes([0b10111111])


def test_ue_se_roundtrip():
    rng = np.random.RandomState(0)
    values_ue = list(rng.randint(0, 100000, 200)) + [0, 1, 2, 255, 256]
    values_se = list(rng.randint(-50000, 50000, 200)) + [0, 1, -1, 2, -2]
    bw = BitWriter()
    for v in values_ue:
        bw.write_ue(int(v))
    for v in values_se:
        bw.write_se(int(v))
    bw.write_rbsp_trailing_bits()
    br = BitReader(bw.get_bytes())
    for v in values_ue:
        assert br.read_ue() == v
    for v in values_se:
        assert br.read_se() == v


@pytest.mark.parametrize(
    "raw,expect",
    [
        # NB: per H.265 7.4.1.1 a trailing 0x00 RBSP byte gets a final 0x03
        (b"\x00\x00\x00", b"\x00\x00\x03\x00\x03"),
        (b"\x00\x00\x01\x00\x00\x02", b"\x00\x00\x03\x01\x00\x00\x03\x02"),
        (b"\x00\x00\x04", b"\x00\x00\x04"),
        (b"\xab\xcd", b"\xab\xcd"),
        (b"\x00\x00\x03\x80", b"\x00\x00\x03\x03\x80"),
    ],
)
def test_emulation_prevention(raw, expect):
    got = insert_emulation_prevention(raw)
    assert got == expect


def test_emulation_roundtrip_random():
    rng = np.random.RandomState(1)
    for _ in range(50):
        raw = bytes(rng.randint(0, 5, rng.randint(1, 200)).astype(np.uint8))
        raw += b"\x80"  # rbsp_trailing_bits: real RBSPs never end in 0x00..0x03
        assert strip_emulation_prevention(insert_emulation_prevention(raw)) == raw


def test_annexb_roundtrip():
    n1 = NalUnit(NalUnitType.SPS_NUT, b"\x12\x00\x00\x00\x55\x80")
    n2 = NalUnit(NalUnitType.IDR_W_RADL, b"\xff\x00\x00\x01\x80")
    stream = write_annexb([n1, n2])
    nals = split_annexb(stream)
    assert len(nals) == 2
    assert nals[0] == n1.to_bytes()
    assert nals[1] == n2.to_bytes()
    # header decode
    assert (nals[0][0] >> 1) & 0x3F == NalUnitType.SPS_NUT
    assert (nals[1][0] >> 1) & 0x3F == NalUnitType.IDR_W_RADL
