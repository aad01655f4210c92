"""CLI apps + HM-style option system: cfg parsing, cascading,
overrides, end-to-end encoder/decoder app run."""
import sys

import numpy as np
import pytest

from hmtpu.apps.options import parse_cfg_file, parse_cli, resolve
from tools.gen_test_yuv import synth_clip

CFG_DIR = __file__.rsplit("/", 2)[0] + "/cfg"


def test_parse_cfg_files():
    opts = parse_cfg_file(f"{CFG_DIR}/encoder_lowdelay_P_main.cfg")
    assert opts["QP"] == "32"
    assert opts["SubPel"] == "nn"
    assert opts["Frame1"].split()[0] == "P"


def test_resolve_baseline_configs():
    ai = resolve(parse_cfg_file(f"{CFG_DIR}/encoder_intra_main.cfg"))
    assert ai.gop == "ai"
    ldp = resolve(parse_cfg_file(f"{CFG_DIR}/encoder_lowdelay_P_main.cfg"))
    assert ldp.gop == "ldp" and ldp.subpel == "nn" and ldp.num_refs == 4
    ra = resolve(parse_cfg_file(
        f"{CFG_DIR}/encoder_randomaccess_main10.cfg"))
    assert ra.gop == "ra" and ra.internal_bit_depth == 10


def test_cli_cascade_and_override():
    opts = parse_cli(["-c", f"{CFG_DIR}/encoder_intra_main.cfg",
                      "-q", "22", "--SourceWidth=96", "-wdt", "64"])
    cfg = resolve(opts)
    assert cfg.qp == 22 and cfg.width == 64


def test_real_toggles_are_wired():
    """HM keys with a real EncoderConfig knob must not be silently
    swallowed (RDOQ off in a cfg used to still encode with RDOQ on)."""
    cfg = resolve({"RDOQ": "0", "EnableTemporalMvp": "0",
                   "RateControl": "1", "TargetBitrate": "400000",
                   "DecisionEngine": "jacobi"})
    assert cfg.rdoq is False
    assert cfg.tmvp is False
    assert cfg.rate_control is True and cfg.target_kbps == 400.0
    assert cfg.decision == "jacobi"
    assert not cfg.ignored
    d = resolve({})
    assert d.rdoq is True and d.tmvp is True and d.target_kbps == 0.0


def test_apps_end_to_end(tmp_path):
    from hmtpu.apps import decoder_app, encoder_app

    yuv = tmp_path / "in.yuv"
    with open(yuv, "wb") as f:
        for y, u, v in synth_clip(64, 64, 2):
            f.write(y.astype(np.uint8).tobytes())
            f.write(u.astype(np.uint8).tobytes())
            f.write(v.astype(np.uint8).tobytes())
    bs = tmp_path / "out.hevc"
    rc = encoder_app.main([
        "-c", f"{CFG_DIR}/encoder_intra_main.cfg",
        "-i", str(yuv), "-b", str(bs), "--SourceWidth=64",
        "--SourceHeight=64", "-f", "2", "-q", "30"])
    assert rc == 0 and bs.stat().st_size > 0
    rec = tmp_path / "rec.yuv"
    rc = decoder_app.main(["-b", str(bs), "-o", str(rec)])
    assert rc == 0
    assert rec.stat().st_size == 2 * (64 * 64 + 2 * 32 * 32)


def test_annexb_bytecount_and_convert(tmp_path):
    import numpy as np

    from hmtpu.apps.annexb_bytecount import count
    from hmtpu.apps.convert_bitdepth import convert_plane, main as conv

    # bytecount over a freshly encoded stream
    from hmtpu.encoder.top import Encoder, EncoderConfig
    from hmtpu.io.yuv import Frame
    from tools.gen_test_yuv import synth_clip

    frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32))
              for y, u, v in synth_clip(96, 96, 2)]
    stream = Encoder(EncoderConfig(width=96, height=96, qp=32,
                                   gop="ai")).encode_sequence(frames)
    units, bbytes, total = count(stream)
    assert sum(units.values()) >= 7     # vps sps pps 2x(slice hash)
    assert 0 < total <= len(stream)

    # bit-depth conversion roundtrip 8 -> 10 -> 8
    rng = np.random.RandomState(0)
    p = rng.randint(0, 256, (64,)).astype(np.uint8)
    up = convert_plane(p, 8, 10)
    back = convert_plane(up, 10, 8)
    np.testing.assert_array_equal(back, p.astype(np.int32))

    src = tmp_path / "in.yuv"
    y = rng.randint(0, 256, (16 * 16 * 3 // 2,)).astype(np.uint8)
    src.write_bytes(y.tobytes())
    dst = tmp_path / "out.yuv"
    assert conv([str(src), "16x16", "8", "10", str(dst)]) == 0
    out = np.frombuffer(dst.read_bytes(), np.uint16)
    np.testing.assert_array_equal(out, y.astype(np.uint16) << 2)


def test_bitrate_targeting_converges():
    """The lambda-modifier guesser must converge a synthetic
    power-law (bitrate ~ m^-0.7) layer model onto its targets, like
    the reference BitrateTargeting iteration."""
    from hmtpu.apps.bitrate_targeting import (
        Point,
        guess_lambda_modifiers,
    )

    def bitrate_of(m, scale):
        return scale * m ** -0.7

    targets = [400.0, 300.0]
    scales = [500.0, 450.0]
    history = [[Point(1.0, bitrate_of(1.0, s))] for s in scales]
    for _ in range(12):
        mods = guess_lambda_modifiers(targets, history)
        for i, m in enumerate(mods):
            history[i].append(Point(m, bitrate_of(m, scales[i])))
    for i, t in enumerate(targets):
        assert abs(history[i][-1].bitrate - t) / t < 0.02, history[i][-1]


def test_sei_message_shapes():
    from hmtpu.io.sei import (
        active_parameter_sets,
        pic_timing_frame_field,
        prefix_sei_nal,
        recovery_point,
        user_data_unregistered,
    )
    from hmtpu.io.hashsei import parse_sei_messages

    msgs = [active_parameter_sets(), recovery_point(0, True, False),
            pic_timing_frame_field(), user_data_unregistered(b"hmtpu")]
    nal = prefix_sei_nal(msgs)
    parsed = parse_sei_messages(nal.rbsp)
    assert [t for t, _ in parsed] == [129, 6, 1, 5]
    assert parsed[3][1][16:] == b"hmtpu"


def test_hrd_buffering_period_stream(tmp_path):
    """VUI/HRD + buffering-period + CPB/DPB pic_timing: stream decodes
    (own + HM oracle when present), SPS VUI round-trips."""
    import numpy as np

    from hmtpu.decoder.core import Decoder
    from hmtpu.encoder.top import Encoder, EncoderConfig
    from hmtpu.io.yuv import Frame

    frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32))
              for y, u, v in synth_clip(96, 64, 4)]
    enc = Encoder(EncoderConfig(width=96, height=64, qp=32, gop="ldp",
                                subpel="none",
                                sei_buffering_period=True,
                                target_kbps=300.0))
    bs = enc.encode_sequence(frames)
    d = Decoder()
    assert len(d.decode_annexb(bs)) == 4
    assert d.sps.vui_timing_present and d.sps.hrd_present
    assert d.sps.time_scale == 50000
    from tests import oracle
    if oracle.have_decoder():
        p = tmp_path / "hrd.hevc"
        p.write_bytes(bs)
        out = oracle.decode(str(p), str(tmp_path / "r.yuv"))
        assert out.count("(OK)") == 4
