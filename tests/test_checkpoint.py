"""Checkpoint/resume (SURVEY §5): a long encode split at a GOP
boundary must produce the same access units as the straight run —
all inter-frame state (DPB recon, collocated motion, harvested CABAC
states, POC counters) round-trips through the checkpoint file."""
import numpy as np

from hmtpu.decoder.core import Decoder
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.yuv import Frame
from tools.gen_test_yuv import synth_clip

W, H = 96, 64


def _frames(n):
    return [Frame(y.astype(np.int32), u.astype(np.int32),
                  v.astype(np.int32))
            for y, u, v in synth_clip(W, H, n)]


def _cfg():
    return EncoderConfig(width=W, height=H, qp=32, gop="ldp",
                         subpel="none")


def test_checkpoint_resume_bit_identical(tmp_path):
    frames = _frames(12)
    straight = Encoder(_cfg()).encode_sequence(frames)

    enc = Encoder(_cfg())
    seg1 = enc.encode_sequence(frames[:8])
    ck = tmp_path / "enc.ckpt"
    enc.save_checkpoint(str(ck))

    enc2 = Encoder(_cfg())
    enc2.load_checkpoint(str(ck))
    seg2 = enc2.encode_sequence(frames[8:])

    assert seg1 + seg2 == straight
    pics = Decoder().decode_annexb(seg1 + seg2)
    assert len(pics) == 12


def test_checkpoint_keeps_results_and_rc(tmp_path):
    frames = _frames(6)
    cfg = _cfg()
    cfg.target_kbps = 200.0
    enc = Encoder(cfg)
    enc.encode_sequence(frames[:4])
    ck = tmp_path / "rc.ckpt"
    enc.save_checkpoint(str(ck))

    cfg2 = _cfg()
    cfg2.target_kbps = 200.0
    enc2 = Encoder(cfg2)
    enc2.load_checkpoint(str(ck))
    assert len(enc2.results) == 4
    assert enc2.rc is not None and enc2.rc.frames_done == enc.rc.frames_done
    enc2.encode_sequence(frames[4:])
    assert len(enc2.results) == 6


def test_checkpoint_resume_ra_bit_identical(tmp_path):
    """RA resume at a completed-GOP boundary: the full-sequence
    schedule is filtered to the segment, so the coding order, the
    retained-DPB contents and therefore the bytes match the straight
    run exactly."""
    frames = _frames(17)
    cfg = EncoderConfig(width=W, height=H, qp=32, gop="ra",
                        subpel="none")
    straight = Encoder(cfg).encode_sequence(frames)

    enc = Encoder(EncoderConfig(width=W, height=H, qp=32, gop="ra",
                                subpel="none"))
    seg1 = enc.encode_sequence(frames[:9])     # IDR + one full GOP-8
    ck = tmp_path / "ra.ckpt"
    enc.save_checkpoint(str(ck))

    enc2 = Encoder(EncoderConfig(width=W, height=H, qp=32, gop="ra",
                                 subpel="none"))
    enc2.load_checkpoint(str(ck))
    seg2 = enc2.encode_sequence(frames[9:])

    assert seg1 + seg2 == straight
    pics = Decoder().decode_annexb(seg1 + seg2)
    assert len(pics) == 17


def test_checkpoint_resume_extends_rc_budget(tmp_path):
    """A resumed segment longer than the first must not exhaust the
    rate-control budget: total_frames is extended, targets stay near
    the per-frame average instead of clamping to the 100-bit floor
    and driving QP to the ceiling."""
    frames = _frames(16)
    cfg = _cfg()
    cfg.target_kbps = 200.0
    enc = Encoder(cfg)
    enc.encode_sequence(frames[:4])
    ck = tmp_path / "rc.ckpt"
    enc.save_checkpoint(str(ck))

    cfg2 = _cfg()
    cfg2.target_kbps = 200.0
    enc2 = Encoder(cfg2)
    enc2.load_checkpoint(str(ck))
    enc2.encode_sequence(frames[4:])
    assert enc2.rc.total_frames == 16
    avg = cfg.target_kbps * 1000.0 / cfg2.frame_rate
    # budget must stay solvent: positive, and each late pick() target
    # is in a sane band around the per-frame average
    assert enc2.rc._budget_left() > -avg
    tgt, _, qp = enc2.rc.pick(False, 0)
    assert tgt > 0.2 * avg
    assert qp < 50
