"""HM-parity LDP reference lists (encoder/top.py _ldp_lists): the
exact per-POC L0 lists printed by the reference encoder
(TAppEncoderStatic, encoder_lowdelay_P_main.cfg) on a 20-frame run —
transcribed from its log, line by line."""
from hmtpu.encoder.top import Encoder, EncoderConfig

# reference log: POC -> [L0 ...] (prev + GOP anchors, startup fills)
HM_L0 = {
    1: [0],
    2: [1, 0],
    3: [2, 1, 0],
    4: [3, 2, 1, 0],
    5: [4, 3, 2, 0],
    6: [5, 4, 3, 0],
    7: [6, 5, 4, 0],
    8: [7, 6, 4, 0],
    9: [8, 7, 4, 0],
    10: [9, 8, 4, 0],
    11: [10, 8, 4, 0],
    12: [11, 8, 4, 0],
    13: [12, 8, 4, 0],
    14: [13, 12, 8, 4],
    15: [14, 12, 8, 4],
    16: [15, 12, 8, 4],
    17: [16, 12, 8, 4],
    18: [17, 16, 12, 8],
    19: [18, 16, 12, 8],
}


def test_ldp_lists_match_reference_log():
    enc = Encoder(EncoderConfig(width=96, height=64, qp=32, gop="ldp"))
    avail = set()
    for poc in range(1, 20):
        avail.add(poc - 1)
        l0, keep = enc._ldp_lists(poc, avail)
        assert l0 == HM_L0[poc], (poc, l0)
        assert set(l0) <= keep          # RPS retains every active ref
        # retention feeds the next frame: trim like _launch_p does
        avail = {p for p in avail if p in keep}


def test_retention_always_covers_next_list():
    """Transitivity: what frame t keeps must contain everything frame
    t+1 wants (otherwise the decoder would have evicted a needed
    picture)."""
    enc = Encoder(EncoderConfig(width=96, height=64, qp=32, gop="ldp"))
    avail = set()
    for poc in range(1, 60):
        avail.add(poc - 1)
        l0, keep = enc._ldp_lists(poc, avail)
        assert set(l0) <= avail
        avail = {p for p in avail if p in keep}
