"""Encoder CLI — capability parity with TAppEncoder (encmain.cpp:52,
TAppEncTop.cpp:468): HM-style config files + overrides, YUV in,
Annex-B out, per-frame log and TEncAnalyze summary.

    python -m hmtpu.apps.encoder_app -c encoder_lowdelay_P_main.cfg \\
        -c per-sequence/BlowingBubbles.cfg -q 27
"""
from __future__ import annotations

import sys
import time

from hmtpu.apps.options import parse_cli, resolve
from hmtpu.encoder.top import Encoder, EncoderConfig
from hmtpu.io.nal import write_annexb
from hmtpu.io.yuv import YuvReader, YuvWriter
from hmtpu.utils.analyze import Analyze


def main(argv=None) -> int:
    opts = parse_cli(sys.argv[1:] if argv is None else argv)
    app = resolve(opts)
    if not app.input_file:
        print("error: no InputFile", file=sys.stderr)
        return 1
    if app.ignored:
        print(f"note: accepted HM options outside the current envelope: "
              f"{sorted(set(app.ignored))}", file=sys.stderr)

    enc = Encoder(EncoderConfig(
        width=app.width, height=app.height, qp=app.qp,
        bit_depth=app.internal_bit_depth, gop=app.gop,
        intra_period=max(app.intra_period, 0),
        num_refs=app.num_refs, sao=app.sao, deblock=app.deblock,
        subpel=app.subpel, search_range=min(app.search_range, 64),
        max_num_merge_cand=app.max_num_merge_cand,
        sign_data_hiding=app.sign_hiding,
        rdoq=app.rdoq, tmvp=app.tmvp, decision=app.decision,
        transform_skip=app.transform_skip,
        sei_buffering_period=app.sei_buffering_period,
        target_kbps=app.target_kbps, frame_rate=app.frame_rate,
        wpp=app.wpp,
        profile=app.profile if app.profile in
        ("main-rext", "high-throughput-rext") else "",
        nn_weights_dir=app.nn_weights_dir or None))

    rd = YuvReader(app.input_file, app.width, app.height,
                   file_bit_depth=app.input_bit_depth,
                   internal_bit_depth=app.internal_bit_depth)
    if app.frame_skip:
        rd.skip_frames(app.frame_skip)
    frames = []
    n = app.frames if app.frames > 0 else 1 << 30
    while len(frames) < n:
        f = rd.read_frame()
        if f is None:
            break
        frames.append(f)
    print(f"encoding {len(frames)} frames {app.width}x{app.height} "
          f"QP {app.qp} gop={app.gop} subpel={enc.cfg.subpel}")

    t0 = time.time()
    stream = enc.encode_sequence(frames)
    dt = time.time() - t0
    with open(app.bitstream_file, "wb") as f:
        f.write(stream)

    ana = Analyze(frame_rate=app.frame_rate)
    for r in enc.results:
        ana.add_result(r.slice_type, r.bits, r.psnr_y, r.psnr_u, r.psnr_v)
        print(ana.frame_line(r.poc, r.slice_type, app.qp, r.bits,
                             r.psnr_y, r.psnr_u, r.psnr_v, r.seconds))
    ana.print_summary()
    print(f"\nBytes written to file: {len(stream)}")
    print(f" Total Time: {dt:9.3f} sec. ({len(frames) / dt:.3f} fps)")

    if app.recon_file:
        wr = YuvWriter(app.recon_file, file_bit_depth=app.input_bit_depth)
        from hmtpu.decoder.core import Decoder
        for pic in sorted(Decoder().decode_annexb(stream),
                          key=lambda p: p.poc):
            wr.write_frame(pic.frame)
        wr.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
