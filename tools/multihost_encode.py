"""Multi-process (multi-host-shaped) segment-parallel encoding demo —
the SURVEY §2.4 DCN axis: GOP/segment sharding over hosts with the
input frames shipped through the distributed runtime and the
bitstreams gathered back to host 0.

Driver mode (default) spawns N worker processes and checks the
gathered stream is BYTE-IDENTICAL to a single-process encode:

    python tools/multihost_encode.py [--nprocs 2] [--frames 8]

Worker mode (spawned): joins the jax.distributed coordinator, receives
the clip via broadcast_one_to_all (process 0 is the source — this is
the "ship frames over DCN" edge), encodes its own closed segments
(each IDR-started, so no cross-segment reference pictures exist), and
contributes its bitstream to a process_allgather.

Segments map to hosts exactly as parallel/segments.py maps them to
local devices; the bitstream concatenation rule is the same.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PORT = 9911


def worker(idx: int, nprocs: int, frames_n: int, qp: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{PORT}", num_processes=nprocs,
                               process_id=idx)
    import numpy as np
    from jax.experimental import multihost_utils

    from hmtpu.encoder.top import Encoder, EncoderConfig
    from hmtpu.io.yuv import Frame
    from hmtpu.parallel.segments import split_segments
    from tools.gen_test_yuv import synth_clip

    w, h = 96, 64
    # process 0 owns the source; everyone else receives the planes
    # through the distributed runtime (the DCN frame-shipping edge)
    if idx == 0:
        clip = list(synth_clip(w, h, frames_n))
        y = np.stack([f[0] for f in clip]).astype(np.int32)
        u = np.stack([f[1] for f in clip]).astype(np.int32)
        v = np.stack([f[2] for f in clip]).astype(np.int32)
    else:
        y = np.zeros((frames_n, h, w), np.int32)
        u = np.zeros((frames_n, h // 2, w // 2), np.int32)
        v = np.zeros((frames_n, h // 2, w // 2), np.int32)
    y, u, v = (np.asarray(multihost_utils.broadcast_one_to_all(p))
               for p in (y, u, v))
    frames = [Frame(y[i], u[i], v[i]) for i in range(frames_n)]

    segs = split_segments(frames_n, nprocs)
    cfg = EncoderConfig(width=w, height=h, qp=qp, gop="ldp",
                        subpel="none")
    t0 = time.time()
    bs = Encoder(cfg).encode_sequence([frames[k] for k in segs[idx]])
    dt = time.time() - t0

    # gather variable-length bitstreams: pad to the global max
    ln = np.zeros(1, np.int32) + len(bs)
    lens = np.asarray(multihost_utils.process_allgather(ln)).reshape(-1)
    cap = int(lens.max())
    buf = np.zeros(cap, np.uint8)
    buf[:len(bs)] = np.frombuffer(bs, np.uint8)
    all_bufs = np.asarray(multihost_utils.process_allgather(buf))
    if idx == 0:
        stream = b"".join(all_bufs[i, :lens[i]].tobytes()
                          for i in range(nprocs))
        out = os.environ.get("HMTPU_MH_OUT", "/tmp/mh_stream.hevc")
        with open(out, "wb") as f:
            f.write(stream)
        print(json.dumps({"nprocs": nprocs, "frames": frames_n,
                          "bytes": len(stream),
                          "seg_seconds": round(dt, 2)}), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--worker", type=int, default=-1)
    args = ap.parse_args()
    if args.worker >= 0:
        worker(args.worker, args.nprocs, args.frames, args.qp)
        return 0

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_hmtpu")
    logs = [open(f"/tmp/mh_worker{i}.log", "w")
            for i in range(args.nprocs)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--worker", str(i), "--nprocs", str(args.nprocs),
         "--frames", str(args.frames), "--qp", str(args.qp)],
        env=env, stdout=logs[i], stderr=subprocess.STDOUT,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for i in range(args.nprocs)]
    rc = max(p.wait() for p in procs)
    for lg in logs:
        lg.close()
    if rc != 0:
        for i in range(args.nprocs):
            print(f"--- worker {i} log tail ---", file=sys.stderr)
            sys.stderr.write(
                "".join(open(f"/tmp/mh_worker{i}.log").readlines()[-15:]))
        print("worker failed", file=sys.stderr)
        return rc
    sys.stdout.write(open("/tmp/mh_worker0.log").readlines()[-1])

    # single-process reference encode: must be byte-identical (closed
    # segments share no state, so sharding cannot change the bits).
    # Force CPU like the workers — device/host kernels differ bitwise.
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from hmtpu.encoder.top import Encoder, EncoderConfig
    from hmtpu.io.yuv import Frame
    from hmtpu.parallel.segments import split_segments
    from tools.gen_test_yuv import synth_clip

    w, h = 96, 64
    frames = [Frame(y.astype(np.int32), u.astype(np.int32),
                    v.astype(np.int32))
              for y, u, v in synth_clip(w, h, args.frames)]
    ref = b"".join(
        Encoder(EncoderConfig(width=w, height=h, qp=args.qp, gop="ldp",
                              subpel="none"))
        .encode_sequence([frames[k] for k in seg])
        for seg in split_segments(args.frames, args.nprocs))
    got = open(os.environ.get("HMTPU_MH_OUT",
                              "/tmp/mh_stream.hevc"), "rb").read()
    ok = got == ref
    print(json.dumps({"multihost_byte_identical": ok,
                      "bytes": len(got)}), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
