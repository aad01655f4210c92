"""Device wavefront machinery: static schedule correctness, substituted
reference-gather parity, and merge/AMVP device-vs-host property tests
(the device derivations must match common/motion.py bit-for-bit, since
the decoder re-derives candidate lists from the same rules)."""
import numpy as np
import pytest

from hmtpu.common.motion import (
    MotionCtx,
    PicMotion,
    amvp_candidates,
    merge_candidates,
)
from hmtpu.search.wavefront import (
    NB_OFFS,
    block_schedule,
    merge_candidates_dev,
    amvp_candidates_dev,
    static_ref_gather,
    zscan_map8,
)

W, H, LOG2CTU = 416, 240, 6
BW, BH = W // 8, H // 8


def test_schedule_respects_zscan_deps():
    s = block_schedule(W, H, LOG2CTU)
    z = zscan_map8(BW, BH, LOG2CTU)
    level, nb_ok = s["level"], s["nb_ok"]
    for y in range(BH):
        for x in range(BW):
            for si, (dy, dx) in enumerate(NB_OFFS):
                ny, nx = y + dy, x + dx
                inb = 0 <= ny < BH and 0 <= nx < BW
                expect = inb and z[ny, nx] < z[y, x]
                assert nb_ok[y, x, si] == expect, (y, x, si)
                if expect:
                    assert level[ny, nx] < level[y, x]
    # every block appears exactly once in the level packing
    blks = s["lv_blk"][s["lv_blk"] >= 0]
    assert sorted(blks.tolist()) == list(range(BW * BH))


def test_schedule_level_count_is_wavefront_like():
    s = block_schedule(W, H, LOG2CTU)
    # a sequential scan would need BW*BH (=1560) steps; the z-scan DAG
    # critical path is ~2x the WPP raster diagonal (below-left AND
    # above-right both constrain) — ~238 levels for 416x240
    assert s["lv_blk"].shape[0] < 2 * (BW + 2 * BH) + 20


@pytest.mark.parametrize("n,log2c", [(8, 6), (4, 5)])
def test_static_ref_gather_matches_host(n, log2c):
    from hmtpu.common.geometry import ref_availability
    from hmtpu.encoder.intra import gather_ref_line
    from hmtpu.ops.intra_ref import substitute_unavailable

    w, h = (W, H) if n == 8 else (W // 2, H // 2)
    rng = np.random.RandomState(3)
    plane = rng.randint(0, 256, (h, w)).astype(np.int32)
    idx, none = static_ref_gather(w, h, log2c, n)
    got = plane.ravel()[idx]
    got[none] = 128
    p = 0
    for byi in range(h // n):
        for bxi in range(w // n):
            x, y = bxi * n, byi * n
            avail = ref_availability(x, y, n, w, h, log2c)
            want = substitute_unavailable(
                gather_ref_line(plane, x, y, n), avail, 8)
            np.testing.assert_array_equal(got[p], want, err_msg=str((x, y)))
            p += 1


def _random_field(rng, num_ref):
    """Random committed motion state over the 8x8 grid (uniform blocks):
    dir 0 (intra) or 1, random mv/ref."""
    dirs = (rng.rand(BH, BW) < 0.85).astype(np.int32)
    mvx = rng.randint(-64, 65, (BH, BW)).astype(np.int32)
    mvy = rng.randint(-64, 65, (BH, BW)).astype(np.int32)
    ref = rng.randint(0, num_ref, (BH, BW)).astype(np.int32)
    return dirs, mvx, mvy, ref


def _host_ctx(dirs, mvx, mvy, ref, ref_pocs, cur_poc):
    field = PicMotion.create(W, H)
    for y in range(BH):
        for x in range(BW):
            if dirs[y, x]:
                field.set_block(x * 8, y * 8, 8, 8, 1,
                                (int(mvx[y, x]), int(mvy[y, x])),
                                int(ref[y, x]))
    return MotionCtx(field, W, H, LOG2CTU, ref_pocs, cur_poc=cur_poc)


def _gather_slots(s, dirs, mvx, mvy, ref):
    """Neighbour slot data exactly as the wavefront kernel gathers it."""
    nb = s["nb_flat"].reshape(-1, 5)
    ok = s["nb_ok"].reshape(-1, 5)
    d = dirs.ravel()[nb]
    return (ok & (d > 0), mvx.ravel()[nb], mvy.ravel()[nb],
            ref.ravel()[nb])


@pytest.mark.parametrize("num_ref", [1, 2])
def test_merge_dev_matches_host(num_ref):
    import jax.numpy as jnp

    rng = np.random.RandomState(11 + num_ref)
    dirs, mvx, mvy, ref = _random_field(rng, num_ref)
    ref_pocs = list(range(10, 10 - num_ref, -1))
    s = block_schedule(W, H, LOG2CTU)
    v, nmx, nmy, nrf = _gather_slots(s, dirs, mvx, mvy, ref)
    cmx, cmy, crf = merge_candidates_dev(
        jnp.asarray(v), jnp.asarray(nmx), jnp.asarray(nmy),
        jnp.asarray(nrf), num_ref, 5)
    cmx, cmy, crf = np.asarray(cmx), np.asarray(cmy), np.asarray(crf)

    ctx = _host_ctx(dirs, mvx, mvy, ref, ref_pocs, cur_poc=11)
    for y in range(BH):
        for x in range(BW):
            want = merge_candidates(ctx, x * 8, y * 8, 8, 8, 5, num_ref)
            p = y * BW + x
            for k, c in enumerate(want):
                assert c.inter_dir == 1
                assert (cmx[p, k], cmy[p, k]) == c.mv[0], (x, y, k)
                assert crf[p, k] == c.ref_idx[0], (x, y, k)


@pytest.mark.parametrize("num_ref", [1, 3])
def test_amvp_dev_matches_host(num_ref):
    import jax.numpy as jnp

    rng = np.random.RandomState(29 + num_ref)
    dirs, mvx, mvy, ref = _random_field(rng, num_ref)
    cur_poc = 11
    ref_pocs = [10, 8, 5][:num_ref]
    s = block_schedule(W, H, LOG2CTU)
    v, nmx, nmy, nrf = _gather_slots(s, dirs, mvx, mvy, ref)
    refpoc = np.asarray(ref_pocs, np.int32)[np.clip(nrf, 0, num_ref - 1)]
    p0x, p0y, p1x, p1y = amvp_candidates_dev(
        jnp.asarray(v), jnp.asarray(nmx), jnp.asarray(nmy),
        jnp.asarray(refpoc), ref_pocs[0], cur_poc)
    p0x, p0y = np.asarray(p0x), np.asarray(p0y)
    p1x, p1y = np.asarray(p1x), np.asarray(p1y)

    ctx = _host_ctx(dirs, mvx, mvy, ref, ref_pocs, cur_poc)
    for y in range(BH):
        for x in range(BW):
            want = amvp_candidates(ctx, x * 8, y * 8, 8, 8, 0, 0)
            p = y * BW + x
            assert (p0x[p], p0y[p]) == want[0], (x, y, want)
            assert (p1x[p], p1y[p]) == want[1], (x, y, want)


def test_merge16_dev_matches_host():
    """CU16 merge lists from the 16-grid neighbour tables must match
    the host derivation at (x, y, 16, 16)."""
    import jax.numpy as jnp

    from hmtpu.search.wavefront import block_schedule16

    rng = np.random.RandomState(77)
    num_ref = 2
    dirs, mvx, mvy, ref = _random_field(rng, num_ref)
    s16 = block_schedule16(W, H, LOG2CTU)
    nb = s16["nb_cell"]
    ok = s16["nb_ok"]
    v = ok & (dirs.ravel()[nb] > 0)
    cmx, cmy, crf = merge_candidates_dev(
        jnp.asarray(v), jnp.asarray(mvx.ravel()[nb]),
        jnp.asarray(mvy.ravel()[nb]), jnp.asarray(ref.ravel()[nb]),
        num_ref, 5)
    cmx, cmy, crf = np.asarray(cmx), np.asarray(cmy), np.asarray(crf)

    ctx = _host_ctx(dirs, mvx, mvy, ref, [10, 8], cur_poc=11)
    gw = W // 16
    for gy in range(H // 16):
        for gx in range(gw):
            want = merge_candidates(ctx, gx * 16, gy * 16, 16, 16, 5,
                                    num_ref)
            p = gy * gw + gx
            for k, c in enumerate(want):
                assert (cmx[p, k], cmy[p, k]) == c.mv[0], (gx, gy, k)
                assert crf[p, k] == c.ref_idx[0], (gx, gy, k)


def test_temporal_cand_dev_matches_host():
    """TMVP device derivation (position + scaling per grid level) must
    match MotionCtx.temporal_mv for every block and CU size."""
    import jax.numpy as jnp

    from hmtpu.search.wavefront import (
        scale_mv_pair_dev,
        temporal_cand_grid_dev,
    )

    rng = np.random.RandomState(5)
    num_ref = 3
    cur_poc, col_poc = 9, 8
    ref_pocs = [8, 7, 5]
    col_ok = rng.rand(BH, BW) < 0.8
    col_mvx = rng.randint(-500, 500, (BH, BW)).astype(np.int32)
    col_mvy = rng.randint(-500, 500, (BH, BW)).astype(np.int32)
    col_refpoc = np.asarray([7, 5, 4])[
        rng.randint(0, 3, (BH, BW))].astype(np.int32)
    col = dict(mvx=col_mvx, mvy=col_mvy, ok=col_ok,
               refpoc=col_refpoc, poc=col_poc)
    ctx = MotionCtx(PicMotion.create(W, H), W, H, LOG2CTU, ref_pocs,
                    cur_poc=cur_poc, col=col)

    for n in (8, 16, 32):
        gw, gh = W // n, H // n
        t_ok, rx, ry, rp = temporal_cand_grid_dev(
            jnp.asarray(col_mvx), jnp.asarray(col_mvy),
            jnp.asarray(col_ok), jnp.asarray(col_refpoc),
            n, W, H, LOG2CTU)
        for target in (ref_pocs[0], ref_pocs[2]):
            tmx, tmy = scale_mv_pair_dev(rx, ry, cur_poc - target,
                                         col_poc - rp)
            tmx, tmy = np.asarray(tmx), np.asarray(tmy)
            ok = np.asarray(t_ok)
            for gy in range(gh):
                for gx in range(gw):
                    want = ctx.temporal_mv(gx * n, gy * n, n, n, target)
                    p = gy * gw + gx
                    if want is None:
                        assert not ok[p], (n, gx, gy)
                    else:
                        assert ok[p], (n, gx, gy)
                        assert (tmx[p], tmy[p]) == want, (n, gx, gy)


def test_merge_amvp_dev_with_temporal_matches_host():
    """Merge/AMVP lists with the collocated candidate enabled must
    match the host derivation (insertion order, no pruning, cap)."""
    import jax.numpy as jnp

    from hmtpu.common.motion import MvCand
    from hmtpu.search.wavefront import (
        scale_mv_pair_dev,
        temporal_cand_grid_dev,
    )

    rng = np.random.RandomState(17)
    num_ref = 2
    cur_poc, col_poc = 7, 6
    ref_pocs = [6, 5]
    dirs, mvx, mvy, ref = _random_field(rng, num_ref)
    col_ok = rng.rand(BH, BW) < 0.7
    col_mvx = rng.randint(-300, 300, (BH, BW)).astype(np.int32)
    col_mvy = rng.randint(-300, 300, (BH, BW)).astype(np.int32)
    col_refpoc = np.asarray([5, 4])[
        rng.randint(0, 2, (BH, BW))].astype(np.int32)
    col = dict(mvx=col_mvx, mvy=col_mvy, ok=col_ok,
               refpoc=col_refpoc, poc=col_poc)

    s = block_schedule(W, H, LOG2CTU)
    v, nmx, nmy, nrf = _gather_slots(s, dirs, mvx, mvy, ref)
    t_ok, rx, ry, rp = temporal_cand_grid_dev(
        jnp.asarray(col_mvx), jnp.asarray(col_mvy),
        jnp.asarray(col_ok), jnp.asarray(col_refpoc), 8, W, H, LOG2CTU)
    tmx, tmy = scale_mv_pair_dev(rx, ry, cur_poc - ref_pocs[0],
                                 col_poc - rp)
    cmx, cmy, crf = merge_candidates_dev(
        jnp.asarray(v), jnp.asarray(nmx), jnp.asarray(nmy),
        jnp.asarray(nrf), num_ref, 5, t_ok=t_ok, t_mvx=tmx, t_mvy=tmy)
    cmx, cmy, crf = np.asarray(cmx), np.asarray(cmy), np.asarray(crf)

    refpoc = np.asarray(ref_pocs, np.int32)[np.clip(nrf, 0, num_ref - 1)]
    tax, tay = scale_mv_pair_dev(rx, ry, cur_poc - ref_pocs[1],
                                 col_poc - rp)
    p0x, p0y, p1x, p1y = amvp_candidates_dev(
        jnp.asarray(v), jnp.asarray(nmx), jnp.asarray(nmy),
        jnp.asarray(refpoc), ref_pocs[1], cur_poc,
        t_ok=t_ok, t_mvx=tax, t_mvy=tay)
    p0x, p0y = np.asarray(p0x), np.asarray(p0y)
    p1x, p1y = np.asarray(p1x), np.asarray(p1y)

    field = PicMotion.create(W, H)
    for y in range(BH):
        for x in range(BW):
            if dirs[y, x]:
                field.set_block(x * 8, y * 8, 8, 8, 1,
                                (int(mvx[y, x]), int(mvy[y, x])),
                                int(ref[y, x]))
    ctx = MotionCtx(field, W, H, LOG2CTU, ref_pocs, cur_poc=cur_poc,
                    col=col)
    for y in range(BH):
        for x in range(BW):
            want = merge_candidates(ctx, x * 8, y * 8, 8, 8, 5, num_ref)
            p = y * BW + x
            for k, c in enumerate(want):
                assert (cmx[p, k], cmy[p, k]) == c.mv[0], (x, y, k)
                assert crf[p, k] == c.ref_idx[0], (x, y, k)
            wa = amvp_candidates(ctx, x * 8, y * 8, 8, 8, 0, 1)
            assert (p0x[p], p0y[p]) == wa[0], (x, y, wa)
            assert (p1x[p], p1y[p]) == wa[1], (x, y, wa)


def _random_field_b(rng, num_ref_l0, num_ref_l1):
    """Random two-list motion state: dir in {0 intra, 1, 2, 3}."""
    dirs = rng.choice([0, 1, 2, 3], (BH, BW),
                      p=[0.15, 0.25, 0.2, 0.4]).astype(np.int32)
    mvx0 = rng.randint(-64, 65, (BH, BW)).astype(np.int32)
    mvy0 = rng.randint(-64, 65, (BH, BW)).astype(np.int32)
    ref0 = rng.randint(0, num_ref_l0, (BH, BW)).astype(np.int32)
    mvx1 = rng.randint(-64, 65, (BH, BW)).astype(np.int32)
    mvy1 = rng.randint(-64, 65, (BH, BW)).astype(np.int32)
    ref1 = rng.randint(0, num_ref_l1, (BH, BW)).astype(np.int32)
    # zero the unused list exactly like the wavefront state commit
    u0, u1 = (dirs & 1) > 0, (dirs & 2) > 0
    for a in (mvx0, mvy0, ref0):
        a[~u0] = 0
    for a in (mvx1, mvy1, ref1):
        a[~u1] = 0
    return dirs, mvx0, mvy0, ref0, mvx1, mvy1, ref1


def _host_ctx_b(dirs, m, ref_pocs0, ref_pocs1, cur_poc):
    mvx0, mvy0, ref0, mvx1, mvy1, ref1 = m
    field = PicMotion.create(W, H)
    for y in range(BH):
        for x in range(BW):
            d = int(dirs[y, x])
            if d:
                field.set_block(
                    x * 8, y * 8, 8, 8, d,
                    (int(mvx0[y, x]), int(mvy0[y, x])),
                    int(ref0[y, x]) if d & 1 else -1,
                    (int(mvx1[y, x]), int(mvy1[y, x])),
                    int(ref1[y, x]) if d & 2 else -1)
    return MotionCtx(field, W, H, LOG2CTU, ref_pocs0, ref_pocs1,
                     cur_poc=cur_poc)


@pytest.mark.parametrize("nr0,nr1", [(2, 1), (3, 2)])
def test_merge_b_dev_matches_host(nr0, nr1):
    """B merge list (two-list spatial + combined + zero fill) must
    match common/motion.py merge_candidates(is_b=True) bit-for-bit."""
    import jax.numpy as jnp

    from hmtpu.search.wavefront import merge_candidates_dev_b

    rng = np.random.RandomState(101 + nr0)
    dirs, mvx0, mvy0, ref0, mvx1, mvy1, ref1 = _random_field_b(
        rng, nr0, nr1)
    cur_poc = 4
    ref_pocs0 = [2, 0, 8][:nr0]
    ref_pocs1 = [8, 2][:nr1]
    s = block_schedule(W, H, LOG2CTU)
    nb = s["nb_flat"].reshape(-1, 5)
    ok = s["nb_ok"].reshape(-1, 5)
    d = dirs.ravel()[nb]
    v = ok & (d > 0)
    ja = jnp.asarray
    cdir, cx0, cy0, cr0, cx1, cy1, cr1 = merge_candidates_dev_b(
        ja(v), ja(d), ja(mvx0.ravel()[nb]), ja(mvy0.ravel()[nb]),
        ja(ref0.ravel()[nb]), ja(mvx1.ravel()[nb]),
        ja(mvy1.ravel()[nb]), ja(ref1.ravel()[nb]),
        ja(np.asarray(ref_pocs0, np.int32)),
        ja(np.asarray(ref_pocs1, np.int32)), nr0, nr1, 5)
    got = [np.asarray(a) for a in (cdir, cx0, cy0, cr0, cx1, cy1, cr1)]

    ctx = _host_ctx_b(dirs, (mvx0, mvy0, ref0, mvx1, mvy1, ref1),
                      ref_pocs0, ref_pocs1, cur_poc)
    for y in range(BH):
        for x in range(BW):
            want = merge_candidates(ctx, x * 8, y * 8, 8, 8, 5, nr0,
                                    True, nr1)
            p = y * BW + x
            for k, c in enumerate(want):
                assert got[0][p, k] == c.inter_dir, (x, y, k, c)
                if c.inter_dir & 1:
                    assert (got[1][p, k], got[2][p, k]) == c.mv[0], \
                        (x, y, k, c)
                    assert got[3][p, k] == c.ref_idx[0], (x, y, k, c)
                if c.inter_dir & 2:
                    assert (got[4][p, k], got[5][p, k]) == c.mv[1], \
                        (x, y, k, c)
                    assert got[6][p, k] == c.ref_idx[1], (x, y, k, c)


@pytest.mark.parametrize("lx,tgt", [(0, 0), (0, 1), (1, 0)])
def test_amvp_b_dev_matches_host(lx, tgt):
    """B AMVP (cross-list same-POC match, cross-list scaling) must
    match common/motion.py amvp_candidates for either target list."""
    import jax.numpy as jnp

    from hmtpu.search.wavefront import amvp_candidates_dev_b

    nr0, nr1 = 2, 2
    rng = np.random.RandomState(211 + lx * 7 + tgt)
    dirs, mvx0, mvy0, ref0, mvx1, mvy1, ref1 = _random_field_b(
        rng, nr0, nr1)
    cur_poc = 4
    ref_pocs0 = [2, 0]
    ref_pocs1 = [8, 2]
    if (lx == 0 and tgt >= nr0) or (lx == 1 and tgt >= nr1):
        pytest.skip("target out of range")
    s = block_schedule(W, H, LOG2CTU)
    nb = s["nb_flat"].reshape(-1, 5)
    ok = s["nb_ok"].reshape(-1, 5)
    d = dirs.ravel()[nb]
    v = ok & (d > 0)
    pocs0 = np.asarray(ref_pocs0, np.int32)
    pocs1 = np.asarray(ref_pocs1, np.int32)
    nb_poc0 = pocs0[np.clip(ref0.ravel()[nb], 0, nr0 - 1)]
    nb_poc1 = pocs1[np.clip(ref1.ravel()[nb], 0, nr1 - 1)]
    target_poc = (ref_pocs0 if lx == 0 else ref_pocs1)[tgt]
    ja = jnp.asarray
    P = BW * BH
    p0x, p0y, p1x, p1y = amvp_candidates_dev_b(
        ja(v), ja(d), ja(mvx0.ravel()[nb]), ja(mvy0.ravel()[nb]),
        ja(nb_poc0), ja(mvx1.ravel()[nb]), ja(mvy1.ravel()[nb]),
        ja(nb_poc1), jnp.full((P,), lx, jnp.int32),
        jnp.full((P,), target_poc, jnp.int32), cur_poc)
    p0x, p0y = np.asarray(p0x), np.asarray(p0y)
    p1x, p1y = np.asarray(p1x), np.asarray(p1y)

    ctx = _host_ctx_b(dirs, (mvx0, mvy0, ref0, mvx1, mvy1, ref1),
                      ref_pocs0, ref_pocs1, cur_poc)
    for y in range(BH):
        for x in range(BW):
            want = amvp_candidates(ctx, x * 8, y * 8, 8, 8, lx, tgt)
            p = y * BW + x
            assert (p0x[p], p0y[p]) == want[0], (x, y, want)
            assert (p1x[p], p1y[p]) == want[1], (x, y, want)
