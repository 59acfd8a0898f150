"""Map database capacity growth (SURVEY.md §7 hard part #1).

The reference's map is unbounded (std::vector/map); our host SoA starts at a
fixed capacity and must DOUBLE transparently when a long sequence outgrows
it — ids stay stable, observations/covisibility survive reallocation, and
absorb() grows too.  Device mirrors key on `version` so growth is invisible
to the jitted side.
"""
import numpy as np

from openvslam_tpu.data.frame import Frame
from openvslam_tpu.data.map_database import MapDatabase

K = 16


def _frame(fid, rng):
    return Frame(
        frame_id=fid, timestamp=float(fid),
        xy=rng.uniform(0, 100, (K, 2)).astype(np.float32),
        xy_undist=rng.uniform(0, 100, (K, 2)).astype(np.float32),
        bearing=np.tile([0, 0, 1.0], (K, 1)).astype(np.float32),
        level=np.zeros(K, np.int32), angle=np.zeros(K, np.float32),
        response=np.ones(K, np.float32),
        desc_u32=rng.integers(0, 2**32, (K, 8), dtype=np.uint32),
        desc_i8=rng.integers(0, 2, (K, 256)).astype(np.int8),
        valid=np.ones(K, bool),
        x_right=np.full(K, -1, np.float32), depth=np.full(K, -1, np.float32),
        lm_idx=np.full(K, -1, np.int32), outlier=np.zeros(K, bool),
        pose_cw=np.eye(4, dtype=np.float32),
    )


def test_kf_and_lm_growth():
    rng = np.random.default_rng(0)
    db = MapDatabase(K, max_kfs=4, max_lms=8)
    n_kf, n_lm_per = 11, 6           # crosses both capacities multiple times
    lm_ids = []
    for f in range(n_kf):
        kf = db.add_keyframe(_frame(f, rng))
        assert kf == f
        for j in range(n_lm_per):
            lm = db.add_landmark(
                rng.normal(size=3).astype(np.float32),
                rng.integers(0, 2**32, 8, dtype=np.uint32),
                rng.integers(0, 2, 256).astype(np.int8), kf)
            db.add_observation(lm, kf, j)
            # co-observe from the previous KF (a free kpt slot) so the
            # covisibility graph has edges across growth boundaries
            if f > 0:
                db.add_observation(lm, kf - 1, n_lm_per + j % (K - n_lm_per))
            lm_ids.append(lm)
        db.update_connections(kf)
    assert db.max_kfs >= n_kf and db.max_lms >= n_kf * n_lm_per
    assert len(db.valid_kf_ids()) == n_kf
    assert len(db.valid_lm_ids()) == n_kf * n_lm_per
    # bookkeeping survived reallocation
    for lm in lm_ids:
        for kf, idx in db.lm_obs[lm].items():
            assert db.kf_lm_idx[kf][idx] == lm
    assert all(db.covis[f] for f in range(1, n_kf))

    # erase across the old/new boundary, then keep growing
    db.erase_keyframe(5)
    assert not db.kf_valid[5]
    kf = db.add_keyframe(_frame(99, rng))
    assert db.kf_valid[kf] and kf == n_kf


def test_absorb_grows():
    rng = np.random.default_rng(1)
    a = MapDatabase(K, max_kfs=2, max_lms=4)
    b = MapDatabase(K, max_kfs=8, max_lms=64)
    for f in range(6):
        kf = b.add_keyframe(_frame(f, rng))
        for j in range(4):
            lm = b.add_landmark(
                rng.normal(size=3).astype(np.float32),
                rng.integers(0, 2**32, 8, dtype=np.uint32),
                rng.integers(0, 2, 256).astype(np.int8), kf)
            b.add_observation(lm, kf, j)
    a.add_keyframe(_frame(100, rng))
    kf_map, lm_map = a.absorb(b)
    assert len(kf_map) == 6 and len(lm_map) == 24
    assert len(a.valid_kf_ids()) == 7
    assert a.max_kfs >= 7 and a.max_lms >= 24
