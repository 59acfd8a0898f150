"""Deep probe of the panning collapse: run the lap until LOST, then dissect
(a) why inliers decayed (in-FOV local-map coverage per frame) and
(b) why relocalization fails frame after frame.

    PYTHONPATH= JAX_PLATFORMS=cpu python tools/lap_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def in_fov_count(cam, db, T_cw, lm_ids):
    if len(lm_ids) == 0:
        return 0
    X = db.lm_pos[lm_ids]
    Xc = (T_cw[:3, :3] @ X.T).T + T_cw[:3, 3]
    z = Xc[:, 2]
    ok = z > 0.1
    u = cam.fx * Xc[:, 0] / np.maximum(z, 1e-6) + cam.cx
    v = cam.fy * Xc[:, 1] / np.maximum(z, 1e-6) + cam.cy
    ok &= (u >= 0) & (u < cam.cols) & (v >= 0) & (v < cam.rows)
    return int(ok.sum())


def main():
    n_frames = 50
    laps = 0.5 * 50 / 90          # same deg/frame as the 90-frame half lap

    from openvslam_tpu.config import Config
    from openvslam_tpu.system import System
    from openvslam_tpu.utils import synthetic

    rows, cols = 320, 416
    cfg = Config.from_dict({
        "Camera": {
            "name": "synthetic", "setup": "monocular", "model": "perspective",
            "fx": 350.0, "fy": 350.0, "cx": cols / 2, "cy": rows / 2,
            "cols": cols, "rows": rows, "fps": 20,
        },
        "Feature": {"max_num_keypts": 600, "num_levels": 4, "scale_factor": 1.2},
        "LoopDetector": {"enabled": False},
    })
    cam = cfg.camera
    rng = np.random.default_rng(7)
    scene = synthetic.RoomSceneRenderer(rng, half=10.0, rows=rows, cols=cols,
                                        n_walls=8)
    poses_gt = synthetic.lap_trajectory(n_frames, radius=6.0, laps=laps)

    sys_ = System(cfg)
    sys_.startup()
    tr = sys_.tracker
    db = sys_.map_db
    frames_lost = 0
    for i in range(n_frames):
        img = scene.render(cam, poses_gt[i])
        nk = db.n_kfs
        pose = sys_.feed_monocular_frame(img, i / 20.0)
        all_lms = np.array(db.valid_lm_ids())
        # use GT pose for FOV coverage: what the map COULD offer here
        fov_all = in_fov_count(cam, db, poses_gt[i], all_lms)
        cache = tr._lm_cache
        fov_local = 0
        if cache is not None:
            cand = cache["cand"]
            cand = cand[db.lm_valid[cand]] if len(cand) else cand
            fov_local = in_fov_count(cam, db, poses_gt[i], cand)
        kf_mark = "KF" if db.n_kfs > nk else "  "
        print(f"f{i:3d} {kf_mark} ok={pose is not None!s:5} inl={tr.num_tracked:4d} "
              f"fov_all={fov_all:4d} fov_local={fov_local:4d} "
              f"localmap={cache['n'] if cache else 0:4d} "
              f"lms={len(all_lms):5d} state={tr.state.name}", flush=True)
        if pose is None and tr.state.name == "LOST":
            frames_lost += 1
            if frames_lost == 2:
                probe_reloc(sys_, img, poses_gt[i])
                break
    sys_.shutdown()


def probe_reloc(sys_, img, T_gt):
    import jax.numpy as jnp
    from openvslam_tpu.ops import bow as bow_ops
    from openvslam_tpu.ops import match as M

    print("\n--- relocalizer probe ---")
    tr = sys_.tracker
    db = sys_.map_db
    rl = tr.relocalizer
    frame = sys_._make_frame(img) if hasattr(sys_, "_make_frame") else None
    if frame is None:
        # rebuild a frame the way System does
        from openvslam_tpu.data import Frame
        kp = sys_.frontend.extract(jnp.asarray(img))
        frame = Frame.from_keypoints(0, 0.0, kp, sys_.cam)
    words = rl.bow_db.compute_words(frame.desc_i8, frame.valid)
    cands = rl.bow_db.acquire_relocalization_candidates(words)
    print(f"reloc candidates: {cands}")
    for kf in cands[:3]:
        kf_words = rl.bow_db.kf_words[kf]
        kf_has_lm = (db.kf_lm_idx[kf] >= 0) & db.kf_kpt_valid[kf]
        gate = bow_ops.word_gate(jnp.asarray(words), jnp.asarray(kf_words))
        print(f"kf{kf}: has_lm={int(kf_has_lm.sum())} gate_pairs={int(np.asarray(gate).sum())}")
        idx, dist = M.match_descriptors(
            jnp.asarray(frame.desc_i8), jnp.asarray(db.kf_desc_i8[kf]),
            jnp.asarray(frame.valid), jnp.asarray(kf_has_lm),
            gate=gate, max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.9,
            cross_check=True,
        )
        idx = np.asarray(idx)
        m_f = np.where(idx >= 0)[0]
        print(f"kf{kf}: word-gated matches = {len(m_f)} (need 15)")
        # ungated for comparison
        idx2, _ = M.match_descriptors(
            jnp.asarray(frame.desc_i8), jnp.asarray(db.kf_desc_i8[kf]),
            jnp.asarray(frame.valid), jnp.asarray(kf_has_lm),
            max_dist=M.HAMMING_DIST_THR_LOW, ratio=0.9, cross_check=True,
        )
        print(f"kf{kf}: ungated matches    = {int((np.asarray(idx2) >= 0).sum())}")
    T = rl.relocalize(frame)
    print(f"relocalize() -> {'OK' if T is not None else 'None'}")
    if T is not None:
        # compare with GT
        dt = np.linalg.norm((-T[:3, :3].T @ T[:3, 3]) - (-T_gt[:3, :3].T @ T_gt[:3, 3]))
        print(f"center error vs GT (map scale differs): {dt:.3f}")


if __name__ == "__main__":
    main()
