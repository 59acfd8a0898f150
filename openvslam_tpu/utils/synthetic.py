"""Synthetic scene / trajectory generators.

Serves two roles (SURVEY.md §4): (1) the reference's synthetic-geometry unit
test pattern — random landmark clouds + random poses + projection through a
known camera, no dataset needed; (2) a deterministic rendered image sequence
for end-to-end tracking tests and benchmarks (known ground truth => ATE can
be asserted ~0), which the reference lacked.
"""
from __future__ import annotations

import numpy as np


def landmark_cloud(rng: np.random.Generator, n: int, center=(0, 0, 6), extent=(4, 3, 2)):
    c = np.asarray(center, np.float64)
    e = np.asarray(extent, np.float64)
    return c + (rng.random((n, 3)) - 0.5) * 2 * e


def lookat_pose_cw(eye, target, up=(0, -1, 0)):
    """Camera-from-world pose with camera at `eye` looking at `target`.

    Camera convention: +z forward, +x right, +y down (as in the reference).
    """
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    upv = np.asarray(up, np.float64)
    right = np.cross(upv, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_wc = np.stack([right, down, fwd], axis=1)  # world-from-camera columns
    T = np.eye(4)
    T[:3, :3] = R_wc.T
    T[:3, 3] = -R_wc.T @ eye
    return T


def orbit_trajectory(n_frames: int, radius=2.0, height=0.0, target=(0, 0, 6),
                     arc=np.pi / 3, jitter=0.0, rng=None):
    """Smooth sideways arc of camera poses looking at `target` -> (N,4,4) T_cw."""
    ts = np.linspace(-arc / 2, arc / 2, n_frames)
    poses = []
    for a in ts:
        eye = np.array([radius * np.sin(a), height, radius * (1 - np.cos(a))])
        if jitter and rng is not None:
            eye = eye + (rng.random(3) - 0.5) * jitter
        poses.append(lookat_pose_cw(eye, target))
    return np.stack(poses)


def random_pose_cw(rng: np.random.Generator, max_angle=0.5, max_trans=1.0):
    w = (rng.random(3) - 0.5) * 2 * max_angle
    theta = np.linalg.norm(w)
    if theta < 1e-12:
        R = np.eye(3)
    else:
        k = w / theta
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = (rng.random(3) - 0.5) * 2 * max_trans
    return T


def random_sim3(rng: np.random.Generator, max_angle=0.5, max_trans=1.0, scale_range=(0.5, 2.0)):
    T = random_pose_cw(rng, max_angle, max_trans)
    s = rng.uniform(*scale_range)
    return T[:3, :3], T[:3, 3], s


class PlaneSceneRenderer:
    """Textured-plane scene: a large multi-octave noise texture on the world
    plane z = plane_z, rendered by per-pixel ray casting (pure numpy).

    Continuous full-frame texture (like real imagery) — keypoint neighborhoods
    move rigidly with the surface, so IC-angles and descriptors are stable
    under viewpoint change, unlike isolated-patch scenes.  Also exercises the
    homography path of the two-view initializer (planar scene => H wins).
    """

    def __init__(self, rng: np.random.Generator, x_range=(-4.0, 18.0),
                 y_range=(-6.0, 6.0), plane_z=7.0, res=60, rows=320, cols=416,
                 octaves=((4, 0.2), (16, 0.4), (64, 1.0), (128, 0.6)),
                 dots=True):
        self.x0, self.x1 = x_range
        self.y0, self.y1 = y_range
        self.plane_z = plane_z
        self.res = res
        self.rows = rows
        self.cols = cols
        tw = int((self.x1 - self.x0) * res)
        th = int((self.y1 - self.y0) * res)
        # multi-octave value noise for FAST-friendly structure
        tex = np.zeros((th, tw))
        for octave, amp in octaves:
            gh = max(2, octave * th // max(th, tw))
            gw = max(2, octave)
            coarse = rng.random((gh, gw))
            yi = np.linspace(0, gh - 1, th)
            xi = np.linspace(0, gw - 1, tw)
            y0 = np.floor(yi).astype(int)
            x0 = np.floor(xi).astype(int)
            y1 = np.minimum(y0 + 1, gh - 1)
            x1 = np.minimum(x0 + 1, gw - 1)
            fy = (yi - y0)[:, None]
            fx = (xi - x0)[None, :]
            interp = (
                coarse[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
                + coarse[np.ix_(y0, x1)] * (1 - fy) * fx
                + coarse[np.ix_(y1, x0)] * fy * (1 - fx)
                + coarse[np.ix_(y1, x1)] * fy * fx
            )
            tex += amp * interp
        if dots:
            # salt-and-pepper corners (aliases under resampling; disable for
            # viewing-angle-heavy sequences)
            n_dots = tw * th // 300
            ys = rng.integers(1, th - 1, n_dots)
            xs = rng.integers(1, tw - 1, n_dots)
            tex[ys, xs] += rng.uniform(-1.5, 1.5, n_dots)
        tex -= tex.min()
        tex /= max(tex.max(), 1e-9)
        self.texture = (20 + tex * 225).astype(np.float32)

    def render(self, cam, T_cw: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        uu, vv = np.meshgrid(np.arange(self.cols), np.arange(self.rows))
        pix = np.stack([uu.reshape(-1), vv.reshape(-1)], -1).astype(np.float32)
        brg = np.asarray(cam.keypoints_to_bearings(jnp.asarray(pix)))
        R = T_cw[:3, :3]
        t = T_cw[:3, 3]
        c = -R.T @ t                      # camera center, world
        d = brg @ R                        # ray directions in world frame
        dz = d[:, 2]
        lam = (self.plane_z - c[2]) / np.where(np.abs(dz) < 1e-9, 1e-9, dz)
        X = c[None, :] + lam[:, None] * d
        visible = lam > 0
        tx = (X[:, 0] - self.x0) * self.res
        ty = (X[:, 1] - self.y0) * self.res
        th, tw = self.texture.shape
        x0 = np.clip(np.floor(tx).astype(int), 0, tw - 2)
        y0 = np.clip(np.floor(ty).astype(int), 0, th - 2)
        fx = np.clip(tx - x0, 0, 1)
        fy = np.clip(ty - y0, 0, 1)
        tex = self.texture
        val = (
            tex[y0, x0] * (1 - fx) * (1 - fy)
            + tex[y0, x0 + 1] * fx * (1 - fy)
            + tex[y0 + 1, x0] * (1 - fx) * fy
            + tex[y0 + 1, x0 + 1] * fx * fy
        )
        inside = visible & (tx >= 0) & (tx < tw - 1) & (ty >= 0) & (ty < th - 1)
        img = np.where(inside, val, 0.0).reshape(self.rows, self.cols)
        return img.astype(np.uint8)


class RoomSceneRenderer:
    """Textured walls of a regular n-gon room with the camera inside —
    supports full-lap trajectories that genuinely revisit their start
    (loop-closure topology, the KITTI-00 analog).  Pure-numpy ray casting
    against the wall planes; nearest valid hit wins.  More walls => gentler
    grazing angles at the seams (an octagon tracks much better than a
    square)."""

    def __init__(self, rng: np.random.Generator, half=10.0, y_range=(-5.0, 5.0),
                 res=40, rows=320, cols=416, n_walls=8,
                 octaves=((4, 0.2), (16, 0.4), (64, 1.0), (128, 0.6)),
                 dots=True):
        self.half = half
        self.rows = rows
        self.cols = cols
        self.y0, self.y1 = y_range
        self.res = res
        # wall width: chord of the polygon's inscribed-circle tangent faces
        wall_w = 2 * half * np.tan(np.pi / n_walls)
        self.walls = []
        self.defs = []
        for k in range(n_walls):
            tex_src = PlaneSceneRenderer(
                rng, x_range=(0.0, wall_w), y_range=y_range, plane_z=1.0,
                res=res, rows=8, cols=8, octaves=octaves, dots=dots,
            )
            self.walls.append(tex_src.texture)
            a = 2 * np.pi * k / n_walls
            n = np.array([np.cos(a), 0.0, np.sin(a)])
            u = np.array([-np.sin(a), 0.0, np.cos(a)])
            self.defs.append((half * n, n, u))
        self.wall_w = wall_w

    def render(self, cam, T_cw: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        uu, vv = np.meshgrid(np.arange(self.cols), np.arange(self.rows))
        pix = np.stack([uu.reshape(-1), vv.reshape(-1)], -1).astype(np.float32)
        brg = np.asarray(cam.keypoints_to_bearings(jnp.asarray(pix)))
        R = T_cw[:3, :3]
        t = T_cw[:3, 3]
        c = -R.T @ t
        d = brg @ R
        best_lam = np.full(len(d), np.inf)
        out = np.zeros(len(d), np.float32)
        for (p0, n, u_axis), tex in zip(self.defs, self.walls):
            denom = d @ n
            lam = ((p0 - c) @ n) / np.where(np.abs(denom) < 1e-9, 1e-9, denom)
            X = c[None, :] + lam[:, None] * d
            tu = (X @ u_axis + self.wall_w / 2) * self.res
            tv = (X[:, 1] - self.y0) * self.res
            th, tw = tex.shape
            ok = (
                (lam > 1e-3) & (lam < best_lam)
                & (tu >= 0) & (tu < tw - 1) & (tv >= 0) & (tv < th - 1)
            )
            x0 = np.clip(np.floor(tu).astype(int), 0, tw - 2)
            y0 = np.clip(np.floor(tv).astype(int), 0, th - 2)
            fx = np.clip(tu - x0, 0, 1)
            fy = np.clip(tv - y0, 0, 1)
            val = (
                tex[y0, x0] * (1 - fx) * (1 - fy)
                + tex[y0, x0 + 1] * fx * (1 - fy)
                + tex[y0 + 1, x0] * (1 - fx) * fy
                + tex[y0 + 1, x0 + 1] * fx * fy
            )
            out = np.where(ok, val, out)
            best_lam = np.where(ok, lam, best_lam)
        return out.reshape(self.rows, self.cols).astype(np.uint8)


def lap_trajectory(n_frames: int, radius=6.0, laps=1.0, start_angle=0.0):
    """Camera circling inside the room looking radially outward -> (N,4,4)."""
    out = []
    for i in range(n_frames):
        a = start_angle + 2 * np.pi * laps * i / n_frames
        eye = np.array([radius * np.cos(a), 0.0, radius * np.sin(a)])
        target = eye * 2.5          # look outward along the radial direction
        out.append(lookat_pose_cw(eye, target))
    return np.stack(out)


class PatchSceneRenderer:
    """Deterministic synthetic image sequence with known ground truth.

    A cloud of 3D points, each carrying a fixed random texture patch; a frame
    renders every visible point's patch at its projected pixel location.
    Patches give each feature a unique descriptor neighborhood (unlike plain
    blobs) so ORB matching behaves realistically.  Ground-truth poses let
    end-to-end tests assert ATE ~ 0 — the integration test the reference
    lacked (SURVEY.md §4).
    """

    def __init__(self, rng: np.random.Generator, n_points=800,
                 center=(0, 0, 6), extent=(7, 5, 2.5), patch=9,
                 rows=480, cols=640):
        self.points = landmark_cloud(rng, n_points, center, extent)
        self.textures = rng.integers(40, 256, size=(n_points, patch, patch)).astype(np.uint8)
        self.patch = patch
        self.rows = rows
        self.cols = cols

    def render(self, cam, T_cw: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        img = np.zeros((self.rows, self.cols), np.uint8)
        pc = (T_cw[:3, :3] @ self.points.T).T + T_cw[:3, 3]
        uv, depth, valid = cam.project(jnp.asarray(pc, np.float32))
        uv = np.asarray(uv)
        depth = np.asarray(depth)
        valid = np.asarray(valid)
        r = self.patch // 2
        order = np.argsort(-depth)          # far first so near patches overwrite
        for i in order:
            if not valid[i]:
                continue
            u, v = int(round(uv[i, 0])), int(round(uv[i, 1]))
            y0, y1 = v - r, v + r + 1
            x0, x1 = u - r, u + r + 1
            ty0 = max(0, -y0); tx0 = max(0, -x0)
            y0 = max(0, y0); x0 = max(0, x0)
            y1 = min(self.rows, y1); x1 = min(self.cols, x1)
            if y1 <= y0 or x1 <= x0:
                continue
            tex = self.textures[i]
            img[y0:y1, x0:x1] = tex[ty0:ty0 + (y1 - y0), tx0:tx0 + (x1 - x0)]
        return img
