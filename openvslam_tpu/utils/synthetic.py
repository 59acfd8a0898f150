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


def noise_texture(rng: np.random.Generator, th: int, tw: int,
                  octaves=((4, 0.2), (16, 0.4), (64, 1.0), (128, 0.6)),
                  dots=True) -> np.ndarray:
    """Multi-octave value-noise texture with FAST-friendly structure,
    float32 in [20, 245].  Shared by every renderer below."""
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
    return (20 + tex * 225).astype(np.float32)


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
        self.texture = noise_texture(rng, th, tw, octaves, dots)

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


class RoundedRectCourse:
    """Closed centerline of a rounded-rectangle street circuit in the
    (x, z) ground plane — the KITTI-00 analog topology: long straights,
    gentle 90-degree corners, and an exact return to the start.

    Parameterized by arclength ``s`` in [0, length).  ``point(s)`` and
    ``tangent(s)`` are vectorized over arrays of s.
    """

    def __init__(self, straight_x: float = 220.0, straight_z: float = 220.0,
                 corner_r: float = 20.0):
        self.sx = float(straight_x)
        self.sz = float(straight_z)
        self.r = float(corner_r)
        arc = np.pi / 2 * self.r
        # pieces: +x straight, corner, +z straight, corner, -x straight,
        # corner, -z straight, corner (counter-clockwise seen from +y)
        self.piece_len = np.array(
            [self.sx, arc, self.sz, arc, self.sx, arc, self.sz, arc])
        self.cum = np.concatenate([[0.0], np.cumsum(self.piece_len)])
        self.length = float(self.cum[-1])
        hx, hz, r = self.sx / 2, self.sz / 2, self.r
        # piece start points / directions for the straights; corner centers
        self.p0 = np.array([
            [-hx, -hz - r], [hx, -hz - r], [hx + r, -hz], [hx + r, hz],
            [hx, hz + r], [-hx, hz + r], [-hx - r, hz], [-hx - r, -hz],
        ])
        self.dirs = np.array([
            [1, 0], [0, 0], [0, 1], [0, 0],
            [-1, 0], [0, 0], [0, -1], [0, 0],
        ], float)
        self.corner_c = np.array([
            [hx, -hz], [hx, hz], [-hx, hz], [-hx, -hz]])
        # corner k spans start angle a0 -> a0 + pi/2 (angle measured from
        # corner center, in the (x, z) plane)
        self.corner_a0 = np.array([-np.pi / 2, 0.0, np.pi / 2, np.pi])

    def _locate(self, s):
        s = np.mod(np.asarray(s, float), self.length)
        piece = np.searchsorted(self.cum, s, side="right") - 1
        piece = np.clip(piece, 0, 7)
        local = s - self.cum[piece]
        return piece, local

    def point(self, s) -> np.ndarray:
        """(…, 2) (x, z) positions on the centerline."""
        piece, local = self._locate(s)
        out = np.zeros(piece.shape + (2,))
        straight = piece % 2 == 0
        out[straight] = (self.p0[piece[straight]]
                         + local[straight, None] * self.dirs[piece[straight]])
        crn = ~straight
        k = piece[crn] // 2
        ang = self.corner_a0[k] + local[crn] / self.r
        out[crn] = self.corner_c[k] + self.r * np.stack(
            [np.cos(ang), np.sin(ang)], -1)
        return out

    def tangent(self, s) -> np.ndarray:
        """(…, 2) unit tangents (direction of travel)."""
        piece, local = self._locate(s)
        out = np.zeros(piece.shape + (2,))
        straight = piece % 2 == 0
        out[straight] = self.dirs[piece[straight]]
        crn = ~straight
        k = piece[crn] // 2
        ang = self.corner_a0[k] + local[crn] / self.r
        out[crn] = np.stack([-np.sin(ang), np.cos(ang)], -1)
        return out


class CityCourseRenderer:
    """Street-canyon scene along a closed course: textured building walls on
    both sides of the street plus a textured road surface, rendered by
    per-pixel ray casting against planar quads with distance/backface
    culling (pure numpy).  This is the KITTI-00-class scene: a multi-hundred-
    metre circuit whose end revisits its start, exercising long-map growth,
    place recognition at scale, and loop closure (VERDICT r2 next-#1).

    Quads: (p0, n, u_axis, v_axis, half_u, half_v, texture); vertical wall
    segments of ~``seg_len`` m tangent to the course boundary offset curves,
    and road quads spanning the street between them.  Camera convention
    +y down, so the road is at y = +road_y.
    """

    def __init__(self, rng: np.random.Generator, course,
                 street_half_w: float = 4.0, wall_y=(-4.5, 1.5),
                 road_y: float = 1.5, seg_len: float = 8.0,
                 res: float = 24.0, max_dist: float = 70.0,
                 octaves=((4, 0.2), (16, 0.4), (64, 1.0), (128, 0.6)),
                 dots=True):
        self.course = course
        self.max_dist = float(max_dist)
        n_seg = int(np.ceil(course.length / seg_len))
        s = np.linspace(0.0, course.length, n_seg + 1)
        pts = course.point(s)                      # (n+1, 2) centerline
        tans = course.tangent(s)
        # left normal (in the ground plane): rotate tangent +90deg
        nrm = np.stack([-tans[:, 1], tans[:, 0]], -1)
        left = pts + street_half_w * nrm
        right = pts - street_half_w * nrm
        y0, y1 = wall_y
        wall_h = y1 - y0
        quads = []        # (p0, n, u_axis, v_axis, hu, hv, tex)

        def _wall(a2, b2, inward2):
            mid = (a2 + b2) / 2
            seg = b2 - a2
            ln = np.linalg.norm(seg)
            if ln < 1e-6:
                return
            u2 = seg / ln
            p0 = np.array([mid[0], (y0 + y1) / 2, mid[1]])
            u_axis = np.array([u2[0], 0.0, u2[1]])
            v_axis = np.array([0.0, 1.0, 0.0])
            n3 = np.array([inward2[0], 0.0, inward2[1]])
            tex = noise_texture(
                rng, max(8, int(wall_h * res)), max(8, int(ln * res)),
                octaves, dots)
            quads.append((p0, n3, u_axis, v_axis, ln / 2, wall_h / 2, tex))

        for i in range(n_seg):
            inward = -nrm[i]                 # from left wall toward street
            _wall(left[i], left[i + 1], inward)
            _wall(right[i], right[i + 1], -inward)
            # road quad between the walls for this stretch
            mid = (pts[i] + pts[i + 1]) / 2
            seg = pts[i + 1] - pts[i]
            ln = np.linalg.norm(seg)
            if ln < 1e-6:
                continue
            u2 = seg / ln
            p0 = np.array([mid[0], road_y, mid[1]])
            u_axis = np.array([u2[0], 0.0, u2[1]])
            v_axis = np.array([nrm[i][0], 0.0, nrm[i][1]])
            n3 = np.array([0.0, -1.0, 0.0])   # toward the camera (+y down)
            tex = noise_texture(
                rng, max(8, int(2 * street_half_w * res)),
                max(8, int(ln * res)), octaves, dots)
            quads.append((p0, n3, u_axis, v_axis, ln / 2, street_half_w, tex))

        self.quad_p0 = np.stack([q[0] for q in quads]).astype(np.float32)
        self.quad_n = np.stack([q[1] for q in quads]).astype(np.float32)
        self.quad_u = np.stack([q[2] for q in quads]).astype(np.float32)
        self.quad_v = np.stack([q[3] for q in quads]).astype(np.float32)
        self.quad_hu = np.array([q[4] for q in quads], np.float32)
        self.quad_hv = np.array([q[5] for q in quads], np.float32)
        self.textures = [q[6] for q in quads]
        # pack textures into one padded atlas so the vectorized render can
        # gather each pixel's texel from its winning quad in one pass
        th_max = max(t.shape[0] for t in self.textures)
        tw_max = max(t.shape[1] for t in self.textures)
        self.atlas = np.zeros((len(quads), th_max, tw_max), np.float32)
        self.tex_h = np.zeros(len(quads), np.int32)
        self.tex_w = np.zeros(len(quads), np.int32)
        for i, t in enumerate(self.textures):
            self.atlas[i, : t.shape[0], : t.shape[1]] = t
            self.tex_h[i], self.tex_w[i] = t.shape
        self.res = res
        self._bearing_cache = {}

    def _bearings(self, cam, ss: int = 1):
        key = (cam.rows, cam.cols, id(type(cam)), ss)
        if key not in self._bearing_cache:
            import jax.numpy as jnp
            # ss x ss subpixel sample grid per output pixel (supersampling:
            # box-filters the texture minification that otherwise aliases
            # frame to frame and destabilizes descriptors at distance)
            sub = (np.arange(ss) + 0.5) / ss - 0.5
            us = (np.arange(cam.cols)[:, None] + sub[None, :]).reshape(-1)
            vs = (np.arange(cam.rows)[:, None] + sub[None, :]).reshape(-1)
            uu, vv = np.meshgrid(us, vs)
            pix = np.stack([uu.reshape(-1), vv.reshape(-1)], -1).astype(
                np.float32)
            self._bearing_cache[key] = np.asarray(
                cam.keypoints_to_bearings(jnp.asarray(pix)), np.float64)
        return self._bearing_cache[key]

    def render(self, cam, T_cw: np.ndarray, ss: int = 1) -> np.ndarray:
        R = T_cw[:3, :3].astype(np.float32)
        t = T_cw[:3, 3].astype(np.float32)
        c = -R.T @ t
        d = (self._bearings(cam, ss) @ R).astype(np.float32)  # (P,3) rays
        # cull: near quads only, facing the camera
        rel = self.quad_p0 - c[None, :]
        near = np.einsum("ij,ij->i", rel, rel) < self.max_dist**2
        facing = np.einsum("ij,ij->i", rel, self.quad_n) < 0
        idx = np.where(near & facing)[0]
        P = len(d)
        if len(idx) == 0:
            return np.zeros((cam.rows, cam.cols), np.uint8)
        n = self.quad_n[idx]                     # (V,3)
        p0 = self.quad_p0[idx]
        denom = d @ n.T                          # (P,V)
        denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        num = np.einsum("vk,vk->v", p0 - c[None, :], n)   # (V,)
        lam = num[None, :] / denom               # (P,V)
        # hit-point texture coords without forming the (P,V,3) intermediate:
        # tu = (c + lam d - p0)·u = (c-p0)·u + lam (d·u)
        u_ax, v_ax = self.quad_u[idx], self.quad_v[idx]
        cu = np.einsum("vk,vk->v", c[None, :] - p0, u_ax)
        cv = np.einsum("vk,vk->v", c[None, :] - p0, v_ax)
        tu = cu[None, :] + lam * (d @ u_ax.T)
        tv = cv[None, :] + lam * (d @ v_ax.T)
        ok = (
            (lam > 1e-3)
            & (np.abs(tu) < self.quad_hu[idx][None, :])
            & (np.abs(tv) < self.quad_hv[idx][None, :])
        )
        lam_ok = np.where(ok, lam, np.inf)
        w = np.argmin(lam_ok, axis=1)            # (P,) winning visible quad
        hit = np.isfinite(lam_ok[np.arange(P), w])
        qw = idx[w]                              # global quad index
        tu_w = tu[np.arange(P), w]
        tv_w = tv[np.arange(P), w]
        px = (tu_w + self.quad_hu[qw]) * self.res
        py = (tv_w + self.quad_hv[qw]) * self.res
        x0 = np.clip(np.floor(px).astype(int), 0, self.tex_w[qw] - 2)
        y0 = np.clip(np.floor(py).astype(int), 0, self.tex_h[qw] - 2)
        fx = np.clip(px - x0, 0, 1)
        fy = np.clip(py - y0, 0, 1)
        at = self.atlas
        val = (
            at[qw, y0, x0] * (1 - fx) * (1 - fy)
            + at[qw, y0, x0 + 1] * fx * (1 - fy)
            + at[qw, y0 + 1, x0] * (1 - fx) * fy
            + at[qw, y0 + 1, x0 + 1] * fx * fy
        )
        out = np.where(hit, val, 0.0)
        if ss > 1:
            out = out.reshape(cam.rows, ss, cam.cols, ss).mean(axis=(1, 3))
        return out.reshape(cam.rows, cam.cols).astype(np.uint8)

    # ------------------------------------------------------------------
    # JAX render path: same quad/texture model, jitted so a whole long
    # sequence renders on the accelerator (the numpy path is ~2.6 s/frame
    # at ss=2 — a 4,000-frame stereo cache would take ~6 CPU-hours; the
    # TPU renders it in minutes).  Numerics: the (P,3)x(3,V) ray-quad dot
    # products run at HIGHEST matmul precision — the default one-pass bf16
    # lowering would put ~0.4 px of frame-to-frame jitter on texture
    # coordinates, which shimmers the textures and destabilizes
    # descriptors at distance (same failure the supersampling exists to
    # prevent).  Culling semantics match the numpy path exactly
    # (quad-center distance + backface, folded into the validity mask).
    # ------------------------------------------------------------------
    _RAY_CHUNK = 65536

    def _render_jax_step(self, cam, ss: int):
        """-> jitted fn (R_cw (B,3,3), c_w (B,3)) -> (B, rows, cols) u8."""
        import jax
        import jax.numpy as jnp
        from functools import partial

        rays_np = self._bearings(cam, ss).astype(np.float32)     # (P,3)
        P = len(rays_np)
        C = self._RAY_CHUNK
        n_chunk = -(-P // C)
        pad = n_chunk * C - P
        rays_np = np.concatenate(
            [rays_np, np.zeros((pad, 3), np.float32)], 0)
        rays = jnp.asarray(rays_np.reshape(n_chunk, C, 3))
        p0 = jnp.asarray(self.quad_p0)                           # (V,3)
        nrm = jnp.asarray(self.quad_n)
        u_ax = jnp.asarray(self.quad_u)
        v_ax = jnp.asarray(self.quad_v)
        hu = jnp.asarray(self.quad_hu)
        hv = jnp.asarray(self.quad_hv)
        tex_h = jnp.asarray(self.tex_h)
        tex_w = jnp.asarray(self.tex_w)
        th, tw = self.atlas.shape[1], self.atlas.shape[2]
        atlas_flat = jnp.asarray(self.atlas.reshape(-1))
        res = float(self.res)
        max_d2 = float(self.max_dist) ** 2
        hp = jax.lax.Precision.HIGHEST

        def chunk_fn(d, c, num, quad_ok):
            """d (C,3) rays, c (3,) center, num (V,) = (p0-c)·n."""
            denom = jnp.matmul(d, nrm.T, precision=hp)           # (C,V)
            denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
            lam = num[None, :] / denom
            cu = jnp.einsum("vk,vk->v", p0 - c[None, :], u_ax,
                            precision=hp)
            cv = jnp.einsum("vk,vk->v", p0 - c[None, :], v_ax,
                            precision=hp)
            tu = -cu[None, :] + lam * jnp.matmul(d, u_ax.T, precision=hp)
            tv = -cv[None, :] + lam * jnp.matmul(d, v_ax.T, precision=hp)
            ok = ((lam > 1e-3) & (jnp.abs(tu) < hu[None, :])
                  & (jnp.abs(tv) < hv[None, :]) & quad_ok[None, :])
            lam_ok = jnp.where(ok, lam, jnp.inf)
            w = jnp.argmin(lam_ok, axis=1)                       # (C,)
            hit = jnp.isfinite(jnp.min(lam_ok, axis=1))
            # recompute texture coords at the winner only (O(C)) so the
            # (C,V) intermediates above stay inside the fused reduction
            nw, uw, vw = nrm[w], u_ax[w], v_ax[w]
            dn = jnp.einsum("ck,ck->c", d, nw, precision=hp)
            dn = jnp.where(jnp.abs(dn) < 1e-9, 1e-9, dn)
            lam_w = num[w] / dn
            rel = c[None, :] - p0[w]
            tu_w = jnp.einsum("ck,ck->c", rel + lam_w[:, None] * d, uw,
                              precision=hp)
            tv_w = jnp.einsum("ck,ck->c", rel + lam_w[:, None] * d, vw,
                              precision=hp)
            px = (tu_w + hu[w]) * res
            py = (tv_w + hv[w]) * res
            x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, tex_w[w] - 2)
            y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, tex_h[w] - 2)
            fx = jnp.clip(px - x0, 0, 1)
            fy = jnp.clip(py - y0, 0, 1)
            base = w * (th * tw)
            g = lambda yy, xx: atlas_flat[base + yy * tw + xx]
            val = (g(y0, x0) * (1 - fx) * (1 - fy)
                   + g(y0, x0 + 1) * fx * (1 - fy)
                   + g(y0 + 1, x0) * (1 - fx) * fy
                   + g(y0 + 1, x0 + 1) * fx * fy)
            return jnp.where(hit, val, 0.0)

        def render_one(Rc):
            R, c = Rc                                            # (3,3),(3,)
            rel = p0 - c[None, :]
            num = jnp.einsum("vk,vk->v", rel, nrm, precision=hp)
            quad_ok = (jnp.einsum("vk,vk->v", rel, rel) < max_d2) & (num < 0)
            d_all = jnp.einsum("nck,kj->ncj", rays, R, precision=hp)
            vals = jax.lax.map(
                lambda d: chunk_fn(d, c, num, quad_ok), d_all)   # (n,C)
            img = vals.reshape(-1)[:P]
            if ss > 1:
                img = img.reshape(cam.rows, ss, cam.cols, ss).mean((1, 3))
            return img.reshape(cam.rows, cam.cols).astype(jnp.uint8)

        @partial(jax.jit)
        def step(R_b, c_b):
            return jax.lax.map(render_one, (R_b, c_b))
        return step

    def render_sequence_jax(self, cam, poses_cw, ss: int = 1,
                            batch: int = 16, progress=None) -> np.ndarray:
        """Render ``poses_cw`` (N,4,4) on the default JAX backend ->
        (N, rows, cols) u8.  Frames are processed ``batch`` at a time
        inside one jitted program (lax.map keeps peak memory at one
        frame's intermediates per chunk)."""
        step = self._render_jax_step(cam, ss)
        poses_cw = np.asarray(poses_cw, np.float32)
        N = len(poses_cw)
        R_all = poses_cw[:, :3, :3]
        c_all = -np.einsum("nij,nj->ni", R_all.transpose(0, 2, 1),
                           poses_cw[:, :3, 3])
        out = np.empty((N, cam.rows, cam.cols), np.uint8)
        for s0 in range(0, N, batch):
            s1 = min(s0 + batch, N)
            Rb = np.zeros((batch, 3, 3), np.float32)
            cb = np.zeros((batch, 3), np.float32)
            Rb[: s1 - s0] = R_all[s0:s1]
            cb[: s1 - s0] = c_all[s0:s1]
            out[s0:s1] = np.asarray(step(Rb, cb))[: s1 - s0]
            if progress is not None:
                progress(s1, N)
        return out


def course_trajectory(course, n_frames: int, laps: float = 1.0,
                      look_ahead: float = 6.0, height: float = 0.0,
                      start_s: float = 0.0):
    """Forward-looking drive along a course centerline -> (N, 4, 4) T_cw.
    The camera sits on the centerline at `height` (camera +y is down, so
    negative height is above the road) looking at the centerline point
    `look_ahead` metres further along — the KITTI viewing geometry."""
    s = start_s + course.length * laps * np.arange(n_frames) / n_frames
    pts = course.point(s)
    tgts = course.point(s + look_ahead)
    out = []
    for i in range(n_frames):
        eye = np.array([pts[i, 0], height, pts[i, 1]])
        target = np.array([tgts[i, 0], height, tgts[i, 1]])
        out.append(lookat_pose_cw(eye, target))
    return np.stack(out)


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


class Photometrics:
    """Per-frame photometric degradation for any renderer's u8 output —
    the validation hardener VERDICT r3 asked for (missing #5's buildable
    half): the clean renderer statistics make every acceptance number
    optimistic; real sensors drift exposure, add shot noise, and smear
    under motion.  Wraps a rendered image:

        photo = Photometrics(rng, exposure_drift=0.06, noise_sigma=4.0,
                             motion_blur_px=5)
        img = photo(renderer.render(cam, pose))

    * exposure: multiplicative gain follows a clamped random walk (step
      sigma ``exposure_drift`` per frame, gain in [0.4, 2.0]) — models
      auto-exposure hunting / lighting change between revisits.
    * noise: additive Gaussian, sigma in gray levels (shot/read noise).
    * motion blur: length-``motion_blur_px`` line kernel along ``direction``
      (default horizontal — panning-dominant motion); odd lengths center
      the kernel.
    All stages operate in float and re-quantize to u8 (sensor semantics).
    """

    def __init__(self, rng: np.random.Generator, exposure_drift: float = 0.0,
                 noise_sigma: float = 0.0, motion_blur_px: int = 0,
                 direction: str = "h"):
        self.rng = rng
        self.exposure_drift = float(exposure_drift)
        self.noise_sigma = float(noise_sigma)
        self.motion_blur_px = int(motion_blur_px)
        self.direction = direction
        self.gain = 1.0

    def __call__(self, img: np.ndarray) -> np.ndarray:
        x = img.astype(np.float32)
        if self.motion_blur_px > 1:
            k = self.motion_blur_px
            axis = 1 if self.direction == "h" else 0
            pad = [(0, 0), (0, 0)]
            pad[axis] = (k // 2, k - 1 - k // 2)
            xp = np.pad(x, pad, mode="edge")
            # windowed mean via cumsum with a leading zero slab:
            # sum over xp[i:i+k] = c[i+k] - c[i]
            zshape = list(xp.shape)
            zshape[axis] = 1
            c = np.concatenate(
                [np.zeros(zshape), np.cumsum(xp, axis=axis,
                                             dtype=np.float64)], axis=axis)
            if axis == 1:
                x = ((c[:, k:] - c[:, :-k]) / k).astype(np.float32)
            else:
                x = ((c[k:, :] - c[:-k, :]) / k).astype(np.float32)
        if self.exposure_drift > 0:
            self.gain = float(np.clip(
                self.gain + self.rng.normal(0.0, self.exposure_drift),
                0.4, 2.0))
            x = x * self.gain
        if self.noise_sigma > 0:
            x = x + self.rng.normal(0.0, self.noise_sigma, x.shape)
        return np.clip(np.round(x), 0, 255).astype(np.uint8)
