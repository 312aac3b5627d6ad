"""Synthetic multi-fisheye sequence renderer (test + bench harness).

The reference validates end-to-end on the Lafida dataset (README.md:
238-257), which is not redistributable here. Instead we render synthetic
fisheye images through the REAL Lafida calibration: a procedurally
textured cubic room observed by the rig along a smooth trajectory. This
gives exact ground-truth poses + full multi-view-consistent parallax,
in the spirit of OpenGV's synthetic experiment helpers
(ThirdParty/OpenGV/test/, SURVEY.md §4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import camera as cam_ops
from ..ops import geometry as geo
from ..ops.rig import Rig, mt_mc

ROOM_HALF = 4.0     # half-extent of the cubic room (meters)
LATTICE = 64        # noise lattice resolution


@functools.lru_cache()
def _lattice(seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.uniform(40.0, 220.0, (LATTICE, LATTICE, LATTICE)).astype(np.float32)


def _texture3d(pts: jax.Array, lat: jax.Array,
               place_texture: bool = False) -> jax.Array:
    """Trilinear 3-D value noise at world points (..., 3) -> (...,).

    ``place_texture=True`` adds a PLACE-DISTINCTIVE layer: a very coarse
    style field modulates the local pattern (contrast sign, step gating,
    brightness) so different regions of the world produce different
    descriptor statistics. The default noise is statistically identical
    everywhere — real enough for tracking, but useless for BoW place
    recognition (every view quantizes to the same word histogram);
    loop-closure tests need appearance that actually identifies WHERE
    you are, like real rooms do."""

    def octave(p, freq):
        q = (p / (2 * ROOM_HALF) + 0.5) * freq % (LATTICE - 1)
        q0 = jnp.floor(q).astype(jnp.int32)
        f = q - q0
        q0 = jnp.clip(q0, 0, LATTICE - 2)

        def at(dx, dy, dz):
            return lat[q0[..., 0] + dx, q0[..., 1] + dy, q0[..., 2] + dz]

        c00 = at(0, 0, 0) * (1 - f[..., 0]) + at(1, 0, 0) * f[..., 0]
        c01 = at(0, 0, 1) * (1 - f[..., 0]) + at(1, 0, 1) * f[..., 0]
        c10 = at(0, 1, 0) * (1 - f[..., 0]) + at(1, 1, 0) * f[..., 0]
        c11 = at(0, 1, 1) * (1 - f[..., 0]) + at(1, 1, 1) * f[..., 0]
        c0 = c00 * (1 - f[..., 1]) + c10 * f[..., 1]
        c1 = c01 * (1 - f[..., 1]) + c11 * f[..., 1]
        return c0 * (1 - f[..., 2]) + c1 * f[..., 2]

    # three octaves: coarse structure + fine corner-rich detail + a
    # hard quantized layer (strong step edges -> FAST corners that
    # survive threshold 20 like real indoor texture)
    fine = octave(pts, 97.0)
    steps = jnp.where(fine > 130.0, 60.0, -60.0)
    base = (0.45 * octave(pts, 11.0) + 0.35 * octave(pts, 53.0)
            + 0.2 * fine + 30.0)
    if not place_texture:
        return jnp.clip(base + steps * 0.5, 0.0, 255.0)
    # place-identity style field (~1 m cells): switches the fine
    # (descriptor-scale) structure between two distinct frequencies,
    # flips the step-layer contrast, gates it on/off, and shifts
    # brightness per region — local descriptor constellations then
    # genuinely identify WHERE a view is
    style = octave(pts, 5.0)
    gate = octave(pts, 7.0)
    fine_b = octave(pts, 61.0)
    pick = style > 130.0
    fine2 = jnp.where(pick, fine, fine_b)
    steps2 = jnp.where(fine2 > 130.0, 60.0, -60.0)
    sign = jnp.where(pick, 1.0, -1.0)
    on = jnp.where(gate > 110.0, 1.0, 0.35)
    base2 = (0.45 * octave(pts, 11.0) + 0.35 * octave(pts, 53.0)
             + 0.2 * fine2 + 30.0)
    return jnp.clip(base2 + sign * on * steps2 * 0.5
                    + 0.35 * (style - 130.0), 0.0, 255.0)


def _ray_box_exit(origin: jax.Array, direction: jax.Array,
                  half=None) -> jax.Array:
    """Distance to the room wall along ``direction`` from an interior
    ``origin``: min over axes of the positive boundary hit. ``half`` is
    the per-axis half-extent (default: the ROOM_HALF cube)."""
    if half is None:
        half = (ROOM_HALF, ROOM_HALF, ROOM_HALF)
    half = jnp.asarray(half, direction.dtype)
    d = jnp.where(jnp.abs(direction) < 1e-9, 1e-9, direction)
    t = (jnp.sign(d) * half - origin) / d
    return jnp.min(t, axis=-1)


def make_renderer(rig: Rig, dtype=jnp.float32, room_half=None,
                  door_wall: dict | list[dict] | None = None,
                  place_texture: bool = False,
                  distractors: list[dict] | None = None):
    """Returns render(M_t) -> (n_cams, H, W) float32 images in [0, 255].

    ``distractors``: moving RIGID objects for dynamic-scene stress (the
    reference's benchmark sequence is Lafida "indoor DYNAMIC" — moving
    people, README.md:242-247). Each dict {center (3,), velocity (3,),
    radius} is a textured sphere whose position at render time is
    center + time * velocity; the texture is sampled in the sphere's
    LOCAL frame (plus a per-sphere offset), so its features move
    rigidly with the object — exactly the non-static content the
    tracker's outlier gates must reject. Pass the frame time as
    ``render(M_t, time)``.

    Per-camera pixel rays are precomputed once (camera intrinsics are
    static); each frame is two batched ops: rotate rays into world +
    sample the 3-D texture at the wall hit points.

    ``door_wall``: one dict (or a list of them) describing interior
    occluding walls normal to z, each with a rectangular door opening:
    {z, door_half_x, door_half_y, door_cx, door_cy}. Two walls with
    OFFSET doors form a sightline baffle — rooms either side share no
    landmarks at all (true broken covisibility for loop-closure tests;
    a single centered door leaks sightlines through the opening).

    A dict with an ``x`` key is instead a solid FIN normal to x:
    {x, z_lo, z_hi} spanning the full y extent. A fin across the
    corridor of a double-door baffle blocks the diagonal rays that
    thread BOTH door openings — without it, strips of the far room's
    outer walls are visible from deep in the near room, and those
    always-visible surfaces breed landmarks observed by every keyframe
    of every era, permanently bridging covisibility across the loop.

    Interior walls sample the texture offset by +-0.04 m along the wall
    normal by APPROACH SIDE: the walls are infinitely thin, so without
    the offset both faces render the same 3-D texture slab and a
    feature on one face matches its mirror image seen from the other
    room — the same cross-era covisibility bridge in disguise.
    """
    h = int(float(rig.cams.height[0]))
    w = int(float(rig.cams.width[0]))
    uu, vv = np.meshgrid(np.arange(w, dtype=np.float64),
                         np.arange(h, dtype=np.float64))
    uv = np.stack([uu, vv], -1).reshape(-1, 2)
    # compute per-pixel rays once, ON THE CPU BACKEND, then pin as
    # numpy: (a) a jit closure must not capture device arrays —
    # embedding them as MLIR constants forces a device->host fetch at
    # lowering time; (b) computing them on the accelerator would mean
    # downloading ~13MB of rays through the device link — measured
    # through this harness's remote-TPU tunnel, device->host transfers
    # are erratically slow (multi-second stalls), while the CPU compute
    # costs ~1s. The render itself still runs on the default backend.
    cams_host = jax.tree.map(np.asarray, rig.cams)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            rays_cam = np.asarray(
                jax.vmap(lambda c: cam_ops.img_to_world(
                    c, jnp.asarray(uv)))(cams_host)).astype(np.float32)
    except RuntimeError:   # no CPU backend registered: compute in place
        rays_cam = np.asarray(
            jax.vmap(lambda c: cam_ops.img_to_world(
                c, jnp.asarray(uv)))(
                jax.tree.map(jnp.asarray, rig.cams))).astype(np.float32)
    rays_cam = rays_cam.reshape(rig.n_cams, h, w, 3)
    lat = _lattice()

    @jax.jit
    def render_impl(M_t: jax.Array, rays: jax.Array,
                    time: jax.Array = jnp.float32(0.0)) -> jax.Array:
        T = mt_mc(M_t, rig.M_c)                      # (N,4,4) cam->world
        R = T[:, :3, :3]
        C = T[:, :3, 3]                               # camera centres
        rays_w = jnp.einsum("nij,nhwj->nhwi", R, rays)
        o = C[:, None, None, :]
        t = _ray_box_exit(o, rays_w, room_half)
        walls = door_wall if isinstance(door_wall, (list, tuple)) \
            else ([door_wall] if door_wall else [])
        # per-pixel texture-sample offset along the winning wall's
        # normal, signed by approach side (see docstring)
        bias = jnp.zeros_like(rays_w)
        for wall in walls:
            if "x" in wall:
                # solid fin normal to x spanning [z_lo, z_hi]; full y,
                # or with a |y| < y_pass passage aperture
                wx = wall["x"]
                zlo, zhi = wall.get("z_lo", 0.0), wall.get("z_hi", 0.8)
                t_f = (wx - o[..., 0]) / jnp.where(
                    jnp.abs(rays_w[..., 0]) < 1e-9, 1e-9, rays_w[..., 0])
                pz = o[..., 2] + t_f * rays_w[..., 2]
                solid = (t_f > 1e-4) & (pz >= zlo) & (pz <= zhi)
                if "y_pass" in wall:
                    pyf = o[..., 1] + t_f * rays_w[..., 1]
                    solid &= jnp.abs(pyf) >= wall["y_pass"]
                dxr = rays_w[..., 0]
                won = solid & (t_f < t)
                t = jnp.where(won, t_f, t)
                off = jnp.stack([0.04 * jnp.sign(dxr),
                                 jnp.zeros_like(dxr),
                                 jnp.zeros_like(dxr)], -1)
                bias = jnp.where(won[..., None], off, bias)
                continue
            # interior occluding wall at z = wz with a door opening —
            # rooms whose keyframes share no landmarks except through
            # the doorway (enables organic loop closures)
            wz = wall.get("z", 0.0)
            dx = wall.get("door_half_x", 0.7)
            dy = wall.get("door_half_y", 1.2)
            cx = wall.get("door_cx", 0.0)
            cy = wall.get("door_cy", 0.0)
            dz = rays_w[..., 2]
            t_wall = (wz - o[..., 2]) / jnp.where(jnp.abs(dz) < 1e-9,
                                                  1e-9, dz)
            px = o[..., 0] + t_wall * rays_w[..., 0]
            py = o[..., 1] + t_wall * rays_w[..., 1]
            solid = (t_wall > 1e-4) & ~((jnp.abs(px - cx) < dx)
                                        & (jnp.abs(py - cy) < dy))
            won = solid & (t_wall < t)
            t = jnp.where(won, t_wall, t)
            off = jnp.stack([jnp.zeros_like(dz), jnp.zeros_like(dz),
                             0.04 * jnp.sign(dz)], -1)
            bias = jnp.where(won[..., None], off, bias)
        # moving rigid distractors: ray-sphere, texture in LOCAL frame
        for i, dsc in enumerate(distractors or []):
            c = jnp.asarray(dsc["center"], rays_w.dtype) \
                + time * jnp.asarray(dsc["velocity"], rays_w.dtype)
            r = float(dsc["radius"])
            oc = o - c
            b = jnp.einsum("...i,...i->...", rays_w, oc)
            cq = jnp.einsum("...i,...i->...", oc, oc) - r * r
            disc = b * b - cq
            t_s = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
            won = (disc > 0) & (t_s > 1e-4) & (t_s < t)
            t = jnp.where(won, t_s, t)
            # texture rides the object: shift the sample point into the
            # sphere's local frame (+ per-sphere offset for distinct
            # appearance); clears any wall bias where the sphere wins
            off = jnp.asarray([7.1 * (i + 1), -3.3 * (i + 1), 1.7],
                              rays_w.dtype)
            bias = jnp.where(won[..., None], off - c, bias)
        hits = o + t[..., None] * rays_w + bias
        img = _texture3d(hits, jnp.asarray(lat), place_texture)
        return jnp.clip(img, 0.0, 255.0)

    rays_dev = jax.device_put(rays_cam)
    render_batch_impl = jax.jit(jax.vmap(render_impl, in_axes=(0, None, 0)))

    def render(M_t: jax.Array, time=None) -> jax.Array:
        """(4,4) pose -> (n_cams,H,W) frame; (B,4,4) poses -> a
        (B,n_cams,H,W) batch rendered in ONE dispatch (each separate
        dispatch through a remote-accelerator link risks a stall, so
        sequence producers prefer one batched call). ``time``: frame
        time(s) driving distractor motion (scalar, or (B,) for a batch;
        default 0)."""
        M_t = jnp.asarray(M_t)
        if M_t.ndim == 3:
            tt = jnp.zeros(M_t.shape[0], jnp.float32) if time is None \
                else jnp.asarray(time, jnp.float32)
            return render_batch_impl(M_t, rays_dev, tt)
        tt = jnp.float32(0.0 if time is None else time)
        return render_impl(M_t, rays_dev, tt)

    return render


def lateral_trajectory(n_frames: int, step: float = 0.05,
                       yaw_rate: float = 0.004) -> np.ndarray:
    """(n_frames, 4, 4) poses: constant lateral translation + slow yaw —
    the parallax-friendliest motion for monocular-style initialization."""
    out = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        ang = yaw_rate * i
        c, s = np.cos(ang), np.sin(ang)
        out[i, :3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        out[i, :3, 3] = [step * i, 0.004 * i, 0.002 * i]
        out[i, 3, 3] = 1.0
    return out


def two_room_loop_trajectory(n_frames: int, depth: float = 1.6,
                             width: float = 1.4) -> np.ndarray:
    """(n_frames, 4, 4) poses: start in room A (z<0) near the door, pass
    through the door (at z=0, x=0), tour room B, and return through the
    door to the start — a genuine revisit with covisibility broken by
    the wall (use with make_renderer(door_wall=...))."""
    # waypoints in (x, z)
    wps = np.array([
        [0.0, -depth], [0.0, -0.4], [0.0, 0.5], [width * 0.7, depth * 0.7],
        [0.0, depth * 1.2], [-width * 0.7, depth * 0.7], [0.0, 0.5],
        [0.0, -0.4], [0.0, -depth],
    ])
    # arc-length resample
    seg = np.linalg.norm(np.diff(wps, axis=0), axis=1)
    cum = np.concatenate([[0], np.cumsum(seg)])
    s = np.linspace(0, cum[-1], n_frames)
    x = np.interp(s, cum, wps[:, 0])
    z = np.interp(s, cum, wps[:, 1])
    out = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        out[i] = np.eye(4)
        out[i][:3, 3] = [x[i], 0.0, z[i]]
    return out


def two_room_revisit_trajectory(n_frames: int, depth: float = 1.6,
                                width: float = 1.4) -> np.ndarray:
    """Two-room tour that RE-TOURS room A after returning through the
    door: an initialization-friendly lateral opening segment, the room-B
    loop of :func:`two_room_loop_trajectory`, then a dwell circuit in
    room A so several keyframes are created after the revisit — the
    loop closer needs CONSISTENCY_TH consecutive detections before it
    fires (cLoopClosing.cpp:166-241)."""
    wps = np.array([
        # lateral start segment (parallax for initialization)
        [0.0, -depth], [0.45, -depth * 1.05], [0.0, -0.9],
        # through the door, tour room B, come back
        [0.0, -0.4], [0.0, 0.5], [width * 0.7, depth * 0.7],
        [0.0, depth * 1.2], [-width * 0.7, depth * 0.7], [0.0, 0.5],
        [0.0, -0.4], [0.0, -depth],
        # dwell: re-tour room A
        [width * 0.5, -depth * 1.2], [0.0, -depth * 1.5],
        [-width * 0.5, -depth * 1.2], [0.0, -depth],
    ])
    seg = np.linalg.norm(np.diff(wps, axis=0), axis=1)
    cum = np.concatenate([[0], np.cumsum(seg)])
    s = np.linspace(0, cum[-1], n_frames)
    x = np.interp(s, cum, wps[:, 0])
    z = np.interp(s, cum, wps[:, 1])
    out = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        out[i] = np.eye(4)
        out[i][:3, 3] = [x[i], 0.0, z[i]]
    return out


# Baffle world: two interior walls with OFFSET doors. A near-180-degree
# fisheye rig sees straight through a single doorway, so a one-wall
# "two-room" split never actually breaks covisibility; two offset doors
# leave no straight sightline between room A (z < 0) and room B
# (z > 0.8), so revisiting room A is a genuine loop-closure event.
BAFFLE_ROOM_HALF = (2.2, 2.2, 3.6)
# two offset-door walls. A corridor fin (dict(x=..., z_lo, z_hi
# [, y_pass])) can additionally block the diagonal rays that thread
# both door openings, but measured across several configurations the
# fin's passage slot is a visual pinch the tracker cannot thread at
# tour pace (the fin edge sweeps the whole near field in a few
# frames), so the baffle default stays fin-less; the thin walls
# instead render side-dependent texture (see make_renderer) so at
# least their two faces cannot masquerade as one surface.
BAFFLE_WALLS = (
    dict(z=0.0, door_half_x=0.5, door_half_y=1.2, door_cx=-0.9),
    dict(z=0.8, door_half_x=0.5, door_half_y=1.2, door_cx=0.9),
)


def baffle_revisit_trajectory(n_frames: int) -> np.ndarray:
    """Tour room A -> corridor (two offset doors) -> tour room B ->
    return -> RE-TOUR room A. Pure translation (identity rotation) like
    the other synthetic paths; the opening segment is lateral for
    initialization parallax; the closing circuit keeps creating
    keyframes after the revisit so DetectLoop can reach its
    CONSISTENCY_TH consecutive detections (cLoopClosing.cpp:166-241)."""
    # corners are ROUNDED with intermediate waypoints: the per-frame
    # motion in the tight corridor is large relative to the matching
    # windows, so a sharp 90-degree turn breaks the constant-velocity
    # motion model and loses tracking deterministically
    corridor_out = [
        [-0.9, -0.9], [-0.9, -0.3], [-0.85, 0.1], [-0.4, 0.42],
        [0.4, 0.42], [0.85, 0.7], [0.9, 1.3],
    ]
    wps = np.array([
        # room A: lateral opening (parallax) + approach to door 1
        [0.0, -2.2], [0.5, -2.35], [-0.2, -1.5],
        *corridor_out,
        # room B tour
        [0.3, 2.0], [-0.3, 2.2], [-0.8, 1.6],
        *corridor_out[::-1],
        # room A re-tour (the revisit): a smooth circuit — sharp
        # direction reversals break the motion model and force
        # relocalizations, which re-anchor the map outside the
        # loop-closing path under test; 1.5 laps so the loop detector
        # gets several keyframes of consistent revisit evidence
        [-0.3, -1.4], [0.3, -1.7], [0.5, -2.2], [0.0, -2.5],
        [-0.6, -2.1], [-0.4, -1.6], [0.1, -1.5], [0.4, -1.9],
        [0.1, -2.3], [-0.4, -2.1],
    ])
    seg = np.linalg.norm(np.diff(wps, axis=0), axis=1)
    cum = np.concatenate([[0], np.cumsum(seg)])
    s = np.linspace(0, cum[-1], n_frames)
    x = np.interp(s, cum, wps[:, 0])
    z = np.interp(s, cum, wps[:, 1])
    out = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        out[i] = np.eye(4)
        out[i][:3, 3] = [x[i], 0.0, z[i]]
    return out


def baffle_revisit_trajectory_short(n_frames: int) -> np.ndarray:
    """CI-budget variant of :func:`baffle_revisit_trajectory`: the same
    baffle world, ~19 m of path walked at a brisker pace so the episode
    fits in ~112 frames. The opening is a full LAP of room A: the
    revisited era must hold MANY keyframes spread over the room —
    DetectLoop excludes every keyframe sharing even one landmark with
    the query (GetConnectedKeyFrames semantics), and a couple of
    long-lived doorway landmarks always bridge the eras, so a sparse
    4-keyframe era gets wholly excluded while a 10-keyframe lap keeps
    unconnected members available as candidates. The revisit retraces
    the lap so the candidates score like near-duplicates."""
    corridor_out = [
        [-0.9, -0.9], [-0.9, -0.3], [-0.85, 0.1], [-0.4, 0.42],
        [0.4, 0.42], [0.85, 0.7], [0.9, 1.3],
    ]
    lap = [
        [0.0, -2.2], [0.6, -2.05], [0.85, -1.5], [0.35, -1.15],
        [-0.45, -1.3], [-0.85, -1.85], [-0.35, -2.25],
    ]
    wps = np.array([
        # room A: a full lap (parallax for initialization + a spread of
        # era-A keyframe poses), then approach door 1
        *lap,
        [-0.2, -1.5],
        *corridor_out,
        # brief room B dip (out of room A's sight for the covisibility
        # break; the drift pulse lands here — deep enough that room-B
        # tracking has stable medium-range support while it absorbs
        # the pulse)
        [0.35, 2.0], [-0.3, 2.05],
        *corridor_out[::-1],
        # room A re-tour: retrace the lap (reverse order, same places)
        [-0.5, -1.3], [0.35, -1.15], [0.85, -1.5], [0.6, -2.05],
        [0.0, -2.2], [-0.35, -2.25], [-0.85, -1.85],
    ])
    seg = np.linalg.norm(np.diff(wps, axis=0), axis=1)
    cum = np.concatenate([[0], np.cumsum(seg)])
    s = np.linspace(0, cum[-1], n_frames)
    x = np.interp(s, cum, wps[:, 0])
    z = np.interp(s, cum, wps[:, 1])
    out = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        out[i] = np.eye(4)
        out[i][:3, 3] = [x[i], 0.0, z[i]]
    return out


def make_ba_problem(rig: Rig, n_kf: int, n_pt: int, *,
                    max_obs_per_pt: int = 8, noise_px: float = 0.5,
                    seed: int = 0):
    """Vectorized synthetic global-BA problem at MAP scale.

    Samples keyframe poses along a slow arc and world points in a shell,
    projects every (kf, point) pair through the rig in one batched call,
    keeps up to ``max_obs_per_pt`` observations per point (first valid
    camera per keyframe), and adds pixel noise. Returns
    (mt_true (N,6), X_true (P,3), uv (K+1,2), kf, cam, pt, valid,
    pt_obs (P,M)) as numpy arrays with the optimizer's one-invalid-pad-row
    convention — the building block for multi-chip BA scaling runs
    (cOptimizer::GlobalBundleAdjustment workload shape,
    cOptimizer.cpp:57-257: all keyframes x all points).
    """
    from ..ops.rig import world_to_img_rig

    rng = np.random.default_rng(seed)
    # poses: slow arc with yaw (like a real trajectory's keyframes)
    ang = np.linspace(0, 1.5 * np.pi, n_kf)
    mt_true = np.zeros((n_kf, 6))
    mt_true[:, 1] = np.tan(ang / 4.0)             # cayley yaw = tan(th/2)
    mt_true[:, 3] = 0.8 * np.sin(ang)
    mt_true[:, 5] = 0.8 * (np.cos(ang) - 1.0)
    mt_true[:, 4] = 0.1 * np.sin(3 * ang)
    # points: shell around the trajectory
    X = rng.standard_normal((n_pt, 3))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    X *= rng.uniform(2.0, 5.0, (n_pt, 1))

    @jax.jit
    def project_all(mt_all, Xj):
        def one(mt):
            return world_to_img_rig(rig, geo.cayley2hom(mt), Xj)
        return jax.vmap(one)(mt_all)

    uv_all, zpos = project_all(jnp.asarray(mt_true), jnp.asarray(X))
    uv_all = np.asarray(uv_all)                    # (N, C, P, 2)
    zpos = np.asarray(zpos)                        # (N, C, P)
    w = np.asarray(rig.cams.width, np.float32)[None, :, None]
    h = np.asarray(rig.cams.height, np.float32)[None, :, None]
    ok = (zpos & (uv_all[..., 0] > 40) & (uv_all[..., 0] < w - 40)
          & (uv_all[..., 1] > 40) & (uv_all[..., 1] < h - 40))
    first_cam = np.argmax(ok, axis=1)              # (N, P)
    vis = ok.any(axis=1)                           # (N, P)
    # keep up to M observing keyframes per point, SPREAD evenly over the
    # point's visible span (taking the first M would starve the later
    # keyframes of observations and ill-condition the reduced camera
    # system): entry r of n visible is kept iff it is the first in its
    # stride bucket floor(r*M/n)
    vis_pn = vis.T                                 # (P, N)
    Mo = max_obs_per_pt
    rank = np.cumsum(vis_pn, axis=1) - 1
    n_vis = np.maximum(vis_pn.sum(axis=1, keepdims=True), 1)
    bucket_id = rank * Mo // n_vis
    prev_bucket = (rank - 1) * Mo // n_vis
    keep = vis_pn & ((bucket_id != prev_bucket) | (rank == 0)) \
        & (rank < n_vis) & (bucket_id < Mo)
    pt_idx, kf_idx = np.nonzero(keep)
    cam_idx = first_cam[kf_idx, pt_idx]
    K = len(pt_idx)
    uv = np.zeros((K + 1, 2))
    uv[:K] = uv_all[kf_idx, cam_idx, pt_idx] \
        + rng.normal(0, noise_px, (K, 2))
    kf = np.zeros(K + 1, np.int32)
    kf[:K] = kf_idx
    cam = np.zeros(K + 1, np.int32)
    cam[:K] = cam_idx
    pt = np.zeros(K + 1, np.int32)
    pt[:K] = pt_idx
    valid = np.zeros(K + 1, bool)
    valid[:K] = True
    pt_obs = np.full((n_pt, max_obs_per_pt), K, np.int32)  # pad -> invalid
    # rank among KEPT observations (<= Mo per point), not among visible
    keep_rank = np.cumsum(keep, axis=1) - 1
    pt_obs[pt_idx, keep_rank[pt_idx, kf_idx]] = np.arange(K)
    return mt_true, X, uv, kf, cam, pt, valid, pt_obs


def bench_trajectory(n_frames: int, radius: float = 0.8,
                     opening: int = 12, step: float = 0.05) -> np.ndarray:
    """Benchmark sequence: a deliberate lateral opening segment (pure
    sideways translation — bootstrap parallax with zero rotation)
    followed by the :func:`smooth_trajectory` arc.

    The reference's own benchmark does exactly this: the Lafida run
    starts at frame 25 (Slam_Settings_indoor1.yaml:54-56), after the
    operator's deliberate initialization motion. Measured on this
    renderer, initialization on the bare arc takes ~30 frames — the
    arc's continuous yaw (~2.7 deg/frame) fights the init matcher's
    fixed window while the 5-pt gates wait for baseline, so a bench
    over 60 arc frames spends half its frames NOT doing SLAM
    (BENCH_r03 full_system: 2 keyframes, <=3 tracked frames). With the
    lateral opening the system initializes by frame ~8 and the timed
    region measures sustained tracking+mapping, like the reference's
    frames 25-759."""
    lat = lateral_trajectory(opening, step=step, yaw_rate=0.0)
    arc = smooth_trajectory(max(n_frames - opening + 1, 2), radius=radius)
    # continue the arc from the opening's end pose (arc[0] = identity)
    tail = np.einsum("ij,njk->nik", lat[-1], arc[1:])
    return np.concatenate([lat, tail])[:n_frames]


def smooth_trajectory(n_frames: int, radius: float = 1.0,
                      height_amp: float = 0.2) -> np.ndarray:
    """(n_frames, 4, 4) body-to-world poses: a slow arc with yaw, like a
    handheld indoor sweep. Ground truth for ATE evaluation."""
    out = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        ang = 0.9 * np.sin(2 * np.pi * s * 0.5)
        c, sn = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, sn], [0, 1, 0], [-sn, 0, c]])
        t = np.array([radius * np.sin(2 * np.pi * s * 0.5),
                      height_amp * np.sin(2 * np.pi * s),
                      radius * (np.cos(2 * np.pi * s * 0.5) - 1.0)])
        out[i, :3, :3] = R
        out[i, :3, 3] = t
        out[i, 3, 3] = 1.0
    return out
