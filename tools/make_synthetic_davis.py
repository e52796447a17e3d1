"""Build a synthetic DAVIS-contract dataset for end-to-end pipeline runs.

Real DAVIS/STv2/FBMS frames are not redistributable with this repo (and not
present in the build image), so quality regression runs use this generator:
textured moving squares over a textured background at the real 480x854
resolution, with piecewise-constant ground-truth flow written in the exact
reference data contract (`/root/reference` `dataset/data.py:117-133`):

  JPEGImages/480p/<seq>/%05d.jpg     RGB frames
  Flows_NewCT/480p/<seq>/%05d.npy    forward flow, file i = frames (i-1, i)
  BackwardFlows_NewCT/480p/<seq>/... backward flow
  Annotations/480p/<seq>/%05d.png    GT masks (eval only)
  trainval.txt / val.txt             split files ("<dir>/ frame.jpg ...")

The motion is exactly the relaxed-common-fate signal (constant flow per
object), so stage-1 training should drive mIoU -> ~95 within tens of
epochs; see RESULTS.md for measured numbers.

Usage: python tools/make_synthetic_davis.py --out /tmp/synth_davis \
          [--seqs 3] [--frames 40] [--height 480] [--width 854]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def _texture(rng: np.random.Generator, h: int, w: int, base: np.ndarray) -> np.ndarray:
    """Smooth colored noise texture around a base color."""
    noise = rng.standard_normal((h // 8 + 2, w // 8 + 2, 3))
    img = np.asarray(Image.fromarray(
        ((noise - noise.min()) / (np.ptp(noise) + 1e-9) * 255).astype(np.uint8)
    ).resize((w, h), Image.BILINEAR), dtype=np.float32)
    return np.clip(0.6 * img + 0.4 * base[None, None], 0, 255)


def make_sequence(root: str, seq: str, n_frames: int, h: int, w: int,
                  rng: np.random.Generator) -> None:
    dirs = {k: os.path.join(root, k, "480p", seq) for k in
            ("JPEGImages", "Annotations", "Flows_NewCT", "BackwardFlows_NewCT")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    bg = _texture(rng, h, w, rng.uniform(40, 120, 3))
    size = int(rng.integers(min(h, w) // 5, min(h, w) // 3))
    fg = _texture(rng, size, size, rng.uniform(150, 240, 3))
    # Constant per-sequence object velocity (the common-fate signal) plus a
    # small constant background drift.
    v_obj = rng.uniform(-6, 6, 2)
    v_bg = rng.uniform(-1.5, 1.5, 2)
    pos0 = np.array([rng.uniform(0, h - size), rng.uniform(0, w - size)])

    def frame_at(t: int):
        # wrap the object inside the frame
        span = np.array([h - size, w - size], np.float64)
        pos = pos0 + v_obj * t
        pos = np.abs((pos % (2 * span)) - span) * np.sign(span)  # reflect
        y, x = int(round(pos[0])), int(round(pos[1]))
        img = np.roll(bg, (int(v_bg[0] * t), int(v_bg[1] * t)), axis=(0, 1)).copy()
        img[y : y + size, x : x + size] = fg
        mask = np.zeros((h, w), np.uint8)
        mask[y : y + size, x : x + size] = 255
        return img, mask, np.array([y, x])

    prev = None
    for t in range(n_frames):
        img, mask, yx = frame_at(t)
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(dirs["JPEGImages"], f"{t:05d}.jpg"), quality=95)
        Image.fromarray(mask).save(os.path.join(dirs["Annotations"], f"{t:05d}.png"))
        if prev is not None:
            p_img, p_mask, p_yx = prev
            d = (yx - p_yx).astype(np.float32)
            # flow file t relates frames (t-1, t): forward = where each
            # pixel of t-1 moves to (u=x, v=y), piecewise constant.
            fw = np.zeros((h, w, 2), np.float32)
            fw[..., 0] = v_bg[1]
            fw[..., 1] = v_bg[0]
            fw[p_mask > 0] = (d[1], d[0])
            bw = np.zeros((h, w, 2), np.float32)
            bw[..., 0] = -v_bg[1]
            bw[..., 1] = -v_bg[0]
            bw[mask > 0] = (-d[1], -d[0])
            np.save(os.path.join(dirs["Flows_NewCT"], f"{t:05d}.npy"), fw)
            np.save(os.path.join(dirs["BackwardFlows_NewCT"], f"{t:05d}.npy"), bw)
        prev = (img, mask, yx)


# --------------------------------------------------------------------------
# "hard" level (VERDICT r3 item 4): the easy generator saturates stage 1 at
# ~95 mIoU, leaving no measurable headroom for the stage-2 CRF/PL machinery
# (the reference's own stage gains are 78.9 -> 80.9 -> 83.0, README.md:62).
# Hard sequences add, with exact analytic GT flow throughout:
#   * an affine CAMERA (pan + slight zoom + rotation) -> non-constant
#     background flow that the model's affine background fit must absorb;
#   * affine OBJECT motion (rotation / anisotropic "breathing" deformation
#     on top of translation) -> non-constant object flow;
#   * THIN structures (elongated bars) and low fg/bg contrast;
#   * a foreground OCCLUDER strip that moves with the camera and partially
#     hides the object (occluded pixels carry background flow and are
#     excluded from the GT mask).
# All motions stay piecewise-AFFINE, which is exactly the model family of
# the relaxed common-fate loss (flow_aggregation head fits an affine flow
# per channel) — learnable, but no longer trivial.
# --------------------------------------------------------------------------


def _affine3(mat2x3: np.ndarray) -> np.ndarray:
    m = np.eye(3, dtype=np.float64)
    m[:2] = mat2x3
    return m


def _affine_flow(m_prev: np.ndarray, m_next: np.ndarray, h: int, w: int) -> np.ndarray:
    """Flow x -> m_next(m_prev^-1(x)) - x on the pixel grid ([..., (u,v)])."""
    t = _affine3(m_next) @ np.linalg.inv(_affine3(m_prev))
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    u = t[0, 0] * xs + t[0, 1] * ys + t[0, 2] - xs
    v = t[1, 0] * xs + t[1, 1] * ys + t[1, 2] - ys
    return np.stack([u, v], axis=-1).astype(np.float32)


def _camera_mat(t: int, h: int, w: int, pan: np.ndarray, zoom_rate: float,
                rot_rate: float, margin: int) -> np.ndarray:
    """Texture->frame affine of the camera at time t (about frame center)."""
    cx, cy = w / 2.0, h / 2.0
    s = (1.0 + zoom_rate) ** t
    a = rot_rate * t
    ca, sa = np.cos(a) * s, np.sin(a) * s
    # frame = R_s @ (tex - tex_center_at_t) + frame_center
    tx = margin + cx + pan[1] * t
    ty = margin + cy + pan[0] * t
    return np.array([[ca, -sa, cx - (ca * tx - sa * ty)],
                     [sa, ca, cy - (sa * tx + ca * ty)]], np.float64)


def _object_mat(t: int, c0: np.ndarray, vel: np.ndarray, rot_rate: float,
                sx: float, sy: float, breath_amp: float, breath_rate: float,
                patch: int) -> np.ndarray:
    """Object-patch->frame affine at time t (anisotropic scale + rotation)."""
    a = rot_rate * t
    bx = sx * (1.0 + breath_amp * np.sin(breath_rate * t))
    by = sy * (1.0 + breath_amp * np.cos(breath_rate * t))
    ca, sa = np.cos(a), np.sin(a)
    cy, cx = c0[0] + vel[0] * t, c0[1] + vel[1] * t
    half = patch / 2.0
    rs = np.array([[ca * bx, -sa * by], [sa * bx, ca * by]])
    off = np.array([cx, cy]) - rs @ np.array([half, half])
    return np.array([[rs[0, 0], rs[0, 1], off[0]], [rs[1, 0], rs[1, 1], off[1]]],
                    np.float64)


def make_hard_sequence(root: str, seq: str, kind: str, n_frames: int, h: int,
                       w: int, rng: np.random.Generator,
                       star_halfw: tuple[float, float] = (2.5, 3.5),
                       flow_blur: float = 0.0, flow_noise: float = 0.0) -> None:
    import cv2

    dirs = {k: os.path.join(root, k, "480p", seq) for k in
            ("JPEGImages", "Annotations", "Flows_NewCT", "BackwardFlows_NewCT")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    # Camera: pan fast enough to matter, zoom/rotate slightly (affine bg).
    margin = 160
    pan = rng.uniform(-3.0, 3.0, 2)
    zoom_rate = rng.uniform(-0.0025, 0.0025)
    cam_rot = rng.uniform(-0.0025, 0.0025)
    bg_base = rng.uniform(60, 140, 3)
    bg_tex = _texture(rng, h + 2 * margin, w + 2 * margin, bg_base)
    # Sharper detail so the background is not trivially smooth.
    bg_tex = np.clip(
        bg_tex + rng.standard_normal(bg_tex.shape) * 12.0, 0, 255)

    # Object: LOW contrast vs background (hard appearance), affine motion.
    patch = 288
    # Moderate contrast: visible appearance boundary (the CRF machinery
    # needs edges to latch onto) but far from the easy generator's
    # bright-on-dark separation.
    fg_base = np.clip(bg_base + rng.uniform(45, 80, 3) * rng.choice([-1, 1], 3), 0, 255)
    fg_tex = _texture(rng, patch, patch, fg_base)
    fg_tex = np.clip(fg_tex + rng.standard_normal(fg_tex.shape) * 10.0, 0, 255)
    yy, xx = np.mgrid[0:patch, 0:patch].astype(np.float32)
    cyx = (patch - 1) / 2.0
    if kind == "thin_bar":
        alpha = ((np.abs(yy - cyx) < patch * 0.045)
                 & (np.abs(xx - cyx) < patch * 0.49)).astype(np.float32)
        obj_rot = rng.uniform(0.02, 0.05) * rng.choice([-1, 1])
        sx = sy = rng.uniform(0.9, 1.3)
        breath_amp = 0.0
    elif kind == "star":
        # Spoked star: a small central disk plus K thin radial arms (~7 px
        # wide at the tip). At the 96^2 mask grid a 480p 7-px arm is ~1.4 px
        # — structurally unresolvable for the mask head, while full-res CRF
        # machinery CAN latch onto the arm edges: the de-saturating content
        # VERDICT r3 #4 asks for, and exactly where the in-training CRF grid
        # resolution (#3) should discriminate.
        k_arms = int(rng.integers(8, 11))
        r = np.hypot(yy - cyx, xx - cyx)
        th = np.arctan2(yy - cyx, xx - cyx)
        phase = rng.uniform(0, 2 * np.pi)
        # distance (rad) to the nearest arm direction
        d_arm = np.abs(((th - phase) * k_arms + np.pi) % (2 * np.pi) - np.pi) / k_arms
        r_in, r_out = patch * 0.22, patch * 0.48
        half_w_px = rng.uniform(*star_halfw)  # arm half-width in pixels
        arm = (d_arm * np.maximum(r, 1.0) < half_w_px) & (r < r_out)
        alpha = (arm | (r < r_in)).astype(np.float32)
        obj_rot = rng.uniform(0.02, 0.04) * rng.choice([-1, 1])
        sx = sy = 1.0
        breath_amp = 0.0
    elif kind == "breathing":
        rr = ((yy - cyx) / (patch * 0.40)) ** 2 + ((xx - cyx) / (patch * 0.30)) ** 2
        alpha = (rr < 1.0).astype(np.float32)
        obj_rot = rng.uniform(-0.01, 0.01)
        sx, sy = rng.uniform(0.7, 1.0), rng.uniform(0.7, 1.0)
        breath_amp = rng.uniform(0.10, 0.18)
    else:  # rotating ellipse
        rr = ((yy - cyx) / (patch * 0.38)) ** 2 + ((xx - cyx) / (patch * 0.26)) ** 2
        alpha = (rr < 1.0).astype(np.float32)
        obj_rot = rng.uniform(0.03, 0.06) * rng.choice([-1, 1])
        sx, sy = rng.uniform(0.8, 1.2), rng.uniform(0.8, 1.2)
        breath_amp = 0.0
    breath_rate = rng.uniform(0.25, 0.45)
    # Object velocity in frame coords; y-range kept smaller so the full
    # clip's travel fits the 480-px height with margins.
    v_obj = np.array([rng.uniform(-2.0, 2.0), rng.uniform(-5.0, 5.0)])
    # Keep the object center inside [margin_px, dim - margin_px] for the
    # whole clip: both c0 and c0 + v*(n-1) must be in bounds.
    travel = v_obj * (n_frames - 1)
    dims = np.array([h, w], np.float64)
    m_px = 130.0
    lo = m_px - np.minimum(travel, 0.0)
    hi = dims - m_px - np.maximum(travel, 0.0)
    bad = lo >= hi  # too fast for the span: park it mid-frame
    lo = np.where(bad, dims / 2 - 1, lo)
    hi = np.where(bad, dims / 2 + 1, hi)
    c0 = rng.uniform(lo, hi)

    # Occluder: a textured vertical strip fixed to the SCENE (moves with the
    # camera), in FRONT of the object.
    occlude = kind in ("rot_ellipse", "thin_bar")
    occ_x0 = int(rng.uniform(0.35, 0.6) * (w + 2 * margin))
    occ_w = int(rng.uniform(0.035, 0.06) * w)
    occ_tex = _texture(rng, h + 2 * margin, occ_w,
                       np.clip(bg_base + rng.uniform(-35, 35, 3), 0, 255))
    occ_alpha_tex = np.zeros((h + 2 * margin, w + 2 * margin), np.float32)
    occ_full = np.zeros((h + 2 * margin, w + 2 * margin, 3), np.float32)
    if occlude:
        occ_alpha_tex[:, occ_x0:occ_x0 + occ_w] = 1.0
        occ_full[:, occ_x0:occ_x0 + occ_w] = occ_tex

    def render(t: int):
        m_cam = _camera_mat(t, h, w, pan, zoom_rate, cam_rot, margin)
        m_obj = _object_mat(t, c0, v_obj, obj_rot, sx, sy, breath_amp,
                            breath_rate, patch)
        flags = cv2.INTER_LINEAR
        bg = cv2.warpAffine(bg_tex, m_cam[:2].astype(np.float32), (w, h), flags=flags)
        obj = cv2.warpAffine(fg_tex, m_obj[:2].astype(np.float32), (w, h), flags=flags)
        a_obj = cv2.warpAffine(alpha, m_obj[:2].astype(np.float32), (w, h), flags=flags)
        img = bg * (1 - a_obj[..., None]) + obj * a_obj[..., None]
        a_occ = cv2.warpAffine(occ_alpha_tex, m_cam[:2].astype(np.float32), (w, h),
                               flags=flags)
        occ = cv2.warpAffine(occ_full, m_cam[:2].astype(np.float32), (w, h), flags=flags)
        img = img * (1 - a_occ[..., None]) + occ * a_occ[..., None]
        mask = ((a_obj > 0.5) & (a_occ <= 0.5)).astype(np.uint8) * 255
        return img, mask, m_cam, m_obj

    def degrade(flow: np.ndarray) -> np.ndarray:
        """RAFT-like flow imperfections: boundary smearing (Gaussian blur of
        the piecewise-affine field bleeds object/background flow across
        ~sigma px of the true edge — the dominant real-flow failure mode the
        reference's appearance-based stage-2 machinery exists to fix) plus
        smooth low-frequency vector noise. GT annotations stay crisp."""
        if flow_blur > 0:
            flow = cv2.GaussianBlur(flow, (0, 0), flow_blur)
        if flow_noise > 0:
            n = rng.standard_normal((h // 32 + 2, w // 32 + 2, 2)).astype(np.float32)
            n = cv2.resize(n, (w, h), interpolation=cv2.INTER_CUBIC)
            flow = flow + n * flow_noise
        return flow

    prev = None
    for t in range(n_frames):
        img, mask, m_cam, m_obj = render(t)
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
            os.path.join(dirs["JPEGImages"], f"{t:05d}.jpg"), quality=95)
        Image.fromarray(mask).save(os.path.join(dirs["Annotations"], f"{t:05d}.png"))
        if prev is not None:
            p_mask, p_cam, p_obj = prev
            fw = _affine_flow(p_cam, m_cam, h, w)
            fw_obj = _affine_flow(p_obj, m_obj, h, w)
            vis_prev = p_mask > 0
            fw[vis_prev] = fw_obj[vis_prev]
            bw = _affine_flow(m_cam, p_cam, h, w)
            bw_obj = _affine_flow(m_obj, p_obj, h, w)
            vis_now = mask > 0
            bw[vis_now] = bw_obj[vis_now]
            np.save(os.path.join(dirs["Flows_NewCT"], f"{t:05d}.npy"), degrade(fw))
            np.save(os.path.join(dirs["BackwardFlows_NewCT"], f"{t:05d}.npy"), degrade(bw))
        prev = (mask, m_cam, m_obj)


HARD_KINDS = ("rot_ellipse", "thin_bar", "breathing")
# "harder": the eval sequence (the LAST seq is the val split) is a star —
# measured stage-1 on `hard` still reached 91.55 test mIoU because the val
# sequence cycled to `breathing`, the easiest kind, and all hard shapes are
# resolvable at the 96^2 mask grid. Stars are not.
HARDER_KINDS = ("thin_bar", "rot_ellipse", "star")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seqs", type=int, default=3)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=854)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--flow-blur", type=float, default=None,
                    help="Gaussian sigma (px) smearing the GT flow across "
                         "object boundaries, simulating RAFT; default 0 "
                         "(hard) / 6.0 (harder)")
    ap.add_argument("--flow-noise", type=float, default=None,
                    help="smooth low-frequency flow noise amplitude in px; "
                         "default 0 (hard) / 0.5 (harder)")
    ap.add_argument("--star-halfw", type=float, nargs=2, default=[2.5, 3.5],
                    metavar=("MIN", "MAX"),
                    help="star arm half-width range in px (difficulty dial: "
                         "wider arms raise the 96^2-grid representability "
                         "ceiling and make stage-1 less hopeless)")
    ap.add_argument("--level", choices=["easy", "hard", "harder"], default="easy",
                    help="hard: affine camera, rotating/deforming/thin "
                         "objects, partial occlusion (VERDICT r3 item 4); "
                         "harder: same but with thin-spoked stars and the "
                         "val sequence a star (unresolvable at the 96^2 "
                         "mask grid)")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    names = [f"seq{i}" for i in range(args.seqs)]
    for i, s in enumerate(names):
        if args.level in ("hard", "harder"):
            kinds = HARD_KINDS if args.level == "hard" else HARDER_KINDS
            kind = kinds[i % len(kinds)]
            blur = args.flow_blur if args.flow_blur is not None else (
                6.0 if args.level == "harder" else 0.0)
            noise = args.flow_noise if args.flow_noise is not None else (
                0.5 if args.level == "harder" else 0.0)
            make_hard_sequence(args.out, s, kind, args.frames, args.height,
                               args.width, rng,
                               star_halfw=tuple(args.star_halfw),
                               flow_blur=blur, flow_noise=noise)
        else:
            make_sequence(args.out, s, args.frames, args.height, args.width, rng)
    frames = " ".join(f"{i:05d}.jpg" for i in range(args.frames))
    with open(os.path.join(args.out, "trainval.txt"), "w") as f:
        for s in names:
            f.write(f"JPEGImages/480p/{s}/ {frames}\n")
    with open(os.path.join(args.out, "val.txt"), "w") as f:
        f.write(f"JPEGImages/480p/{names[-1]}/ {frames}\n")
    # DAVIS evaluator contract
    os.makedirs(os.path.join(args.out, "ImageSets/2016"), exist_ok=True)
    with open(os.path.join(args.out, "ImageSets/2016/val.txt"), "w") as f:
        f.write(names[-1] + "\n")
    print(f"wrote {args.seqs} sequences x {args.frames} frames to {args.out}")


if __name__ == "__main__":
    main()
