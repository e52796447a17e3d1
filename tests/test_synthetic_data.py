"""tools/make_synthetic_davis.py: data-contract and difficulty invariants.

The generator is the quality oracle for every end-to-end pipeline run (no
real DAVIS data ships in this image), so its contract — reference
dataset/data.py:117-133 layout, exact analytic flow, and the measured
difficulty structure of the levels — is worth pinning.
"""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def harder_set(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth") / "data_davis")
    proc = subprocess.run(
        [sys.executable, "tools/make_synthetic_davis.py", "--out", out,
         "--seqs", "3", "--frames", "5", "--height", "240", "--width", "416",
         "--level", "harder", "--seed", "1"],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 0, proc.stderr
    return out


def test_layout_contract(harder_set):
    for sub in ("JPEGImages", "Annotations", "Flows_NewCT", "BackwardFlows_NewCT"):
        for seq in ("seq0", "seq1", "seq2"):
            assert os.path.isdir(os.path.join(harder_set, sub, "480p", seq))
    # split format: "<dir>/ frame.jpg ..." (bare names parse to 0 frames)
    line = open(os.path.join(harder_set, "trainval.txt")).readline().split()
    assert line[0] == "JPEGImages/480p/seq0/"
    assert line[1] == "00000.jpg"
    # flow file t relates frames (t-1, t): no 00000.npy
    assert not os.path.exists(
        os.path.join(harder_set, "Flows_NewCT", "480p", "seq0", "00000.npy"))
    fw = np.load(os.path.join(harder_set, "Flows_NewCT", "480p", "seq0", "00001.npy"))
    assert fw.shape == (240, 416, 2) and fw.dtype == np.float32


def test_masks_nonempty_every_frame(harder_set):
    for seq in ("seq0", "seq1", "seq2"):
        for t in range(5):
            m = np.asarray(Image.open(
                os.path.join(harder_set, "Annotations", "480p", seq, f"{t:05d}.png")))
            assert set(np.unique(m)) <= {0, 255}
            # objects stay in frame and visible (occluders are partial)
            assert (m > 0).mean() > 0.002, f"{seq} frame {t} almost empty"


def test_star_val_sequence_thinnest_at_mask_grid(harder_set):
    """The val sequence (a sun: disk + thin spokes) must lose the most
    structure through the mask-grid downsample — its spokes are the
    grid-resolution-discriminating content for the CRF A/B."""
    def roundtrip_iou(seq):
        m = np.asarray(Image.open(os.path.join(
            harder_set, "Annotations", "480p", seq, "00002.png"))) > 127
        im = Image.fromarray(m.astype(np.uint8) * 255)
        h, w = m.shape
        small = im.resize((w // 5, h // 5), Image.BILINEAR)  # ~mask-grid ratio
        back = np.asarray(small.resize((w, h), Image.BILINEAR)) > 127
        return (m & back).sum() / max((m | back).sum(), 1)

    star = roundtrip_iou("seq2")
    others = min(roundtrip_iou("seq0"), roundtrip_iou("seq1"))
    assert star < 0.99, f"star roundtrip {star:.3f} — spokes missing?"
    assert others > star, f"star {star:.3f} vs others {others:.3f}"


def test_harder_flow_is_boundary_degraded(harder_set, tmp_path):
    """harder's primary de-saturation lever: RAFT-like boundary smearing.
    Across-the-edge flow steps must be BLENDED over several px (the exact
    piecewise-affine flow of --flow-blur 0 jumps in 1 px)."""
    import scipy.ndimage as ndi

    def edge_step_sharpness(root, seq="seq1"):
        m = np.asarray(Image.open(os.path.join(
            root, "Annotations", "480p", seq, "00001.png"))) > 127
        fw = np.load(os.path.join(root, "Flows_NewCT", "480p", seq, "00002.npy"))
        # |gradient| of u summed over a thin band at the edge, normalized by
        # the local step size: sharp steps concentrate gradient in 1-2 px.
        gy, gx = np.gradient(fw[..., 0])
        gmag = np.hypot(gy, gx)
        edge = ndi.binary_dilation(m, iterations=1) & ~ndi.binary_erosion(m, iterations=1)
        return float(gmag[edge].max())

    crisp = str(tmp_path / "crisp")
    proc = subprocess.run(
        [sys.executable, "tools/make_synthetic_davis.py", "--out", crisp,
         "--seqs", "2", "--frames", "3", "--height", "240", "--width", "416",
         "--level", "harder", "--seed", "1", "--flow-blur", "0",
         "--flow-noise", "0"],
        capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 0, proc.stderr
    sharp = edge_step_sharpness(crisp)
    smeared = edge_step_sharpness(harder_set)
    # blur sigma 6 spreads the step over ~12 px: peak edge gradient drops
    assert smeared < 0.5 * sharp, (smeared, sharp)


def test_flow_matches_finite_difference(harder_set):
    """Forward flow at visible object pixels must be the analytic object
    motion, elsewhere the camera motion — cross-check flow against the
    actual mask displacement between consecutive frames."""
    seq = "seq1"  # rot_ellipse: solid object, reliable centroid
    m0 = np.asarray(Image.open(os.path.join(
        harder_set, "Annotations", "480p", seq, "00001.png"))) > 127
    m1 = np.asarray(Image.open(os.path.join(
        harder_set, "Annotations", "480p", seq, "00002.png"))) > 127
    fw = np.load(os.path.join(harder_set, "Flows_NewCT", "480p", seq, "00002.npy"))
    # centroid displacement vs mean flow over the (prev-visible) mask
    cy0, cx0 = np.argwhere(m0).mean(axis=0)
    cy1, cx1 = np.argwhere(m1).mean(axis=0)
    mean_u, mean_v = fw[m0][:, 0].mean(), fw[m0][:, 1].mean()
    # occlusion/rotation make this approximate; 1.5 px tolerance
    assert abs(mean_u - (cx1 - cx0)) < 1.5
    assert abs(mean_v - (cy1 - cy0)) < 1.5
