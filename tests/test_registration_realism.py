"""Registration under realistic conditions (VERDICT r1 items 2+3).

Round-1 registration tests only self-registered a clean volume under small
motion. These cover what clinical HASTE data actually throws at the engine:

- cross-contrast pairs (MNI T1 template vs subject T2): monotone-DECREASING
  intensity relationships that break NCC — handled by the 'mi' (Parzen
  mutual information) and 'cr' (correlation ratio, FLIRT's default cost)
  metrics (reference utils/qmri_utils.py:1027-1037);
- Rician noise on both volumes;
- 10 degree / 10 mm initial misalignment;
- anisotropic acquisition grids (thick HASTE slices vs 1 mm recon);
- per-TE contrast drift (different tissues decay differently between
  echoes, so echo-to-echo registration sees per-structure amplitude
  changes, reference utils/qmri_utils.py:378-383).

All tests assert transform recovery (rotation / translation error), not
just metric improvement.
"""

import numpy as np
import pytest

from fetal_t2mapping_tpu.core.volume import Volume
from fetal_t2mapping_tpu.recon.registration import register_affine, register_rigid
from fetal_t2mapping_tpu.recon.resample import resample_to_reference, resample_volume

REG = dict(levels=(2, 1), sigmas=(1.0, 0.0), iters=(120, 60), lr=0.8)


def _tissue_blobs(shape=(32, 32, 32), spacing=(2.0, 2.0, 2.0), seed=0,
                  n_blobs=30):
    """Blob image + per-blob component images (for per-TE contrast drift).

    Many SMALL blobs, not a few fat ones: histogram metrics (MI/CR) see
    only the intensity joint distribution, and a scene of a few smooth
    Gaussians has a nearly rotation-invariant histogram (observed: MI flat
    within +-0.05 rad there). Real brain images have fine structure; the
    fixture must too."""
    rng = np.random.default_rng(seed)
    nz, ny, nx = shape
    zz, yy, xx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                             indexing="ij")
    comps = []
    for _ in range(n_blobs):
        cz, cy, cx = rng.uniform(6, np.array(shape) - 6)
        s = rng.uniform(1.2, 2.5)
        comps.append(np.exp(-(((zz - cz) ** 2 + (yy - cy) ** 2
                               + (xx - cx) ** 2) / (2 * s * s))).astype(np.float32))
    return comps, spacing


def _vol(data, spacing=(2.0, 2.0, 2.0)):
    return Volume(np.asarray(data, np.float32), spacing=spacing,
                  origin=(-30.0, -30.0, -30.0))


def _rigid_world_matrix(rx, ry, rz, t, center):
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    R = Rz @ Rx @ Ry
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = np.asarray(center) - R @ np.asarray(center) + np.asarray(t)
    return T


def _recovery_errors(T_true, T_est, center):
    """(rotation error rad, translation error mm) of T_est vs T_true^-1."""
    comp = T_true @ T_est
    R = comp[:3, :3]
    rot_err = np.arccos(np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0))
    t_err = np.abs(comp[:3, 3] - center + R @ center).max()
    return rot_err, t_err


def _rician(data, sigma, rng):
    n1 = rng.normal(0, sigma, data.shape).astype(np.float32)
    n2 = rng.normal(0, sigma, data.shape).astype(np.float32)
    return np.sqrt((data + n1) ** 2 + n2 ** 2).astype(np.float32)


def _cross_contrast_pair(seed=7):
    """T1-like and T2-like images of the SAME scene: per-tissue intensities
    REORDER between the two (bright-in-T1 tissues dark-in-T2 and vice
    versa, a non-monotone relationship), air background dark in both —
    which is what an MNI-T1-template vs subject-T2 pair actually looks
    like. NCC's linear-intensity assumption breaks; MI/CR must not."""
    rng = np.random.default_rng(seed + 1)
    comps, spacing = _tissue_blobs(seed=seed)
    a_t1 = rng.uniform(0.5, 1.5, len(comps))
    a_t2 = rng.permutation(a_t1)                          # reordered contrast
    t1 = sum(c * a * 100.0 for c, a in zip(comps, a_t1))
    t2 = sum(c * a * 100.0 for c, a in zip(comps, a_t2))
    return _vol(t1, spacing), _vol(t2, spacing)


@pytest.mark.parametrize("metric", ["mi", "cr"])
def test_cross_contrast_recovery(metric):
    """Same geometry, per-tissue-reordered intensities: the histogram
    metrics must recover the transform to <0.02 rad / <1 mm
    (VERDICT r1 item 2 'Done' criterion)."""
    fixed, t2_like = _cross_contrast_pair()
    center = np.asarray(fixed.center_world())
    T_true = _rigid_world_matrix(0.06, -0.05, 0.04, [4.0, -3.0, 3.0], center)
    moving = resample_to_reference(t2_like, t2_like, transform=T_true)

    reg = register_rigid(fixed, moving, metric=metric, **REG)
    rot_err, t_err = _recovery_errors(T_true, reg.matrix, center)
    assert rot_err < 0.02, f"{metric}: rotation error {rot_err:.4f} rad"
    assert t_err < 1.0, f"{metric}: translation error {t_err:.2f} mm"


def test_ncc_fails_on_anticorrelated_contrast():
    """Documents WHY the histogram metrics exist: when the intensity
    relationship is globally DECREASING (anticorrelated pair), NCC is
    driven away from alignment while MI still recovers it."""
    comps, spacing = _tissue_blobs(seed=7)
    t1 = sum(comps) * 100.0
    fixed = _vol(t1, spacing)
    inverted = _vol(t1.max() - t1, spacing)               # bright background
    center = np.asarray(fixed.center_world())
    T_true = _rigid_world_matrix(0.06, -0.05, 0.04, [4.0, -3.0, 3.0], center)
    moving = resample_to_reference(inverted, inverted, transform=T_true)
    reg = register_rigid(fixed, moving, metric="ncc", **REG)
    rot_err, t_err = _recovery_errors(T_true, reg.matrix, center)
    assert rot_err > 0.02 or t_err > 1.0  # NCC does NOT recover it


def test_rician_noise_large_offset():
    """Rician noise on both volumes + 10 degree / 10 mm initial offset."""
    rng = np.random.default_rng(3)
    comps, spacing = _tissue_blobs(seed=11)
    clean = sum(comps) * 100.0
    fixed = _vol(_rician(clean, 4.0, rng), spacing)
    center = np.asarray(fixed.center_world())
    T_true = _rigid_world_matrix(0.10, -0.10, 0.08, [6.0, -5.0, 5.0], center)
    # (0.10, -0.10, 0.08) compose to ~10 degrees total rotation
    moved = resample_to_reference(_vol(clean, spacing), _vol(clean, spacing),
                                  transform=T_true)
    moving = _vol(_rician(moved.data, 4.0, rng), spacing)

    reg = register_rigid(fixed, moving, **REG)
    rot_err, t_err = _recovery_errors(T_true, reg.matrix, center)
    assert rot_err < 0.02, f"rotation error {rot_err:.4f} rad"
    assert t_err < 1.0, f"translation error {t_err:.2f} mm"


def test_anisotropic_haste_slices():
    """Moving volume on a thick-slice grid (2x2x8 mm, HASTE-like) registered
    onto the isotropic fixed grid."""
    comps, spacing = _tissue_blobs(seed=13)
    clean = sum(comps) * 100.0
    fixed = _vol(clean, spacing)
    center = np.asarray(fixed.center_world())
    T_true = _rigid_world_matrix(0.05, 0.06, -0.04, [4.0, 3.0, -3.0], center)
    moved = resample_to_reference(fixed, fixed, transform=T_true)
    # resample the moved scene onto a thick-slice grid: 4x fewer z samples
    thick = resample_volume(moved, (2.0, 2.0, 8.0))

    reg = register_rigid(fixed, thick, **REG)
    rot_err, t_err = _recovery_errors(T_true, reg.matrix, center)
    assert rot_err < 0.03, f"rotation error {rot_err:.4f} rad"
    assert t_err < 1.5, f"translation error {t_err:.2f} mm"


def _fetal_scene(seed=23, shape=(48, 48, 48)):
    """A small bright "fetal brain" blob cluster inside a LARGER, brighter
    "maternal" background that will move independently of it.

    Returns (brain_img, bg_img, brain_mask) on the fixed grid. The
    background carries ~an order of magnitude more metric mass (more
    voxels, comparable intensity), so an unmasked metric locks onto IT."""
    rng = np.random.default_rng(seed)
    nz, ny, nx = shape
    zz, yy, xx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                             indexing="ij")
    c = (np.asarray(shape) - 1) / 2.0
    r2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
    brain_region = r2 <= 8.0 ** 2

    def blob(cz, cy, cx, s):
        return np.exp(-(((zz - cz) ** 2 + (yy - cy) ** 2 + (xx - cx) ** 2)
                        / (2 * s * s))).astype(np.float32)

    brain = np.zeros(shape, np.float32)
    for _ in range(12):
        off = rng.uniform(-5, 5, 3)
        brain += blob(*(c + off), rng.uniform(1.0, 1.8)) * rng.uniform(60, 140)
    brain *= brain_region  # strictly inside the brain region

    bg = np.zeros(shape, np.float32)
    n_bg = 0
    while n_bg < 40:
        p = rng.uniform(5, np.asarray(shape) - 5)
        # keep maternal structure clear of the brain + a safety margin so
        # the correct brain pose isn't contaminated through mask samples
        if ((p - c) ** 2).sum() < 16.0 ** 2:
            continue
        bg += blob(*p, rng.uniform(1.4, 2.6)) * rng.uniform(60, 140)
        n_bg += 1
    return brain, bg, brain_region


def test_masked_registration_ignores_moving_background():
    """VERDICT r2 item 1 'Done' criterion: brain and background move with
    DIFFERENT rigid transforms. The unmasked metric, dominated by the
    larger background, fails to recover the brain's transform; with a
    fixed-image metric mask over the brain (the reference's
    SetMetricFixedMask design, utils/qmri_utils.py:194-197) the engine
    recovers it to <0.02 rad / <1 mm."""
    brain, bg, brain_mask = _fetal_scene()
    spacing = (2.0, 2.0, 2.0)
    fixed = _vol(brain + bg, spacing)
    center = np.asarray(fixed.center_world())
    T_brain = _rigid_world_matrix(0.05, -0.04, 0.04, [3.0, -2.0, 2.0], center)
    # background moves the OTHER way, and further
    T_bg = _rigid_world_matrix(-0.08, 0.07, -0.06, [-6.0, 5.0, -4.0], center)
    brain_m = resample_to_reference(_vol(brain, spacing), _vol(brain, spacing),
                                    transform=T_brain)
    bg_m = resample_to_reference(_vol(bg, spacing), _vol(bg, spacing),
                                 transform=T_bg)
    moving = _vol(brain_m.data + bg_m.data, spacing)

    unmasked = register_rigid(fixed, moving, **REG)
    rot_u, t_u = _recovery_errors(T_brain, unmasked.matrix, center)
    assert rot_u > 0.02 or t_u > 1.0, (
        f"unmasked unexpectedly recovered the brain pose "
        f"({rot_u:.4f} rad, {t_u:.2f} mm) — scene not adversarial enough")

    masked = register_rigid(fixed, moving, fixed_mask=brain_mask, **REG)
    rot_m, t_m = _recovery_errors(T_brain, masked.matrix, center)
    assert rot_m < 0.02, f"masked rotation error {rot_m:.4f} rad"
    assert t_m < 1.0, f"masked translation error {t_m:.2f} mm"


def test_masked_affine_and_mask_validation():
    """fixed_mask on the affine path: self-registration under a mask stays
    at identity; malformed masks are rejected loudly."""
    comps, spacing = _tissue_blobs(seed=29)
    img = sum(comps) * 100.0
    fixed = _vol(img, spacing)
    mask = img > 20.0
    reg = register_affine(fixed, fixed, fixed_mask=mask,
                          levels=(2, 1), sigmas=(1.0, 0.0), iters=(40, 20))
    assert np.allclose(reg.matrix[:3, :3], np.eye(3), atol=0.02)
    assert np.abs(reg.matrix[:3, 3]).max() < 1.0

    with pytest.raises(ValueError, match="shape"):
        register_rigid(fixed, fixed, fixed_mask=np.ones((4, 4, 4), bool),
                       levels=(2, 1), sigmas=(1.0, 0.0), iters=(2, 2))
    with pytest.raises(ValueError, match="empty"):
        register_rigid(fixed, fixed,
                       fixed_mask=np.zeros(fixed.shape, bool),
                       levels=(2, 1), sigmas=(1.0, 0.0), iters=(2, 2))


def test_auto_fixed_mask_recovers_under_air_background():
    """fixed_mask='auto' (threshold+fill+dilate+erode signal mask, the
    registration_itk build_mask pipeline) excludes air: recovery still
    holds, and the mask machinery runs end to end from a string spec."""
    comps, spacing = _tissue_blobs(seed=31)
    img = sum(comps) * 100.0
    fixed = _vol(img, spacing)
    center = np.asarray(fixed.center_world())
    T_true = _rigid_world_matrix(0.05, -0.04, 0.03, [3.0, -2.0, 2.0], center)
    moving = resample_to_reference(fixed, fixed, transform=T_true)
    reg = register_rigid(fixed, moving, fixed_mask="auto", **REG)
    rot_err, t_err = _recovery_errors(T_true, reg.matrix, center)
    assert rot_err < 0.02 and t_err < 1.0

    with pytest.raises(ValueError, match="auto"):
        register_rigid(fixed, fixed, fixed_mask="magic",
                       levels=(2, 1), sigmas=(1.0, 0.0), iters=(2, 2))


def test_per_te_contrast_drift():
    """Echo-to-echo registration: each structure decays with its own T2, so
    the second echo is NOT a scalar multiple of the first (per-structure
    amplitude drift). Mirrors the reference's cross-TE registration
    (utils/qmri_utils.py:378-383)."""
    rng = np.random.default_rng(5)
    comps, spacing = _tissue_blobs(seed=17)
    t2s = rng.uniform(60.0, 400.0, len(comps))
    te1, te2 = 114.0, 299.0
    img1 = sum(c * 1000.0 * np.exp(-te1 / t) for c, t in zip(comps, t2s))
    img2 = sum(c * 1000.0 * np.exp(-te2 / t) for c, t in zip(comps, t2s))
    fixed = _vol(_rician(img1, 2.0, rng), spacing)
    center = np.asarray(fixed.center_world())
    T_true = _rigid_world_matrix(-0.05, 0.04, 0.05, [-3.0, 4.0, 3.0], center)
    moved = resample_to_reference(_vol(img2, spacing), _vol(img2, spacing),
                                  transform=T_true)
    moving = _vol(_rician(moved.data, 2.0, rng), spacing)

    reg = register_rigid(fixed, moving, metric="mi", **REG)
    rot_err, t_err = _recovery_errors(T_true, reg.matrix, center)
    assert rot_err < 0.02, f"rotation error {rot_err:.4f} rad"
    assert t_err < 1.0, f"translation error {t_err:.2f} mm"


# --------------------------------------------------------- textured scenes
def _smooth_noise(shape, rng, cutoff):
    """Band-limited random field (unit std): white noise low-passed in the
    Fourier domain at ``cutoff`` cycles per volume."""
    w = rng.normal(size=shape)
    F = np.fft.fftn(w)
    ks = np.meshgrid(*[np.fft.fftfreq(s, 1.0 / s) for s in shape],
                     indexing="ij")
    k = np.sqrt(sum(a * a for a in ks))
    F *= np.exp(-((k / cutoff) ** 2))
    out = np.fft.ifftn(F).real
    return (out / max(out.std(), 1e-9)).astype(np.float32)


def _textured_brain_pair(seed=31, shape=(48, 48, 48)):
    """Brain-like textured scene, far from the blob fixtures above: warped
    concentric tissue SHELLS (sharp class boundaries like cortex/WM/CSF
    interfaces), a shared fine multiplicative texture field, and
    nonmonotonically REORDERED per-class intensities between the two
    contrasts. The joint histogram of such a pair is many-moded and
    boundary-dominated — the regime 32-bin Parzen MI actually faces on
    in-vivo cross-contrast pairs (VERDICT r2 weak #2)."""
    rng = np.random.default_rng(seed)
    g = [np.linspace(-1, 1, s, dtype=np.float32) for s in shape]
    zz, yy, xx = np.meshgrid(*g, indexing="ij")
    warp = _smooth_noise(shape, rng, cutoff=3.0) * 0.12   # gyri-like distortion
    r = np.sqrt((zz / 0.85) ** 2 + (yy / 0.75) ** 2 + (xx / 0.8) ** 2) + warp
    classes = np.digitize(r, [0.3, 0.55, 0.75, 0.9, 1.05])   # 6 tissue bands
    t1_int = np.array([0.9, 0.55, 1.0, 0.45, 0.25, 0.0], np.float32)
    t2_int = np.array([0.45, 1.0, 0.3, 0.8, 0.15, 0.0], np.float32)  # reordered
    tex = 1.0 + 0.2 * _smooth_noise(shape, rng, cutoff=9.0)  # shared anatomy texture
    return (t1_int[classes] * 100.0 * tex).astype(np.float32), \
           (t2_int[classes] * 100.0 * tex).astype(np.float32)


@pytest.mark.parametrize("metric", ["mi", "cr"])
def test_textured_cross_contrast_with_bias_fields(metric):
    """Cross-contrast recovery on the textured-shell scene with INDEPENDENT
    smooth multiplicative bias fields on each image (coil shading differs
    between acquisitions) plus Rician noise: the histogram metrics must
    still recover the pose to <0.02 rad / <1 mm."""
    rng = np.random.default_rng(41)
    t1, t2 = _textured_brain_pair()
    spacing = (2.0, 2.0, 2.0)
    bias_f = np.exp(0.25 * _smooth_noise(t1.shape, rng, cutoff=1.5))
    bias_m = np.exp(0.25 * _smooth_noise(t2.shape, rng, cutoff=1.5))

    fixed = _vol(_rician(t1 * bias_f, 2.0, rng), spacing)
    center = np.asarray(fixed.center_world())
    T_true = _rigid_world_matrix(0.07, -0.05, 0.06, [4.0, -3.0, 3.0], center)
    moved = resample_to_reference(_vol(t2, spacing), _vol(t2, spacing),
                                  transform=T_true)
    moving = _vol(_rician(np.asarray(moved.data) * bias_m, 2.0, rng), spacing)

    reg = register_rigid(fixed, moving, metric=metric, **REG)
    rot_err, t_err = _recovery_errors(T_true, reg.matrix, center)
    assert rot_err < 0.02, f"{metric}: rotation error {rot_err:.4f} rad"
    assert t_err < 1.0, f"{metric}: translation error {t_err:.2f} mm"


def test_textured_same_contrast_ncc_with_bias():
    """Same-contrast NCC on the textured scene with independent bias fields:
    the default metric the in-vivo fusion path runs (recon_pipeline
    run_fusion) must tolerate realistic shading differences."""
    rng = np.random.default_rng(43)
    t1, _ = _textured_brain_pair(seed=37)
    spacing = (2.0, 2.0, 2.0)
    bias_f = np.exp(0.15 * _smooth_noise(t1.shape, rng, cutoff=1.5))
    bias_m = np.exp(0.15 * _smooth_noise(t1.shape, rng, cutoff=1.5))

    fixed = _vol(_rician(t1 * bias_f, 2.0, rng), spacing)
    center = np.asarray(fixed.center_world())
    T_true = _rigid_world_matrix(-0.06, 0.05, -0.04, [-4.0, 3.0, -3.0], center)
    moved = resample_to_reference(_vol(t1, spacing), _vol(t1, spacing),
                                  transform=T_true)
    moving = _vol(_rician(np.asarray(moved.data) * bias_m, 2.0, rng), spacing)

    reg = register_rigid(fixed, moving, metric="ncc", **REG)
    rot_err, t_err = _recovery_errors(T_true, reg.matrix, center)
    assert rot_err < 0.02, f"rotation error {rot_err:.4f} rad"
    assert t_err < 1.0, f"translation error {t_err:.2f} mm"
