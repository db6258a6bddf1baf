"""In-vivo stage-2 integration: resample -> register -> fuse over a BIDS tree.

Three anisotropic 'acquisitions' (thick slices along a different axis each,
small rigid misalignments, noise) of one known object must fuse into an HR
volume close to the ground truth — the reconstruct_vol_trilinear contract
(reference utils/qmri_utils.py:82-136) exercised end to end through the
pipeline orchestrator, files and all.
"""

import os

import numpy as np
import pandas as pd

from fetal_t2mapping_tpu import config as C
from fetal_t2mapping_tpu.core import Volume, nifti
from fetal_t2mapping_tpu.pipeline.recon_pipeline import (
    run_reconstruct_volumes,
    run_resample_volumes,
)
from fetal_t2mapping_tpu.recon.resample import resample_volume
from fetal_t2mapping_tpu.utils.bids import get_img_path

TE = 114


def _truth(n=40):
    z, y, x = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing="ij")
    r = np.sqrt(z**2 + y**2 + x**2)
    img = 800.0 * np.exp(-3.0 * r**2) * (1 + 0.25 * np.sin(4 * x) * np.cos(3 * y))
    return img.astype(np.float32)


def _acquire(truth_vol, thick_axis, shift_mm, rng):
    """Simulate a thick-slice acquisition: downsample one axis 3x + shift."""
    spacing = [1.0, 1.0, 1.0]
    spacing[thick_axis] = 3.0  # (x, y, z) order
    low = resample_volume(truth_vol, spacing)
    data = np.asarray(low.data) + rng.normal(0, 4.0, low.shape).astype(np.float32)
    origin = np.asarray(low.origin, float)
    origin[thick_axis] += shift_mm  # small rigid offset to be recovered
    return Volume(data=data, spacing=low.spacing, origin=tuple(origin),
                  direction=low.direction)


def test_resample_fuse_recovers_truth(tmp_path):
    rng = np.random.default_rng(0)
    truth = _truth()
    truth_vol = Volume(data=truth, spacing=(1, 1, 1), origin=(0, 0, 0))
    bids = os.path.join(str(tmp_path), "projects/")

    rows = []
    for otype, axis, shift in (("ax", 2, 0.0), ("cor", 1, 1.5), ("sag", 0, -2.0)):
        acq = {"prj": "prj-004", "sub": "sub-001", "ses": "ses-01",
               "run": f"run-{otype}", "EchoTime": TE / 1000.0,
               "ImageOrientationPatientSTR": otype}
        vol = _acquire(truth_vol, axis, shift, rng)
        nifti.write(get_img_path(bids, acq, C.IN_DIRNAME), vol, dtype=np.float32)
        rows.append(acq)
    metadata = pd.DataFrame(rows)

    run_resample_volumes(metadata, bids, 1.0)
    # fast registration settings: the offsets are small and the test must
    # stay CPU-friendly
    run_reconstruct_volumes(
        metadata, bids, denoise=False, fixed_type="ax",
        registration_kwargs=dict(levels=(2, 1), sigmas=(1.0, 0.0),
                                 iters=(60, 30)))

    recon_path = get_img_path(bids, rows[0], C.RECON_DIRNAME)
    assert os.path.exists(recon_path)
    recon = nifti.read(recon_path)
    # compare on the ax grid interior (borders lose coverage to the shifts)
    got = np.asarray(recon.data)
    ref = np.asarray(resample_volume(truth_vol, [1.0, 1.0, 1.0]).data)
    # the ax grid loses a slice to the 3x down/up rounding; crop to common
    common = tuple(slice(0, min(a, b)) for a, b in zip(got.shape, ref.shape))
    got, ref = got[common], ref[common]
    core = (slice(6, -6),) * 3
    m = np.asarray(ref)[core] > 100
    rel = np.abs(got[core][m] - np.asarray(ref)[core][m]) / np.asarray(ref)[core][m]
    assert np.median(rel) < 0.06, np.median(rel)

    # idempotent resume: second invocation must not recompute (mtime stable)
    mtime = os.path.getmtime(recon_path)
    run_reconstruct_volumes(metadata, bids, denoise=False, fixed_type="ax")
    assert os.path.getmtime(recon_path) == mtime
