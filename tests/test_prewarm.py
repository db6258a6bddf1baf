"""Cold-start prewarm: header-only reads + the background program loader.

The prewarm exists to move one-time program loads off the tunneled chip's
critical path (VERDICT r4 task 6); these tests pin its host-side
contracts on the CPU backend — geometry fidelity of read_header, the
thread lifecycle, and the process_qmri wiring (results must be the same
with and without prewarm, since it only ever touches synthetic data).
"""

import os

import numpy as np
import pandas as pd
import pytest

from fetal_t2mapping_tpu import config as C
from fetal_t2mapping_tpu.core import Volume, nifti
from fetal_t2mapping_tpu.labels.synthseg import SynthSegRunner
from fetal_t2mapping_tpu.recon.resample import resample_volume
from fetal_t2mapping_tpu.utils.bids import get_img_path
from fetal_t2mapping_tpu.utils.prewarm import (
    geoms_from_metadata,
    start_recon_prewarm,
)

# fast multi-level settings: full default budgets would make the CPU
# registration in these tests needlessly slow
REG_FAST = dict(levels=(2, 1), sigmas=(1.0, 0.0), iters=(8, 4),
                samples=(512, 512))


def _rot_direction():
    """A non-axis-aligned direction matrix (rotation about z by 30 deg)."""
    c, s = np.cos(np.pi / 6), np.sin(np.pi / 6)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return tuple(R.reshape(-1))


class TestReadHeader:
    def test_matches_full_read(self, tmp_path):
        vol = Volume(np.arange(4 * 5 * 6, dtype=np.int16).reshape(4, 5, 6),
                     spacing=(0.8, 1.25, 3.0), origin=(-12.0, 4.5, 7.25),
                     direction=_rot_direction())
        from fetal_t2mapping_tpu.core import volcache

        for name in ("a.nii.gz", "a.nii"):
            path = str(tmp_path / name)
            nifti.write(path, vol, dtype=np.int16)
            volcache.invalidate(path)  # force the on-disk header path
            full, hdr = nifti.read(path), nifti.read_header(path)
            assert hdr.shape == full.shape
            assert hdr.data.dtype == np.asarray(full.data).dtype
            np.testing.assert_allclose(hdr.spacing, full.spacing, atol=1e-5)
            np.testing.assert_allclose(hdr.origin, full.origin, atol=1e-4)
            np.testing.assert_allclose(hdr.direction, full.direction,
                                       atol=1e-5)
            data = np.asarray(hdr.data)
            assert not data.any()
            # broadcast view: geometry-only reads must not commit memory
            # proportional to the voxel count
            assert set(data.strides) == {0}

    def test_error_contract(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            nifti.read_header(str(tmp_path / "missing.nii.gz"))
        bad = tmp_path / "bad.nii"
        bad.write_bytes(b"\x00" * 400)
        with pytest.raises(ValueError):
            nifti.read_header(str(bad))
        trunc = tmp_path / "trunc.nii.gz"
        trunc.write_bytes(b"\x1f\x8b\x08\x00junkjunk")
        with pytest.raises(ValueError):
            nifti.read_header(str(trunc))

    def test_scaled_header_promotes_to_float32(self, tmp_path):
        # a scl_slope/inter header makes the FULL read return scaled
        # float32 data; the header-only view must report the same dtype
        # (prewarm warms programs keyed on it)
        from fetal_t2mapping_tpu.core import volcache

        vol = Volume(np.arange(24, dtype=np.int16).reshape(2, 3, 4))
        path = str(tmp_path / "scaled.nii")
        nifti.write(path, vol, dtype=np.int16)
        raw = bytearray(open(path, "rb").read())
        import struct

        struct.pack_into("<f", raw, 112, 2.0)   # scl_slope
        struct.pack_into("<f", raw, 116, 1.5)   # scl_inter
        open(path, "wb").write(bytes(raw))
        volcache.invalidate(path)
        full, hdr = nifti.read(path), nifti.read_header(path)
        assert np.asarray(full.data).dtype == np.float32
        assert np.asarray(hdr.data).dtype == np.float32
        np.testing.assert_allclose(np.asarray(full.data).ravel()[:3],
                                   [1.5, 3.5, 5.5])

    def test_pending_async_write_is_served(self, tmp_path):
        vol = Volume(np.ones((3, 4, 5), np.float32), spacing=(1, 2, 3))
        path = str(tmp_path / "q.nii.gz")
        nifti.write_async(path, vol)
        hdr = nifti.read_header(path)
        assert hdr.shape == (3, 4, 5)
        np.testing.assert_allclose(hdr.spacing, (1, 2, 3))
        nifti.flush_writes()


def _acq_geoms(n=30):
    """Three anisotropic acquisition geometries of one ~n^3 mm FOV."""
    geoms = {}
    for otype, axis in (("ax", 2), ("cor", 1), ("sag", 0)):
        spacing = [1.0, 1.0, 1.0]
        spacing[axis] = 3.0
        shape = [n, n, n]
        shape[2 - axis] = n // 3  # data is (z, y, x); spacing is (x, y, z)
        geoms[otype] = Volume(
            np.broadcast_to(np.float32(0.0), tuple(shape)),
            spacing=tuple(spacing), origin=(0.0, 0.0, 0.0))
    return geoms


class TestPrewarm:
    def test_runs_all_steps(self):
        h = start_recon_prewarm(_acq_geoms(), n_echoes=3,
                                registration_kwargs=dict(REG_FAST))
        h.wait(timeout=300)
        assert h.done
        assert h.error is None, h.error
        assert h.steps == ["resample", "fuse", "denoise", "reg_echo", "feta"]
        assert h.seconds > 0

    def test_integer_inputs_replay_disk_cast(self):
        # DICOM-converted sessions feed uint16 volumes: the prewarm must
        # trace the same int-input gather + disk-cast programs without
        # erroring (dtype fidelity is the whole point of header geoms)
        geoms = {o: g.with_data(np.broadcast_to(np.uint16(0), g.shape))
                 for o, g in _acq_geoms().items()}
        h = start_recon_prewarm(geoms, n_echoes=2, denoise=False,
                                registration_kwargs=dict(REG_FAST))
        h.wait(timeout=300)
        assert h.error is None, h.error
        assert h.steps == ["resample", "fuse", "reg_echo", "feta"]

    def test_jax_synthseg_forward_is_prewarmed(self, tmp_path):
        from fetal_t2mapping_tpu.labels.unet3d import (SYNTHSEG_LABELS,
                                                       UNetConfig,
                                                       random_params)

        cfg = UNetConfig(n_levels=3, base_features=4,
                         n_labels=len(SYNTHSEG_LABELS))
        wpath = str(tmp_path / "w.npz")
        np.savez(wpath, **random_params(cfg))
        h = start_recon_prewarm(
            _acq_geoms(), n_echoes=2, denoise=False,
            registration_kwargs=dict(REG_FAST),
            synthseg=SynthSegRunner(mode="jax", weights=wpath))
        h.wait(timeout=300)
        assert h.error is None, h.error
        assert h.steps == ["resample", "fuse", "reg_echo", "feta", "unet"]

    def test_non_jax_synthseg_modes_skip_unet(self):
        h = start_recon_prewarm(_acq_geoms(), n_echoes=2, denoise=False,
                                registration_kwargs=dict(REG_FAST),
                                synthseg=SynthSegRunner(mode="fake"))
        h.wait(timeout=300)
        assert h.error is None, h.error
        assert "unet" not in h.steps

    def test_requires_fixed_orientation(self):
        geoms = _acq_geoms()
        del geoms["ax"]
        with pytest.raises(ValueError, match="fixed_type"):
            start_recon_prewarm(geoms)

    def test_prewarm_failure_is_contained(self):
        # a bogus registration kwarg must surface on handle.error, never
        # raise into the caller
        h = start_recon_prewarm(_acq_geoms(),
                                registration_kwargs=dict(levels=(2, 1)))
        h.wait(timeout=300)
        assert h.error is not None
        assert h.steps == ["resample"]


class TestProcessQmriPrewarm:
    def _make_tree(self, root, tes=(114, 202)):
        rng = np.random.default_rng(0)
        n = 36
        z, y, x = np.meshgrid(*[np.linspace(-1, 1, n)] * 3, indexing="ij")
        img = 600.0 * np.exp(-3.0 * (x * x + y * y + z * z))
        truth = Volume(img.astype(np.float32), spacing=(1, 1, 1))
        bids = os.path.join(root, "projects/")
        rows = []
        for te in tes:
            for otype, axis in (("ax", 2), ("cor", 1), ("sag", 0)):
                spacing = [1.0, 1.0, 1.0]
                spacing[axis] = 3.0
                low = resample_volume(truth, spacing)
                data = (np.asarray(low.data)
                        + rng.normal(0, 3.0, low.shape)).astype(np.float32)
                acq = {"prj": "prj-004", "sub": "sub-001", "ses": "ses-01",
                       "run": f"run-{otype}-{te}", "EchoTime": te / 1000.0,
                       "ImageOrientationPatientSTR": otype}
                nifti.write(get_img_path(bids, acq, C.IN_DIRNAME),
                            low.with_data(data), dtype=np.float32)
                rows.append(acq)
        return bids, pd.DataFrame(rows)

    def test_geoms_from_metadata(self, tmp_path):
        from fetal_t2mapping_tpu.core import volcache

        bids, md = self._make_tree(str(tmp_path))
        volcache.clear()  # a fresh process would header-read from disk
        geoms = geoms_from_metadata(md, bids)
        assert sorted(geoms) == ["ax", "cor", "sag"]
        for g in geoms.values():
            assert set(np.asarray(g.data).strides) == {0}  # headers only
        assert geoms["ax"].spacing[2] == 3.0

    def test_process_qmri_with_prewarm(self, tmp_path):
        from fetal_t2mapping_tpu.pipeline.recon_pipeline import process_qmri

        bids, md = self._make_tree(str(tmp_path))
        process_qmri(bids, md, in_vivo=True, low_field=True,
                     synthseg=SynthSegRunner(mode="fake"),
                     registration_kwargs=dict(REG_FAST), prewarm=True)
        recon = get_img_path(bids, md.iloc[0], C.RECON_DIRNAME)
        assert nifti.exists(recon)
        assert nifti.read(recon).shape[0] >= 30

    def test_prewarm_skips_on_unfusable_orientations(self, tmp_path):
        # a session without the full ax/cor/sag triple must SKIP the
        # prewarm with a warning, never abort the pipeline (fusion skips
        # such sessions too; prewarm failures only cost the overlap)
        from fetal_t2mapping_tpu.pipeline.recon_pipeline import process_qmri

        bids, md = self._make_tree(str(tmp_path))
        md = md[md["ImageOrientationPatientSTR"] != "ax"]
        process_qmri(bids, md, in_vivo=True, low_field=True,
                     synthseg=SynthSegRunner(mode="fake"),
                     registration_kwargs=dict(REG_FAST), prewarm=True)
