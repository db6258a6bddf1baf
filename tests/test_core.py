"""Core layer tests: Volume geometry + NIfTI round-trips."""

import numpy as np
import pytest

from fetal_t2mapping_tpu.core import Volume, nifti
from fetal_t2mapping_tpu.core.stack import EchoStack, pad_bucket


def _rand_direction(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return tuple(q.reshape(-1))


class TestVolume:
    def test_shape_size(self):
        v = Volume(np.zeros((4, 5, 6)))
        assert v.shape == (4, 5, 6)
        assert v.size == (6, 5, 4)

    def test_world_roundtrip(self):
        rng = np.random.default_rng(0)
        v = Volume(
            np.zeros((3, 4, 5)),
            spacing=(0.8, 1.1, 3.0),
            origin=(-12.0, 5.0, 7.5),
            direction=_rand_direction(rng),
        )
        idx = rng.uniform(0, 3, size=(10, 3))
        pts = v.index_to_world(idx)
        back = v.world_to_index(pts)
        np.testing.assert_allclose(back, idx, atol=1e-9)

    def test_world_grid_matches_affine(self):
        v = Volume(np.zeros((2, 3, 4)), spacing=(2.0, 3.0, 4.0), origin=(1.0, 2.0, 3.0))
        g = v.world_grid()
        # voxel (z=1, y=2, x=3) -> index (x,y,z)=(3,2,1)
        expected = v.index_to_world(np.array([3.0, 2.0, 1.0]))
        np.testing.assert_allclose(g[1, 2, 3], expected)

    def test_with_data_checks_shape(self):
        v = Volume(np.zeros((2, 2, 2)))
        with pytest.raises(ValueError):
            v.with_data(np.zeros((3, 2, 2)))


class TestNifti:
    @pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
    @pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8, np.float64])
    def test_roundtrip_identity_geometry(self, tmp_path, suffix, dtype):
        rng = np.random.default_rng(1)
        data = (rng.uniform(0, 100, size=(5, 6, 7))).astype(dtype)
        v = Volume(data, spacing=(1.0, 1.5, 2.0), origin=(-4.0, 3.0, 9.0))
        p = str(tmp_path / f"t{suffix}")
        nifti.write(p, v)
        r = nifti.read(p)
        np.testing.assert_allclose(np.asarray(r.data, dtype=np.float64), data.astype(np.float64), rtol=1e-6)
        np.testing.assert_allclose(r.spacing, v.spacing, atol=1e-5)
        np.testing.assert_allclose(r.origin, v.origin, atol=1e-4)
        np.testing.assert_allclose(r.direction, v.direction, atol=1e-5)

    def test_roundtrip_rotated_geometry(self, tmp_path):
        rng = np.random.default_rng(2)
        v = Volume(
            rng.standard_normal((4, 4, 4)).astype(np.float32),
            spacing=(0.9, 1.2, 4.4),
            origin=(10.0, -20.0, 30.0),
            direction=_rand_direction(rng),
        )
        p = str(tmp_path / "rot.nii.gz")
        nifti.write(p, v)
        r = nifti.read(p)
        np.testing.assert_allclose(r.data, v.data, rtol=1e-6)
        np.testing.assert_allclose(r.direction, v.direction, atol=1e-5)
        np.testing.assert_allclose(r.origin, v.origin, atol=1e-4)
        # world positions agree
        np.testing.assert_allclose(
            r.index_to_world([1.0, 2.0, 3.0]), v.index_to_world([1.0, 2.0, 3.0]), atol=1e-3
        )

    def test_geometry_propagation_idiom(self, tmp_path):
        """save maps copying recon geometry (reference utils/t2map_utils.py:21-23)."""
        rng = np.random.default_rng(3)
        recon = Volume(rng.standard_normal((3, 3, 3)).astype(np.float32), spacing=(1, 1, 1), origin=(5, 6, 7))
        t2map = recon.with_data(np.abs(recon.data) * 100.0)
        p = str(tmp_path / "map.nii.gz")
        nifti.write(p, t2map)
        r = nifti.read(p)
        assert r.same_geometry(recon)


class TestEchoStack:
    def _mkstack(self):
        rng = np.random.default_rng(4)
        shape = (4, 5, 6)
        tes = [114.0, 202.0, 299.0]
        geom = Volume(np.zeros(shape, np.float32))
        recons, masks = [], []
        for te in tes:
            recons.append(geom.with_data(rng.uniform(10, 100, shape).astype(np.float32)))
            m = np.zeros(shape, np.uint8)
            m[1:3, 1:4, 2:5] = 1
            masks.append(geom.with_data(m))
        return EchoStack.from_volumes(recons, masks, tes)

    def test_union_mask_and_te_sort(self):
        st = self._mkstack()
        assert st.n_echoes == 3
        assert st.mask.sum() == 2 * 3 * 3
        assert list(st.tes) == sorted(st.tes)

    def test_gather_scatter_roundtrip(self):
        st = self._mkstack()
        batch, idx, n = st.gather(granule=8192)
        assert batch.shape[0] == pad_bucket(n)
        assert batch.shape[0] >= n and batch.shape[1] == 3
        vals = np.arange(n, dtype=np.float32)
        vol = st.scatter(vals, idx)
        assert vol.data.shape == st.grid_shape
        np.testing.assert_allclose(np.sort(vol.data[st.mask]), vals)
        assert (vol.data[~st.mask] == 0).all()

    def test_pad_bucket(self):
        assert pad_bucket(1) == 256
        assert pad_bucket(257) == 512
        assert pad_bucket(8192) == 8192
        assert pad_bucket(8193) == 16384
        assert pad_bucket(100000) == 104 * 1024
