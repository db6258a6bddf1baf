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

    @pytest.mark.parametrize("device", [False, True])
    def test_float_to_int_storage_rounds_and_clamps(self, tmp_path, device):
        # integer-typed checkpoints (resampled intermediates mirroring the
        # reference's pixel-type-preserving resample): float data must
        # round-half-even and clamp — never C-cast truncate or wrap — and
        # NaN (fusion's out-of-FOV marker) must store as 0. Same contract
        # for host and device-backed volumes.
        data = np.array([[[-5.4, 0.4, 0.5, 1.5, 99.6, 70000.0, np.nan]]],
                        np.float32)
        if device:
            import jax.numpy as jnp
            v = Volume(jnp.asarray(data))
        else:
            v = Volume(data)
        p = str(tmp_path / "q.nii.gz")
        nifti.write(p, v, dtype=np.uint16)
        from fetal_t2mapping_tpu.core import volcache
        volcache.clear()                       # force a disk read-back
        r = np.asarray(nifti.read(p).data).ravel()
        assert r.dtype == np.uint16
        np.testing.assert_array_equal(r, [0, 0, 0, 2, 100, 65535, 0])

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

    def test_pad_bucket_geometric_fleet_reuse(self):
        # above the granule, buckets form a 1.1-ratio geometric series
        # (snapped to granule multiples): <= ~10% padded rows...
        for n in (100_000, 1_000_000, 3_065_159):
            b = pad_bucket(n)
            assert b >= n and b % 8192 == 0
            assert b <= int(n * 1.1) + 8192
        # ...and the whole clinical-size mask range (2.5-3.5M voxels, one
        # subject each in a fleet) collapses to a handful of programs
        buckets = {pad_bucket(n) for n in range(2_500_000, 3_500_000, 10_000)}
        assert len(buckets) <= 5, sorted(buckets)
        # monotone: a bigger mask never gets a smaller bucket
        ns = [pad_bucket(n) for n in range(1, 200_000, 997)]
        assert ns == sorted(ns)


class TestNiftiCorruptionFuzz:
    """Structural-corruption fuzz over the NIfTI codec (VERDICT r3 task 7).

    The ingest pipeline only feeds core.nifti files it wrote itself, but the
    CLIs read ARBITRARY user NIfTIs. Contract (mirrors the DICOM parser
    fuzz, tests/test_dcm2nifti.py): every corruption of a valid file either
    parses (harmless corruption) or raises a typed, file-attributed
    ValueError — never struct.error, a hang, or an unbounded allocation —
    identically for the native (ft2io) and pure-Python byte paths.
    Deterministic seeds: any failure is reproducible."""

    def _valid_file(self, tmp_path, gz):
        rng = np.random.default_rng(3)
        vol = Volume(rng.normal(100.0, 20.0, (6, 8, 10)).astype(np.float32),
                     spacing=(1.0, 1.2, 2.0), origin=(-4.0, 3.0, 7.0))
        p = str(tmp_path / ("fuzz_base.nii" + (".gz" if gz else "")))
        nifti.write(p, vol, dtype=np.float32)
        with open(p, "rb") as f:
            return p, bytearray(f.read())

    @pytest.mark.parametrize("native_io", [True, False])
    def test_nii_corruptions_fail_cleanly(self, tmp_path, monkeypatch,
                                          native_io):
        import struct
        import time

        from fetal_t2mapping_tpu import native
        from fetal_t2mapping_tpu.core import volcache

        if native_io and not native.available():
            pytest.skip("native IO runtime unavailable")
        if not native_io:
            monkeypatch.setattr(native, "available", lambda: False)
        monkeypatch.setattr(volcache, "get", lambda path: None)  # force disk

        _, base = self._valid_file(tmp_path, gz=False)
        rng = np.random.default_rng(42)
        n_parsed = n_raised = 0
        for i in range(100):
            buf = bytearray(base)
            kind = i % 5
            if kind == 0:      # truncation anywhere (header or payload)
                buf = buf[:int(rng.integers(0, len(buf)))]
            elif kind == 1:    # byte flip in the 348-byte header
                j = int(rng.integers(0, 348))
                buf[j] ^= int(rng.integers(1, 256))
            elif kind == 2:    # blast a 4-byte header window (dims, codes,
                               # pixdims, offsets, srow)
                j = int(rng.integers(0, 344))
                buf[j:j + 4] = rng.integers(0, 256, 4).astype("u1").tobytes()
            elif kind == 3:    # dimension-field explosion: huge int16 dims
                               # (a forged 32767^3 grid must not allocate)
                vals = rng.integers(-32768, 32767, 8).astype("i2")
                vals[0] = int(rng.integers(0, 8))
                buf[40:56] = vals.tobytes()
            else:              # vox_offset / scl fields: NaN, inf, negative
                v = float(rng.choice([np.nan, np.inf, -np.inf, -1e9, 1e18]))
                off = int(rng.choice([108, 112, 116]))
                buf[off:off + 4] = struct.pack("<f", v)
            p = str(tmp_path / f"fuzz_{int(native_io)}_{i}.nii")
            with open(p, "wb") as f:
                f.write(bytes(buf))
            t0 = time.monotonic()
            try:
                v = nifti.read(p)
                assert np.asarray(v.data).nbytes < (1 << 26)
                n_parsed += 1
            except ValueError as e:
                assert p in str(e) or "fuzz_" in str(e), e  # attributed
                n_raised += 1
            except MemoryError as e:
                raise AssertionError(
                    f"corruption {i}: unbounded allocation ({e})")
            assert time.monotonic() - t0 < 10.0, \
                f"corruption {i}: reader took >10 s"
        # the mutation schedule must actually exercise both outcomes
        assert n_raised >= 20, (n_parsed, n_raised)
        assert n_parsed >= 5, (n_parsed, n_raised)

    @pytest.mark.parametrize("native_io", [True, False])
    def test_gz_corruptions_fail_cleanly(self, tmp_path, monkeypatch,
                                         native_io):
        import time

        from fetal_t2mapping_tpu import native
        from fetal_t2mapping_tpu.core import volcache

        if native_io and not native.available():
            pytest.skip("native IO runtime unavailable")
        if not native_io:
            monkeypatch.setattr(native, "available", lambda: False)
        monkeypatch.setattr(volcache, "get", lambda path: None)

        _, base = self._valid_file(tmp_path, gz=True)
        rng = np.random.default_rng(7)
        n_raised = 0
        for i in range(40):
            buf = bytearray(base)
            if i % 2 == 0:     # truncate the gzip stream (mid-member)
                buf = buf[:int(rng.integers(1, len(buf)))]
            else:              # corrupt a byte of the deflate stream/CRC
                j = int(rng.integers(2, len(buf)))
                buf[j] ^= int(rng.integers(1, 256))
            p = str(tmp_path / f"gzfuzz_{int(native_io)}_{i}.nii.gz")
            with open(p, "wb") as f:
                f.write(bytes(buf))
            t0 = time.monotonic()
            try:
                nifti.read(p)
            except ValueError:
                n_raised += 1   # uniform contract on BOTH io paths
            assert time.monotonic() - t0 < 10.0
        assert n_raised >= 10, n_raised

    def test_missing_file_is_file_not_found(self, tmp_path, monkeypatch):
        from fetal_t2mapping_tpu.core import volcache

        monkeypatch.setattr(volcache, "get", lambda path: None)
        with pytest.raises(FileNotFoundError):
            nifti.read(str(tmp_path / "nope.nii.gz"))
