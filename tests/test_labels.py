"""Label subsystem tests: FeTA remap, masks, phantom spheres, SynthSeg fake."""

import numpy as np
from scipy import ndimage

from fetal_t2mapping_tpu.core import Volume, nifti
from fetal_t2mapping_tpu.labels import (
    SynthSegRunner,
    extract_brain,
    mask_from_labels,
    phantom_labels_from_seeds,
    synthseg_to_feta,
)
from fetal_t2mapping_tpu.utils.maps_io import phantom_roi_stats


class TestFetaRemap:
    def test_mapping_table(self):
        src = np.array([0, 24, 3, 42, 2, 41, 4, 5, 14, 15, 43, 44, 7, 8, 46, 47,
                        10, 11, 12, 13, 17, 18, 26, 28, 49, 50, 51, 52, 53, 54,
                        58, 60, 16, 99], np.int16)
        vol = Volume(src.reshape(1, 1, -1))
        out = np.asarray(synthseg_to_feta(vol).data).ravel()
        expected = np.array([0, 1, 2, 2, 3, 3, 4, 4, 4, 4, 4, 4, 5, 5, 5, 5,
                             6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6,
                             7, 0])
        np.testing.assert_array_equal(out, expected)


class TestMasks:
    def test_mask_from_labels_and_extract(self):
        labels = Volume(np.array([[[0, 1], [5, 0]]], np.int16))
        mask = mask_from_labels(labels)
        np.testing.assert_array_equal(mask.data, [[[0, 1], [1, 0]]])
        recon = labels.with_data(np.full((1, 2, 2), 7.0, np.float32))
        bet = extract_brain(recon, mask)
        np.testing.assert_array_equal(bet.data, [[[0, 7], [7, 0]]])


class TestPhantomLabels:
    def test_spheres_match_scipy_seed_dilation(self):
        shape = (32, 40, 40)
        geom = Volume(np.zeros(shape, np.float32))
        seeds = [[10, 12, 8], [30, 25, 20]]  # (x, y, z)
        radius = 6
        out = np.asarray(phantom_labels_from_seeds(geom, seeds, radius=radius).data)

        ball = np.zeros((2 * radius + 1,) * 3, bool)
        g = np.arange(-radius, radius + 1)
        zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
        ball = zz**2 + yy**2 + xx**2 <= radius**2
        for i, (x, y, z) in enumerate(seeds, start=1):
            seed_img = np.zeros(shape, bool)
            seed_img[z, y, x] = True
            ref = ndimage.binary_dilation(seed_img, structure=ball)
            np.testing.assert_array_equal(out == i, ref)

    def test_overlap_later_seed_wins(self):
        geom = Volume(np.zeros((10, 10, 10), np.float32))
        out = np.asarray(phantom_labels_from_seeds(geom, [[5, 5, 5], [6, 5, 5]], radius=2).data)
        assert out[5, 5, 6] == 2  # overlapping voxel takes max label

    def test_roi_stats(self):
        geom = Volume(np.zeros((16, 16, 16), np.float32))
        labels = np.asarray(phantom_labels_from_seeds(geom, [[4, 4, 4], [11, 11, 11]], radius=2).data)
        t2 = np.where(labels == 1, 100.0, 0.0) + np.where(labels == 2, 50.0, 0.0)
        df = phantom_roi_stats(t2, t2 * 2, t2 * 0, labels, ["T2-3", "T2-5"], [99.0, 49.0])
        assert list(df["id"]) == ["T2-3", "T2-5"]
        np.testing.assert_allclose(df["meanT2"], [100.0, 50.0])
        np.testing.assert_allclose(df["trueT2"], [99.0, 49.0])


class TestSynthSegFake:
    def test_fake_runner_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        in_dir = tmp_path / "recon"
        out_dir = tmp_path / "labels"
        in_dir.mkdir()
        vol = Volume(rng.uniform(0, 100, (8, 8, 8)).astype(np.float32))
        nifti.write(str(in_dir / "sub-001_ses-01_te-114_recon_1mm.nii.gz"), vol)
        runner = SynthSegRunner(mode="fake")
        assert runner.available()
        runner.run(str(in_dir), str(out_dir))
        out = nifti.read(str(out_dir / "sub-001_ses-01_te-114_recon_1mm_synthseg.nii.gz"))
        labs = np.unique(np.asarray(out.data))
        assert set(labs.tolist()) <= {0, 2, 3}
        assert (np.asarray(out.data) > 0).any()
