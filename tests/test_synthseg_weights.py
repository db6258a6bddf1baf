"""SynthSeg weights path: Keras-h5 conversion + numerical forward parity.

The real SynthSeg model (FreeSurfer ``models/synthseg_1.0.h5``; reference
reaches it through the mri_synthseg binary, utils/qmri_utils.py:424-466)
cannot ship in-repo, so the conversion and the TPU U-Net forward pass are
pinned on a FIXTURE weight file written in the exact Keras HDF5 layout
(``model_weights/<layer>/<layer>/kernel:0``) with SynthSeg's neuron-style
layer names. Validation is against an INDEPENDENT PyTorch implementation
of the same topology — any disagreement in conv/ELU/pool/upsample/concat
semantics or in the converter's name mapping fails the test numerically.
"""

import os

import numpy as np
import pytest

from fetal_t2mapping_tpu.labels.convert_synthseg import convert
from fetal_t2mapping_tpu.labels.unet3d import (
    UNetConfig, config_from_params, load_params, pad_to_divisor,
    segment_volume, unet_apply, validate_params)

CFG = UNetConfig(n_levels=3, n_conv_per_level=2, base_features=4, kernel=3,
                 n_labels=5)


def _keras_layer_names(cfg):
    """(keras_name, our_name, c_in, c_out) in SynthSeg/neuron naming.

    uparm indices continue the downarm level count (as neuron numbers
    them); the converter maps sorted uparm groups deepest-first.
    """
    feats = [cfg.base_features * 2 ** lv for lv in range(cfg.n_levels)]
    rows = []
    c_in = 1
    for lv in range(cfg.n_levels):
        for i in range(cfg.n_conv_per_level):
            rows.append((f"unet_conv_downarm_{lv}_{i}", f"enc{lv}_{i}", c_in, feats[lv]))
            c_in = feats[lv]
    up_idx = cfg.n_levels
    for lv in range(cfg.n_levels - 2, -1, -1):
        c_in = c_in + feats[lv]
        for i in range(cfg.n_conv_per_level):
            rows.append((f"unet_conv_uparm_{up_idx}_{i}", f"dec{lv}_{i}", c_in, feats[lv]))
            c_in = feats[lv]
        up_idx += 1
    rows.append(("unet_likelihood", "head", c_in, cfg.n_labels))
    return rows


@pytest.fixture(scope="module")
def fixture_npz(tmp_path_factory):
    """Write a Keras-layout .h5 with random (but fixed-seed) weights, run
    the converter, return the npz path."""
    h5py = pytest.importorskip("h5py")
    tmp = tmp_path_factory.mktemp("synthseg")
    h5_path = str(tmp / "synthseg_fixture.h5")
    rng = np.random.default_rng(42)
    with h5py.File(h5_path, "w") as f:
        g = f.create_group("model_weights")
        for keras_name, _, c_in, c_out in _keras_layer_names(CFG):
            k = 1 if keras_name == "unet_likelihood" else CFG.kernel
            layer = g.create_group(keras_name).create_group(keras_name)
            layer.create_dataset(
                "kernel:0",
                data=rng.normal(0, 0.3 / np.sqrt(c_in * k ** 3),
                                (k, k, k, c_in, c_out)).astype(np.float32))
            layer.create_dataset(
                "bias:0", data=rng.normal(0, 0.01, c_out).astype(np.float32))
    npz_path = str(tmp / "synthseg_fixture.npz")
    convert(h5_path, npz_path, verbose=False)
    return npz_path


def test_converter_mapping_and_shapes(fixture_npz):
    params = load_params(fixture_npz)
    cfg = config_from_params(params)
    assert cfg == CFG
    validate_params(params, cfg)  # raises on any shape slip


def _torch_forward(params, x_np, cfg):
    """Independent reference forward pass (PyTorch, NCDHW)."""
    import torch
    import torch.nn.functional as F

    def w(name):
        # (k,k,k,in,out) -> torch (out,in,k,k,k)
        return torch.from_numpy(np.transpose(params[name + "_w"], (4, 3, 0, 1, 2)).copy())

    def b(name):
        return torch.from_numpy(params[name + "_b"].copy())

    x = torch.from_numpy(np.transpose(x_np, (0, 4, 1, 2, 3)).copy())
    skips = []
    for lv in range(cfg.n_levels):
        for i in range(cfg.n_conv_per_level):
            name = f"enc{lv}_{i}"
            x = F.elu(F.conv3d(x, w(name), b(name), padding=cfg.kernel // 2))
        if lv < cfg.n_levels - 1:
            skips.append(x)
            x = F.max_pool3d(x, 2)
    for lv in range(cfg.n_levels - 2, -1, -1):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = torch.cat([skips[lv], x], dim=1)
        for i in range(cfg.n_conv_per_level):
            name = f"dec{lv}_{i}"
            x = F.elu(F.conv3d(x, w(name), b(name), padding=cfg.kernel // 2))
    x = F.conv3d(x, w("head"), b("head"))
    return np.transpose(x.numpy(), (0, 2, 3, 4, 1))


def test_forward_matches_torch_reference(fixture_npz):
    import jax.numpy as jnp

    params = load_params(fixture_npz)
    cfg = config_from_params(params)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 8, 12, 8, 1)).astype(np.float32)

    ours = np.asarray(unet_apply({k: jnp.asarray(v) for k, v in params.items()},
                                 jnp.asarray(x), cfg))
    ref = _torch_forward(params, x, cfg)
    assert ours.shape == ref.shape == (1, 8, 12, 8, cfg.n_labels)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_segment_volume_byte_stable(fixture_npz):
    params = load_params(fixture_npz)
    rng = np.random.default_rng(1)
    vol = (rng.uniform(0, 100, (10, 9, 11))).astype(np.float32)
    lab1 = segment_volume(params, vol)
    lab2 = segment_volume(params, vol)
    assert lab1.dtype == np.int16
    assert lab1.shape == vol.shape
    np.testing.assert_array_equal(lab1, lab2)  # byte-stable
    assert set(np.unique(lab1)) <= set(range(CFG.n_labels))


def test_jax_runner_drives_pipeline(fixture_npz, tmp_path):
    """SynthSegRunner(mode='jax') with converted weights: recon NIfTIs in,
    byte-stable label NIfTIs out — the pipeline contract of the reference's
    mri_synthseg step."""
    from fetal_t2mapping_tpu.core import nifti
    from fetal_t2mapping_tpu.core.volume import Volume
    from fetal_t2mapping_tpu.labels.synthseg import SynthSegRunner

    in_dir = tmp_path / "recon"
    out_dir = tmp_path / "labels"
    in_dir.mkdir()
    rng = np.random.default_rng(2)
    data = rng.uniform(0, 1000, (12, 10, 14)).astype(np.float32)
    vol = Volume(data, spacing=(1.0, 1.0, 1.0), origin=(1.0, 2.0, 3.0))
    nifti.write(str(in_dir / "sub-001_ses-01_te-114_recon_1mm.nii.gz"), vol)

    runner = SynthSegRunner(mode="jax", weights=fixture_npz)
    assert runner.available()
    runner.run(str(in_dir), str(out_dir))
    out = str(out_dir / "sub-001_ses-01_te-114_recon_1mm_synthseg.nii.gz")
    assert os.path.exists(out)
    lab = nifti.read(out)
    assert lab.data.shape == data.shape
    assert lab.spacing == vol.spacing  # geometry propagated
    # byte-stable across runs
    runner.run(str(in_dir), str(out_dir))
    lab2 = nifti.read(out)
    np.testing.assert_array_equal(np.asarray(lab.data), np.asarray(lab2.data))


def _write_fixture_h5(h5py, h5_path, cfg, *, prefix="unet", seed=42):
    """Keras-layout conv weights for one U-Net stack under model_weights."""
    rng = np.random.default_rng(seed)
    mode = "a" if os.path.exists(h5_path) else "w"
    with h5py.File(h5_path, mode) as f:
        g = f.require_group("model_weights")
        for keras_name, _, c_in, c_out in _keras_layer_names(cfg):
            keras_name = keras_name.replace("unet", prefix, 1)
            k = 1 if "likelihood" in keras_name else cfg.kernel
            layer = g.create_group(keras_name).create_group(keras_name)
            layer.create_dataset(
                "kernel:0",
                data=rng.normal(0, 0.3 / np.sqrt(c_in * k ** 3),
                                (k, k, k, c_in, c_out)).astype(np.float32))
            layer.create_dataset(
                "bias:0", data=rng.normal(0, 0.01, c_out).astype(np.float32))


def test_converter_skips_distractor_datasets(tmp_path, capsys):
    """A REAL released .h5 carries more than conv weights: optimizer slots
    (whose leaves reuse the kernel/bias names), norm-layer parameters and
    scalar training state. The converter must skip+report them and produce
    the IDENTICAL manifest it produces from a clean file (VERDICT r2
    task 7)."""
    h5py = pytest.importorskip("h5py")
    clean, dirty = str(tmp_path / "clean.h5"), str(tmp_path / "dirty.h5")
    _write_fixture_h5(h5py, clean, CFG)
    _write_fixture_h5(h5py, dirty, CFG)
    rng = np.random.default_rng(0)
    with h5py.File(dirty, "a") as f:
        # Adam slots mirroring the model layout under optimizer_weights
        opt = f.create_group("optimizer_weights/Adam")
        lay = opt.create_group("unet_conv_downarm_0_0")
        lay.create_dataset("kernel:0", data=rng.normal(
            0, 1, (CFG.kernel,) * 3 + (1, CFG.base_features)).astype(np.float32))
        lay.create_dataset("bias:0",
                           data=rng.normal(0, 1, CFG.base_features).astype(np.float32))
        opt.create_dataset("iter:0", data=np.asarray(123, np.int64))
        # a batch-norm layer inside model_weights
        bn = f["model_weights"].create_group("unet_bn_0").create_group("unet_bn_0")
        for nm in ("gamma:0", "beta:0", "moving_mean:0", "moving_variance:0"):
            bn.create_dataset(nm, data=np.ones(CFG.base_features, np.float32))
        # a dense/1-D optimizer leftover named 'kernel' (ndim != 5)
        f["model_weights"].create_group("unet_dense").create_group(
            "unet_dense").create_dataset(
            "kernel:0", data=np.ones((4, 4), np.float32))

    p_clean = convert(clean, str(tmp_path / "clean.npz"), verbose=False)
    p_dirty = convert(dirty, str(tmp_path / "dirty.npz"), verbose=True)
    out = capsys.readouterr().out
    assert "skipped" in out and "optimizer state" in out
    assert sorted(p_clean) == sorted(p_dirty)
    for k in p_clean:
        np.testing.assert_array_equal(p_clean[k], p_dirty[k])


def test_converter_rejects_robust_cascade(tmp_path):
    """The --robust variant the reference invokes (utils/qmri_utils.py:445)
    is a cascade of several U-Nets; the converter must refuse it BY NAME
    instead of silently translating one stack."""
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "robust.h5")
    _write_fixture_h5(h5py, path, CFG, prefix="unet")
    _write_fixture_h5(h5py, path, CFG, prefix="l2l", seed=7)
    with pytest.raises(ValueError, match="robust"):
        convert(path, str(tmp_path / "robust.npz"), verbose=False)


def test_converter_rejects_kernel_without_bias(tmp_path):
    h5py = pytest.importorskip("h5py")
    path = str(tmp_path / "nobias.h5")
    _write_fixture_h5(h5py, path, CFG)
    with h5py.File(path, "a") as f:
        del f["model_weights/unet_conv_downarm_0_0/unet_conv_downarm_0_0/bias:0"]
    with pytest.raises(ValueError, match="no bias"):
        convert(path, str(tmp_path / "nobias.npz"), verbose=False)
