"""Layout-faithful dry-run of the released synthseg_1.0.h5 file (VERDICT r4
task 8).

The real weights cannot ship in-repo (externally licensed, ~100 MB, no
network egress here), so this fixture clones everything ABOUT the file the
converter could trip on, per the public SynthSeg repo (Billot et al. 2023,
github.com/BBillot/SynthSeg) and its bundled neuron fork (ext/neuron/
models.py), which the reference reaches through FreeSurfer's mri_synthseg
binary (reference utils/qmri_utils.py:424-466):

* Keras ``save_weights`` HDF5 layout: one ROOT-level group per layer (no
  ``model_weights`` wrapper), nested ``<layer>/<layer>/<weight>:0``
  datasets, ``layer_names``/``weight_names``/``backend``/``keras_version``
  attributes, and weight-LESS layers (input, maxpool, upsample, merge,
  softmax prediction) present as empty groups.
* The real architecture: 5 levels, 2 convs/level, 3^3 kernels, 33 output
  labels, and — because SynthSeg trains with ``batch_norm=-1`` — one
  BatchNormalization layer per level (``unet_bn_down_{lvl}`` /
  ``unet_bn_up_{lvl}``) whose gamma/beta/moving_mean/moving_variance the
  converter must FOLD into inference affines, not skip.
* neuron's layer numbering: ``unet_conv_uparm_{5+i}_{c}`` continues the
  downarm level count, while ``unet_bn_up_{i}`` counts the decoder loop
  from the bottleneck.

base_features is reduced 24 -> 8 to keep the fixture file small; feature
count does not affect any name the converter parses. Numerical truth is an
independent PyTorch forward consuming the RAW h5 BN statistics via
F.batch_norm (so the converter's folding math and epsilon are pinned, not
assumed).
"""

import numpy as np
import pytest

from fetal_t2mapping_tpu.labels.convert_synthseg import convert
from fetal_t2mapping_tpu.labels.unet3d import (
    UNetConfig, config_from_params, load_params, unet_apply, validate_params)

REAL_CFG = UNetConfig(n_levels=5, n_conv_per_level=2, base_features=8,
                      kernel=3, n_labels=33, batch_norm=True)


def _real_layer_sequence(cfg):
    """(layer_name, kind, c_in, c_out) in the exact order neuron's unet()
    builds the real model; kind in {'input','conv','bn','pool','up',
    'merge','head','pred'}."""
    feats = [cfg.base_features * 2 ** lv for lv in range(cfg.n_levels)]
    rows = [("unet_input", "input", 0, 0)]
    c_in = 1
    for lv in range(cfg.n_levels):
        for i in range(cfg.n_conv_per_level):
            rows.append((f"unet_conv_downarm_{lv}_{i}", "conv", c_in, feats[lv]))
            c_in = feats[lv]
        rows.append((f"unet_bn_down_{lv}", "bn", 0, feats[lv]))
        if lv < cfg.n_levels - 1:
            rows.append((f"unet_maxpool_{lv}", "pool", 0, 0))
    for i, lv in enumerate(range(cfg.n_levels - 2, -1, -1)):
        up_idx = cfg.n_levels + i
        rows.append((f"unet_up_{up_idx}", "up", 0, 0))
        rows.append((f"unet_merge_{up_idx}", "merge", 0, 0))
        c_in = c_in + feats[lv]
        for c in range(cfg.n_conv_per_level):
            rows.append((f"unet_conv_uparm_{up_idx}_{c}", "conv", c_in, feats[lv]))
            c_in = feats[lv]
        rows.append((f"unet_bn_up_{i}", "bn", 0, feats[lv]))
    rows.append(("unet_likelihood", "head", c_in, cfg.n_labels))
    rows.append(("unet_prediction", "pred", 0, 0))
    return rows


def _write_real_layout_h5(h5py, path, cfg, seed=11):
    """Clone Keras model.save_weights() for the real architecture."""
    rng = np.random.default_rng(seed)
    seq = _real_layer_sequence(cfg)
    raw_bn = {}
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array([n.encode() for n, *_ in seq])
        f.attrs["backend"] = b"tensorflow"
        f.attrs["keras_version"] = b"2.3.1"
        for name, kind, c_in, c_out in seq:
            g = f.create_group(name)
            if kind in ("input", "pool", "up", "merge", "pred"):
                g.attrs["weight_names"] = np.array([], dtype="S1")
                continue
            inner = g.create_group(name)
            if kind == "bn":
                wn = ["gamma:0", "beta:0", "moving_mean:0",
                      "moving_variance:0"]
                vals = {
                    "gamma:0": rng.uniform(0.5, 1.5, c_out),
                    "beta:0": rng.normal(0, 0.2, c_out),
                    "moving_mean:0": rng.normal(0, 0.5, c_out),
                    "moving_variance:0": rng.uniform(0.5, 2.0, c_out),
                }
                raw_bn[name] = {k.split(":")[0]: np.asarray(v, np.float32)
                                for k, v in vals.items()}
                for k in wn:
                    inner.create_dataset(k, data=vals[k].astype(np.float32))
            else:
                k = 1 if kind == "head" else cfg.kernel
                wn = ["kernel:0", "bias:0"]
                inner.create_dataset(
                    "kernel:0",
                    data=rng.normal(0, 0.3 / np.sqrt(c_in * k ** 3),
                                    (k, k, k, c_in, c_out)).astype(np.float32))
                inner.create_dataset(
                    "bias:0",
                    data=rng.normal(0, 0.01, c_out).astype(np.float32))
            g.attrs["weight_names"] = np.array(
                [f"{name}/{w}".encode() for w in wn])
    return raw_bn


@pytest.fixture(scope="module")
def real_layout(tmp_path_factory):
    h5py = pytest.importorskip("h5py")
    tmp = tmp_path_factory.mktemp("synthseg_real")
    h5_path = str(tmp / "synthseg_1.0.h5")
    raw_bn = _write_real_layout_h5(h5py, h5_path, REAL_CFG)
    npz_path = str(tmp / "synthseg_1.0.npz")
    convert(h5_path, npz_path, verbose=False)
    return h5_path, npz_path, raw_bn


def test_converts_real_layout_and_infers_real_config(real_layout, capsys):
    _, npz_path, _ = real_layout
    params = load_params(npz_path)
    cfg = config_from_params(params)
    assert cfg == REAL_CFG
    validate_params(params, cfg)
    # every BN layer converted (not skipped), both arms, all levels
    assert {k for k in params if k.startswith("bn_down")} == {
        f"bn_down{lv}_{sfx}" for lv in range(5) for sfx in ("s", "b")}
    assert {k for k in params if k.startswith("bn_up")} == {
        f"bn_up{lv}_{sfx}" for lv in range(4) for sfx in ("s", "b")}


def test_converter_reports_weightless_layers_quietly(real_layout, capsys):
    """Weight-less layers (input/maxpool/up/merge/prediction) are empty
    groups in the real file — conversion must neither fail on them nor
    misreport them as skipped model weights."""
    h5_path, _, _ = real_layout
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        convert(h5_path, td + "/w.npz", verbose=True)
    out = capsys.readouterr().out
    assert "unet_bn_down_0" in out and "bn_down0" in out
    assert "skipped" not in out  # nothing in the real layout is skippable


def test_bn_up_continuing_count_also_maps(tmp_path):
    """Some neuron revisions number bn_up with the CONTINUING level count
    (like the uparm convs). sort-and-assign-deepest-first must map those
    identically."""
    h5py = pytest.importorskip("h5py")
    a, b = str(tmp_path / "a.h5"), str(tmp_path / "b.h5")
    _write_real_layout_h5(h5py, a, REAL_CFG, seed=3)
    _write_real_layout_h5(h5py, b, REAL_CFG, seed=3)
    with h5py.File(b, "a") as f:
        for i in range(REAL_CFG.n_levels - 1):
            f.move(f"unet_bn_up_{i}/unet_bn_up_{i}",
                   f"unet_bn_up_{i}/tmp_inner")
            f.move(f"unet_bn_up_{i}/tmp_inner",
                   f"unet_bn_up_{REAL_CFG.n_levels + i}_inner")
            del f[f"unet_bn_up_{i}"]
            f.move(f"unet_bn_up_{REAL_CFG.n_levels + i}_inner",
                   f"unet_bn_up_{REAL_CFG.n_levels + i}")
    pa = convert(a, str(tmp_path / "a.npz"), verbose=False)
    pb = convert(b, str(tmp_path / "b.npz"), verbose=False)
    assert sorted(pa) == sorted(pb)
    for k in pa:
        np.testing.assert_array_equal(pa[k], pb[k])


def _torch_forward_bn(params, raw_bn, x_np, cfg):
    """Independent reference forward (PyTorch, NCDHW) consuming the RAW
    Keras BN statistics — pins the converter's folding math + epsilon."""
    import torch
    import torch.nn.functional as F

    def w(name):
        return torch.from_numpy(
            np.transpose(params[name + "_w"], (4, 3, 0, 1, 2)).copy())

    def b(name):
        return torch.from_numpy(params[name + "_b"].copy())

    def bn(x, keras_name):
        d = raw_bn[keras_name]
        return F.batch_norm(
            x, torch.from_numpy(d["moving_mean"]),
            torch.from_numpy(d["moving_variance"]),
            weight=torch.from_numpy(d["gamma"]),
            bias=torch.from_numpy(d["beta"]), training=False, eps=1e-3)

    x = torch.from_numpy(np.transpose(x_np, (0, 4, 1, 2, 3)).copy())
    skips = []
    for lv in range(cfg.n_levels):
        for i in range(cfg.n_conv_per_level):
            name = f"enc{lv}_{i}"
            x = F.elu(F.conv3d(x, w(name), b(name), padding=cfg.kernel // 2))
        x = bn(x, f"unet_bn_down_{lv}")
        if lv < cfg.n_levels - 1:
            skips.append(x)
            x = F.max_pool3d(x, 2)
    for i, lv in enumerate(range(cfg.n_levels - 2, -1, -1)):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = torch.cat([skips[lv], x], dim=1)
        for c in range(cfg.n_conv_per_level):
            name = f"dec{lv}_{c}"
            x = F.elu(F.conv3d(x, w(name), b(name), padding=cfg.kernel // 2))
        x = bn(x, f"unet_bn_up_{i}")
    x = F.conv3d(x, w("head"), b("head"))
    return np.transpose(x.numpy(), (0, 2, 3, 4, 1))


def test_forward_with_bn_matches_torch_reference(real_layout):
    import jax.numpy as jnp

    _, npz_path, raw_bn = real_layout
    params = load_params(npz_path)
    cfg = config_from_params(params)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 16, 32, 16, 1)).astype(np.float32)

    ours = np.asarray(unet_apply({k: jnp.asarray(v) for k, v in params.items()},
                                 jnp.asarray(x), cfg))
    ref = _torch_forward_bn(params, raw_bn, x, cfg)
    assert ours.shape == ref.shape == (1, 16, 32, 16, cfg.n_labels)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_s2d_path_matches_dense_with_bn(real_layout):
    """The space-to-depth level-0 program must stay exact when the model
    carries per-level BN (tiled slot-major affines)."""
    import jax.numpy as jnp

    from fetal_t2mapping_tpu.labels.unet3d import (
        s2d_level0_params, unet_apply_s2d)

    _, npz_path, _ = real_layout
    params = load_params(npz_path)
    cfg = config_from_params(params)
    pj = {k: jnp.asarray(v) for k, v in params.items()}
    s2d = {k: jnp.asarray(v)
           for k, v in s2d_level0_params(params, cfg).items()}
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (1, 16, 16, 32, 1)).astype(np.float32)
    dense = np.asarray(unet_apply(pj, jnp.asarray(x), cfg))
    s2d_logits = np.asarray(unet_apply_s2d(pj, s2d, jnp.asarray(x), cfg,
                                           return_logits=True))
    np.testing.assert_allclose(s2d_logits, dense, rtol=2e-4, atol=2e-4)
