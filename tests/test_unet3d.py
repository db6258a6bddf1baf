"""TPU-native SynthSeg-topology U-Net: shapes, determinism, pipeline wiring."""

import os

import numpy as np
import pytest

from fetal_t2mapping_tpu.core import Volume, nifti
from fetal_t2mapping_tpu.labels.synthseg import SynthSegRunner
from fetal_t2mapping_tpu.labels.unet3d import (
    SYNTHSEG_LABELS,
    UNetConfig,
    load_params,
    pad_to_divisor,
    random_params,
    segment_volume,
    unet_apply,
)

# small config so tests stay fast; same code path as the full network
CFG = UNetConfig(n_levels=3, base_features=4, n_labels=len(SYNTHSEG_LABELS))


def test_forward_shapes_and_divisor():
    import jax.numpy as jnp

    params = {k: jnp.asarray(v) for k, v in random_params(CFG).items()}
    x = jnp.zeros((1, 8, 16, 8, 1), jnp.float32)
    out = unet_apply(params, x, CFG)
    assert out.shape == (1, 8, 16, 8, CFG.n_labels)


def test_default_config_matches_synthseg_topology():
    cfg = UNetConfig()
    assert cfg.n_levels == 5 and cfg.base_features == 24
    assert cfg.divisor == 16
    params = random_params(cfg)
    # encoder deepest level carries 24 * 2^4 = 384 features
    assert params["enc4_0_w"].shape[-1] == 384
    assert params["head_w"].shape == (1, 1, 1, 24, len(SYNTHSEG_LABELS))


def test_segment_volume_labels_and_crop():
    params = random_params(CFG, seed=1)
    data = np.abs(np.random.default_rng(0).normal(500, 100, (9, 13, 11))).astype(np.float32)
    labels = segment_volume(params, data, CFG)
    assert labels.shape == data.shape          # padding cropped away
    assert labels.dtype == np.int16
    assert set(np.unique(labels)) <= set(SYNTHSEG_LABELS)
    # deterministic
    np.testing.assert_array_equal(labels, segment_volume(params, data, CFG))


def test_pad_to_divisor_roundtrip():
    d = np.arange(5 * 6 * 7, dtype=np.float32).reshape(5, 6, 7)
    padded, crop = pad_to_divisor(d, 4)
    assert padded.shape == (8, 8, 8)
    np.testing.assert_array_equal(padded[crop], d)


def test_runner_jax_mode(tmp_path):
    params = random_params(CFG, seed=2)
    wpath = str(tmp_path / "w.npz")
    np.savez(wpath, **params)
    assert load_params(wpath).keys() == params.keys()

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    vol = Volume(np.random.default_rng(1).normal(400, 50, (8, 8, 8)).astype(np.float32),
                 spacing=(1, 1, 1), origin=(0, 0, 0))
    nifti.write(str(in_dir / "sub-001_ses-01_te-114_recon_1mm.nii.gz"), vol)

    runner = SynthSegRunner(mode="jax", weights=wpath)
    assert runner.available()
    # monkeypatch the full-size config down to the test config
    from fetal_t2mapping_tpu.labels import synthseg as ss
    from fetal_t2mapping_tpu.labels import unet3d

    orig = unet3d.segment_volume
    try:
        unet3d.segment_volume = \
            lambda p, d, cfg=CFG, **kw: orig(p, d, CFG, **kw)
        runner.run(str(in_dir), str(out_dir))
    finally:
        unet3d.segment_volume = orig
    outs = os.listdir(out_dir)
    assert outs == ["sub-001_ses-01_te-114_recon_1mm_synthseg.nii.gz"]
    lbl = nifti.read(str(out_dir / outs[0]))
    assert set(np.unique(np.asarray(lbl.data))) <= set(SYNTHSEG_LABELS)


def test_runner_jax_requires_weights():
    r = SynthSegRunner(mode="jax")
    if not os.environ.get("FT2_SYNTHSEG_WEIGHTS"):
        assert not r.available()
        with pytest.raises(ValueError):
            r.run("/tmp/nonexistent_in", "/tmp/nonexistent_out")


class TestSpaceToDepthLevel0:
    """The production inference path rewrites level 0 in space-to-depth
    form (unet3d.unet_apply_s2d) — exactly the same network, with the
    24-channel full-resolution convs expressed as 192-channel convs at
    half resolution so the MXU lanes stay full (~1.6x the dense forward
    on TPU). These tests pin exactness against unet_apply."""

    def _pair(self, cfg, seed, shape):
        import jax.numpy as jnp

        from fetal_t2mapping_tpu.labels.unet3d import s2d_level0_params

        params = random_params(cfg, seed=seed)
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        s2d = {k: jnp.asarray(v)
               for k, v in s2d_level0_params(params, cfg).items()}
        x = jnp.asarray(np.random.default_rng(seed).normal(0, 1, shape),
                        jnp.float32)
        return pj, s2d, x

    @pytest.mark.parametrize("cfgkw,shape", [
        (dict(n_levels=3, base_features=4, n_labels=5), (1, 16, 12, 20, 1)),
        (dict(n_levels=2, base_features=3, n_labels=4), (2, 8, 10, 6, 1)),
        (dict(n_levels=2, base_features=2, n_labels=3,
              n_conv_per_level=3), (1, 8, 8, 8, 1)),
        (dict(), (1, 16, 16, 16, 1)),           # full SynthSeg topology
    ])
    def test_logits_match_dense_path(self, cfgkw, shape):
        import jax.numpy as jnp

        from fetal_t2mapping_tpu.labels.unet3d import unet_apply_s2d

        cfg = UNetConfig(**cfgkw)
        pj, s2d, x = self._pair(cfg, seed=1, shape=shape)
        ref = np.asarray(unet_apply(pj, x, cfg, jnp.float32))
        got = np.asarray(unet_apply_s2d(pj, s2d, x, cfg, jnp.float32,
                                        return_logits=True))
        scale = max(float(np.abs(ref).max()), 1e-6)
        assert np.abs(got - ref).max() / scale < 1e-4   # fp32 sum order only
        cls = np.asarray(unet_apply_s2d(pj, s2d, x, cfg, jnp.float32))
        np.testing.assert_array_equal(cls, ref.argmax(-1))

    def test_fold_upsample_kernel_exact(self):
        """dec0_0's upsample branch folds onto the coarse grid: conv3
        (SAME) of the folded kernel == dense conv of the upsampled input,
        for every tap and channel."""
        import jax.numpy as jnp

        from fetal_t2mapping_tpu.labels.unet3d import (
            _conv, _fold_upsample_kernel, _upsample2)
        import jax

        rng = np.random.default_rng(0)
        cu, co, q = 4, 3, 5
        z = jnp.asarray(rng.normal(0, 1, (1, q, q, q, cu)), jnp.float32)
        w = rng.normal(0, 1, (3, 3, 3, cu, co)).astype(np.float32)
        ref = np.asarray(_conv(_upsample2(z), jnp.asarray(w), jnp.zeros(co)))
        out = jax.lax.conv_general_dilated(
            z, jnp.asarray(_fold_upsample_kernel(w)), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        got = np.asarray(out.reshape(1, q, q, q, 2, 2, 2, co)
                         .transpose(0, 1, 4, 2, 5, 3, 6, 7)
                         .reshape(1, 2 * q, 2 * q, 2 * q, co))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_s2d_kernel_rejects_non3(self):
        from fetal_t2mapping_tpu.labels.unet3d import _s2d_kernel

        with pytest.raises(ValueError):
            _s2d_kernel(np.zeros((2, 2, 2, 3, 3), np.float32))

    def test_segment_volume_rejects_s2d_on_incompatible_cfg(self):
        """Explicit use_s2d=True must raise (not silently run dense) when
        the architecture cannot be S2D-transformed."""
        cfg = UNetConfig(n_levels=1, base_features=2, n_labels=3)
        params = random_params(cfg, seed=0)
        with pytest.raises(ValueError, match="use_s2d"):
            segment_volume(params, np.ones((4, 4, 4), np.float32), cfg,
                           use_s2d=True)

    def test_s2d_transform_cached_per_params(self):
        from fetal_t2mapping_tpu.labels.unet3d import _s2d_params_cached

        params = random_params(CFG, seed=9)
        a = _s2d_params_cached(params, CFG)
        b = _s2d_params_cached(params, CFG)
        assert a is b                       # second call is a cache hit
        other = random_params(CFG, seed=10)
        c = _s2d_params_cached(other, CFG)
        assert c is not a

    def test_segment_volume_s2d_matches_dense(self):
        """segment_volume's selectable S2D path (use_s2d=True /
        FT2_UNET_S2D=1) must match the dense jit path voxel for voxel."""
        import jax.numpy as jnp

        from fetal_t2mapping_tpu.labels.unet3d import _segment_jit

        params = random_params(CFG, seed=4)
        data = np.abs(np.random.default_rng(4).normal(
            500, 100, (9, 13, 11))).astype(np.float32)
        labels = segment_volume(params, data, CFG, use_s2d=True)
        # dense path on the same normalized/padded input
        scale = np.percentile(data[data > 0], 99.5)
        norm = np.clip(data / scale, 0.0, 1.0)
        padded, crop = pad_to_divisor(norm, CFG.divisor)
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        cls = np.asarray(_segment_jit(pj, jnp.asarray(padded)[None, ..., None],
                                      CFG, jnp.float32))[0][crop]
        lut = np.asarray(SYNTHSEG_LABELS, np.int16)
        np.testing.assert_array_equal(labels, lut[cls])


def test_bf16_compute_matches_fp32_labels():
    """The TPU production path feeds the MXU bf16 inputs with fp32
    accumulation; class decisions must match full precision away from
    decision boundaries."""
    import jax.numpy as jnp

    from fetal_t2mapping_tpu.labels.unet3d import (
        UNetConfig, random_params, unet_apply)

    cfg = UNetConfig(n_levels=3, n_conv_per_level=2, base_features=4,
                     n_labels=5)
    params = {k: jnp.asarray(v) for k, v in random_params(cfg, seed=3).items()}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 16, 1)), jnp.float32)
    lg32 = np.asarray(unet_apply(params, x, cfg, jnp.float32))
    lg16 = np.asarray(unet_apply(params, x, cfg, jnp.bfloat16))
    assert lg16.dtype == np.float32          # fp32 accumulation throughout
    scale = max(float(np.std(lg32)), 1e-6)
    assert np.abs(lg16 - lg32).max() / scale < 0.1
    agree = (lg16.argmax(-1) == lg32.argmax(-1)).mean()
    assert agree > 0.97, f"bf16/fp32 label agreement {agree:.4f}"


class TestPallasS2DConv:
    """The fused Pallas MXU kernel for the S2D path (labels.pallas_conv):
    im2col matmul over the 8 taps with bias + decoder residual + ELU in
    the epilogue. Interpret-mode numerics pinned against the XLA
    composition and the dense network."""

    def test_conv_matches_xla_composition(self):
        import jax
        import jax.numpy as jnp

        from fetal_t2mapping_tpu.labels.pallas_conv import conv_s2d, pack_taps
        from fetal_t2mapping_tpu.labels.unet3d import _conv_s2d, _s2d_kernel

        rng = np.random.default_rng(0)
        ci, co, q = 3, 5, 6
        w2 = _s2d_kernel(rng.normal(0, 0.2, (3, 3, 3, ci, co)).astype(np.float32))
        b = rng.normal(0, 0.1, 8 * co).astype(np.float32)
        x = rng.normal(0, 1, (q + 1, q + 1, q + 1, 8 * ci)).astype(np.float32)
        res = rng.normal(0, 1, (q, q, q, 8 * co)).astype(np.float32)
        ref = np.asarray(jax.nn.elu(
            _conv_s2d(jnp.asarray(x)[None], jnp.asarray(w2), jnp.asarray(b),
                      compute_dtype=jnp.float32) + jnp.asarray(res)[None]))[0]
        got = np.asarray(conv_s2d(
            jnp.asarray(x), jnp.asarray(pack_taps(w2)), jnp.asarray(b),
            residual=jnp.asarray(res), activation="elu",
            compute_dtype=jnp.float32, interpret=True))
        scale = max(float(np.abs(ref).max()), 1e-6)
        assert np.abs(got - ref).max() / scale < 1e-5

    def test_pack_taps_shape_guard(self):
        from fetal_t2mapping_tpu.labels.pallas_conv import pack_taps

        with pytest.raises(ValueError):
            pack_taps(np.zeros((3, 3, 3, 2, 2), np.float32))

    def test_forward_matches_dense_and_xla_s2d(self):
        """use_s2d='pallas' labels == use_s2d=True labels == dense labels
        (fp32 on CPU: the only difference is fp32 tap-summation order)."""
        cfg = UNetConfig(n_levels=3, base_features=4, n_labels=7)
        params = random_params(cfg, seed=1)
        vol = np.abs(np.random.default_rng(2).normal(
            300, 120, (24, 20, 28))).astype(np.float32)
        dense = segment_volume(params, vol, cfg, use_s2d=False)
        s2d = segment_volume(params, vol, cfg, use_s2d=True)
        pall = segment_volume(params, vol, cfg, use_s2d="pallas")
        np.testing.assert_array_equal(s2d, pall)
        assert (dense == pall).mean() > 0.999

    def test_env_selects_pallas(self, monkeypatch):
        cfg = UNetConfig(n_levels=2, base_features=2, n_labels=3)
        params = random_params(cfg, seed=3)
        vol = np.abs(np.random.default_rng(3).normal(
            200, 80, (8, 8, 8))).astype(np.float32)
        ref = segment_volume(params, vol, cfg, use_s2d="pallas")
        monkeypatch.setenv("FT2_UNET_S2D", "pallas")
        got = segment_volume(params, vol, cfg)
        np.testing.assert_array_equal(ref, got)

    def test_pallas_rejects_batched(self):
        import jax.numpy as jnp

        from fetal_t2mapping_tpu.labels.unet3d import (
            s2d_level0_params, unet_apply_s2d)

        cfg = UNetConfig(n_levels=2, base_features=2, n_labels=3)
        params = random_params(cfg, seed=0)
        pj = {k: jnp.asarray(v) for k, v in params.items()}
        s2d = {k: jnp.asarray(v)
               for k, v in s2d_level0_params(params, cfg).items()}
        x = jnp.zeros((2, 8, 8, 8, 1), jnp.float32)
        with pytest.raises(ValueError, match="single volume"):
            unet_apply_s2d(pj, s2d, x, cfg, conv_impl="pallas")

    def test_mesh_excludes_pallas(self):
        cfg = UNetConfig(n_levels=2, base_features=2, n_labels=3)
        params = random_params(cfg, seed=0)

        class _FakeMesh:                     # only reaches the early raise
            axis_names = ("vox",)

        with pytest.raises(ValueError, match="mutually exclusive"):
            segment_volume(params, np.ones((8, 8, 8), np.float32), cfg,
                           use_s2d="pallas", mesh=_FakeMesh())
