"""N4-style bias correction: recover a known smooth multiplicative field."""

import numpy as np

from fetal_t2mapping_tpu.core.volume import Volume
from fetal_t2mapping_tpu.recon.biasfield import n4_bias_correction, shared_log_bias


def _biased_volume(seed=0, nz=32, bias_strength=0.6):
    rng = np.random.default_rng(seed)
    z, y, x = np.meshgrid(*[np.linspace(-1, 1, nz)] * 3, indexing="ij")
    # piecewise-"tissue" image: two intensity classes + mild noise
    tissue = np.where(np.sqrt(z**2 + y**2 + x**2) < 0.6, 1000.0, 600.0)
    tissue = tissue * (1 + 0.02 * rng.standard_normal(tissue.shape))
    field = np.exp(bias_strength * (0.7 * z + 0.5 * y * y - 0.3 * x))
    mask = (np.sqrt(z**2 + y**2 + x**2) < 0.95)
    img = np.where(mask, tissue * field, 0.0).astype(np.float32)
    return (Volume(data=img, spacing=(4.0, 4.0, 4.0), origin=(0, 0, 0)),
            Volume(data=mask.astype(np.uint8), spacing=(4.0, 4.0, 4.0), origin=(0, 0, 0)),
            field, mask, tissue)


def _cv(img, mask):
    vals = img[mask]
    return np.std(vals) / np.mean(vals)


def test_n4_reduces_residual_field_error():
    vol, mask_vol, field, mask, tissue = _biased_volume()
    res = n4_bias_correction(vol, mask_vol)
    # residual log-field error (corrected / true tissue) must shrink —
    # raw intensity CV is dominated by the bimodal tissue contrast itself
    err_before = np.std(np.log(np.asarray(vol.data)[mask] / tissue[mask]))
    err_after = np.std(np.log(
        np.maximum(np.asarray(res.corrected.data)[mask], 1e-6) / tissue[mask]))
    assert err_after < err_before * 0.5, (err_before, err_after)
    # estimated field must correlate with the applied one inside the mask
    est = np.log(np.asarray(res.field.data)[mask])
    true = np.log(field[mask])
    corr = np.corrcoef(est, true)[0, 1]
    assert corr > 0.9, corr
    assert res.field_cv.shape == (40,)


def test_n4_multiresolution_refines():
    vol, mask_vol, field, mask, tissue = _biased_volume(seed=3)
    single = n4_bias_correction(vol, mask_vol, n_iters=20, ctrl_spacing_mm=100.0)
    multi = n4_bias_correction(vol, mask_vol, n_iters=20,
                               ctrl_spacing_mm=(200.0, 100.0, 60.0))
    def err(res):
        return np.std(np.log(
            np.maximum(np.asarray(res.corrected.data)[mask], 1e-6) / tissue[mask]))
    assert err(multi) <= err(single) * 1.05   # at least as good
    assert multi.field_cv.shape == (60,)      # 20 iters x 3 levels


def test_n4_nearly_identity_on_unbiased_image():
    vol, mask_vol, _, mask, _tis = _biased_volume(bias_strength=0.0)
    res = n4_bias_correction(vol, mask_vol, n_iters=10, ctrl_spacing_mm=60.0)
    field = np.asarray(res.field.data)[mask]
    # no bias present: estimated field should stay within a few percent of flat
    assert np.abs(np.log(field)).max() < 0.1


def test_shared_log_bias_pools_echoes():
    vol1, mask_vol, field, mask, _tis = _biased_volume(seed=1)
    # second echo: same field, globally darker tissue
    img2 = (np.asarray(vol1.data) * 0.5).astype(np.float32)
    vol2 = vol1.with_data(img2)
    corrected, shared = shared_log_bias([vol1, vol2], [mask_vol, mask_vol],
                                        n_iters=10, ctrl_spacing_mm=60.0)
    assert len(corrected) == 2
    cv1 = _cv(np.asarray(corrected[0].data), mask)
    assert cv1 < _cv(np.asarray(vol1.data), mask)
    est = np.log(np.asarray(shared.data)[mask])
    corr = np.corrcoef(est, np.log(field[mask]))[0, 1]
    assert corr > 0.7, corr
