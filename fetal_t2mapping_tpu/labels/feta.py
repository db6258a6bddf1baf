"""SynthSeg (FreeSurfer aseg ids) -> FeTA 7-class remap.

Device gather-based relabeling replacing the reference's chain of boolean
masks (utils/qmri_utils.py:976-1009). The mapping table is the fixed
anatomical correspondence used there:
1 CSF, 2 cortical GM, 3 WM, 4 ventricles, 5 cerebellum, 6 deep GM,
7 brainstem.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.volume import Volume

FETA_CLASS_NAMES = {
    0: "background", 1: "csf", 2: "gm", 3: "wm", 4: "ventricles",
    5: "cerebellum", 6: "deep_gm", 7: "brainstem",
}

_SYNTHSEG_TO_FETA = {
    24: 1,
    3: 2, 42: 2,
    2: 3, 41: 3,
    4: 4, 5: 4, 14: 4, 15: 4, 43: 4, 44: 4,
    7: 5, 8: 5, 46: 5, 47: 5,
    10: 6, 11: 6, 12: 6, 13: 6, 17: 6, 18: 6, 26: 6, 28: 6,
    49: 6, 50: 6, 51: 6, 52: 6, 53: 6, 54: 6, 58: 6, 60: 6,
    16: 7,
}

_LUT = np.zeros(256, np.uint8)
for k, v in _SYNTHSEG_TO_FETA.items():
    _LUT[k] = v


@jax.jit
def _remap(labels):
    lut = jnp.asarray(_LUT)
    idx = jnp.clip(labels.astype(jnp.int32), 0, 255)
    return lut[idx]


def synthseg_to_feta(labels: Volume) -> Volume:
    """Remap a SynthSeg label volume to FeTA classes (geometry preserved).

    Returns a DEVICE-backed Volume: the pipeline immediately write_asyncs
    the result, so the (clinical-size) download rides the writer pool off
    the critical path instead of blocking here — measured 40 -> ~4 s on
    the recon.feta stage of a 240^3 session over the tunneled chip.
    ``np.asarray(vol.data)`` materializes on host as usual."""
    out = _remap(jnp.asarray(np.asarray(labels.data)))
    return labels.with_data(out)
