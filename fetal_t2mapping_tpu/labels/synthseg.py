"""Pluggable SynthSeg adapter (external pretrained segmentation CNN).

The reference shells out to FreeSurfer's ``mri_synthseg`` through a generated
bash script run under GNU parallel (utils/qmri_utils.py:424-466). Retraining
that CNN is out of scope; this adapter keeps the same contract — a directory
of recon NIfTIs in, a directory of label NIfTIs out — with three backends:

- 'subprocess': invoke a user-provided command template per directory pair
  (default ``mri_synthseg --i {input} --o {output} --robust --threads 4 --cpu``)
- 'jax':       the TPU-native 3-D U-Net (labels.unet3d, SynthSeg topology);
  weights from ``weights`` or $FT2_SYNTHSEG_WEIGHTS (.npz manifest)
- 'callable':  any Python function f(input_dir, output_dir)
- 'fake':      deterministic threshold-based labeler for tests/pipelines
  without FreeSurfer (foreground -> WM id 2, bright -> GM id 3, as a stand-in)
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import subprocess
from typing import Callable, Optional

import numpy as np

from ..core import nifti

DEFAULT_CMD = "mri_synthseg --i {input} --o {output} --robust --threads 4 --cpu"


@dataclasses.dataclass
class SynthSegRunner:
    mode: str = "subprocess"  # 'subprocess' | 'jax' | 'callable' | 'fake'
    command_template: str = DEFAULT_CMD
    fn: Optional[Callable[[str, str], None]] = None
    weights: Optional[str] = None  # .npz for mode='jax' ($FT2_SYNTHSEG_WEIGHTS)
    mesh: Optional[object] = None  # jax.sharding.Mesh: 'jax' mode shards z over it

    def available(self) -> bool:
        if self.mode == "subprocess":
            return shutil.which(self.command_template.split()[0]) is not None
        if self.mode == "jax":
            return bool(self.weights or os.environ.get("FT2_SYNTHSEG_WEIGHTS"))
        return True

    def run(self, input_dir: str, output_dir: str) -> None:
        os.makedirs(output_dir, exist_ok=True)
        if self.mode in ("subprocess", "callable"):
            # these consumers may read input_dir with their OWN IO (an
            # external binary, a user callback using sitk/open) — queued
            # async writes must be real files first. 'jax'/'fake' read
            # through nifti.read, which serves queued writes from the
            # volume cache.
            nifti.flush_writes(force=True)
        if self.mode == "subprocess":
            import shlex

            # split the TEMPLATE, then substitute paths as whole argv
            # elements — paths with spaces must not be word-split
            argv = [a.format(input=input_dir, output=output_dir)
                    for a in shlex.split(self.command_template)]
            subprocess.run(argv, check=True)
        elif self.mode == "jax":
            self._jax(input_dir, output_dir)
        elif self.mode == "callable":
            if self.fn is None:
                raise ValueError("mode='callable' requires fn")
            self.fn(input_dir, output_dir)
        elif self.mode == "fake":
            self._fake(input_dir, output_dir)
        else:
            raise ValueError(f"unknown mode {self.mode!r}")

    def _jax(self, input_dir: str, output_dir: str) -> None:
        from .unet3d import load_params, segment_volume

        weights = self.weights or os.environ.get("FT2_SYNTHSEG_WEIGHTS")
        if not weights:
            raise ValueError(
                "mode='jax' needs converted SynthSeg weights "
                "(weights=... or FT2_SYNTHSEG_WEIGHTS)")
        params = load_params(weights)
        # list_volumes, not glob: under deferred flushes the recon writes
        # may still be queued (nifti.read serves them from the cache)
        for path in nifti.list_volumes(input_dir):
            vol = nifti.read(path)
            labels = segment_volume(params, np.asarray(vol.data),
                                    mesh=self.mesh)
            base = os.path.basename(path).replace(".nii.gz", "_synthseg.nii.gz")
            nifti.write(os.path.join(output_dir, base),
                        vol.with_data(labels), dtype=np.int16)

    @staticmethod
    def _fake(input_dir: str, output_dir: str) -> None:
        for path in nifti.list_volumes(input_dir):
            vol = nifti.read(path)
            data = np.asarray(vol.data, np.float32)
            fg = data > np.percentile(data, 60)
            bright = data > np.percentile(data, 85)
            labels = np.zeros(data.shape, np.int16)
            labels[fg] = 2      # aseg left-cerebral-WM
            labels[bright] = 3  # aseg left-cerebral-GM
            out = vol.with_data(labels)
            base = os.path.basename(path).replace(".nii.gz", "_synthseg.nii.gz")
            nifti.write(os.path.join(output_dir, base), out, dtype=np.int16)
