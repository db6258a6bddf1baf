"""fetal_t2mapping_tpu — a TPU-native quantitative T2-mapping framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Medical-Image-Analysis-Laboratory/fetal_t2mapping (quantitative T2 mapping of
the brain at 0.55 T / 1.5 T from multi-echo HASTE acquisitions):

- ``core``     — immutable ``Volume`` geometry model + pure-Python NIfTI-1 I/O
- ``models``   — signal models (gaussian / gaussian-rician / rician) and the
                 batched, vmapped, box-constrained Newton/LM voxel-fit solver
                 (replaces the reference's per-voxel scipy L-BFGS-B fanned out
                 over multiprocessing.Pool, reference run_t2mapping.py:120-312)
- ``ops``      — device kernels: trilinear gather-resample, binary morphology,
                 TV-Chambolle denoising, image pyramids
- ``recon``    — resampling, differentiable rigid/affine registration, and
                 multi-orientation HR fusion (replaces SimpleITK/Elastix/FLIRT)
- ``labels``   — SynthSeg→FeTA remap, masks, phantom seed labels, atlas warps
- ``parallel`` — mesh/sharding helpers for multi-chip voxel-parallel fits
- ``analysis`` — ROI statistics, convergence observability, reproducibility
- ``utils``    — BIDS path resolution, metadata CSV logs, DICOM ingest
- ``cli``      — the three pipeline entry points mirroring the reference CLIs
"""

__version__ = "0.1.0"
