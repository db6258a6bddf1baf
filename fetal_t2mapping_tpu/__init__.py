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

import os as _os


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache, on by default.

    Kernel compiles cost 15-40 s per shape (minutes for the 3-parameter
    multistart kernels) and JAX's in-memory cache is per-process, so every
    CLI invocation used to repay them. The persistent cache brings a warm
    second process from ~265 s to ~3 s (measured on the target chip).

    FT2_COMPILE_CACHE=<dir> overrides the location; FT2_COMPILE_CACHE=0
    disables; a user-configured jax_compilation_cache_dir is respected.
    """
    val = _os.environ.get("FT2_COMPILE_CACHE", "")
    if val == "0":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return  # user already configured one
        path = val or _os.path.join(
            _os.path.expanduser("~"), ".cache", "fetal_t2mapping_tpu", "xla")
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # jax absent/old: the package's host-only parts still work
        pass


_enable_compile_cache()
