"""Cold-start program prewarming: load the big stage-2 device programs
on a background thread while the pipeline's host/link-bound phases run.

On the tunneled chip every DISTINCT compiled program pays seconds of
remote per-executable initialization on its FIRST execution (measured in
docs/VALIDATION.md "cold start": program COUNT, not compile time,
dominates); meanwhile the pipeline's opening phases — DICOM ingest, gz
inflate of the inputs, derivative writes — are host work that leaves the
device idle. This module first-executes the expensive stage-2 programs
(multi-level registration solves, affine-gather warps, TV denoise,
label remaps) on SYNTHETIC data of the exact production shapes, so
their loads overlap ingest/IO instead of serializing inside the first
session (the reference's CPU baseline pays zero compile/load cost,
run_t2mapping.py:442 — this recovers that advantage without giving up
the compiled kernels).

Program identity in JAX is (traced shapes/dtypes, static args), so the
prewarm must replay the pipeline's public entry points with the SAME
kwargs and geometry the session will use — it derives every downstream
shape the way the pipeline does (resample_volume computes the HR grid
from the acquisition header) and needs only geometry-only header reads
(:func:`..core.nifti.read_header`), never voxel payloads.

Usage (product surface)::

    process_qmri(..., prewarm=True)          # or qmri_reconstruction --prewarm

or explicitly, to overlap an even earlier phase (e.g. ingest)::

    h = start_recon_prewarm(acq_geoms, registration_kwargs=...)
    ...                                       # ingest / host work
    h.wait()                                  # optional; thread is daemon
"""

from __future__ import annotations

import logging
import os
import threading
import time
from typing import Dict, Optional, Sequence

import numpy as np

from ..core.volume import Volume
from .profiling import profiler

log = logging.getLogger("fetal_t2mapping_tpu.prewarm")


class PrewarmHandle:
    """Join handle for a background prewarm run.

    ``wait()`` blocks until the run finishes (never raises: a prewarm
    failure only costs the overlap, so errors are logged and stored on
    ``.error``). ``steps`` lists the program groups that completed."""

    def __init__(self, thread: threading.Thread):
        self._thread = thread
        self.steps: list = []
        self.error: Optional[BaseException] = None
        self.seconds: float = 0.0

    def wait(self, timeout: Optional[float] = None) -> "PrewarmHandle":
        self._thread.join(timeout)
        return self

    @property
    def done(self) -> bool:
        return not self._thread.is_alive()


def _smooth_noise(shape, rng):
    """Cheap structured synthetic image: low-frequency product pattern +
    noise. Registration/TV run their full (early-exit-bounded) budgets on
    it; only the compiled programs matter, not the solution."""
    grids = np.ix_(*(np.linspace(0.0, 3.0, s, dtype=np.float32)
                     for s in shape))
    base = 100.0 * np.cos(grids[0]) * np.cos(grids[1]) * np.cos(grids[2])
    return (base + rng.normal(0.0, 5.0, shape)).astype(np.float32)


def _run(acq_geoms: Dict[str, Volume], handle: PrewarmHandle, *,
         fixed_type: str, n_echoes: int, denoise: bool,
         high_res: float, registration_kwargs: Optional[dict],
         labels: bool, synthseg=None) -> None:
    import jax
    import jax.numpy as jnp

    from ..core import nifti
    from ..labels.feta import synthseg_to_feta
    from ..recon.denoise import denoise_volume
    from ..recon.fuse import fuse_orientations
    from ..recon.registration import register_rigid_multi
    from ..recon.resample import resample_to_reference, resample_volume

    def _steps():
        # 1) acquisition -> HR isotropic gathers: one program per distinct
        #    (acquisition grid, HR grid) pair, exactly as run_resample_volumes
        #    derives them from the input headers
        his = {}
        for otype, geom in acq_geoms.items():
            # match the header's dtype: the gather program traces its
            # input dtype, and the pipeline feeds the DICOM-converted
            # int16/uint16 volumes straight in — a float32 stand-in would
            # warm a program the session never runs
            dt = np.asarray(geom.data).dtype
            noise = _smooth_noise(geom.shape, rng)
            vol = geom.with_data(np.abs(noise).astype(dt) if dt.kind == "u"
                                 else noise.astype(dt))
            hi = resample_volume(vol, [high_res] * 3, device=True)
            if dt.kind in "iu":
                # the session writes integer-typed resampled intermediates
                # (run_resample_volumes) and fuses the CACHE-SERVED cast
                # volumes: replay the on-device disk cast so both the
                # write-path clip/round/astype chain and fusion's
                # int->f32 upcast are the programs the session runs
                hi = hi.with_data(nifti._cast_for_disk(hi, dt))
            his[otype] = hi
        jax.block_until_ready(his[fixed_type].data)
        handle.steps.append("resample")

        # 2) fusion: pyramids + the P=2 multi-level registration solve +
        #    HR->HR warps + the coverage-weighted combine — the single
        #    biggest program group of the session
        fused = fuse_orientations(his, fixed_type,
                                  registration_kwargs=registration_kwargs)
        jax.block_until_ready(fused.data)
        handle.steps.append("fuse")

        if denoise:
            jax.block_until_ready(denoise_volume(fused).data)
            handle.steps.append("denoise")

        # 3) echo->first-echo registration (P = n_echoes-1 lock-step solve)
        #    + the device-transform warp; the warp gather program itself is
        #    shared with fusion's (cval rides as a traced operand)
        if n_echoes > 1:
            movs = [fused.with_data(fused.data) for _ in range(n_echoes - 1)]
            regs = register_rigid_multi(fused, movs,
                                        **(registration_kwargs or {}))
            warped = resample_to_reference(
                movs[0], fused, transform=regs[0].matrix_device, device=True)
            jax.block_until_ready(warped.data)
            handle.steps.append("reg_echo")

        if labels:
            # 4) the eager label-remap chain at HR shape (clip+gather+cast:
            #    each eager op is its own singleton program on first use).
            # Host-synthesized labels: downloading the fused volume here
            # would spend ~10 s of the very tunnel bandwidth the prewarm
            # exists to stay off.
            lab_data = (rng.random(fused.shape, np.float32) > 0.5)
            lab = fused.with_data(lab_data.astype(np.int16) * 2)
            synthseg_to_feta(lab)
            handle.steps.append("feta")

        if getattr(synthseg, "mode", "") == "jax" and synthseg.available():
            # 5) jax-mode segmentation: the z-decomposed U-Net forward at
            #    the HR shape is the next-biggest program group of the
            #    session (the real weights are tiny next to it). One label
            #    download (~27 MB int16) rides along — half a derivative.
            from ..labels.unet3d import load_params, segment_volume

            weights = (synthseg.weights
                       or os.environ.get("FT2_SYNTHSEG_WEIGHTS"))
            segment_volume(load_params(weights),
                           rng.random(fused.shape).astype(np.float32),
                           mesh=getattr(synthseg, "mesh", None))
            handle.steps.append("unet")

    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    try:
        # visible in every stage breakdown as THREAD-seconds of background
        # device work (it overlaps the main thread's stages by design)
        with profiler.stage("recon.prewarm"):
            _steps()
    except BaseException as exc:  # noqa: BLE001 — never kill the pipeline
        handle.error = exc
        log.warning("prewarm failed after %s: %s", handle.steps, exc)
    finally:
        handle.seconds = time.perf_counter() - t0
        log.info("prewarm done in %.1f s: %s", handle.seconds, handle.steps)


def start_recon_prewarm(
    acq_geoms: Dict[str, Volume],
    *,
    fixed_type: str = "ax",
    n_echoes: int = 3,
    denoise: bool = True,
    high_res: float = 1.0,
    registration_kwargs: Optional[dict] = None,
    labels: bool = True,
    synthseg=None,
) -> PrewarmHandle:
    """Start the background prewarm for one session geometry.

    ``acq_geoms`` maps orientation ('ax'/'cor'/'sag') to a geometry
    Volume for that acquisition (from :func:`..core.nifti.read_header`;
    data is never read). ``registration_kwargs`` must match what the
    session will pass (different statics/shapes = different programs).
    ``synthseg`` (a :class:`..labels.synthseg.SynthSegRunner`) additionally
    prewarms the jax-mode U-Net forward at the HR shape when that is the
    session's segmentation backend (other modes run out-of-process and
    have nothing to load here). Returns immediately; the daemon thread
    executes each program group once and block_until_ready's it.
    """
    geoms = dict(acq_geoms)
    if fixed_type not in geoms:
        raise ValueError(f"fixed_type {fixed_type!r} not in {sorted(geoms)}")
    # late-binding closure: `handle` is assigned before start(), and the
    # lambda only resolves the name when the thread runs
    thread = threading.Thread(
        target=lambda: _run(geoms, handle, fixed_type=fixed_type,
                            n_echoes=n_echoes, denoise=denoise,
                            high_res=high_res,
                            registration_kwargs=registration_kwargs,
                            labels=labels, synthseg=synthseg),
        name="ft2-prewarm", daemon=True)
    handle = PrewarmHandle(thread)
    with profiler.stage("recon.prewarm_start"):
        thread.start()
    return handle


def geoms_from_metadata(metadata, bids_path: str) -> Dict[str, Volume]:
    """One geometry-only Volume per orientation of the FIRST in-vivo
    session in ``metadata`` (header reads only — a few hundred bytes per
    acquisition). Sessions of one protocol share geometry, so warming the
    first session's shapes covers the fleet run."""
    from .. import config as C
    from ..core import nifti
    from .bids import get_img_path

    geoms: Dict[str, Volume] = {}
    first = metadata.groupby(["prj", "sub", "ses"]).groups
    if not first:
        return geoms
    key = sorted(first)[0]
    md = metadata.loc[first[key]]
    for otype, o_md in md.groupby("ImageOrientationPatientSTR"):
        path = get_img_path(bids_path, o_md.iloc[0], C.IN_DIRNAME)
        try:
            geoms[str(otype)] = nifti.read_header(path)
        except (FileNotFoundError, ValueError) as exc:
            log.warning("prewarm: cannot read header %s (%s)", path, exc)
    return geoms
