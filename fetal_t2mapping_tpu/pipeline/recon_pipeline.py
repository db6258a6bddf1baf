"""Stage 2 pipeline: derivative generation (resample/fuse/segment/label).

Host-side orchestration equivalent of the reference's ``process_qmri``
(run_qmri_reconstruction.py:5-92). Every step writes NIfTIs into the
derivative tree and skips work whose outputs already exist (the filesystem
is the checkpoint; all stages are idempotent/resumable).

In-vivo sequence: resample->fuse(+denoise)->[hf-to-lf reg]->synthseg->mask->
bet->feta->atlas labels. In-vitro: phantom sphere labels from seeds.
"""

from __future__ import annotations

import functools
import logging
import os
import re
from typing import Dict, Optional, Sequence

import numpy as np
import pandas as pd

from .. import config as C
from ..core import nifti
from ..labels.feta import synthseg_to_feta
from ..labels.masks import extract_brain, mask_from_labels
from ..labels.phantom import phantom_labels_from_seeds
from ..labels.synthseg import SynthSegRunner
from ..recon.denoise import denoise_volume
from ..recon.fuse import fuse_orientations
from ..recon.registration import (register_affine, register_rigid,
                                  register_rigid_multi)
from ..recon.resample import resample_to_reference, resample_volume
from ..utils.bids import get_img_path, mk_bids_dir
from ..utils.profiling import profiler

log = logging.getLogger("fetal_t2mapping_tpu.recon")


def _flushes_writes(fn):
    """Stage functions queue NIfTI writes on the async writer pool; each
    public stage drains the queue on exit so the filesystem-is-checkpoint
    contract holds at every API boundary (a caller may list/read the
    derivative tree right after the call returns)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        finally:
            nifti.flush_writes()
    return wrapper


@_flushes_writes
def run_resample_volumes(metadata: pd.DataFrame, bids_path: str,
                         high_res: float = 1.0, overwrite: bool = False) -> None:
    """Step 2: per-acquisition isotropic resample (reference :35-59)."""
    log.info("===== Resampling to %.2f mm =====", high_res)
    for _, acq in metadata.iterrows():
        out_path = get_img_path(bids_path, acq, C.RESAMP_DIRNAME)
        if nifti.exists(out_path) and not overwrite:
            continue
        vol = nifti.read(get_img_path(bids_path, acq, C.IN_DIRNAME))
        hi = resample_volume(vol, [high_res] * 3, device=True)
        # preserve an integer input's pixel type on disk, exactly like the
        # reference's sitk.Resample(..., volume.GetPixelID()) (reference
        # utils/qmri_utils.py:78-80, whose resampled intermediates are the
        # converter's int16/uint16) — and an integer-typed intermediate
        # costs HALF the device->host transfer of a float32 one. The cast
        # rounds+clamps on device (see nifti._cast_for_disk); float inputs
        # stay float32.
        in_dt = np.dtype(vol.data.dtype)
        nifti.write_async(out_path, hi,
                          dtype=in_dt if in_dt.kind in "iu" else np.float32)
        log.info("resampled %s -> %s", acq["run"], out_path)


@_flushes_writes
def run_reconstruct_volumes(metadata: pd.DataFrame, bids_path: str, *,
                            denoise: bool = True, fixed_type: str = "ax",
                            overwrite: bool = False,
                            registration_kwargs: Optional[dict] = None) -> None:
    """Step 3: per-TE 3-orientation fusion + echo-to-echo registration
    + TV denoising (reference :359-391)."""
    for (prj, sub, ses), ss_md in metadata.groupby(["prj", "sub", "ses"]):
        first_recon = None
        later_echoes = []               # fused recons awaiting echo->first reg
        for echotime, te_md in ss_md.groupby("EchoTime"):
            acq = te_md.iloc[0]
            out_path = get_img_path(bids_path, acq, C.RECON_DIRNAME)
            # checkpoint test BEFORE loading: a resumed run must not inflate
            # three HR volumes per TE just to skip them
            if nifti.exists(out_path) and not overwrite:
                if first_recon is None:
                    first_recon = nifti.read(out_path)
                continue
            paths = {a["ImageOrientationPatientSTR"]:
                     get_img_path(bids_path, a, C.RESAMP_DIRNAME)
                     for _, a in te_md.iterrows()}
            if len(paths) != 3:
                log.warning("TE %.0f ms of %s_%s has orientations %s; skipped",
                            echotime * 1000, sub, ses, sorted(paths))
                continue
            otypes = list(paths)
            with profiler.stage("fuse.read"):
                imgs: Dict[str, nifti.Volume] = dict(
                    zip(otypes, nifti.read_batch([paths[o] for o in otypes])))
            log.info("===== Fusion TE %3d ms (%s_%s) =====", int(echotime * 1000), sub, ses)
            with profiler.stage("fuse.fuse"):
                recon = fuse_orientations(imgs, fixed_type,
                                          registration_kwargs=registration_kwargs)
            if first_recon is None:
                first_recon = recon
                if denoise:
                    with profiler.stage("fuse.denoise"):
                        recon = denoise_volume(recon)
                with profiler.stage("fuse.write"):
                    nifti.write_async(out_path, recon, dtype=np.float32)
                log.info("recon saved: %s", out_path)
            else:
                later_echoes.append((out_path, recon))
        if not later_echoes:
            continue
        # register ALL later echoes onto the first TE's recon (:378-383) in
        # one jitted multi-pair program — the echoes share the fixed image,
        # so the solves batch instead of running sequentially
        with profiler.stage("fuse.reg_echo"):
            regs = register_rigid_multi(first_recon,
                                        [r for _, r in later_echoes],
                                        **(registration_kwargs or {}))
        for (out_path, recon), reg in zip(later_echoes, regs):
            recon = resample_to_reference(recon, first_recon,
                                          transform=reg.matrix_device,
                                          device=True)
            if denoise:
                with profiler.stage("fuse.denoise"):
                    recon = denoise_volume(recon)
            with profiler.stage("fuse.write"):
                nifti.write_async(out_path, recon, dtype=np.float32)
            log.info("recon saved: %s", out_path)


@_flushes_writes
def run_biasfield_correction(metadata: pd.DataFrame, bids_path: str, *,
                             shared: bool = False, overwrite: bool = False,
                             **n4_kwargs) -> None:
    """Optional N4 bias correction of the resampled volumes (reference
    utils/qmri_utils.py:254-357). ``shared=False`` corrects each acquisition
    independently; ``shared=True`` pools the log-bias across echo times per
    (sub, ses, orientation) — the coil bias is TE-independent."""
    from ..recon.biasfield import n4_bias_correction, shared_log_bias

    if not shared:
        for _, acq in metadata.iterrows():
            out_path = get_img_path(bids_path, acq, C.N4_DIRNAME)
            if nifti.exists(out_path) and not overwrite:
                continue
            vol = nifti.read(get_img_path(bids_path, acq, C.RESAMP_DIRNAME))
            res = n4_bias_correction(vol, **n4_kwargs)
            nifti.write_async(out_path, res.corrected, dtype=np.float32)
            log.info("n4: %s", out_path)
        return
    group_keys = ["prj", "sub", "ses", "ImageOrientationPatientSTR"]
    for _, md in metadata.groupby(group_keys):
        acqs = list(md.iterrows())
        out_paths = [get_img_path(bids_path, a, C.N4_DIRNAME) for _, a in acqs]
        if all(nifti.exists(p) for p in out_paths) and not overwrite:
            continue
        vols = [nifti.read(get_img_path(bids_path, a, C.RESAMP_DIRNAME))
                for _, a in acqs]
        corrected, _ = shared_log_bias(vols, **n4_kwargs)
        for out_path, vol in zip(out_paths, corrected):
            nifti.write_async(out_path, vol, dtype=np.float32)
            log.info("n4 (shared): %s", out_path)


@_flushes_writes
def register_high_to_low_field(metadata: pd.DataFrame, bids_path: str,
                               registration_kwargs: Optional[dict] = None) -> None:
    """Step 3bis: register 1.5 T recons to the 0.55 T ses-01 te-114 recon
    (reference :1039-1051), with its per-subject exclusions."""
    warm: Dict[tuple, np.ndarray] = {}
    for (prj, sub, ses, echotime), sub_md in metadata.groupby(["prj", "sub", "ses", "EchoTime"]):
        for _, acq in sub_md.iterrows():
            # metadata stores EchoTime in seconds; the exclusion list is in ms
            if round(echotime * 1000) == 299 and sub in ("sub-003", "sub-004"):
                continue
            moving_path = get_img_path(bids_path, acq, C.RECON_DIRNAME)
            fixed_path = re.sub(r"ses-\d{2}", "ses-01", moving_path)
            fixed_path = re.sub(r"te-\d+", "te-114", fixed_path)
            if not nifti.exists(moving_path) or not nifti.exists(fixed_path):
                continue
            fixed = nifti.read(fixed_path)
            moving = nifti.read(moving_path)
            # successive echoes of one (prj, sub, ses) share the motion:
            # warm-start from the previous echo's solved parameters
            reg = register_rigid(fixed, moving,
                                 init_params=warm.get((prj, sub, ses)),
                                 **(registration_kwargs or {}))
            # device params/matrix: the whole per-session echo chain
            # (solve -> warm-start next solve -> warp -> async write)
            # stays on device with zero host syncs
            warm[(prj, sub, ses)] = reg.params_device
            out = resample_to_reference(moving, fixed,
                                        transform=reg.matrix_device,
                                        device=True)
            nifti.write_async(moving_path, out, dtype=np.float32)
            log.info("hf->lf registered: %s", moving_path)


def run_segmentation(metadata: pd.DataFrame, bids_path: str,
                     runner: Optional[SynthSegRunner] = None) -> None:
    """Step 4: SynthSeg labels per (prj, sub, ses) recon dir (reference :424-466)."""
    runner = runner or SynthSegRunner()
    for (prj, sub, ses), _ in metadata.groupby(["prj", "sub", "ses"]):
        input_dir = os.path.join(bids_path, prj, "derivatives", C.RECON_DIRNAME, sub, ses, "anat")
        output_dir = mk_bids_dir(bids_path, prj, "derivatives", C.SYNTHSEG_DIRNAME, sub, ses, "anat")
        runner.run(input_dir, output_dir)


def _derivative_files(bids_path, prj, sub, ses, dirname):
    # pending-aware listing, not glob: under nifti.deferred_flushes the
    # producing stage's writes may still be queued; a plain glob would
    # silently see an empty directory and skip the whole derivative step
    d = os.path.join(bids_path, prj, "derivatives", dirname, sub, ses, "anat")
    return nifti.list_volumes(d)


@_flushes_writes
def run_masks_and_bet(metadata: pd.DataFrame, bids_path: str,
                      overwrite: bool = False) -> None:
    """Steps 5 + 5bis: masks from labels; brain extraction (reference :935-974)."""
    for (prj, sub, ses), _ in metadata.groupby(["prj", "sub", "ses"]):
        mask_dir = mk_bids_dir(bids_path, prj, "derivatives", C.MASK_DIRNAME, sub, ses, "anat")
        bet_dir = mk_bids_dir(bids_path, prj, "derivatives", C.BET_DIRNAME, sub, ses, "anat")
        for lbl_path in _derivative_files(bids_path, prj, sub, ses, C.SYNTHSEG_DIRNAME):
            out = os.path.join(
                mask_dir, os.path.basename(lbl_path).replace("synthseg", "mask"))
            if nifti.exists(out) and not overwrite:
                continue
            mask = mask_from_labels(nifti.read(lbl_path))
            nifti.write_async(out, mask, dtype=np.uint8)
        # derive each mask path from the recon filename (never pair two
        # independently sorted globs: a count/naming mismatch would silently
        # BET the wrong mask onto a recon)
        for recon_path in _derivative_files(bids_path, prj, sub, ses, C.RECON_DIRNAME):
            base = os.path.basename(recon_path)
            mask_path = os.path.join(
                bids_path, prj, "derivatives", C.MASK_DIRNAME, sub, ses, "anat",
                base.replace(C.RECON_DIRNAME + ".nii", C.MASK_DIRNAME + ".nii"))
            if not nifti.exists(mask_path):
                raise FileNotFoundError(
                    f"no mask for recon {recon_path!r} (expected {mask_path!r}; "
                    "did the SynthSeg/mask step run?)")
            out = os.path.join(
                bet_dir, base.replace(C.RECON_DIRNAME + ".nii", C.BET_DIRNAME + ".nii"))
            if nifti.exists(out) and not overwrite:
                continue
            bet = extract_brain(nifti.read(recon_path), nifti.read(mask_path))
            nifti.write_async(out, bet, dtype=np.float32)


@_flushes_writes
def run_feta_labels(metadata: pd.DataFrame, bids_path: str,
                    overwrite: bool = False) -> None:
    """Step 6: SynthSeg -> FeTA remap (reference :976-1009)."""
    for (prj, sub, ses), _ in metadata.groupby(["prj", "sub", "ses"]):
        out_dir = mk_bids_dir(bids_path, prj, "derivatives", C.FETA_DIRNAME, sub, ses, "anat")
        for lbl_path in _derivative_files(bids_path, prj, sub, ses, C.SYNTHSEG_DIRNAME):
            out = os.path.join(
                out_dir, os.path.basename(lbl_path).replace("synthseg", "feta"))
            if nifti.exists(out) and not overwrite:
                continue
            feta = synthseg_to_feta(nifti.read(lbl_path))
            nifti.write_async(out, feta, dtype=np.int16)


@_flushes_writes
def run_atlas_labels(metadata: pd.DataFrame, bids_path: str, *,
                     mni_template: Optional[str] = None,
                     jhu_atlas: Optional[str] = None,
                     ho_atlas: Optional[str] = None,
                     low_field: bool = True) -> None:
    """Step 7: affine MNI152->subject registration + JHU/HO atlas warps.

    TPU-native replacement of the three FLIRT subprocesses (reference
    :1011-1037): one affine registration of the template to the subject's
    BET volume, then nearest-neighbour warps of both atlases with the same
    transform. Template/atlas paths default to $FSLDIR locations.
    """
    fsl = os.environ.get("FSLDIR", "/usr/local/fsl")
    mni_template = mni_template or os.path.join(fsl, "data/standard/MNI152_T1_1mm_brain.nii.gz")
    jhu_atlas = jhu_atlas or os.path.join(fsl, "data/atlases/JHU/JHU-ICBM-labels-1mm.nii.gz")
    ho_atlas = ho_atlas or os.path.join(
        fsl, "data/atlases/HarvardOxford/HarvardOxford-cort-maxprob-thr50-1mm.nii.gz")
    for p in (mni_template, jhu_atlas, ho_atlas):
        if not nifti.exists(p):
            log.warning("atlas input missing: %s — skipping atlas labels", p)
            return
    te_tag = "te-114" if low_field else "te-115"

    mni = nifti.read(mni_template)
    jhu = nifti.read(jhu_atlas)
    ho = nifti.read(ho_atlas)

    for (prj, sub, ses), _ in metadata.groupby(["prj", "sub", "ses"]):
        bet_path = os.path.join(bids_path, prj, "derivatives", C.BET_DIRNAME, sub, ses,
                                "anat", f"{sub}_{ses}_{te_tag}_{C.BET_DIRNAME}.nii.gz")
        if not nifti.exists(bet_path):
            log.warning("BET reference missing: %s", bet_path)
            continue
        bet = nifti.read(bet_path)
        # cross-contrast pair (MNI T1 template -> subject T2): correlation
        # ratio, FLIRT's default cost for this exact step (reference
        # utils/qmri_utils.py:1027-1037); NCC assumes a linear intensity
        # relationship T1/T2 do not have
        reg = register_affine(bet, mni, metric="cr")
        mni_dir = mk_bids_dir(bids_path, prj, "derivatives", C.MNI_DIRNAME, sub, ses, "anat")
        jhu_dir = mk_bids_dir(bids_path, prj, "derivatives", C.JHU_DIRNAME, sub, ses, "anat")
        ho_dir = mk_bids_dir(bids_path, prj, "derivatives", C.HO_DIRNAME, sub, ses, "anat")
        warped = resample_to_reference(mni, bet, transform=reg.matrix)
        nifti.write_async(os.path.join(mni_dir, f"{sub}_{ses}_{C.MNI_DIRNAME}.nii.gz"),
                    warped, dtype=np.float32)
        np.savetxt(os.path.join(mni_dir, f"{sub}_{ses}_{C.MNI_DIRNAME}_omat.mat"), reg.matrix)
        for atlas, out_dir, name in ((jhu, jhu_dir, C.JHU_DIRNAME), (ho, ho_dir, C.HO_DIRNAME)):
            labels = resample_to_reference(atlas, bet, transform=reg.matrix, method="nearest")
            nifti.write_async(os.path.join(out_dir, f"{sub}_{ses}_{name}.nii.gz"), labels, dtype=np.int16)


@_flushes_writes
def downsample_labels(metadata: pd.DataFrame, bids_path: str,
                      high_dirname: str, low_dirname: str) -> None:
    """Nearest-neighbour resample of HR label maps back to acquisition grids
    (reference utils/qmri_utils.py:504-530)."""
    for (prj, sub, ses), md in metadata.groupby(["prj", "sub", "ses"]):
        for _, acq in md.iterrows():
            high = nifti.read(get_img_path(bids_path, acq, high_dirname))
            ref = nifti.read(get_img_path(bids_path, acq, C.IN_DIRNAME))
            if high.shape == ref.shape and high.same_geometry(ref):
                low = high
            else:
                low = resample_to_reference(high, ref, method="nearest")
            nifti.write_async(get_img_path(bids_path, acq, low_dirname), low, dtype=np.int16)


@_flushes_writes
def downsample_masks(metadata: pd.DataFrame, bids_path: str,
                     high_dirname: str, low_dirname: str) -> None:
    """Mask downsampling with dilate+close+open regularization
    (reference utils/qmri_utils.py:568-589)."""
    from ..ops.morphology import binary_closing, binary_dilate, binary_opening

    for (prj, sub, ses), md in metadata.groupby(["prj", "sub", "ses"]):
        for _, acq in md.iterrows():
            high = nifti.read(get_img_path(bids_path, acq, high_dirname))
            ref = nifti.read(get_img_path(bids_path, acq, C.IN_DIRNAME))
            low = resample_to_reference(high, ref, method="nearest")
            m = np.asarray(low.data) > 0
            m = np.asarray(binary_dilate(m, 2))
            m = np.asarray(binary_closing(m, 1))
            m = np.asarray(binary_opening(m, 1))
            out_path = get_img_path(bids_path, acq, low_dirname).replace("masks.nii", "mask.nii")
            nifti.write_async(out_path, low.with_data(m.astype(np.uint8)), dtype=np.uint8)


@_flushes_writes
def build_phantom_masks(metadata: pd.DataFrame, bids_path: str, *,
                        threshold: float = 100.0) -> None:
    """In-vitro: foreground masks from the recon volumes (reference
    utils/qmri_utils.py:591-623 — threshold + fill holes + closing + dilate).
    The t2map stage loads MASK_DIRNAME unconditionally, so the in-vitro
    branch must produce it too."""
    from ..labels.masks import phantom_mask

    for (prj, sub, ses), _ in metadata.groupby(["prj", "sub", "ses"]):
        input_dir = os.path.join(bids_path, prj, "derivatives", C.RECON_DIRNAME, sub, ses, "anat")
        out_dir = mk_bids_dir(bids_path, prj, "derivatives", C.MASK_DIRNAME, sub, ses, "anat")
        for img_path in nifti.list_volumes(input_dir):
            out_path = os.path.join(out_dir, os.path.basename(img_path).replace(
                C.RECON_DIRNAME, C.MASK_DIRNAME))
            if nifti.exists(out_path):
                continue
            mask = phantom_mask(nifti.read(img_path), threshold=threshold)
            nifti.write_async(out_path, mask, dtype=np.uint8)
            log.info("phantom mask: %s", out_path)


@_flushes_writes
def build_phantom_labels(metadata: pd.DataFrame, bids_path: str,
                         seeds: Sequence[Sequence[int]], radius: int = 6) -> None:
    """In-vitro: sphere labels from seed voxels (reference :868-933)."""
    for (prj, sub, ses), _ in metadata.groupby(["prj", "sub", "ses"]):
        input_dir = os.path.join(bids_path, prj, "derivatives", C.RECON_DIRNAME, sub, ses, "anat")
        out_dir = mk_bids_dir(bids_path, prj, "derivatives", C.PHANTOM_LABELS_DIRNAME, sub, ses, "anat")
        for img_path in nifti.list_volumes(input_dir):
            out_path = os.path.join(out_dir, os.path.basename(img_path).replace(
                C.RECON_DIRNAME, C.PHANTOM_LABELS_DIRNAME))
            if nifti.exists(out_path):
                continue
            geom = nifti.read(img_path)
            labels = phantom_labels_from_seeds(geom, seeds, radius=radius)
            nifti.write_async(out_path, labels, dtype=np.uint8)
            log.info("phantom labels: %s", out_path)


def process_qmri(bids_path: str, metadata: pd.DataFrame, *, in_vivo: bool,
                 low_field: bool, synthseg: Optional[SynthSegRunner] = None,
                 seeds_key: str = C.DEFAULT_PHANTOM_SEEDS_KEY,
                 registration_kwargs: Optional[dict] = None,
                 mesh=None, prewarm: bool = False) -> None:
    """Full stage-2 pipeline (reference run_qmri_reconstruction.py:5-92).

    ``mesh`` (a ``jax.sharding.Mesh``) spreads the stage's device work over
    the mesh: every rigid/affine registration solve shards its metric-sample
    axis (recon.registration ``mesh=``), and jax-mode SynthSeg inference
    shards the U-Net's z axis (labels.unet3d ``mesh=``). Results are
    identical to the single-device run.

    ``prewarm=True`` (in-vivo) starts a background thread that first-
    executes the big device programs on synthetic data of this metadata's
    acquisition shapes (header reads only), overlapping their one-time
    remote loads with the stage's host/IO-bound phases — see
    :mod:`..utils.prewarm`. Results are unaffected; it only moves
    cold-start cost off the critical path."""
    from ..utils.profiling import profiler

    if mesh is not None:
        registration_kwargs = dict(registration_kwargs or {})
        registration_kwargs.setdefault("mesh", mesh)
        if synthseg is not None and getattr(synthseg, "mesh", None) is None:
            import dataclasses as _dc

            synthseg = _dc.replace(synthseg, mesh=mesh)
    if prewarm and in_vivo:
        from ..utils.prewarm import geoms_from_metadata, start_recon_prewarm

        geoms = geoms_from_metadata(metadata, bids_path)
        # "ax" is the fusion's fixed orientation (run_reconstruct_volumes
        # fixed_type); a session whose stacks classified differently
        # (e.g. a tilted axial read as 'custom') must SKIP the prewarm,
        # not abort the pipeline — prewarm failures only cost the overlap
        if len(geoms) == 3 and "ax" in geoms:
            try:
                start_recon_prewarm(
                    geoms, n_echoes=int(metadata["EchoTime"].nunique()),
                    registration_kwargs=registration_kwargs,
                    synthseg=synthseg)
            except Exception:
                log.warning("prewarm skipped (setup failed)", exc_info=True)
        else:
            log.warning("prewarm skipped: found orientations %s",
                        sorted(geoms))
    # one flush barrier for the whole pipeline: the per-stage flush-on-exit
    # barriers become no-ops (nifti.deferred_flushes), so checkpoint
    # downloads/encodes drain on the writer pool WHILE later stages compute
    # instead of serializing each stage's end on the device link; stage-to-
    # stage reads are served from the volume cache either way
    with nifti.deferred_flushes():
        try:
            _process_qmri_stages(
                bids_path, metadata, in_vivo=in_vivo, low_field=low_field,
                synthseg=synthseg, seeds_key=seeds_key,
                registration_kwargs=registration_kwargs, profiler=profiler)
        finally:
            # every queued checkpoint write lands before the stage returns:
            # the filesystem-is-checkpoint contract holds at the API boundary
            with profiler.stage("recon.flush_writes"):
                nifti.flush_writes(force=True)


def _process_qmri_stages(bids_path, metadata, *, in_vivo, low_field,
                         synthseg, seeds_key, registration_kwargs, profiler):
    if in_vivo:
        with profiler.stage("recon.resample"):
            run_resample_volumes(metadata, bids_path, 1.0)
        with profiler.stage("recon.fuse"):
            run_reconstruct_volumes(metadata, bids_path, denoise=True, fixed_type="ax",
                                    registration_kwargs=registration_kwargs)
        if not low_field:
            with profiler.stage("recon.hf_to_lf"):
                register_high_to_low_field(metadata, bids_path,
                                           registration_kwargs=registration_kwargs)
        with profiler.stage("recon.synthseg"):
            run_segmentation(metadata, bids_path, synthseg)
        with profiler.stage("recon.masks_bet"):
            run_masks_and_bet(metadata, bids_path)
        with profiler.stage("recon.feta"):
            run_feta_labels(metadata, bids_path)
        with profiler.stage("recon.atlas"):
            run_atlas_labels(metadata, bids_path, low_field=low_field)
    else:
        with profiler.stage("recon.phantom_masks"):
            build_phantom_masks(metadata, bids_path)
        with profiler.stage("recon.phantom_labels"):
            build_phantom_labels(metadata, bids_path, C.PHANTOM_SEEDS[seeds_key])
