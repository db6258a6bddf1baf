"""Stage 3 pipeline: voxel-wise T2 mapping over the BIDS derivative tree.

Host-side orchestration equivalent of the reference's ``process_t2maps``
(run_t2mapping.py:333-479): per (prj, sub, ses) load the recon + mask
(+ phantom label) volumes for the selected TEs, build an EchoStack, run the
device fit, then write maps, convergence figures and the phantom ROI CSV.

Multi-session runs are stage-pipelined (the PP analogue this workload
admits, SURVEY §2): while the device fits session *i*, a host thread
prefetches session *i+1*'s echo stack (native threaded zlib inflate), so
fleet runs hide host IO behind device compute. The reference runs stages
strictly sequentially (run_qmri_reconstruction.py:8-34).
"""

from __future__ import annotations

import logging
import os
import sys
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import numpy as np
import pandas as pd

from .. import config as C
from ..analysis.convergence import save_convergence_plots
from ..core import nifti
from ..core.stack import EchoStack
from ..models.t2map import fit_stack
from ..utils.bids import get_img_path, mk_bids_dir
from ..utils.maps_io import save_nifti_maps, save_phantom_csv
from ..utils.profiling import profiler

log = logging.getLogger("fetal_t2mapping_tpu.t2map")


def set_ada_path(bids_path: str, prj: str) -> str:
    return mk_bids_dir(bids_path, prj, "ada", "convergence_analysis")


def _enumerate_sessions(metadata: pd.DataFrame, bids_path: str,
                        tes: Sequence[int], phantom: bool) -> list:
    """Validation pass: one job dict per fit-able (prj, sub, ses).

    Applies the reference's skip semantics up front (TE completeness,
    run_t2mapping.py:388-390; derivatives present) so the prefetcher only
    ever loads sessions that will actually be fitted.
    """
    jobs = []
    for prj, prj_md in metadata.groupby("prj"):
        for (sub, ses), sub_md in prj_md.groupby(["sub", "ses"]):
            acq = None
            te_found, recon_paths, mask_paths = [], [], []
            for echotime, te_md in sub_md.groupby("EchoTime"):
                acq = te_md.iloc[0]
                te_found.append(round(echotime * 1000))
                recon_paths.append(get_img_path(bids_path, acq, C.RECON_DIRNAME))
                mask_paths.append(get_img_path(bids_path, acq, C.MASK_DIRNAME))
            if sorted(te_found) != sorted(list(tes)):
                log.warning("one or more selected TEs missing for %s_%s: %s vs %s; skipped",
                            sub, ses, te_found, list(tes))
                continue
            label_path = (get_img_path(bids_path, acq, C.PHANTOM_LABELS_DIRNAME)
                          if phantom else None)
            # label_path joins the check: a phantom session whose sphere
            # labels were never built must SKIP with the same warning, not
            # crash inside the prefetch thread at _load_session
            needed = recon_paths + mask_paths + ([label_path] if label_path
                                                 else [])
            missing = [p for p in needed if not nifti.exists(p)]
            if missing:
                log.warning("derivatives missing for %s_%s (run the recon stage "
                            "first): %s; skipped", sub, ses, missing[0])
                continue
            jobs.append({"prj": prj, "sub": sub, "ses": ses, "acq": acq,
                         "te_found": te_found, "recon_paths": recon_paths,
                         "mask_paths": mask_paths, "label_path": label_path})
    return jobs


def _load_session(job: dict):
    """Host IO for one session: parallel-inflate the whole echo stack."""
    n = len(job["recon_paths"])
    with profiler.stage("t2map.load", items=2 * n):
        loaded = nifti.read_batch(job["recon_paths"] + job["mask_paths"])
    label_vol = nifti.read(job["label_path"]) if job["label_path"] else None
    return loaded[:n], loaded[n:], label_vol


def process_t2maps(
    metadata: pd.DataFrame,
    bids_path: str,
    tes: Sequence[int],
    cfg: C.FitConfig,
    *,
    phantom: bool = False,
    low_field: bool = True,
    fast: bool = False,
    sim: str = "0",
    make_plots: bool = True,
    prefetch: bool = True,
    mesh=None,
) -> list:
    """Fit every (prj, sub, ses) in the metadata; returns per-session summaries.

    Args mirror the reference CLI semantics: ``phantom`` loads sphere labels
    and writes the ROI CSV; ``fast`` restricts the fit to labeled voxels
    (run_t2mapping.py:393-400); sessions missing any selected TE are skipped
    with a warning (:388-390). ``prefetch=False`` disables the load/fit
    overlap (e.g. on memory-tight hosts: it holds two echo stacks at once).
    ``mesh`` (a ``jax.sharding.Mesh``) shards every session's voxel fit over
    the mesh devices — the product surface for the reference's only real
    parallelism, the ``Pool(processes=20)`` voxel fan-out
    (run_t2mapping.py:442-443); maps are identical to the single-device run.
    """
    tes = list(tes)
    tes_in_seconds = [t / 1000.0 for t in tes]
    # EXACT-match TE selection is deliberate reference parity
    # (run_t2mapping.py:351 uses the same float isin): a scanner TE that
    # is not an integral millisecond never matches there either
    metadata = metadata[metadata["EchoTime"].isin(tes_in_seconds)]
    jobs = _enumerate_sessions(metadata, bids_path, tes, phantom)
    if not jobs:
        return []

    summaries = []
    ex = ThreadPoolExecutor(max_workers=1) if prefetch and len(jobs) > 1 else None
    try:
        pending = ex.submit(_load_session, jobs[0]) if ex else None
        for i, job in enumerate(jobs):
            recons, masks, label_vol = (pending.result() if pending
                                        else _load_session(job))
            if ex and i + 1 < len(jobs):
                pending = ex.submit(_load_session, jobs[i + 1])
            else:
                pending = None
            summaries.append(_fit_one(job, recons, masks, label_vol, bids_path,
                                      cfg, phantom=phantom, low_field=low_field,
                                      fast=fast, sim=sim, make_plots=make_plots,
                                      mesh=mesh))
    finally:
        # an exception from the fit loop is the PRIMARY failure: cleanup
        # errors below (plot render, flush) are logged, not raised, so
        # they never replace it on the way out
        unwinding = sys.exc_info()[0] is not None
        if ex:
            # if _fit_one raised for session i, the already-submitted
            # prefetch for i+1 is abandoned: consume it so shutdown doesn't
            # block on unneeded IO and its own exception isn't dropped
            if pending is not None and not pending.cancel():
                try:
                    pending.result()
                except Exception:
                    log.exception("abandoned prefetch load failed")
            ex.shutdown(wait=True)
        # queued async map writes and plot renders land before the API
        # returns (the filesystem-is-checkpoint contract at the boundary);
        # a plot-render failure must not skip the map-write flush
        try:
            _drain_plots()
        except Exception:
            if not unwinding:
                raise
            log.exception("plot render failed during error unwind")
        finally:
            try:
                nifti.flush_writes()
            except Exception:
                if not unwinding:
                    raise
                log.exception("write flush failed during error unwind")
    return summaries


_plot_pool = None
_plot_futures: list = []


def _plot_executor() -> ThreadPoolExecutor:
    global _plot_pool
    if _plot_pool is None:
        _plot_pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="ft2-plots")
    return _plot_pool


def _profiled_plots(*args):
    with profiler.stage("t2map.plots"):
        return save_convergence_plots(*args)


def _drain_plots() -> None:
    """Wait for EVERY queued convergence-figure render, then re-raise the
    first failure (raising on the first would abandon the rest queued)."""
    first_exc = None
    while _plot_futures:
        try:
            _plot_futures.pop().result()
        except Exception as exc:
            if first_exc is None:
                first_exc = exc
    if first_exc is not None:
        raise first_exc


def _fit_one(job: dict, recons, masks, label_vol, bids_path: str,
             cfg: C.FitConfig, *, phantom: bool, low_field: bool, fast: bool,
             sim: str, make_plots: bool, mesh=None) -> dict:
    prj, sub, ses, acq = job["prj"], job["sub"], job["ses"], job["acq"]
    te_found = job["te_found"]
    stack = EchoStack.from_volumes(recons, masks, te_found)
    if phantom and fast:
        # ROI-only fast mode: mask out everything unlabeled
        stack = EchoStack(
            signal=stack.signal,
            mask=stack.mask & (np.asarray(label_vol.data) > 0),
            tes=stack.tes,
            geometry=stack.geometry,
        )

    log.info("T2 mapping %s_%s_%s: grid %s, %d voxels, TEs %s, model %s",
             prj, sub, ses, stack.grid_shape, int(stack.mask.sum()),
             te_found, cfg.model)
    with profiler.stage("t2map.fit", items=int(stack.mask.sum())):
        out = fit_stack(stack, cfg, mesh=mesh)
    log.info("fit done in %.3f s (%.0f voxels/s)", out.fit_seconds,
             out.n_voxels / max(out.fit_seconds, 1e-9))

    with profiler.stage("t2map.save"):
        map_paths = save_nifti_maps(out, bids_path, acq, C.T2MAP_DIRNAME, sim, cfg.model)

    if make_plots:
        # figure rendering is pure host work on already-downloaded arrays
        # (thread-safe OO matplotlib): queue it on a worker so it overlaps
        # the next session's load/fit; process_t2maps drains the queue
        ada_path = set_ada_path(bids_path, prj)
        m = stack.mask
        _plot_futures.append(_plot_executor().submit(
            _profiled_plots, ada_path, out.traces, out.trace_t2,
            out.n_iter.data[m], out.fun.data[m], out.t2.data[m],
            sub, ses, sim, cfg.model))

    csv_path = None
    if phantom:
        gt, ids = C.phantom_gt(low_field)
        csv_path = save_phantom_csv(out, label_vol, ids, gt, bids_path, acq,
                                    C.T2MAP_DIRNAME, sim, cfg.model)

    return {
        "prj": prj, "sub": sub, "ses": ses,
        "n_voxels": out.n_voxels,
        "fit_seconds": out.fit_seconds,
        "converged_frac": float(out.converged.data[stack.mask].mean()),
        "maps": map_paths, "roi_csv": csv_path,
    }
