"""CLI: qMRI reconstruction / derivative generation
(reference run_qmri_reconstruction.py:94-141)."""

from __future__ import annotations

import argparse
import logging
import os
import sys

from .. import config as C
from ..labels.synthseg import SynthSegRunner
from ..pipeline.recon_pipeline import process_qmri
from ..utils.metadata import set_metadata


def parse_arguments(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native qMRI Reconstruction",
        formatter_class=argparse.RawTextHelpFormatter)
    parser.add_argument("--path", type=str, required=True,
                        help="Path to general directory ../qMRI/")
    parser.add_argument("--csv", type=str, nargs="+", required=True,
                        help="Metadata CSV log file name(s) or project name (prj-00X)")
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--in_vivo", action="store_true")
    group.add_argument("--in_vitro", action="store_true")
    group2 = parser.add_mutually_exclusive_group(required=True)
    group2.add_argument("--lf", action="store_true", help="0.55 T data")
    group2.add_argument("--hf", action="store_true", help="1.5 T data")
    parser.add_argument("--seeds", type=str, default=C.DEFAULT_PHANTOM_SEEDS_KEY,
                        choices=sorted(C.PHANTOM_SEEDS),
                        help="Phantom seed set (in-vitro only)")
    parser.add_argument("--synthseg", type=str, default="subprocess",
                        choices=["subprocess", "jax", "fake"],
                        help="Segmentation backend ('jax' runs the converted "
                             "weights on device; 'fake' needs no FreeSurfer)")
    parser.add_argument("--masked_metric", action="store_true",
                        help="Restrict registration metrics to an automatic "
                             "fixed-image signal mask (threshold+fill+"
                             "dilate+erode per slice, excluding air/no-"
                             "signal regions) — the reference's "
                             "SetMetricFixedMask design (registration_itk); "
                             "pass an explicit fixed_mask through the API "
                             "to isolate a structure instead")
    parser.add_argument("--prewarm", action="store_true",
                        help="Overlap one-time device program loads with "
                             "the stage's host/IO phases: a background "
                             "thread first-executes the big programs on "
                             "synthetic data of this run's acquisition "
                             "shapes (in-vivo; results unchanged)")
    parser.add_argument("--mesh", type=int, default=None, metavar="N",
                        help="Shard device work over the first N devices: "
                             "registration metric samples and jax-mode "
                             "SynthSeg inference (jax.sharding mesh)")
    return parser.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    args = parse_arguments(argv)
    if not os.path.exists(args.path):
        print(f"Error: path does not exist: {args.path}", file=sys.stderr)
        return 1
    bids_path = os.path.join(args.path, "projects/")
    csv_path = os.path.join(args.path, "dicom/logs/")
    metadata = set_metadata(csv_path, args.csv, args.lf)
    from ..parallel.mesh import mesh_from_flag

    try:
        mesh = mesh_from_flag(args.mesh)
    except ValueError as exc:
        print(f"Error: {exc}", file=sys.stderr)
        return 1
    process_qmri(
        bids_path, metadata,
        in_vivo=args.in_vivo,
        low_field=args.lf,
        synthseg=SynthSegRunner(mode=args.synthseg),
        seeds_key=args.seeds,
        registration_kwargs=(dict(fixed_mask="auto")
                             if args.masked_metric else None),
        mesh=mesh,
        prewarm=args.prewarm,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
