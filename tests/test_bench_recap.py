"""The bench recap line must evidence every row AND survive the driver's
tail capture: BENCH_r04.json proved the driver keeps exactly the LAST
2000 characters of stdout, so recap + headline together must fit or the
recap gets front-truncated into unparseable JSON (VERDICT r4 weak #1 /
task 1)."""

import io
import json
import sys

import numpy as np

import bench


def _fake_rows():
    """A full driver run's row set (metric names + field shapes from a
    real round-4/5 run), including the fat nested fields the recap must
    strip."""
    stages = {f"recon.stage{i}": round(1.234 + i, 3) for i in range(18)}
    rows = [
        {"metric": "mosaic_interpret_parity_max_rel_diff", "value": 0.00706,
         "vs_baseline": None},
        {"metric": "registration_rigid_192_batch4_seconds", "value": 1.219,
         "vs_baseline": None},
        {"metric": "registration_rigid_64_batch8_seconds", "value": 0.723,
         "vs_baseline": None},
        {"metric": "pipeline_e2e_marginal_seconds", "value": 1.8,
         "vs_baseline": 83.3},
        {"metric": "t2fit_gaussian_rician_voxels_per_sec", "value": 125514736.2,
         "vs_baseline": 1122.1, "max_rel_t2_err_vs_curvefit": 0.0421,
         "median_rel_t2_err_vs_truth": 0.0094, "converged": 1.0,
         "unconverged_identifiable_frac": 0.0, "n_overflow": 0,
         "oracle_gap_max": 0.00145, "oracle_gap_p99": 0.0005,
         "oracle_gap_p50": 1e-6},
        {"metric": "t2fit_rician_voxels_per_sec", "value": 101688085.0,
         "vs_baseline": 909.1, "converged": 0.9999, "n_overflow": 0,
         "unconverged_identifiable_frac": 0.0, "oracle_gap_max": 0.01,
         "oracle_gap_p99": 0.004, "oracle_gap_p50": 2e-6},
        {"metric": "t2fit_gaussian_6te_voxels_per_sec", "value": 269201034.7,
         "vs_baseline": 2406.8, "max_rel_t2_err_vs_curvefit": 0.000272,
         "converged": 1.0, "n_overflow": 0,
         "unconverged_identifiable_frac": 0.0},
        {"metric": "exp_unit_utilization", "value": 0.0242, "vs_baseline": None},
        {"metric": "kernel_marginal_ps_per_voxel_iteration", "value": 67.8,
         "fit_r2": 0.9978, "vs_baseline": None},
        {"metric": "kernel_utilization_vs_op_model", "value": 0.323,
         "vs_baseline": None},
        {"metric": "registration_seconds", "value": 0.27, "vs_baseline": 244.0,
         "rot_err_rad": 0.004, "trans_err_mm": 0.21},
        {"metric": "unet_inference_voxels_per_sec", "value": 60900000.0,
         "vs_baseline": None},
        {"metric": "volume_serving_seconds", "value": 0.042,
         "vs_baseline": 3571.0, "fit_converged": 1.0},
        {"metric": "volume_serving_gaussian_rician_seconds", "value": 0.161,
         "vs_baseline": 931.0, "fit_converged": 1.0, "n_overflow": 0,
         "oracle_gap_max": 0.0015, "compact_layout": 1},
        {"metric": "pipeline_e2e_seconds", "value": 16.6, "vs_baseline": 9.04,
         "marginal_session_seconds": 2.6, "fit_converged": 1.0,
         "stages_s": stages},
        {"metric": "pipeline_e2e_fullsize_seconds", "value": 281.2,
         "vs_baseline": 0.53, "fit_stage_seconds": 9.41,
         "fit_stage_vs_anchor": 15.9, "tunnel_io_thread_seconds": 391.0,
         "flush_wait_seconds": 55.0, "n_masked_voxels": 2988067,
         "mask_frac": 0.216, "median_t2_map_rel_err": 0.0033,
         "fit_converged": 1.0, "stages_s": stages},
        {"metric": "pipeline_e2e_fullsize_marginal_seconds", "value": 141.0,
         "vs_baseline": 1.06, "fit_stage_seconds": 3.1,
         "fit_stage_vs_anchor": 48.4, "tunnel_io_thread_seconds": 290.0,
         "flush_wait_seconds": 31.0, "n_masked_voxels": 2988067,
         "mask_frac": 0.216, "median_t2_map_rel_err": 0.0034,
         "fit_converged": 1.0, "stages_s": stages},
        {"metric": "t2fit_voxels_per_sec", "value": 403634625.6,
         "vs_baseline": 3609.0, "max_rel_t2_err_vs_curvefit": 0.00036,
         "converged": 1.0, "unconverged_identifiable_frac": 0.0,
         "n_overflow": 0},
    ]
    return rows


HEADLINE_BUDGET = 350  # a real headline row measures 251 chars


def test_recap_fits_driver_tail(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_ROWS", list(_fake_rows()))
    monkeypatch.setattr(bench, "_SHED", ["unet", "registration_mi"])
    bench.emit_recap()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert len(out[0]) + HEADLINE_BUDGET <= 2000, len(out[0])
    rec = json.loads(out[0])
    assert rec["metric"] == "bench_recap"
    assert rec["gates_passed"] is True
    assert rec["shed_rows"] == ["unet", "registration_mi"]
    metrics = {r["metric"] for r in _fake_rows()}
    assert set(rec["rows"]) == metrics
    # every row must evidence at least its value; nested dicts must be gone
    for name, row in rec["rows"].items():
        payload = row if isinstance(row, dict) else {"v": row}
        assert not any(isinstance(v, (dict, list)) for v in payload.values())


def test_recap_rich_tier_carries_gate_scalars(monkeypatch, capsys):
    rows = [r for r in _fake_rows()
            if r["metric"] == "t2fit_gaussian_rician_voxels_per_sec"]
    monkeypatch.setattr(bench, "_ROWS", list(rows))
    monkeypatch.setattr(bench, "_SHED", [])
    bench.emit_recap()
    rec = json.loads(capsys.readouterr().out.strip())
    gr = rec["rows"]["t2fit_gaussian_rician_voxels_per_sec"]
    assert gr["v"] == 125510000.0  # 5 significant digits
    assert gr["c"] == 1.0          # converged
    assert gr["o"] == 0            # n_overflow
    assert gr["g"] == 0.00145      # oracle gap max
