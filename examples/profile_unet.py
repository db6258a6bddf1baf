"""Per-op attribution of the U-Net 160^3 forward pass (VERDICT r3 #8).

Captures a jax.profiler trace of the jitted segmentation forward, parses
the TPU device plane's "XLA Ops" line from the xplane proto, and
aggregates self-time by HLO category (the metadata carries hlo_category,
flops, bytes_accessed and the emitting source line), so the 'where does
the forward's time go' question is answered with device counters rather
than ablation guesses. The decision this feeds: only build a hand-fused
Pallas conv kernel if conv FLOP time is >= half the forward (reference
budget context: the SynthSeg subprocess this replaces,
/root/reference/utils/qmri_utils.py:424-466).

Usage:  python examples/profile_unet.py [n=160] [reps=20] [impl=dense]
``impl``: 'dense' (z-decomposed 3^3 convs, the default program), 's2d'
(space-to-depth level 0 via XLA convs), or 'pallas' (S2D level 0 with the
fused Pallas conv kernel, labels/pallas_conv.py).
Writes the trace under /tmp/ft2_unet_profile and prints module time,
per-category self time (with achieved TF/s and GB/s), and top ops.
"""

import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _platform  # noqa: F401  (JAX_PLATFORMS=cpu honor)
import numpy as np


def _find_xplane(logdir):
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    return max(paths, key=os.path.getmtime)


def parse_device_ops(path):
    """Per-op totals from the device plane's synchronous "XLA Ops" line.

    ("Async XLA Ops" spans are DMA copy-start->done windows that OVERLAP
    compute — summing them double-counts; module wall time comes from the
    "XLA Modules" line instead.) Returns (module_ps_per_iter, rows) where
    rows = [(name, category, source, total_ps, flops, bytes)] with flops/
    bytes already multiplied by the event count.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    dev = [p for p in space.planes
           if p.name.startswith("/device:") and "CUSTOM" not in p.name]
    if not dev:
        raise RuntimeError("no device plane in trace")
    plane = dev[0]
    sm = dict(plane.stat_metadata.items())
    em = dict(plane.event_metadata.items())

    def md_stats(md):
        out = {}
        for st in md.stats:
            key = sm[st.metadata_id].name
            out[key] = st.str_value or st.int64_value or st.double_value
        return out

    module_ps, n_modules = 0, 0
    agg = {}
    for line in plane.lines:
        if line.name == "XLA Modules":
            for ev in line.events:
                module_ps += ev.duration_ps
                n_modules += 1
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            md = em[ev.metadata_id]
            if ev.metadata_id not in agg:
                stats = md_stats(md)
                agg[ev.metadata_id] = [
                    md.display_name,
                    stats.get("hlo_category", "?"),
                    str(stats.get("source", "")),
                    0, 0, int(stats.get("flops", 0) or 0),
                    int(stats.get("bytes_accessed", 0) or 0)]
            row = agg[ev.metadata_id]
            row[3] += ev.duration_ps
            row[4] += 1
    rows = [(name, cat, src, ps, flops * cnt, bts * cnt)
            for name, cat, src, ps, cnt, flops, bts in agg.values()]
    return (module_ps / max(n_modules, 1)), rows


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 160
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    impl = sys.argv[3] if len(sys.argv) > 3 else "dense"

    import time

    import jax
    import jax.numpy as jnp

    from fetal_t2mapping_tpu.labels.unet3d import (
        UNetConfig, _segment_jit, _s2d_params_cached, _segment_s2d_jit,
        random_params)

    cfg = UNetConfig()
    params_np = random_params(cfg)
    params = {k: jnp.asarray(v) for k, v in params_np.items()}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, n, n, n, 1)).astype(np.float32))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    if impl == "dense":
        def step():
            return _segment_jit(params, x, cfg, dtype)
    elif impl in ("s2d", "pallas"):
        s2d = _s2d_params_cached(params_np, cfg)

        def step():
            return _segment_s2d_jit(params, s2d, x, cfg, dtype,
                                    conv_impl=impl)
    else:
        raise SystemExit(f"unknown impl {impl!r}")

    np.asarray(step())  # compile + sync

    t0 = time.perf_counter()
    for _ in range(reps):
        out = step()
    np.asarray(out)  # device->host read is the reliable sync on this stack
    wall_ms = (time.perf_counter() - t0) / reps * 1e3

    logdir = "/tmp/ft2_unet_profile"
    with jax.profiler.trace(logdir):
        for _ in range(reps):
            out = step()
        np.asarray(out)

    module_ps, rows = parse_device_ops(_find_xplane(logdir))
    total_ps = sum(r[3] for r in rows)
    per_cat = collections.defaultdict(lambda: [0, 0, 0])
    for _, cat, _, ps, flops, bts in rows:
        per_cat[cat][0] += ps
        per_cat[cat][1] += flops
        per_cat[cat][2] += bts

    print(f"unet {n}^3 forward ({dtype.__name__}): wall {wall_ms:.1f} ms/iter "
          f"(incl. label download), XLA module {module_ps / 1e9:.1f} ms/iter, "
          f"op self-time total {total_ps / 1e12 / reps * 1e3:.1f} ms/iter")
    print("\nper-HLO-category self time:")
    for cat, (ps, flops, bts) in sorted(per_cat.items(), key=lambda kv: -kv[1][0]):
        secs = ps / 1e12
        print(f"  {cat:28s} {ps / total_ps * 100:5.1f}%  "
              f"{secs / reps * 1e3:7.2f} ms/iter  "
              f"{flops / secs / 1e12 if secs else 0:6.1f} TF/s  "
              f"{bts / secs / 1e9 if secs else 0:7.0f} GB/s")
    print("\ntop 15 ops:")
    for name, cat, src, ps, flops, bts in sorted(rows, key=lambda r: -r[3])[:15]:
        secs = ps / 1e12
        print(f"  {ps / total_ps * 100:5.1f}%  {ps / 1e12 / reps * 1e3:6.2f} ms  "
              f"[{cat}] {name[:46]:46s} {src.split('/')[-1]}"
              f"  {flops / secs / 1e12 if secs else 0:.1f} TF/s"
              f" {bts / secs / 1e9 if secs else 0:.0f} GB/s")


if __name__ == "__main__":
    main()
