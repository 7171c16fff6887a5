"""Sharded large-map CG: virtual-mesh validation + per-chip projection.

The single-chip implicit-Schur CG at 10k kf / 500k lm / 1M obs measured
0.635 GN iters/s, HBM-bandwidth-bound streaming the obs tables (PERF.md
finding 34). ba_cg.solve_sharded splits exactly that stream 1/D over a
'model' mesh axis (gather plans are per-shard) and psums the [P,4]
landmark sums + the [W,6] reduced camera system over ICI.

Real multi-chip hardware is unavailable here (one v5e behind the axon
relay), so this tool does the two things that CAN be done:

1. VALIDATE the sharded solver on virtual CPU meshes of 1/2/4/8 devices
   against the single-device solver (cost + trajectory agreement).
   Wall-clock on a virtual mesh is meaningless — all "devices" share one
   host core — so no speed numbers are reported from it.
2. PROJECT per-chip GN iters/s from the measured bandwidth bound: per GN
   iteration the solver streams the per-obs tables (jf/jp/w/r + the padded
   gather plans) once for assembly and twice per CG matvec; sharding cuts
   that 1/D per device while adding one [P,4] psum per matvec and one
   [P,4,4]+[W,6,6] psum per GN iteration over ICI. The projection reports
   the D where psum bytes stop being negligible next to the per-device
   stream.

    python tools/profile_cg_sharded.py [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="CI-sized problem (200 kf / 5k lm)")
    ap.add_argument("--devices", default="1,2,4,8")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from slam_robot_tpu.utils.cachedir import jax_cache_dir
    jax.config.update("jax_compilation_cache_dir", jax_cache_dir("cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from slam_robot_tpu.ops import ba_cg
    from slam_robot_tpu.utils import synthetic

    nf, npts, opf = (64, 2000, 40) if args.small else (256, 8000, 60)
    prob = synthetic.build_large_problem(nf, npts, obs_per_frame=opf)
    keys = ("frame_quat", "frame_trans", "frame_cam", "cam_k", "point_loc",
            "point_uncertainty", "obs_frame", "obs_point", "obs_px",
            "obs_ok", "present", "free_frame")
    solve_args = tuple(prob[k] for k in keys)
    cgc = ba_cg.CGConfig(max_free_frames=nf, gn_iters=3, cg_iters=12,
                         precond="diag")

    ref = ba_cg.solve(*solve_args, cgc)
    ref_cost = float(np.asarray(ref.cost))
    ref_trans = np.asarray(ref.frame_trans)

    rows = []
    devs = jax.devices()
    for d in (int(x) for x in args.devices.split(",")):
        if d > len(devs):
            continue
        mesh = Mesh(np.array(devs[:d]), ("model",))
        res = ba_cg.solve_sharded(mesh, *solve_args, cfg=cgc)
        cost = float(np.asarray(res.cost))
        dtr = float(np.max(np.abs(np.asarray(res.frame_trans) - ref_trans)))
        rows.append({
            "devices": d,
            "cost": round(cost, 4),
            "cost_rel_err": round(abs(cost - ref_cost) / max(ref_cost, 1e-9), 8),
            "trans_max_diff_mm": round(dtr, 5),
            "ok": bool(np.asarray(res.ok)),
        })
        print(json.dumps(rows[-1]), flush=True)

    # --- projection from the measured single-chip bandwidth bound ---
    # Per-obs bytes streamed per pass (f32): jf [2,6] + jp [2,4] + w + r[2]
    # + px[2] + idx tables (frame/point/slot ~3 int32) = (12+8+1+2+2+3)*4
    O, P, W = 1_000_000, 500_000, 10_000
    obs_row_b = (12 + 8 + 1 + 2 + 2 + 3) * 4
    passes_per_gn = 1 + 2 * 20          # assembly + 2 streams per CG matvec
    stream_b = O * obs_row_b * passes_per_gn
    psum_b = 20 * P * 4 * 4 + P * 16 * 4 + W * 36 * 4  # matvec u's + blocks
    single_chip = 0.635                  # measured, finding 34
    proj = []
    for d in (2, 4, 8, 16, 64):
        per_dev = stream_b / d
        # ICI all-reduce bandwidth is of the same order as HBM on v5e but
        # the psum'd tensors are small next to the stream until ~stream/D
        # approaches psum bytes
        eff = per_dev / (per_dev + psum_b)
        proj.append({"devices": d,
                     "projected_gn_iters_per_s": round(single_chip * d * eff, 2),
                     "per_device_stream_MB_per_gn": round(per_dev / 1e6, 1),
                     "psum_MB_per_gn": round(psum_b / 1e6, 1)})
    print(json.dumps({
        "validation": rows,
        "projection_basis": {
            "measured_single_chip_gn_iters_per_s": single_chip,
            "bound": "HBM stream of obs tables (finding 34)",
            "obs_row_bytes": obs_row_b,
            "passes_per_gn": passes_per_gn,
        },
        "projection": proj,
        "note": "virtual-mesh wall times are not reported: all virtual "
                "devices share one host core",
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
