"""GP-vs-DP trainer wall-rate comparison on a virtual 8-device CPU mesh.

Round-4 verdict item 1's done-criterion: the graph-parallel trainer path
(device-resident GraphStore, round-5) must sustain wall steps/s within 2x of
the DP fast path at equal shapes.  Multi-chip TPU hardware is not reachable
from this rig, so the comparison runs the REAL train_normal trainer twice on
the same virtual CPU mesh — identical dataset, model depth and batch — once
``--data-parallel 2`` (replicated DeviceDataset + sharded in-jit gather) and
once ``--graph-parallel 4 --data-parallel 2`` (GraphStore: partitioned
operators placed once, [B]-index gather in-jit).  Absolute numbers are
CPU-emulation artifacts; the RATIO is the quantity of interest — with both
paths device-resident it isolates orchestration overhead, not compute.

Run standalone or via bench.py (subprocess):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python benchmarks/gp_dp_wall.py
Prints one JSON line: {"dp_steps_per_s": ..., "gp_steps_per_s": ..., "gp_over_dp": ...}
"""

import json
import os
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from surfacenetworks_tpu.cli import train_normal  # noqa: E402

COMMON = [
    "--synthetic", "8", "--synthetic-points", "4000",
    "--num-epoch", "2", "--num-updates", "10",
    "--layer", "8", "--batch-size", "4", "--seed", "5", "--no-test",
]


def rate_of(extra):
    d = tempfile.mkdtemp()
    train_normal.main(COMMON + extra + ["--result-dir", d])
    rates = []
    for line in open(os.path.join(d, "log", "debug.log")):
        if "Train" in line and "steps/s" in line:
            rates.append(float(line.split(",")[-2].split("steps/s")[0]))
    return rates[-1]  # post-compile epoch


CORR_COMMON = [
    "--synthetic", "2", "--synthetic-points", "4096", "--layer", "3",
    "--num-epoch", "2", "--num-updates", "6", "--deser-option", "no",
    "--full-train", "--seed", "5",
]


def corr_rate_of(extra):
    """Wall steps/s of the FAUST siamese trainer (post-compile epoch) —
    GP (partitioned trunks + cached targets, round-5) vs single-device at
    equal shapes."""
    from surfacenetworks_tpu.cli import train_correspondence

    d = tempfile.mkdtemp()
    train_correspondence.main(
        CORR_COMMON + extra + ["--result-dir", d, "--result-prefix", "w"]
    )
    rates = []
    for line in open(os.path.join(d, "log", "w.log")):
        if "Train epoch" in line and "steps/s" in line:
            rates.append(float(line.split(",")[-2].split("steps/s")[0]))
    return rates[-1]


def main():
    assert len(jax.devices()) >= 8, "needs 8 virtual devices (set XLA_FLAGS)"
    dp = rate_of(["--data-parallel", "2"])
    gp = rate_of(["--graph-parallel", "4", "--data-parallel", "2"])
    corr_single = corr_rate_of([])
    corr_gp = corr_rate_of(["--graph-parallel", "4"])
    print(json.dumps({
        "dp_steps_per_s": round(dp, 2),
        "gp_steps_per_s": round(gp, 2),
        "gp_over_dp": round(gp / dp, 3),
        "corr_single_steps_per_s": round(corr_single, 2),
        "corr_gp_steps_per_s": round(corr_gp, 2),
        "corr_gp_over_single": round(corr_gp / corr_single, 3),
    }))


if __name__ == "__main__":
    main()
