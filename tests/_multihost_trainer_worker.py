"""Worker for the 2-process FULL-TRAINER jax.distributed CPU simulation.

Unlike ``_multihost_worker.py`` (bare collectives + a hand-rolled DP step),
this drives the real CLI trainers end-to-end across the process boundary —
the code path a user takes on an actual multi-host slice:

* ``train_normal --multihost --data-parallel 4`` — batch sharded over 4
  devices spanning 2 processes, gradient all-reduce over "DCN";
* ``train_correspondence --multihost --graph-parallel 4`` — BASELINE
  config 5's shape: each FAUST trunk operator's rows partitioned across all
  4 devices of both processes, ring halo exchange crossing the process
  boundary (CPU stand-in for ICI+DCN).

Every process runs the same trainer invocation (same seed -> identical host
batches); placements go through ``dist.mesh_setup.put_global``.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    coordinator, process_id = sys.argv[1], sys.argv[2]
    common = [
        "--multihost",
        "--coordinator-address", coordinator,
        "--num-processes", "2",
        "--process-id", process_id,
    ]

    from surfacenetworks_tpu.cli import train_normal

    train_normal.main(
        common
        + [
            "--synthetic", "8", "--batch-size", "4", "--data-parallel", "4",
            "--layer", "2", "--num-epoch", "1", "--num-updates", "3",
            "--no-test", "--debug",
        ]
    )
    assert jax.process_count() == 2 and jax.device_count() == 4
    print(f"worker {process_id}: train_normal dp OK", flush=True)

    from surfacenetworks_tpu.cli import train_correspondence

    train_correspondence.main(
        common
        + [
            "--synthetic", "3", "--layer", "2", "--num-epoch", "1",
            "--num-updates", "2", "--graph-parallel", "4",
            "--deser-option", "no", "--result-dir", "/tmp/mh_corr",
        ]
    )
    print(f"worker {process_id}: train_correspondence gp OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
