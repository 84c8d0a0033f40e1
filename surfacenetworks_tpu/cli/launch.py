"""Meta-launcher: compose and run task trainer commands (run_normal.py:8-37).

The reference's launcher builds a ``CUDA_VISIBLE_DEVICES=… python
train_4_normal.py …`` command string from high-level options and shells out.
The TPU equivalent selects the task module, folds high-level options into
trainer flags (including a ``--preset``), and execs in a subprocess — device
selection is by JAX platform/visible-devices env instead of CUDA slots.

    python -m surfacenetworks_tpu.cli.launch --task normal --model lap \
        --layer 15 --preset normal-lap --dry-run
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

TASKS = {
    "normal": "surfacenetworks_tpu.cli.train_normal",
    "mnist": "surfacenetworks_tpu.cli.train_mnist",
    "vae": "surfacenetworks_tpu.cli.train_vae",
    "arap": "surfacenetworks_tpu.cli.train_arap",
    "correspondence": "surfacenetworks_tpu.cli.train_correspondence",
}

parser = argparse.ArgumentParser(description="Surface Networks launcher (TPU)")
parser.add_argument("--task", default="normal", choices=sorted(TASKS))
parser.add_argument("--model", default="lap")
parser.add_argument("--layer", type=int, default=None)
parser.add_argument("--batch-size", type=int, default=None)
parser.add_argument("--lr", type=float, default=None)
parser.add_argument("--preset", default=None)
parser.add_argument("--config", default=None)
parser.add_argument("--platform", default=None, help="jax platform override (tpu|cpu)")
parser.add_argument("--devices", default=None, help="visible device ids, comma separated")
parser.add_argument("--dry-run", action="store_true", help="print the command, do not run")
parser.add_argument("rest", nargs=argparse.REMAINDER, help="extra flags passed through (after --)")


def build_command(args) -> tuple[list[str], dict]:
    cmd = [sys.executable, "-m", TASKS[args.task]]
    prefix_parts = [args.task, args.model]
    for flag in ["model", "layer", "batch_size", "lr", "preset", "config"]:
        val = getattr(args, flag)
        if val is not None:
            cmd += [f"--{flag.replace('_', '-')}", str(val)]
            if flag in ("layer",):
                prefix_parts.append(str(val))
    rest = [a for a in args.rest if a != "--"]
    if not any(a.startswith("--result-prefix") for a in rest):
        cmd += ["--result-prefix", "_".join(prefix_parts)]
    cmd += rest
    env = dict(os.environ)
    if args.platform:
        env["JAX_PLATFORMS"] = args.platform
    if args.devices:
        env["JAX_VISIBLE_DEVICES"] = args.devices
    return cmd, env


def main(argv=None):
    args = parser.parse_args(argv)
    cmd, env = build_command(args)
    print(" ".join(cmd))
    if args.dry_run:
        return 0
    return subprocess.run(cmd, env=env).returncode


if __name__ == "__main__":
    raise SystemExit(main())
