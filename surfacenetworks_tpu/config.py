"""Dataclass/JSON config system with per-task presets.

The reference configures every run through per-script argparse flags plus a
string-composing meta-launcher (run_normal.py:8-37, train_4_normal.py:30-85).
The TPU build keeps those CLIs flag-compatible but adds one config layer over
all of them (SURVEY.md §5 "Config / flag system"):

* every trainer accepts ``--config run.json`` and/or ``--preset NAME``;
* values resolve as: parser defaults < preset < json file < explicit flags;
* ``dump_config(args, path)`` records the fully-resolved run config next to
  the checkpoints so every run is reproducible from one artifact.

Presets mirror the reference's default configurations (BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any

# Per-task presets: the reference's shipped default configurations.
PRESETS: dict[str, dict[str, Any]] = {
    # run_normal.py:9-29 + train_4_normal.py defaults
    "normal-lap": {
        "model": "lap", "layer": 15, "batch_size": 32, "num_updates": 1250,
        "num_epoch": 300, "lr": 1e-3, "half_lr": 20, "optimizer": "adam",
    },
    "normal-dirac": {
        "model": "dirac", "layer": 15, "batch_size": 32, "num_updates": 1250,
        "num_epoch": 300, "lr": 1e-3, "half_lr": 20, "optimizer": "adam",
    },
    # mesh_mnist/models.py:27-35, main.py:41
    "mnist-lap": {"model": "lap", "batch_size": 64, "num_epoch": 100, "lr": 1e-3},
    "mnist-dirac": {"model": "dirac", "batch_size": 64, "num_epoch": 100, "lr": 1e-3},
    # mesh_mnist/models_vae.py:26-36, main_vae.py
    "vae-lap": {"model": "lap", "batch_size": 64, "num_epoch": 100, "lr": 1e-3,
                "latent": 100, "kld_warmup": 10},
    # as_rigid_as_possible/main.py:38-53
    "arap-lap": {"model": "lap", "layer": 15, "batch_size": 32, "num_updates": 1000,
                 "num_epoch": 110, "lr": 1e-3},
    "arap-dirac": {"model": "dirac", "layer": 15, "batch_size": 32,
                   "num_updates": 1000, "num_epoch": 110, "lr": 1e-3},
    # dense_correspondence/main.py:40-53
    "faust-lap": {"model": "lap", "layer": 15, "batch_size": 1, "num_epoch": 100,
                  "lr": 1e-3, "loss": "dcel"},
    "faust-dirac": {"model": "dirac", "layer": 15, "batch_size": 1,
                    "num_epoch": 100, "lr": 1e-3, "loss": "dcel"},
}


def add_config_flags(parser: argparse.ArgumentParser) -> None:
    """Attach ``--config`` / ``--preset`` to a task parser."""
    parser.add_argument("--config", default=None, help="JSON config file")
    parser.add_argument(
        "--preset", default=None, choices=sorted(PRESETS), help="named default config"
    )


def parse_with_config(parser: argparse.ArgumentParser, argv=None) -> argparse.Namespace:
    """Parse argv with preset/json-file layered under explicit flags.

    Pre-parses ``--config``/``--preset``, folds their values into the parser
    defaults (json keys use the dest naming, ``_`` for ``-``), then parses
    the full argv so explicit flags win.
    """
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", default=None)
    pre.add_argument("--preset", default=None)
    known, _ = pre.parse_known_args(argv)
    layered: dict[str, Any] = {}
    if known.preset:
        layered.update(PRESETS[known.preset])
    if known.config:
        with open(known.config) as fp:
            layered.update(json.load(fp))
    valid = {a.dest for a in parser._actions}
    unknown = set(layered) - valid
    if unknown:
        raise SystemExit(f"config keys not recognized by this task: {sorted(unknown)}")
    parser.set_defaults(**layered)
    return parser.parse_args(argv)


def dump_config(args: argparse.Namespace, path: str) -> None:
    """Write the fully-resolved run config as JSON (reproducibility artifact)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {k: v for k, v in vars(args).items() if not k.startswith("_")}
    with open(path, "w") as fp:
        json.dump(payload, fp, indent=2, default=str)
