"""Config system, meta-launcher, and headless visualization tests."""

import argparse
import json
import os

import numpy as np
import pytest

from surfacenetworks_tpu import config, viz
from surfacenetworks_tpu.cli import launch
from surfacenetworks_tpu.data import datasets


def _parser():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="lap")
    p.add_argument("--layer", type=int, default=15)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-updates", type=int, default=500)
    p.add_argument("--num-epoch", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--half-lr", type=int, default=-1)
    p.add_argument("--optimizer", default="adam")
    config.add_config_flags(p)
    return p


def test_preset_layers_under_flags():
    args = config.parse_with_config(_parser(), ["--preset", "normal-lap"])
    assert args.batch_size == 32 and args.num_updates == 1250 and args.half_lr == 20
    # explicit flag wins over preset
    args = config.parse_with_config(_parser(), ["--preset", "normal-lap", "--batch-size", "4"])
    assert args.batch_size == 4 and args.num_epoch == 300


def test_json_config_over_preset(tmp_path):
    cfg = tmp_path / "run.json"
    cfg.write_text(json.dumps({"lr": 5e-4, "layer": 3}))
    args = config.parse_with_config(
        _parser(), ["--preset", "normal-lap", "--config", str(cfg)]
    )
    assert args.lr == 5e-4 and args.layer == 3 and args.batch_size == 32


def test_unknown_config_key_rejected(tmp_path):
    cfg = tmp_path / "bad.json"
    cfg.write_text(json.dumps({"no_such_flag": 1}))
    with pytest.raises(SystemExit, match="no_such_flag"):
        config.parse_with_config(_parser(), ["--config", str(cfg)])


def test_dump_config_roundtrip(tmp_path):
    args = config.parse_with_config(_parser(), ["--preset", "arap-lap"])
    path = str(tmp_path / "cfg" / "run.json")
    config.dump_config(args, path)
    data = json.loads(open(path).read())
    assert data["batch_size"] == 32 and data["model"] == "lap"


def test_presets_cover_all_tasks():
    tasks = {name.split("-")[0] for name in config.PRESETS}
    assert tasks == {"normal", "mnist", "vae", "arap", "faust"}


def test_launcher_builds_command():
    args = launch.parser.parse_args(
        ["--task", "normal", "--model", "dirac", "--layer", "3", "--dry-run"]
    )
    cmd, env = launch.build_command(args)
    assert "surfacenetworks_tpu.cli.train_normal" in cmd
    assert "--model" in cmd and "dirac" in cmd
    assert "--result-prefix" in cmd


def test_launcher_dry_run_exits_zero():
    assert launch.main(["--task", "vae", "--dry-run"]) == 0


def test_trainer_accepts_preset(tmp_path):
    """End-to-end: the normal trainer runs one tiny epoch from a preset
    with every heavy knob overridden by flags."""
    from surfacenetworks_tpu.cli import train_normal

    train_normal.main(
        [
            "--preset", "normal-lap", "--synthetic", "4", "--layer", "2",
            "--batch-size", "2", "--num-epoch", "1", "--num-updates", "2",
            "--debug", "--result-dir", str(tmp_path),
        ]
    )


# ----------------------------------------------------------------- viz


def test_render_mesh_and_quiver(tmp_path):
    V, F = datasets.random_blob_mesh(np.random.default_rng(0), 40)
    p1 = viz.render_mesh(V, F, str(tmp_path / "mesh.png"), color=V[:, 2])
    assert os.path.getsize(p1) > 0
    from surfacenetworks_tpu import geometry as geo

    L = geo.igl_style_laplacian(V, F, hack=1.0)
    p2 = viz.quiver_operator(V, F, L @ V, str(tmp_path / "quiver.png"))
    assert os.path.getsize(p2) > 0


def test_render_comparison_and_animation(tmp_path):
    V, F = datasets.random_blob_mesh(np.random.default_rng(1), 30)
    p = viz.render_comparison(V, V * 1.1, V * 0.9, F, str(tmp_path / "cmp.png"))
    assert os.path.getsize(p) > 0
    frames = [V * (1 + 0.05 * t) for t in range(3)]
    g = viz.animate_sequence(frames, F, str(tmp_path / "seq.gif"), pred_frames=frames)
    assert os.path.getsize(g) > 0
