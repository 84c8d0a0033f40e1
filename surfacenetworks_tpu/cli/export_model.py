"""Export a trained normal-prediction model to a serving artifact.

The deployment story the reference lacks (its inference = unpickling a torch
checkpoint inside the training repo): this CLI restores a checkpoint, builds
the operator for the target mesh (or a synthetic stand-in for smoke tests),
and writes one self-contained StableHLO artifact (`serve.py`) that runs on
TPU/CPU without the model code.

    python -m surfacenetworks_tpu.cli.export_model \
        --model lap --layer 15 --deser results/normal_predict/pts/run.msgpack \
        --mesh path/to/scan.obj --out model.snx
    # smoke test without data:
    python -m surfacenetworks_tpu.cli.export_model --synthetic --out /tmp/m.snx
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from surfacenetworks_tpu import serve
from surfacenetworks_tpu import models as zoo
from surfacenetworks_tpu.cli.common import enable_compilation_cache
from surfacenetworks_tpu.data import Buckets, datasets, laplacian_batch, dirac_batch
from surfacenetworks_tpu.train import checkpoint

parser = argparse.ArgumentParser(description="Export model for serving")
parser.add_argument("--model", default="lap", help="lap | dirac")
parser.add_argument("--layer", type=int, default=15)
parser.add_argument("--deser", default=None, help="checkpoint to restore (msgpack)")
parser.add_argument("--mesh", default=None, help=".obj/.ply mesh fixing the served bucket")
parser.add_argument("--synthetic", action="store_true", help="synthetic mesh (smoke test)")
parser.add_argument("--bucket", type=int, default=0, help="vertex bucket override (0 = mesh size)")
parser.add_argument("--bf16", action="store_true", help="bf16 compute in the artifact")
parser.add_argument("--runtime-operator", action="store_true",
                    help="keep the operator a runtime argument (one artifact, many "
                         "same-bucket meshes) instead of baking it in")
parser.add_argument("--platforms", nargs="+", default=["tpu", "cpu"])
parser.add_argument("--out", required=True)


def main(argv=None):
    args = parser.parse_args(argv)
    enable_compilation_cache()
    operator = "dirac" if args.model.startswith("dirac") else "lap"
    if args.synthetic or args.mesh is None:
        samples = datasets.synthetic_normal_dataset(1, 120, seed=0, operator=operator)
    else:
        sample = datasets.load_normal_sample(args.mesh, operator=operator)
        if sample is None:
            raise SystemExit(
                f"--mesh {args.mesh}: empty or degenerate mesh (no faces, NaN "
                "normals, or non-finite operator entries) — cannot export"
            )
        samples = [sample]
    buckets = Buckets.for_samples(samples)
    if args.bucket:
        buckets.n_vertices = max(buckets.n_vertices, args.bucket)
    batch = (dirac_batch if operator == "dirac" else laplacian_batch)(samples, buckets)

    dt = jnp.bfloat16 if args.bf16 else None
    if operator == "dirac":
        model = zoo.DirDeepModel(3, 3, args.layer, dtype=dt)
    else:
        model = zoo.LapDeepModel(3, 3, layers=args.layer, dtype=dt)
    mask, inputs = jnp.asarray(batch.mask), jnp.asarray(batch.inputs)
    params = model.init(jax.random.key(0), batch.operator, mask, inputs)["params"]
    if args.deser:
        state = checkpoint.load_checkpoint(args.deser)
        params = checkpoint.fuzzy_restore(params, state["params"])

    blob = serve.export_forward(
        model, params, batch.operator, mask, inputs,
        bake_operator=not args.runtime_operator,
        platforms=tuple(args.platforms),
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    info = serve.export_info(blob)
    print(f"wrote {args.out}: {len(blob)} bytes, platforms={info['platforms']}, "
          f"in={info['in_avals']}, out={info['out_avals']}")


if __name__ == "__main__":
    main()
