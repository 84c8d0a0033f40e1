"""Edge-partitioned SpMM scaling harness: edges/s at 1..P partitions.

On a real multi-chip slice this measures the BASELINE north-star metric
(>=85% edges/s scaling efficiency with edge-partitioned operators and halo
exchange).  On a single chip / virtual CPU mesh it still runs and reports
the numbers (virtual-device timings are NOT hardware-representative).

Usage:
    python benchmarks/scaling.py [--n-points 7000] [--channels 128] [--parts 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure(n_points: int, channels: int, parts_list: list[int]):
    import jax
    import jax.numpy as jnp

    from surfacenetworks_tpu import geometry as geo
    from surfacenetworks_tpu import sparse as sps
    from surfacenetworks_tpu.data import datasets
    from surfacenetworks_tpu.dist import edge_partition, make_mesh

    rng = np.random.default_rng(0)
    V, F = datasets.random_blob_mesh(rng, n_points)
    L = geo.igl_style_laplacian(V, F, hack=1.0).tocsr()
    perm = sps.rcm_permutation(L)
    L = L[perm][:, perm].tocsr()
    coo = L.tocoo()
    bw = int(np.abs(coo.row - coo.col).max())
    nnz = L.nnz

    results = {}
    n_devices = len(jax.devices())
    for n_parts in parts_list:
        if n_parts > n_devices:
            continue
        unit = n_parts * 128
        N = (L.shape[0] + unit - 1) // unit * unit
        halo = max(((bw + 127) // 128) * 128, 128)
        halo = min(halo, N // n_parts)
        try:
            pop = edge_partition.partition_operator(L, n_parts, halo=halo, k=16, n_rows=N)
        except ValueError as e:
            results[n_parts] = {"error": str(e)}
            continue
        mesh = make_mesh(n_data=1, n_graph=n_parts, devices=jax.devices()[:n_parts])
        pspmm = edge_partition.make_partitioned_spmm(mesh)
        x = rng.normal(size=(N, channels)).astype(np.float32)

        @jax.jit
        def chain(op, x0, n):
            def body(_, y):
                return pspmm(op, y) * 0.2 + x0 * 0.01

            return jnp.sum(jax.lax.fori_loop(0, n, body, x0))

        with mesh:
            op_d = edge_partition.shard_partitioned(mesh, pop)
            x_d = edge_partition.shard_rows(mesh, jnp.asarray(x))

            def timed(n):
                float(chain(op_d, x_d, jnp.asarray(n, jnp.int32)))
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(chain(op_d, x_d, jnp.asarray(n, jnp.int32)))
                    best = min(best, time.perf_counter() - t0)
                return best

            t = (timed(544) - timed(32)) / 512
        results[n_parts] = {
            "edges_per_s": nnz / t,
            "us_per_apply": t * 1e6,
            "halo": halo,
        }
    base = None
    for p in sorted(results):
        r = results[p]
        if "edges_per_s" not in r:
            continue
        if base is None:
            base = r["edges_per_s"]
        r["scaling_efficiency"] = r["edges_per_s"] / (base * p)
    return {"n_vertices": L.shape[0], "nnz": nnz, "bandwidth": bw, "parts": results}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-points", type=int, default=7000)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--parts", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()
    print(json.dumps(measure(args.n_points, args.channels, args.parts), indent=2, default=float))
