"""Host input pipeline: pack-once caching, device-resident datasets,
background prefetch, and device-side metric accumulation.

The reference loads and converts every sample ONCE up front
(normal_predict/train_4_normal.py:195-218 preload loop; sample_batch then
only pads cached tensors) but still ships each batch to the device every
step.  The TPU-native ladder here goes further, rung by rung:

* :class:`OperatorCache` — packs each sample's operator (scipy -> ELL / BSR
  / dense / Dirac tables) exactly once per (sample, bucket shape, format)
  and reuses the packed arrays across every epoch.  Keys are identity-based
  on the objects the packed result derives from (the scipy matrix / coeff
  table / V+F arrays), so replacing a sample's operator naturally invalidates
  its cache entry while plain re-batching hits.

* :class:`DeviceDataset` / :class:`IndexedBatch` — the endpoint: the whole
  packed dataset is device-resident as stacked ``[S, ...]`` arrays and a
  batch is a ``[B]``-index gather fused INSIDE the jit'd train step.  With
  the metric sums carried through the same executable
  (:class:`MetricAccumulator` covers the host paths), a steady-state step
  is one async dispatch and zero host->device bytes beyond the indices.

* :func:`prefetch` — assembles batch t+1 on a background thread while the
  device runs step t (double buffering), for the DP/graph-parallel paths
  whose placement is sharding-specific and stays on the host route.

Together these took the trainers from host-bound (~16 steps/s wall at a
~5 ms compiled step, the round-3 evidence logs) to device-bound loops
(156-380 steps/s measured across the zoo, round 4).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator


def _nbytes(value) -> int:
    """Approximate host bytes held by a packed value.  All operator
    containers (EllOperator/BsrOperator/DiracOperator, tuples, lists, bare
    arrays) are pytrees whose leaves carry ``nbytes``."""
    import jax

    return sum(getattr(leaf, "nbytes", 0) for leaf in jax.tree_util.tree_leaves(value))


class OperatorCache:
    """Pack-once cache for per-sample operator representations.

    ``get(owners, key, build)`` returns the cached value for
    ``(ids of owners, key)`` or calls ``build()`` and stores the result.
    ``owners`` are the host objects the packed value derives from (e.g. the
    scipy ``L`` matrix); the cache holds references to them so their ``id``
    stays valid, and verifies identity on every hit — a sample whose operator
    was replaced (new object) misses and repacks.

    ``budget_bytes`` caps host memory: once the cached arrays exceed it, new
    entries are built but not stored (the cache degrades to pass-through
    instead of growing without bound).
    """

    def __init__(self, budget_bytes: int = 8 << 30):
        self._store: dict[tuple, tuple[tuple, Any]] = {}
        self.budget_bytes = budget_bytes
        self.bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, owners: tuple, key: tuple, build: Callable[[], Any]):
        k = tuple(id(o) for o in owners) + key
        hit = self._store.get(k)
        if hit is not None and all(a is b for a, b in zip(hit[0], owners)):
            self.hits += 1
            return hit[1]
        self.misses += 1
        value = build()
        size = _nbytes(value)
        if hit is not None:
            # stale entry (owner replaced at a reused id): reclaim its budget
            self.bytes -= _nbytes(hit[1])
            del self._store[k]
        if self.bytes + size <= self.budget_bytes:
            self._store[k] = (owners, value)
            self.bytes += size
        elif not getattr(self, "_warned", False):
            # degrade to pass-through LOUDLY: every further miss repacks from
            # scipy each batch — the host-bound regime this cache exists to
            # prevent
            import warnings

            warnings.warn(
                f"OperatorCache budget ({self.budget_bytes / 1e9:.1f} GB) exceeded "
                f"after {len(self._store)} entries; further operators repack "
                "every batch (raise budget_bytes to keep the pack-once behavior)",
                stacklevel=2,
            )
            self._warned = True
        return value

    def clear(self) -> None:
        self._store.clear()
        self.bytes = 0

    def stats(self) -> str:
        return (
            f"operator cache: {len(self._store)} entries, "
            f"{self.bytes / 1e6:.1f} MB, {self.hits} hits / {self.misses} misses"
        )


class MetricAccumulator:
    """Device-side metric accumulation: one host fetch per epoch.

    Fetching a device scalar after every step (``float(loss)``) blocks the
    host on a device round trip per step — measured ~24 ms per fetch through
    a remote-TPU tunnel vs 0.04 ms for an async dispatch.  ``add`` keeps the
    running sums ON DEVICE (a tiny async scalar add per step); ``sums()``
    fetches once.  NaN detection therefore happens once per epoch instead of
    per step — same diagnostic, off the critical path.

    ``max_inflight`` bounds how far the host may dispatch ahead of the
    device: every ``add`` enqueues the step's first scalar and, past the
    bound, blocks on the OLDEST one — the device stays ~max_inflight steps
    deep (pipelined, no bubbles) without queuing an epoch's worth of input
    buffers in HBM."""

    def __init__(self, max_inflight: int = 16):
        self._sums = None
        self._inflight: list = []
        self.max_inflight = max_inflight
        self.n = 0

    def add(self, *scalars) -> None:
        if self._sums is None:
            self._sums = list(scalars)
        else:
            self._sums = [a + b for a, b in zip(self._sums, scalars)]
        self.n += 1
        if scalars:
            self._inflight.append(scalars[0])
            if len(self._inflight) > self.max_inflight:
                import jax

                jax.block_until_ready(self._inflight.pop(0))

    def sums(self) -> tuple:
        if self._sums is None:
            return ()
        return tuple(float(x) for x in self._sums)

    def means(self) -> tuple:
        return tuple(s / max(self.n, 1) for s in self.sums())


def _concat_host_trees(objs: list):
    """np.concatenate the leaves of structurally-identical single-sample
    batch trees along axis 0 (EllMatrix containers concatenate their array
    fields; the per-sample static ``window`` unifies to the max, a valid
    band bound for every member)."""
    import jax
    import numpy as np

    from surfacenetworks_tpu.sparse import EllMatrix

    is_ell = lambda x: isinstance(x, EllMatrix)
    leaves0, treedef = jax.tree_util.tree_flatten(objs[0], is_leaf=is_ell)
    all_leaves = [leaves0] + [
        jax.tree_util.tree_flatten(o, is_leaf=is_ell)[0] for o in objs[1:]
    ]
    out = []
    for i in range(len(leaves0)):
        group = [lv[i] for lv in all_leaves]
        if is_ell(group[0]):
            out.append(
                EllMatrix(
                    cols=np.concatenate([np.asarray(g.cols) for g in group], axis=0),
                    vals=np.concatenate([np.asarray(g.vals) for g in group], axis=0),
                    n_cols=group[0].n_cols,
                    window=max(g.window for g in group),
                )
            )
        else:
            out.append(np.concatenate([np.asarray(g) for g in group], axis=0))
    return jax.tree_util.tree_unflatten(treedef, out)


def stack_device_trees(objs: list):
    """``jnp.stack`` the leaves of structurally-identical device trees along
    a NEW leading axis — the device-side analogue of
    :func:`_concat_host_trees`, used to build sample stores that jit'd steps
    index with traced ``[()]`` ints (the correspondence epoch-scan path).
    EllMatrix members unify their static ``window`` to the group max (a
    valid band bound for every member); all other static metadata must
    already agree (shared bucket config guarantees it).
    """
    import jax
    import jax.numpy as jnp

    from surfacenetworks_tpu.sparse import EllMatrix

    is_ell = lambda x: isinstance(x, EllMatrix)
    leaves0, treedef = jax.tree_util.tree_flatten(objs[0], is_leaf=is_ell)
    all_leaves = [leaves0] + [
        jax.tree_util.tree_flatten(o, is_leaf=is_ell)[0] for o in objs[1:]
    ]
    out = []
    for i in range(len(leaves0)):
        group = [lv[i] for lv in all_leaves]
        if is_ell(group[0]):
            out.append(
                EllMatrix(
                    cols=jnp.stack([g.cols for g in group]),
                    vals=jnp.stack([g.vals for g in group]),
                    n_cols=group[0].n_cols,
                    window=max(g.window for g in group),
                )
            )
        else:
            out.append(jnp.stack(group))
    return jax.tree_util.tree_unflatten(treedef, out)


class IndexedBatch:
    """A device-resident dataset tree + the row indices of one batch.

    Trainers dispatch ``(tree, idx)`` straight into a jit'd step that gathers
    the batch rows ON DEVICE — the whole batch assembly is one fused gather
    inside the step's executable, so a training step costs exactly one
    dispatch and zero host->device bytes beyond the ``[B]`` index vector."""

    def __init__(self, tree, idx, names=None):
        self.tree = tree
        self.idx = idx
        self.names = names

    @property
    def inputs(self):  # shape introspection for throughput meters
        return self.tree["inputs"]

    def padded_vertex_count(self) -> int:
        return int(self.idx.shape[0]) * int(self.tree["inputs"].shape[1])

    @staticmethod
    def gather(tree, idx):
        """Inside-jit batch assembly: gather ``idx`` rows of every leaf."""
        import jax

        return jax.tree_util.tree_map(lambda a: a[idx], tree)


class DeviceDataset:
    """Whole-dataset device residency + jit-fused index batching.

    The endpoint of the input-pipeline ladder: every sample's fully packed
    single-sample batch is built once on the host, stacked into ``[S, ...]``
    arrays, and device_put ONCE.  A training batch is then just an ``[S]``-
    indexed gather executed INSIDE the jit'd train step (``IndexedBatch``),
    so steady-state steps ship only a ``[B]`` int32 index vector to the
    device.  Measured on the round-4 rig: per-step eager device concats cost
    ~18 ms through the remote-TPU tunnel; the fused gather removes them
    entirely (the chained step runs at its compiled ~1 ms).

    Falls back to returning None from :func:`build` when the packed dataset
    exceeds ``budget_bytes`` (callers keep the host path).
    """

    def __init__(self, tree, names, index_of, items=None):
        self.tree = tree
        self.names = names
        self._index_of = index_of
        # pin the items: identity keys stay valid only while the objects
        # live — without this, a freed sample list lets CPython reuse ids and
        # indices() could silently resolve an unrelated object
        self._items = items

    @classmethod
    def build(cls, items, build_one: Callable, budget_bytes: int = 6 << 30,
              value_keys: bool = False, place: Callable | None = None):
        """``place`` overrides the device placement of the stacked host tree
        (default ``jax.device_put``) — e.g. ``lambda t: dist.replicate(mesh,
        t)`` to replicate the dataset over a DP mesh so the in-jit gather
        can be resharded batch-wise by the step's sharding constraints."""
        import jax

        items = list(items)
        singles = [build_one(s) for s in items]
        trees = [
            {
                "inputs": b.inputs,
                "targets": b.targets,
                "mask": b.mask,
                "operator": b.operator,
                "faces": b.faces,
                "aux": b.aux,
            }
            for b in singles
        ]
        host = _concat_host_trees(trees) if len(trees) > 1 else trees[0]
        if _nbytes(host) > budget_bytes:
            return None
        names = [b.names[0] if b.names else None for b in singles]
        index_of = {(s if value_keys else id(s)): i for i, s in enumerate(items)}
        placed = place(host) if place is not None else jax.device_put(host)
        return cls(placed, names, index_of, items=items)

    def indices(self, items, value_keys: bool = False):
        import numpy as np

        return np.asarray(
            [self._index_of[s if value_keys else id(s)] for s in items], np.int32
        )

    def batch(self, items, value_keys: bool = False) -> IndexedBatch:
        idx = self.indices(items, value_keys=value_keys)
        return IndexedBatch(self.tree, idx, names=[self.names[i] for i in idx])

    def stats(self) -> str:
        return (
            f"device dataset: {len(self.names)} samples, "
            f"{_nbytes(self.tree) / 1e6:.1f} MB resident"
        )


class _Failure:
    def __init__(self, exc: BaseException):
        self.exc = exc


_DONE = object()


def prefetch(
    make_batch: Callable[[int], Any], n_steps: int, depth: int = 2
) -> Iterator[Any]:
    """Yield ``make_batch(i)`` for ``i in range(n_steps)``, assembled ahead
    of the consumer on a background thread.

    ``depth`` bounds the number of batches in flight (2 = double buffering:
    while the device runs step t, the worker packs batch t+1).  Worker
    exceptions re-raise in the consumer at the failing step's position; if
    the consumer stops early (break / exception), the worker is signalled
    and exits instead of blocking on the full queue forever.
    """
    if n_steps <= 0:
        return
    q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for i in range(n_steps):
                if not _put(make_batch(i)):
                    return
        except BaseException as e:  # noqa: BLE001 - surfaced in the consumer
            _put(_Failure(e))
        else:
            _put(_DONE)

    t = threading.Thread(target=worker, daemon=True, name="snx-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _DONE:
                break
            if isinstance(item, _Failure):
                raise item.exc
            yield item
    finally:
        stop.set()


def padded_vertex_count(batch) -> int:
    """B * N_padded of a batch, for throughput meters — uniform over host
    MeshBatches and IndexedBatches."""
    if isinstance(batch, IndexedBatch):
        return batch.padded_vertex_count()
    return int(batch.inputs.shape[0]) * int(batch.inputs.shape[1])


def prefetch_over(sampler, make_batch: Callable[[list], Any], n_steps: int, depth: int = 2):
    """Convenience: prefetch ``make_batch(sampler.next_batch())`` — the
    standard trainer hot-loop shape.  Sampling happens on the worker thread;
    samplers are only touched from that single thread during the loop."""
    return prefetch(lambda _i: make_batch(sampler.next_batch()), n_steps, depth=depth)
