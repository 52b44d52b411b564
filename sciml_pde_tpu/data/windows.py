"""HBM-resident trajectory store + on-device window gather.

Replaces the reference's sliding-window Datasets (e.g.
``pdebench/models/fno_aux/utils_2d_rd.py:147-176``: index = (trajectory,
t0) over all windows of ``initial_step`` frames, read lazily per
``__getitem__`` in DataLoader workers).  Here the full trajectory tensor
lives on device and ``gather_windows`` runs *inside* the jitted train
step, so batch assembly is an XLA gather fused with the forward pass and
the host only ships ``(B, 2)`` int32 indices per step.

Window layout matches the reference's model contract: inputs are
``(B, *spatial, T, C)`` with time second-to-last (``utils_2d_rd.py:160``
permutes to that layout before returning).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp


def gather_windows(
    data: jnp.ndarray, idx: jnp.ndarray, initial_step: int, rollout: int
):
    """Gather (x, y) windows from a trajectory store.

    Args:
      data: ``(N, T, *spatial, C)`` trajectory store (device-resident).
      idx:  ``(B, 2)`` int32 rows of ``(trajectory, t0)``.
      initial_step: input window length (frames fed to the model).
      rollout: target length; ``y`` covers frames
        ``t0+initial_step .. t0+initial_step+rollout-1``.  ``rollout=0``
        returns an empty-time ``y`` (used by SSL pretraining / export).

    Returns:
      ``x: (B, *spatial, initial_step, C)`` and
      ``y: (B, *spatial, rollout, C)`` — time second-to-last, the layout
      every model family here consumes.
    """
    span = initial_step + rollout
    offs = jnp.arange(span, dtype=idx.dtype)
    # (B, span) frame indices -> one fused XLA gather over (traj, frame)
    win = data[idx[:, 0, None], idx[:, 1, None] + offs[None, :]]
    win = jnp.moveaxis(win, 1, -2)  # (B, *spatial, span, C)
    return win[..., :initial_step, :], win[..., initial_step:, :]


class WindowedTrajectories:
    """A trajectory store with its coordinate grid and window bookkeeping.

    ``train=True`` enumerates every valid sliding window (reference
    train-split behavior); ``train=False`` exposes exactly one window per
    trajectory at ``t0=0`` (reference test-split behavior, e.g.
    ``utils_2d_ns.py:117-123``).
    """

    def __init__(self, data, grid, *, initial_step: int, rollout: int = 1,
                 train: bool = True, to_device: bool = True):
        # to_device=False keeps the store in host RAM (numpy) for the
        # host-streaming pipeline (data/stream.py) — stores beyond HBM
        if to_device:
            # chunked transfer: a single multi-GB device_put stages ~6x
            # the payload in host RAM on the remote backend
            # (utils/transfer.py, PERFORMANCE.md backend notes)
            from sciml_pde_tpu.utils.transfer import device_put_chunked

            self.data = device_put_chunked(data)
        else:
            self.data = np.asarray(data)
        self.grid = grid if isinstance(grid, jnp.ndarray) else jnp.asarray(grid)
        self.initial_step = int(initial_step)
        self.rollout = int(rollout)
        self.train = bool(train)
        n_t = self.data.shape[1]
        if n_t < self.initial_step + self.rollout:
            raise ValueError(
                f"trajectories have {n_t} frames < initial_step+rollout "
                f"({self.initial_step}+{self.rollout})"
            )

    @property
    def num_trajectories(self) -> int:
        return int(self.data.shape[0])

    @property
    def windows_per_trajectory(self) -> int:
        if not self.train:
            return 1
        return self.data.shape[1] - self.initial_step - self.rollout + 1

    def window_index(self) -> np.ndarray:
        """``(num_windows, 2)`` int32 host array of (trajectory, t0) rows."""
        n, w = self.num_trajectories, self.windows_per_trajectory
        traj = np.repeat(np.arange(n, dtype=np.int32), w)
        t0 = np.tile(np.arange(w, dtype=np.int32), n)
        return np.stack([traj, t0], axis=1)

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return (
            f"WindowedTrajectories(data={tuple(self.data.shape)}, "
            f"grid={tuple(self.grid.shape)}, initial_step={self.initial_step}, "
            f"rollout={self.rollout}, train={self.train})"
        )


def sharded_gather_windows(
    data: jnp.ndarray, idx: jnp.ndarray, initial_step: int, rollout: int, mesh
):
    """``gather_windows`` for a store sharded over the 'data' mesh axis.

    ``data`` is ``(N, T, *spatial, C)`` with trajectories sharded over
    'data' (see ``parallel.trajectory_sharding``); ``idx`` is ``(B, 2)``
    batch-sharded rows whose trajectory ids are **shard-local**
    (0 .. N/n_data - 1) — produced by ``sharded_epoch_batches``.  The
    gather runs per-shard under ``shard_map`` (no cross-chip traffic);
    the returned windows are batch-sharded, which is exactly what the
    jitted train step consumes.
    """
    from jax.sharding import PartitionSpec as P

    from sciml_pde_tpu.parallel.mesh import AXES

    ndim_rest = data.ndim - 1
    spec_data = P(AXES.data, *([None] * ndim_rest))

    def local(data_shard, idx_shard):
        return gather_windows(data_shard, idx_shard, initial_step, rollout)

    return jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec_data, P(AXES.data, None)),
        out_specs=(P(AXES.data), P(AXES.data)),
    )(data, idx)


def sharded_epoch_batches(
    index: np.ndarray, batch_size: int, n_traj: int, n_shards: int, rng=None
):
    """Shuffled batches for a trajectory store sharded over `n_shards`.

    Each batch holds ``batch_size / n_shards`` windows from every shard's
    trajectory range, ordered shard-major so slicing the batch over the
    'data' axis lines each slice up with its local store shard; trajectory
    ids are converted to shard-local.  Requires ``n_traj % n_shards == 0``
    and ``batch_size % n_shards == 0``.
    """
    index = np.asarray(index)
    if n_traj % n_shards or batch_size % n_shards:
        raise ValueError(
            f"n_traj={n_traj} and batch_size={batch_size} must divide n_shards={n_shards}"
        )
    per_shard_traj = n_traj // n_shards
    per_shard_b = batch_size // n_shards
    shard_of = index[:, 0] // per_shard_traj
    # per-shard window pools, trajectory ids made local
    pools = []
    for s in range(n_shards):
        rows = index[shard_of == s].copy()
        rows[:, 0] -= s * per_shard_traj
        pools.append(rows)
    n_batches = min(len(p) for p in pools) // per_shard_b
    orders = [
        (rng.permutation(len(p)) if rng is not None else np.arange(len(p)))
        for p in pools
    ]
    for b in range(n_batches):
        parts = [
            pools[s][orders[s][b * per_shard_b : (b + 1) * per_shard_b]]
            for s in range(n_shards)
        ]
        yield np.concatenate(parts, axis=0)


def epoch_batches(index: np.ndarray, batch_size: int, rng=None):
    """Yield shuffled fixed-size index batches for one epoch.

    Fixed batch shapes keep a single jit cache entry; the remainder is
    dropped (reference DataLoader ``drop_last`` effect).  When fewer rows
    than ``batch_size`` exist the permuted rows are tiled up to one full
    batch so tiny debug datasets still train.
    """
    index = np.asarray(index)
    n = len(index)
    order = rng.permutation(n) if rng is not None else np.arange(n)
    nb = n // batch_size
    if nb == 0:
        reps = -(-batch_size // max(n, 1))
        yield index[np.tile(order, reps)[:batch_size]]
        return
    for b in range(nb):
        yield index[order[b * batch_size : (b + 1) * batch_size]]


def weighted_epoch_batches(index: np.ndarray, batch_size: int, rng,
                           weights: np.ndarray):
    """``epoch_batches`` with importance sampling (with replacement).

    Same fixed batch shapes and steps-per-epoch as the uniform sampler;
    rows are drawn with probability proportional to ``weights``.  Used to
    over-sample rare window regimes — e.g. the t0~0 DR windows where the
    inhibitor channel is near zero and otherwise makes up only ~1/91st of
    the training distribution (see RESULTS.md, v-channel analysis).
    """
    index = np.asarray(index)
    n = len(index)
    p = np.asarray(weights, np.float64)
    p = p / p.sum()
    nb = max(n // batch_size, 1)
    draws = rng.choice(n, size=nb * batch_size, replace=True, p=p)
    for b in range(nb):
        yield index[draws[b * batch_size : (b + 1) * batch_size]]
