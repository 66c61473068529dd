"""Multi-chip MSM: points/scalars sharded, one point exchanged per chip.

TPU-native scale-out of the Pippenger kernel (SURVEY.md §2.6: "sharded
MSM (points/scalars partitioned, bucket sums reduced ... over ICI)").
Design: each chip runs the full windowed kernel on its local slice of
the point axis (embarrassingly parallel -- the expensive part), then the
per-chip partial results (ONE projective point each, ~3 KiB) are
all-gathered and folded with the complete point-add.  Communication is
O(chips), independent of N.

Works over 1-D ('shards') meshes and 2-D (host, chip) meshes from
parallel.mesh.make_host_mesh: pass the axis name(s) the point dimension
is sharded over; the final fold's all-gather then spans ICI within a
host and DCN across hosts -- ~3 KiB per chip either way.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ec import jaxcurve as JC
from ..msm.pippenger import msm


def _axis_size(mesh, axis) -> int:
    if isinstance(axis, str):
        return mesh.shape[axis]
    n = 1
    for a in axis:
        n *= mesh.shape[a]
    return n


def sharded_msm(mesh, f, points, scalars, c: int = 8, axis="shards"):
    """MSM with the point axis sharded over `mesh`.

    points: projective pytree (N, ...); scalars (N, 16) plain limbs.
    axis: mesh axis name, or tuple of names for multi-axis (host, chip)
    sharding.  N must be divisible by the total shard count.  Returns a
    replicated point.
    """
    n_shards = _axis_size(mesh, axis)
    n = jax.tree.leaves(points)[0].shape[0]
    if n % n_shards:
        raise ValueError(f"point count {n} not divisible by {n_shards} shards")

    point_spec = (P(axis),) * 3

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(point_spec, P(axis)),
        out_specs=(P(),) * 3,
        # the windowed kernel mixes replicated constants (infinity inits)
        # with sharded data inside fori_loop carries; skip the
        # varying-manual-axes type check, correctness is covered by tests
        check_vma=False,
    )
    def body(pts_local, scal_local):
        part = msm(f, pts_local, scal_local, c)
        parts = jax.tree.map(lambda a: lax.all_gather(a, axis), part)
        if not isinstance(axis, str):
            # multi-axis gather stacks one axis per name; flatten
            parts = jax.tree.map(
                lambda a: a.reshape((n_shards,) + a.shape[len(axis):]), parts
            )

        def fold(i, acc):
            p_i = jax.tree.map(lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False), parts)
            return JC.point_add(f, acc, p_i)

        return lax.fori_loop(0, n_shards, fold, JC.point_infinity(f))

    return body(points, scalars)
