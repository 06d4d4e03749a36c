"""GSPMD partitioning rules for the fused Pallas kernels.

``pallas_call`` lowers to a Mosaic custom call with NO SPMD partitioning
rule: under a >1-device mesh the XLA/Shardy partitioner replicates it, so
every device runs the kernel on the FULL gathered batch — silently negating
lineout data parallelism for exactly the hot ops the kernels accelerate
(the reason round 3 first gated Pallas off for multi-device 1D fit meshes).

``batch0_partitioned`` closes that hole with
``jax.experimental.custom_partitioning``: the wrapped kernel declares that
the leading (batch) dimension of its batched operands and results shards
together, and its per-shard lowering is simply the same kernel on the local
shard (the batch axis is the kernel's outer grid dimension, so a smaller
grid is the natural local program).  No collectives are needed: every
batched-kernel invocation in this codebase is batch-local — per-lineout
tables, per-lineout queries, per-lineout cotangents.

Equivalence (sharded == unsharded, bit-exact, forward and both cotangent
kernels) is pinned on an 8-virtual-device CPU mesh in
``tests/test_parallel/test_sharding.py`` (interpret mode — the partitioning
machinery is backend-independent; Mosaic compilation of the local program
is the single-device path already exercised on the chip).
"""

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

import jax
from jax import lax


def axis_partitioned(fn, arg_dims, out_dims, rule, static_argnums=(), psum_outs=()):
    """Wrap ``fn`` with a single-shared-axis GSPMD partitioning rule.

    Generalizes ``batch0_partitioned`` to an arbitrary sharded dim per
    operand plus reduced outputs: the ARTS bilinear kernel shards its QUERY
    axis (dim 1 of [B, Q] operands) while its backward's table cotangent
    [B, R, C] sums contributions from every query shard — the per-shard
    lowering runs the kernel on the local queries and ``lax.psum``s that
    output over the mesh axis (legal here: custom_partitioning lowers the
    supplied function in a fully-manual SPMD context, jax/_src/
    custom_partitioning.py:193-200).

    Args:
      fn: the wrapped function; must be shape-polymorphic in the sharded dim.
      arg_dims: per DYNAMIC positional arg, the dim index that shards (None
        = replicated operand).
      out_dims: per (flat) result, the dim index that shards (None =
        replicated result).
      rule: Shardy einsum-like sharding rule for the dynamic args.
      static_argnums: positions (in ``fn``'s full signature) of static args.
      psum_outs: indices into the flat results that the per-shard lowering
        must all-reduce over the sharded mesh axis (their ``out_dims`` entry
        should be None).

    Returns a callable with ``fn``'s signature; with no sharded operands it
    degrades to ``fn`` itself.
    """
    cp = custom_partitioning(fn, static_argnums=static_argnums)

    def partition(*pargs):
        static_args = pargs[: len(pargs) - 3]
        mesh, arg_shapes, result_shape = pargs[-3:]

        axis = None
        for s, d in zip(arg_shapes, arg_dims):
            if d is not None:
                spec = s.sharding.spec
                if len(spec) > d and spec[d] is not None:
                    axis = spec[d]
                    break

        def mk(s, d):
            nd = len(s.shape)
            if d is not None and axis is not None:
                spec = [None] * nd
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
            return NamedSharding(mesh, P())

        arg_sh = tuple(mk(s, d) for s, d in zip(arg_shapes, arg_dims))
        flat_res, treedef = jax.tree.flatten(result_shape)
        res_sh = jax.tree.unflatten(
            treedef, [mk(s, d) for s, d in zip(flat_res, out_dims)]
        )

        def lower_fn(*dyn_args):
            it = iter(dyn_args)
            sts = iter(static_args)
            n_total = len(dyn_args) + len(static_args)
            full = [
                next(sts) if i in static_argnums else next(it) for i in range(n_total)
            ]
            outs = fn(*full)
            if axis is not None and psum_outs:
                flat, tdef = jax.tree.flatten(outs)
                for i in psum_outs:
                    flat[i] = lax.psum(flat[i], axis)
                outs = jax.tree.unflatten(tdef, flat)
            return outs

        return mesh, lower_fn, res_sh, arg_sh

    cp.def_partition(partition=partition, sharding_rule=rule)
    return cp


def batch0_partitioned(fn, arg_batched, rule, static_argnums=()):
    """Wrap ``fn`` with a leading-batch-dim GSPMD partitioning rule.

    Args:
      fn: a batched function; every batched operand/result has the batch on
        dim 0, and ``fn`` must be shape-polymorphic in that dim (pallas grid
        dims are).
      arg_batched: tuple of bools over the DYNAMIC (non-static) positional
        args in order — True for operands whose dim 0 is the batch.
      rule: Shardy einsum-like sharding rule string for the dynamic args,
        e.g. ``"b q, b c k, m -> b q, b q"``; the shared factor ``b`` is the
        batch dimension.
      static_argnums: positions (in ``fn``'s full signature) of static
        (hashable, non-array) args.

    Returns a callable with ``fn``'s signature.  With no sharded operands it
    degrades to ``fn`` itself; under a mesh, each device runs ``fn`` on its
    dim-0 shard.
    """
    cp = custom_partitioning(fn, static_argnums=static_argnums)

    def partition(*pargs):
        # jax calls this as partition(*static_args, mesh, arg_shapes, result_shape)
        static_args = pargs[: len(pargs) - 3]
        mesh, arg_shapes, result_shape = pargs[-3:]

        # The batch axis: whatever the propagator already put on dim 0 of a
        # batched operand.  All batched operands and results are then FORCED
        # to that same dim-0 sharding (replicated elsewhere) so the local
        # shapes the per-shard lowering sees are consistent — the propagator
        # may legitimately suggest mixed shardings (e.g. queries sharded,
        # tables replicated), which would hand the kernel a mismatched grid.
        axis = None
        for s, b in zip(arg_shapes, arg_batched):
            if b:
                spec = s.sharding.spec
                if len(spec) and spec[0] is not None:
                    axis = spec[0]
                    break

        def mk(s, batched):
            nd = len(s.shape)
            if batched and axis is not None:
                return NamedSharding(mesh, P(axis, *([None] * (nd - 1))))
            return NamedSharding(mesh, P())

        arg_sh = tuple(mk(s, b) for s, b in zip(arg_shapes, arg_batched))
        flat_res, treedef = jax.tree.flatten(result_shape)
        res_sh = jax.tree.unflatten(treedef, [mk(s, True) for s in flat_res])

        def lower_fn(*dyn_args):
            # reinsert the static args at their original positions
            it = iter(dyn_args)
            sts = iter(static_args)
            n_total = len(dyn_args) + len(static_args)
            full = [
                next(sts) if i in static_argnums else next(it) for i in range(n_total)
            ]
            return fn(*full)

        return mesh, lower_fn, res_sh, arg_sh

    cp.def_partition(partition=partition, sharding_rule=rule)
    return cp
