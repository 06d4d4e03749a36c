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
grid is the natural local program).  No collectives are needed there: every
batched-kernel invocation in this codebase is batch-local — per-lineout
tables, per-lineout queries, per-lineout cotangents.  ``axis_partitioned``
generalizes to an arbitrary sharded dim per operand plus psum-reduced
outputs (the ARTS bilinear kernel's query axis).

Equivalence (sharded == unsharded to bf16-accumulation roundoff — CPU gemm
accumulation order is shape- and compile-dependent, so interpret mode is
NOT bit-exact; see the tolerance notes in the tests) is pinned on an
8-virtual-device CPU mesh in ``tests/test_parallel/test_sharding.py``
(interpret mode — the partitioning machinery is backend-independent; Mosaic
compilation of the local program is the single-device path already
exercised on the chip).
"""

import warnings

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

import jax
from jax import lax

# custom_partitioning embeds its process-local callback POINTER in the lowered
# HLO, which poisons the persistent compile cache: every process computes a
# different cache key for the same program, so the minutes-long axon remote
# compile re-runs on every CLI invocation (observed: four distinct
# jit_run_chunk cache entries for two identical runs).  This flag strips the
# pointer from the key — safe here because the partition callbacks are pure
# functions of the program.  Set where the pointer enters the HLO (this module
# wraps every kernel that carries a GSPMD rule).
jax.config.update("jax_remove_custom_partitioning_ptr_from_cache_key", True)


def axis_partitioned(fn, arg_dims, out_dims, rule, static_argnums=(), psum_outs=()):
    """Wrap ``fn`` with a single-shared-axis GSPMD partitioning rule.

    The sharded axis may sit at a different dim per operand, and outputs
    that REDUCE over it are supported: the ARTS bilinear kernel shards its
    QUERY axis (dim 1 of [B, Q] operands) while its backward's table
    cotangent [B, R, C] sums contributions from every query shard — the
    per-shard lowering runs the kernel on the local queries and
    ``lax.psum``s that output over the mesh axis (legal here:
    custom_partitioning lowers the supplied function in a fully-manual SPMD
    context, jax/_src/custom_partitioning.py:193-200).

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
    degrades to ``fn`` itself (with a warning under a >1-device mesh — a
    replicated kernel there means the batch sharding failed to propagate
    and every device is doing the full work).
    """
    cp = custom_partitioning(fn, static_argnums=static_argnums)

    def partition(*pargs):
        # jax calls this as partition(*static_args, mesh, arg_shapes, result_shape)
        static_args = pargs[: len(pargs) - 3]
        mesh, arg_shapes, result_shape = pargs[-3:]

        # The sharded axis: whatever the propagator already put on the
        # declared dim of a shardable operand.  Every shardable operand and
        # result is then FORCED to that axis (replicated elsewhere) so the
        # local shapes the per-shard lowering sees are consistent — the
        # propagator may legitimately suggest mixed shardings (e.g. queries
        # sharded, tables replicated), which would hand the kernel a
        # mismatched grid.
        axis = None
        for s, d in zip(arg_shapes, arg_dims):
            if d is not None:
                spec = s.sharding.spec
                if len(spec) > d and spec[d] is not None:
                    axis = spec[d]
                    break
        if axis is None and mesh.size > 1:
            # Correct but silently serial: each device would run the kernel
            # on the full data.  Observable so a propagation failure on a
            # real multi-chip topology doesn't masquerade as a slow fit
            # (fallback: optimizer.pallas_sharded: false).
            warnings.warn(
                f"custom-partitioned kernel {getattr(fn, '__name__', fn)!r} "
                f"lowered REPLICATED under a {mesh.size}-device mesh: no "
                "operand arrived with its shardable dim sharded, so every "
                "device runs the full kernel.",
                stacklevel=2,
            )

        def mk(s, d):
            nd = len(s.shape)
            if d is not None and axis is not None:
                spec = [None] * nd
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
            return NamedSharding(mesh, P())

        arg_sh = tuple(mk(s, d) for s, d in zip(arg_shapes, arg_dims))
        flat_res, treedef = jax.tree.flatten(result_shape)
        od = out_dims if out_dims is not None else (0,) * len(flat_res)
        res_sh = jax.tree.unflatten(treedef, [mk(s, d) for s, d in zip(flat_res, od)])

        def lower_fn(*dyn_args):
            # reinsert the static args at their original positions
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

    The special case of ``axis_partitioned`` where every batched operand and
    every result shards on dim 0 and nothing reduces across shards.

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
    arg_dims = tuple(0 if b else None for b in arg_batched)
    # out_dims=None -> "all results shard on dim 0" (the result count is only
    # known at partition time)
    return axis_partitioned(fn, arg_dims, None, rule, static_argnums=static_argnums)
