"""Minimal pytree-module infrastructure (equinox-equivalent semantics).

The reference builds its parameter system on ``equinox.Module`` with
``eqx.partition/combine`` and boolean filter-spec pytrees
(``/root/reference/tsadar/core/modules/ts_params.py:648-685``).  equinox is not a
dependency here; this module provides the same capabilities on top of plain
dataclasses registered with ``jax.tree_util.register_dataclass``:

* ``@module`` — dataclass decorator; fields marked ``static_field()`` become pytree
  metadata (hashable, part of treedef), everything else is a child.
* ``partition(tree, spec)`` / ``combine(a, b)`` — split a pytree into trainable and
  frozen halves using a boolean pytree (None marks holes, as in equinox).
* ``filter_spec_by_path(tree, pred)`` — build a boolean spec by predicate over
  ``jax.tree_util`` key paths, which replaces equinox's ``tree_at`` surgery with
  declarative path matching.
"""

import dataclasses

import jax
from jax import tree_util as jtu


def static_field(**kwargs):
    """Mark a dataclass field as pytree metadata (not traced, must be hashable)."""
    metadata = dict(kwargs.pop("metadata", None) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def module(cls):
    """Register a class as a frozen-ish dataclass pytree node."""
    cls = dataclasses.dataclass(cls)
    data_fields = [f.name for f in dataclasses.fields(cls) if not f.metadata.get("static", False)]
    meta_fields = [f.name for f in dataclasses.fields(cls) if f.metadata.get("static", False)]
    return jtu.register_dataclass(cls, data_fields=data_fields, meta_fields=meta_fields)


def _is_none(x):
    return x is None


def partition(tree, filter_spec):
    """Split ``tree`` into (selected, rest) by a boolean pytree of identical structure."""
    diff = jtu.tree_map(lambda leaf, keep: leaf if keep else None, tree, filter_spec)
    static = jtu.tree_map(lambda leaf, keep: None if keep else leaf, tree, filter_spec)
    return diff, static


def combine(first, second):
    """Merge two partitioned pytrees; leaves of ``first`` win where not None."""
    return jtu.tree_map(
        lambda a, b: b if a is None else a, first, second, is_leaf=_is_none
    )


def filter_spec_by_path(tree, pred):
    """Boolean filter spec: ``pred(path_names, leaf) -> bool`` per leaf.

    ``path_names`` is a tuple of strings/ints: attribute names for dataclass
    fields, indices for sequences, keys for dicts.
    """

    def name_of(entry):
        if isinstance(entry, jtu.GetAttrKey):
            return entry.name
        if isinstance(entry, jtu.SequenceKey):
            return entry.idx
        if isinstance(entry, (jtu.DictKey, jtu.FlattenedIndexKey)):
            return getattr(entry, "key", getattr(entry, "index", None))
        return str(entry)

    return jtu.tree_map_with_path(
        lambda path, leaf: bool(pred(tuple(name_of(p) for p in path), leaf)), tree
    )


def tree_false_like(tree):
    return jtu.tree_map(lambda _: False, tree)


def apply_updates(params, updates):
    """Gradient-descent style update on a partitioned (None-holed) pytree."""
    return jtu.tree_map(
        lambda p, u: p if u is None else p + u, params, updates, is_leaf=_is_none
    )
