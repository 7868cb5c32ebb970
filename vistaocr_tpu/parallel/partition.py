"""Batch-axis SPMD partitioning for Pallas kernels — makes DP first-class
on the fused fast path (SURVEY.md §2 parallelism table).

``pallas_call`` lowers to an opaque custom call that XLA's partitioner
cannot see into: with batch-sharded operands GSPMD all-gathers the full
batch to every device, runs the kernel replicated, and slices the result
— numerically correct, but DP scaling silently forfeited (measured: four
all-gathers wrapped the CTC kernel on an 8-device mesh before this fix).

Every kernel in ops/ is batch-parallel — per-sample recursions with at
most one cross-batch output (the LSTM's hidden-weight gradient, a sum
over samples). That makes the right tool jax.experimental's
``custom_partitioning`` with an einsum-style Shardy rule:

- each device runs the kernel on its LOCAL batch shard (the lower_fn);
- batch-summed outputs are ``psum``'d over the batch mesh axes inside the
  lower_fn and declared replicated;
- operands/results are pinned to "batch dim sharded, everything else
  replicated", so the partitioner inserts at most a cheap resharding of
  the inputs, never a full-batch gather.

The wrapper is transparent on an unsharded (single-device or replicated)
program: with no batch sharding the lower_fn is the kernel itself.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _parse_rule(rule: str) -> Tuple[list, list]:
    ins, outs = rule.split("->")
    parse = lambda side: [  # noqa: E731
        tuple(term.split()) for term in side.split(",")
    ]
    return parse(ins), parse(outs)


def batch_partitioned(
    fn: Callable,
    rule: str,
    *,
    batch: str = "b",
    reduced_outputs: Sequence[int] = (),
):
    """Wrap batch-parallel ``fn`` for SPMD partitioning along ``batch``.

    ``rule`` is an einsum-style factor rule, e.g.
    ``"t b s, t u b, b s, b s -> t b s"`` — one term per operand/result,
    whitespace-separated factor names per dimension. The ``batch`` factor
    is the only partitioned one; all other dims stay replicated.

    ``reduced_outputs``: indices of outputs that are SUMS over the batch
    (the partition lower_fn psums them across the batch mesh axes and they
    are declared replicated).
    """
    in_terms, out_terms = _parse_rule(rule)
    reduced = frozenset(reduced_outputs)

    def batch_axes_of(arg_shapes) -> tuple:
        """Mesh axes the batch factor is sharded over (from the first
        batch-carrying operand with a non-trivial spec at that dim)."""
        for s, term in zip(arg_shapes, in_terms):
            if batch not in term:
                continue
            d = term.index(batch)
            spec = s.sharding.spec
            if d < len(spec) and spec[d] is not None:
                ax = spec[d]
                return tuple(ax) if isinstance(ax, tuple) else (ax,)
        return ()

    def sharding_for(mesh, term, axes, *, is_reduced=False):
        if is_reduced or not axes:
            return NamedSharding(mesh, P(*([None] * len(term))))
        return NamedSharding(
            mesh, P(*[axes if f == batch else None for f in term])
        )

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        axes = batch_axes_of(arg_shapes)
        shardings = [
            sharding_for(mesh, t, axes, is_reduced=(i in reduced))
            for i, t in enumerate(out_terms)
        ]
        if isinstance(result_shape, (list, tuple)):
            return type(result_shape)(shardings)
        return shardings[0]

    def partition(mesh, arg_shapes, result_shape):
        axes = batch_axes_of(arg_shapes)
        arg_shardings = tuple(
            sharding_for(mesh, t, axes) for t in in_terms
        )
        res_list = [
            sharding_for(mesh, t, axes, is_reduced=(i in reduced))
            for i, t in enumerate(out_terms)
        ]

        def lower_fn(*args):
            out = fn(*args)
            if reduced and axes:
                multi = isinstance(out, (list, tuple))
                outs = list(out) if multi else [out]
                for i in reduced:
                    outs[i] = jax.lax.psum(outs[i], axes)
                out = type(out)(outs) if multi else outs[0]
            return out

        if isinstance(result_shape, (list, tuple)):
            result_shardings = type(result_shape)(res_list)
        else:
            result_shardings = res_list[0]
        return mesh, lower_fn, result_shardings, arg_shardings

    wrapped = custom_partitioning(fn)
    wrapped.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=rule,
    )
    return wrapped
