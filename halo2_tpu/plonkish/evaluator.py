"""Compile gate expressions into vectorized device programs.

The reference's MockProver evaluates every gate expression on every row in a
Rust loop (SURVEY.md §3.1 "HOT LOOP"); here the whole (constraints × rows)
check is a single jitted XLA program over limb-decomposed Montgomery columns,
shared between the MockProver and the real prover's quotient evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..field.device import DeviceField
from .column import ColumnKind
from .expression import (
    Constant,
    Expression,
    Negated,
    Product,
    Query,
    Scaled,
    SelectorExpr,
    Sum,
)


class ExprCompiler:
    """Evaluates an expression DAG over column tensors.

    `columns` maps: ColumnKind -> (num_cols, L, n) array, plus "selector".
    Rotation r at row i reads row (i + r) mod n, matching halo2's wrap-around
    rotations in the evaluation domain.
    """

    def __init__(self, df: DeviceField, columns: dict, rot_scale: int = 1):
        self.df = df
        self.columns = columns
        self.rot_scale = rot_scale  # rotations scale on extended domains
        self._memo: dict = {}

    def eval(self, expr: Expression):
        key = expr
        hit = self._memo.get(key)
        if hit is not None:
            return hit
        out = self._eval(expr)
        self._memo[key] = out
        return out

    def _n(self):
        return next(iter(self.columns.values())).shape[-1]

    def _eval(self, e: Expression):
        df = self.df
        if isinstance(e, Constant):
            return df.encode_scalar(int(e.value))[:, None]  # (L, 1) broadcasts over n
        if isinstance(e, Query):
            arr = self.columns[e.column.kind.value][e.column.index]
            r = e.rotation.value * self.rot_scale
            return jnp.roll(arr, -r, axis=-1) if r else arr
        if isinstance(e, SelectorExpr):
            return self.columns["selector"][e.selector.index]
        if isinstance(e, Sum):
            return df.add(self.eval(e.a), self.eval(e.b))
        if isinstance(e, Product):
            return df.mul(self.eval(e.a), self.eval(e.b))
        if isinstance(e, Negated):
            return df.neg(self.eval(e.a))
        if isinstance(e, Scaled):
            return df.mul(self.eval(e.a), df.encode_scalar(int(e.scale))[:, None])
        raise TypeError(f"unknown expression node {type(e)}")


def encode_columns(df: DeviceField, finalized) -> dict:
    """Materialized host columns -> device Montgomery tensors."""
    import numpy as np

    def enc(cols):
        if not cols:
            return jnp.zeros((0, 16, finalized.assignment.n), jnp.uint32)
        return jnp.stack([df.encode(c) for c in cols])

    return {
        ColumnKind.ADVICE.value: enc(finalized.advice),
        ColumnKind.FIXED.value: enc(finalized.fixed),
        ColumnKind.INSTANCE.value: enc(finalized.instance),
        "selector": enc(finalized.selectors),
    }


def build_gate_checker(cs, df: DeviceField):
    """Returns (jitted_fn, meta): fn(columns) -> (C, n) bool nonzero-mask."""
    meta = []
    exprs = []
    for gi, gate in enumerate(cs.gates):
        for ci, c in enumerate(gate.constraints):
            meta.append((gi, ci))
            exprs.append(c)

    def fn(columns):
        comp = ExprCompiler(df, columns)
        masks = [~df.is_zero(comp.eval(e)) for e in exprs]
        if not masks:
            return jnp.zeros((0, 1), bool)
        return jnp.stack(masks)

    return jax.jit(fn), meta


def build_expr_batch_eval(cs, df: DeviceField, exprs, rot_scale: int = 1):
    """Jitted evaluation of arbitrary expressions -> (len(exprs), L, n)."""

    def fn(columns):
        comp = ExprCompiler(df, columns, rot_scale=rot_scale)
        n = None
        for v in columns.values():
            if v.ndim == 3 and v.shape[0] > 0:
                n = v.shape[-1]
                break
        outs = []
        for e in exprs:
            r = comp.eval(e)
            if r.shape[-1] == 1 and n is not None:
                r = jnp.broadcast_to(r, r.shape[:-1] + (n,))
            outs.append(r)
        return jnp.stack(outs)

    return jax.jit(fn)
