"""Compile gate expressions into a scanned instruction program on device.

The reference's halo2 backend compiles gate expressions into a flat list of
calculations evaluated row-parallel (halo2 `poly::evaluator`); the MockProver
evaluates every gate on every row in a Rust loop (SURVEY.md §3.1 "HOT LOOP").
Here we do the TPU-native version of the same idea: expressions are CSE'd into
a static SSA program (one instruction per unique node), executed by a
``lax.scan`` VM whose body contains each field op ONCE — so the XLA graph size
is constant in circuit complexity, while every instruction is vectorized over
all rows (the row axis rides the TPU lanes).

Shared between the MockProver's gate check and the real prover's quotient
evaluation (rot_scale handles extended-domain rotations).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..jitutil import tuned_jit

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

# VM opcodes
_ADD, _MUL, _NEG = 0, 1, 2


class Program:
    """A compiled expression set: query table + constants + instructions."""

    def __init__(self, exprs, rot_scale: int = 1):
        self.rot_scale = rot_scale
        self.queries: list[tuple[str, int, int]] = []  # (kind, col_index, rotation)
        self._query_ids: dict = {}
        self.consts: list[int] = []
        self._const_ids: dict = {}
        # instructions hold symbolic refs; slots are resolved once the query
        # and constant tables stop growing (a ref's numeric slot depends on
        # the FINAL table sizes)
        self._sym_instrs: list[tuple[int, tuple, tuple]] = []
        self._node_ids: dict = {}
        self._out_refs = [self._visit(e) for e in exprs]
        self.instrs = [
            (op, self._slot(a), self._slot(b)) for op, a, b in self._sym_instrs
        ]

    def _query_slot(self, key) -> int:
        idx = self._query_ids.get(key)
        if idx is None:
            idx = len(self.queries)
            self._query_ids[key] = idx
            self.queries.append(key)
        return idx

    def _const_slot(self, v: int) -> int:
        idx = self._const_ids.get(v)
        if idx is None:
            idx = len(self.consts)
            self._const_ids[v] = idx
            self.consts.append(v)
        return idx

    def _emit(self, op: int, r1: tuple, r2: tuple) -> int:
        self._sym_instrs.append((op, r1, r2))
        return len(self._sym_instrs) - 1

    def _visit(self, e: Expression) -> tuple[str, int]:
        """Returns ('q'|'c'|'i', index)."""
        key = e
        hit = self._node_ids.get(key)
        if hit is not None:
            return hit
        if isinstance(e, Constant):
            out = ("c", self._const_slot(int(e.value)))
        elif isinstance(e, Query):
            out = ("q", self._query_slot((e.column.kind.value, e.column.index, e.rotation.value)))
        elif isinstance(e, SelectorExpr):
            out = ("q", self._query_slot(("selector", e.selector.index, 0)))
        elif isinstance(e, Sum):
            out = ("i", self._emit(_ADD, self._visit(e.a), self._visit(e.b)))
        elif isinstance(e, Product):
            out = ("i", self._emit(_MUL, self._visit(e.a), self._visit(e.b)))
        elif isinstance(e, Negated):
            r1 = self._visit(e.a)
            out = ("i", self._emit(_NEG, r1, r1))
        elif isinstance(e, Scaled):
            r1 = self._visit(e.a)
            r2 = ("c", self._const_slot(int(e.scale)))
            out = ("i", self._emit(_MUL, r1, r2))
        else:
            raise TypeError(f"unknown expression node {type(e)}")
        self._node_ids[key] = out
        return out

    def _slot(self, ref) -> int:
        tag, idx = ref
        if tag == "q":
            return idx
        if tag == "c":
            return len(self.queries) + idx
        return len(self.queries) + len(self.consts) + idx

    def output_slots(self) -> list[int]:
        return [self._slot(r) for r in self._out_refs]


def _run_program(prog: Program, df: DeviceField, columns: dict):
    """Execute the program; returns (num_outputs, L, n) Montgomery arrays."""
    n = None
    for v in columns.values():
        if v.ndim == 3 and v.shape[0] > 0:
            n = v.shape[-1]
            break
    assert n is not None, "no columns to evaluate over"

    # pre-rolled query tensor (Q, L, n)
    qs = []
    for kind, ci, rot in prog.queries:
        arr = columns[kind][ci]
        r = rot * prog.rot_scale
        qs.append(jnp.roll(arr, -r, axis=-1) if r else arr)
    # constants, broadcast over rows (C, L, n)
    cs = [jnp.broadcast_to(df.encode_scalar(v)[:, None], (16, n)) for v in prog.consts]

    base = jnp.stack(qs + cs) if (qs or cs) else jnp.zeros((0, 16, n), jnp.uint32)
    nq_c = base.shape[0]
    buf0 = jnp.concatenate(
        [base, jnp.zeros((len(prog.instrs), 16, n), jnp.uint32)], axis=0
    )

    instr_arr = jnp.asarray(
        np.array(
            [(op, s1, s2, nq_c + i) for i, (op, s1, s2) in enumerate(prog.instrs)],
            np.int32,
        ).reshape(len(prog.instrs), 4)
    )

    def body(buf, instr):
        op, s1, s2, dst = instr[0], instr[1], instr[2], instr[3]
        a = jax.lax.dynamic_index_in_dim(buf, s1, 0, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(buf, s2, 0, keepdims=False)
        r = jax.lax.switch(
            op,
            [lambda a, b: df.add(a, b), lambda a, b: df.mul(a, b), lambda a, b: df.neg(a)],
            a,
            b,
        )
        return jax.lax.dynamic_update_index_in_dim(buf, r, dst, 0), None

    if len(prog.instrs):
        buf, _ = jax.lax.scan(body, buf0, instr_arr)
    else:
        buf = buf0
    return buf[jnp.asarray(np.array(prog.output_slots(), np.int32))]


def encode_columns(df: DeviceField, finalized) -> dict:
    """Materialized host columns -> device Montgomery tensors."""

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


# jitted programs cached by (expression structure, field, rot_scale) so
# repeated runs of the same circuit shape reuse the compiled XLA executable
_CHECKER_CACHE: dict = {}


def build_gate_checker(cs, df: DeviceField):
    """Returns (jitted_fn, meta): fn(columns) -> (C, n) bool nonzero-mask."""
    meta = []
    exprs = []
    for gi, gate in enumerate(cs.gates):
        for ci, c in enumerate(gate.constraints):
            meta.append((gi, ci))
            exprs.append(c)

    key = ("gates", tuple(exprs), df.spec.name)
    cached = _CHECKER_CACHE.get(key)
    if cached is not None:
        return cached, meta

    prog = Program(exprs)

    def fn(columns):
        if not exprs:
            return jnp.zeros((0, 1), bool)
        outs = _run_program(prog, df, columns)
        return ~jnp.all(outs == 0, axis=1)  # (C, n) nonzero mask

    jfn = tuned_jit(fn)
    _CHECKER_CACHE[key] = jfn
    return jfn, meta


def build_expr_batch_eval(cs, df: DeviceField, exprs, rot_scale: int = 1):
    """Jitted evaluation of arbitrary expressions -> (len(exprs), L, n)."""
    key = ("batch", tuple(exprs), df.spec.name, rot_scale)
    cached = _CHECKER_CACHE.get(key)
    if cached is not None:
        return cached

    prog = Program(exprs, rot_scale=rot_scale)

    def fn(columns):
        return _run_program(prog, df, columns)

    jfn = tuned_jit(fn)
    _CHECKER_CACHE[key] = jfn
    return jfn
