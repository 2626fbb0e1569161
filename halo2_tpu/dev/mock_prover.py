"""MockProver — the constraint-satisfaction test oracle (halo2 `dev::MockProver`).

Runs synthesis on the host, then checks (a) every gate constraint on every
usable row as ONE jitted device program over limb-vectorized columns, (b) the
permutation (copy) cycles, (c) lookup multiset inclusion — returning the same
structured failures the reference tests assert on (SURVEY.md §4).

Usage mirrors the reference test pattern (e.g. src/circuits/hash_v1.rs:43-55):

    prover = MockProver.run(k, circuit, [public_inputs], F=Fp)
    assert prover.verify() == []          # `assert_eq!(prover.verify(), Ok(()))`
    prover.assert_satisfied()             # panics with a report on failure
"""

from __future__ import annotations

import numpy as np

from ..field.device import get_device_field
from ..field.host import PrimeField
from ..plonkish.assignment import run_synthesis
from ..plonkish.column import Column, ColumnKind
from ..plonkish.evaluator import build_gate_checker, build_expr_batch_eval, encode_columns
from .failures import (
    ConstraintNotSatisfied,
    InRegion,
    Lookup,
    OutsideRegion,
    Permutation,
)


class MockProver:
    def __init__(self, cs, assignment, finalized, F):
        self.cs = cs
        self.assignment = assignment
        self.finalized = finalized
        self.F = F
        self._failures = None

    @classmethod
    def run(cls, k: int, circuit, instances: list, F: type[PrimeField]):
        cs, _config, assignment = run_synthesis(
            circuit, k, instances, witness=True, field=F
        )
        finalized = assignment.finalize()
        return cls(cs, assignment, finalized, F)

    # ------------------------------------------------------------------ checks
    def verify(self) -> list:
        if self._failures is None:
            self._failures = (
                self._check_gates() + self._check_lookups() + self._check_permutation()
            )
        return self._failures

    def assert_satisfied(self):
        failures = self.verify()
        if failures:
            lines = "\n".join(f"  - {f!r}" for f in failures)
            raise AssertionError(f"circuit is not satisfied:\n{lines}")

    # -- gates ---------------------------------------------------------------
    def _check_gates(self):
        df = get_device_field(self.F.SPEC)
        fin = self.finalized
        checker, meta = build_gate_checker(self.cs, df)
        columns = encode_columns(df, fin)
        mask = np.asarray(checker(columns))  # (C, n) bool
        failures = []
        usable = fin.usable_rows
        for (gi, ci), row_mask in zip(meta, mask):
            gate = self.cs.gates[gi]
            cols = [c for c, _ in gate.constraints[ci].queried_columns() if isinstance(c, Column)]
            for row in np.nonzero(row_mask[:usable])[0]:
                failures.append(
                    ConstraintNotSatisfied(
                        gi,
                        gate.name,
                        ci,
                        gate.constraint_names[ci],
                        self._locate(cols, int(row)),
                    )
                )
        return failures

    def _locate(self, columns, row: int):
        for col in columns:
            loc = self.finalized.locate(col, row)
            if loc is not None:
                return InRegion(*loc)
        return OutsideRegion(row)

    # -- permutation ---------------------------------------------------------
    def _check_permutation(self):
        fin = self.finalized
        cols = self.cs.permutation_columns
        usable = fin.usable_rows
        index = {c: i for i, c in enumerate(cols)}

        # build cycle next-pointers exactly like halo2 permutation keygen
        mapping = {}
        aux = {}
        sizes = {}

        def find(x):
            root = x
            while aux.get(root, root) != root:
                root = aux[root]
            while aux.get(x, x) != x:
                aux[x], x = root, aux[x]
            return root

        for (ka, ca, ra), (kb, cb, rb) in fin.copies:
            a = (ka, ca, ra)
            b = (kb, cb, rb)
            la, lb = find(a), find(b)
            if la == lb:
                continue
            if sizes.get(la, 1) < sizes.get(lb, 1):
                la, lb = lb, la
            sizes[la] = sizes.get(la, 1) + sizes.get(lb, 1)
            aux[lb] = la
            # splice cycles: swap next pointers of the two representatives
            mapping.setdefault(a, a)
            mapping.setdefault(b, b)
            # find actual cycle entry points: use a and b directly
            mapping[a], mapping[b] = mapping[b], mapping[a]

        def value(kind, col, row):
            if kind == ColumnKind.ADVICE:
                return fin.advice[col][row]
            if kind == ColumnKind.FIXED:
                return fin.fixed[col][row]
            return fin.instance[col][row]

        failures = []
        for col in cols:
            for row in range(usable):
                cell = (col.kind, col.index, row)
                nxt = mapping.get(cell)
                if nxt is None or nxt == cell:
                    continue
                if value(*cell) != value(*nxt):
                    failures.append(
                        Permutation(
                            (col.kind.value, col.index),
                            self._locate([col], row)
                            if col.kind != ColumnKind.INSTANCE
                            else OutsideRegion(row),
                        )
                    )
        return failures

    # -- lookups -------------------------------------------------------------
    def _check_lookups(self):
        if not self.cs.lookups:
            return []
        df = get_device_field(self.F.SPEC)
        fin = self.finalized
        columns = encode_columns(df, fin)
        usable = fin.usable_rows
        failures = []
        for li, lk in enumerate(self.cs.lookups):
            exprs = [e for pair in lk.pairs for e in pair]
            ev = build_expr_batch_eval(self.cs, df, exprs)
            vals = ev(columns)  # (2*pairs, L, n) Montgomery — compare raw limbs
            vals = np.asarray(vals)
            npairs = len(lk.pairs)
            inputs = vals[0::2][:, :, :usable]  # (pairs, L, usable)
            tables = vals[1::2][:, :, :usable]
            # pack rows into byte tuples for set membership
            inp_rows = inputs.transpose(2, 0, 1).reshape(usable, -1)
            tab_rows = tables.transpose(2, 0, 1).reshape(usable, -1)
            table_set = {r.tobytes() for r in tab_rows}
            for row in range(usable):
                if inp_rows[row].tobytes() not in table_set:
                    in_cols = [
                        c
                        for pair in lk.pairs
                        for c, _ in pair[0].queried_columns()
                        if isinstance(c, Column)
                    ]
                    failures.append(Lookup(li, lk.name, self._locate(in_cols, row)))
        return failures
