"""Key generation + protocol structure (halo2 `keygen_vk` / `keygen_pk`).

Builds the pinned proving structure from a circuit's ConstraintSystem:

* query lists — every (column, rotation) referenced by gates/lookups plus a
  Rotation::cur query for every equality-enabled column (as halo2's
  permutation argument adds);
* selector handling — every selector becomes its own fixed polynomial
  (documented divergence from halo2's selector compression: same soundness,
  a few more commitments in the vk);
* the permutation argument's sigma polynomials (delta^i omega^j labels over
  the copy cycles, chunked by degree like halo2) and their commitments;
* the full quotient-polynomial expression list (gates + permutation +
  lookup arguments) over AUX columns, shared verbatim by the device prover
  (instruction-VM over the extended coset) and the host verifier.

Reference parity: SURVEY.md §1.A call-surface; src/circuits/utils.rs:31-36.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..ec import host as ec
from ..field.device import get_device_field
from ..field.params import BN254_FR
from ..plonkish.assignment import run_synthesis
from ..plonkish.column import Column, ColumnKind, Rotation
from ..plonkish.expression import Constant, Expression, Query
from ..poly.domain import EvaluationDomain, get_domain

FR = BN254_FR


# ------------------------------------------------------------------ structure
@dataclasses.dataclass
class AuxLayout:
    """Index map for ColumnKind.AUX columns used in quotient expressions."""

    IDENTITY = 0
    L0 = 1
    L_LAST = 2
    L_BLIND = 3
    BETA = 4
    GAMMA = 5
    THETA = 6
    Y = 7
    PERM_Z_BASE = 8

    def __init__(self, num_perm_chunks: int, num_lookups: int):
        self.num_perm_chunks = num_perm_chunks
        self.num_lookups = num_lookups
        self.lookup_base = self.PERM_Z_BASE + num_perm_chunks

    def perm_z(self, c: int) -> int:
        return self.PERM_Z_BASE + c

    def lookup_permuted_input(self, i: int) -> int:
        return self.lookup_base + 3 * i

    def lookup_permuted_table(self, i: int) -> int:
        return self.lookup_base + 3 * i + 1

    def lookup_z(self, i: int) -> int:
        return self.lookup_base + 3 * i + 2

    @property
    def num_aux(self) -> int:
        return self.lookup_base + 3 * self.num_lookups


def _aux(idx: int, rot: int = 0) -> Expression:
    return Query(Column(ColumnKind.AUX, idx), Rotation(rot))


def _horner(exprs, chal: Expression) -> Expression:
    acc = exprs[0]
    for e in exprs[1:]:
        acc = acc * chal + e
    return acc


class PlonkStructure:
    """Everything derivable from (cs, k) alone."""

    def __init__(self, cs, k: int):
        self.cs = cs
        self.k = k
        self.n = 1 << k
        self.bf = cs.blinding_factors()
        self.u = self.n - (self.bf + 1)  # l_last row; active rows are 0..u-1

        # ---- queries
        adv, fix, sel, inst = {}, {}, {}, {}

        def record(col, rot):
            if isinstance(col, Column):
                d = {
                    ColumnKind.ADVICE: adv,
                    ColumnKind.FIXED: fix,
                    ColumnKind.INSTANCE: inst,
                }[col.kind]
                d.setdefault((col.index, rot.value), None)
            else:  # Selector
                sel.setdefault((col.index, rot.value), None)

        for gate in cs.gates:
            for c in gate.constraints:
                for col, rot in c.queried_columns():
                    record(col, rot)
        for lk in cs.lookups:
            for i_e, t_e in lk.pairs:
                for col, rot in i_e.queried_columns():
                    record(col, rot)
                for col, rot in t_e.queried_columns():
                    record(col, rot)
        for col in cs.permutation_columns:
            record(col, Rotation.cur())

        self.advice_queries = sorted(adv)
        self.fixed_queries = sorted(fix)
        self.selector_queries = sorted(sel)
        self.instance_queries = sorted(inst)

        # ---- permutation chunking (halo2: chunk_len = degree - 2)
        self.degree = max(cs.degree(), 3)
        chunk = max(self.degree - 2, 1)
        cols = list(cs.permutation_columns)
        self.perm_chunks = [cols[i : i + chunk] for i in range(0, len(cols), chunk)]
        self.aux = AuxLayout(len(self.perm_chunks), len(cs.lookups))

        # ---- quotient expressions
        self.quotient_exprs = self._build_quotient_exprs()
        qdeg = max((e.degree() for e in self.quotient_exprs), default=1)
        self.domain: EvaluationDomain = get_domain(FR, k, qdeg)

    # ------------------------------------------------------- quotient exprs
    def _build_quotient_exprs(self):
        aux = self.aux
        exprs: list[Expression] = []
        beta, gamma, theta = _aux(aux.BETA), _aux(aux.GAMMA), _aux(aux.THETA)
        l0, l_last, l_blind = _aux(aux.L0), _aux(aux.L_LAST), _aux(aux.L_BLIND)
        identity = _aux(aux.IDENTITY)
        active = Constant(1) - (l_last + l_blind)
        one = Constant(1)

        # gates
        for gate in self.cs.gates:
            exprs.extend(gate.constraints)

        # permutation argument
        chunks = self.perm_chunks
        if chunks:
            delta = _delta()
            exprs.append(l0 * (one - _aux(aux.perm_z(0))))
            for c in range(1, len(chunks)):
                exprs.append(
                    l0 * (_aux(aux.perm_z(c)) - _aux(aux.perm_z(c - 1), rot=self.u))
                )
            z_last = _aux(aux.perm_z(len(chunks) - 1))
            exprs.append(l_last * (z_last * z_last - z_last))
            global_idx = 0
            for c, cols in enumerate(chunks):
                z = _aux(aux.perm_z(c))
                z_next = _aux(aux.perm_z(c), rot=1)
                left = z_next
                right = z
                for col in cols:
                    v = Query(col, Rotation.cur())
                    sigma = _aux(self._sigma_aux_index(global_idx))
                    left = left * (v + beta * sigma + gamma)
                    right = right * (
                        v + beta * Constant(pow(delta, global_idx, FR.p)) * identity + gamma
                    )
                    global_idx += 1
                exprs.append(active * (left - right))

        # lookup arguments
        for i, lk in enumerate(self.cs.lookups):
            a_comp = _horner([p[0] for p in lk.pairs], theta)
            s_comp = _horner([p[1] for p in lk.pairs], theta)
            ap = _aux(aux.lookup_permuted_input(i))
            ap_prev = _aux(aux.lookup_permuted_input(i), rot=-1)
            sp = _aux(aux.lookup_permuted_table(i))
            z = _aux(aux.lookup_z(i))
            z_next = _aux(aux.lookup_z(i), rot=1)
            exprs.append(l0 * (one - z))
            exprs.append(l_last * (z * z - z))
            exprs.append(
                active
                * (z_next * (ap + beta) * (sp + gamma) - z * (a_comp + beta) * (s_comp + gamma))
            )
            exprs.append(l0 * (ap - sp))
            exprs.append(active * (ap - sp) * (ap - ap_prev))
        return exprs

    def _sigma_aux_index(self, global_col_idx: int) -> int:
        # sigma polys live after the dynamic aux block
        return self.aux.num_aux + global_col_idx

    def combined_quotient(self) -> Expression:
        """All quotient expressions Horner-folded over the Y aux challenge —
        built once per structure (deep Expression hashing costs ~1 s per
        prove otherwise; profile round 4)."""
        cached = getattr(self, "_combined_quotient", None)
        if cached is None:
            cached = _horner(self.quotient_exprs, _aux(self.aux.Y))
            self._combined_quotient = cached
        return cached

    def quotient_program(self, rot_scale: int):
        """Compiled instruction Program for the combined quotient expression
        (shared by the native expr-VM and cached per structure)."""
        cache = getattr(self, "_quotient_programs", None)
        if cache is None:
            cache = {}
            self._quotient_programs = cache
        if rot_scale not in cache:
            from ..plonkish.evaluator import Program

            cache[rot_scale] = Program([self.combined_quotient()], rot_scale=rot_scale)
        return cache[rot_scale]

    @property
    def num_aux_total(self) -> int:
        return self.aux.num_aux + len(self.cs.permutation_columns)

    # ------------------------------------------------------------ permutation
    def build_sigma_values(self, copies) -> list[list[int]]:
        """Copy pairs -> sigma column values (delta^i omega^j labels)."""
        n, p = self.n, FR.p
        cols = self.cs.permutation_columns
        index = {(c.kind, c.index): i for i, c in enumerate(cols)}
        delta = _delta()
        omega = self.domain.omega

        # next-pointer cycles (same splice as the mock prover)
        mapping = {}
        aux_uf, sizes = {}, {}

        def find(x):
            root = x
            while aux_uf.get(root, root) != root:
                root = aux_uf[root]
            while aux_uf.get(x, x) != x:
                aux_uf[x], x = root, aux_uf[x]
            return root

        for a, b in copies:
            ka = (a[0], a[1])
            kb = (b[0], b[1])
            if ka not in index or kb not in index:
                raise ValueError(f"copy involves non-equality column: {a} {b}")
            ca, cb = (index[ka], a[2]), (index[kb], b[2])
            ra, rb = find(ca), find(cb)
            if ra == rb:
                continue
            if sizes.get(ra, 1) < sizes.get(rb, 1):
                ra, rb = rb, ra
            sizes[ra] = sizes.get(ra, 1) + sizes.get(rb, 1)
            aux_uf[rb] = ra
            mapping.setdefault(ca, ca)
            mapping.setdefault(cb, cb)
            mapping[ca], mapping[cb] = mapping[cb], mapping[ca]

        deltas = [pow(delta, i, p) for i in range(len(cols))]
        omegas = [1] * n
        for j in range(1, n):
            omegas[j] = omegas[j - 1] * omega % p

        sigmas = []
        for i in range(len(cols)):
            col_vals = [deltas[i] * omegas[j] % p for j in range(n)]
            sigmas.append(col_vals)
        for (ci, ri), (cj, rj) in mapping.items():
            sigmas[ci][ri] = deltas[cj] * omegas[rj] % p
        return sigmas


def _delta() -> int:
    """halo2curves DELTA: generator of the 2^S-cosets, g^(2^S)."""
    return pow(FR.generator, 1 << FR.two_adicity, FR.p)


# -------------------------------------------------------------------- keygen
@dataclasses.dataclass
class VerifyingKey:
    k: int
    structure: PlonkStructure
    fixed_commitments: list      # order: fixed columns, then selectors
    sigma_commitments: list
    digest: int                  # transcript seed

    @property
    def cs(self):
        return self.structure.cs


@dataclasses.dataclass
class ProvingKey:
    vk: VerifyingKey
    fixed_values: list           # host ints per fixed column (incl. selectors)
    sigma_values: list
    fixed_coeffs: object         # device (F, 16, n)
    sigma_coeffs: object

    # ------------------------------------------------- persistence (SURVEY §5)
    # The reference rebuilds pk/vk per invocation (src/circuits/utils.rs:31-36);
    # SURVEY.md §5 checkpoint/resume mandates serializing SRS *and* pk/vk —
    # keygen (NTTs + fixed/sigma commitments) is the slowest prover phase.
    # Circuit structure (ConstraintSystem expression DAG) is cheap to rebuild
    # and host-code-versioned, so only the computed artifacts are persisted;
    # ``load`` re-synthesizes the structure and validates k.
    def save(self, path: str):
        import pickle

        import numpy as np

        data = {
            "k": self.vk.k,
            "digest": self.vk.digest,
            "fixed_commitments": [ec.g1_to_ints(p) for p in self.vk.fixed_commitments],
            "sigma_commitments": [ec.g1_to_ints(p) for p in self.vk.sigma_commitments],
            "fixed_values": self.fixed_values,
            "sigma_values": self.sigma_values,
            "fixed_coeffs": np.asarray(self.fixed_coeffs),
            "sigma_coeffs": np.asarray(self.sigma_coeffs),
        }
        with open(path, "wb") as f:
            pickle.dump(data, f)

    @classmethod
    def load(cls, path: str, circuit, k: int, F) -> "ProvingKey":
        import pickle

        with open(path, "rb") as f:
            data = pickle.load(f)
        if data["k"] != k:
            raise ValueError(f"pk cache k={data['k']} != requested k={k}")
        circuit_no_wit = circuit.without_witnesses()
        cs, _cfg, _asn = run_synthesis(circuit_no_wit, k, [], witness=False, field=F)
        structure = PlonkStructure(cs, k)
        vk = VerifyingKey(
            k,
            structure,
            [ec.g1_from_ints(x, y) for x, y in data["fixed_commitments"]],
            [ec.g1_from_ints(x, y) for x, y in data["sigma_commitments"]],
            data["digest"],
        )
        # keep coeffs as HOST numpy: jnp ops upload on dispatch, and the
        # native engine reads them without paying a tunnel device_get
        # (first fetch measured 285 s round 4)
        return cls(
            vk,
            data["fixed_values"],
            data["sigma_values"],
            data["fixed_coeffs"],
            data["sigma_coeffs"],
        )


def commit_lagrange(params, domain: EvaluationDomain, values_host: list) -> object:
    """Commit a column given in Lagrange form: iNTT then MSM."""
    dfr = get_device_field(FR)
    evals = dfr.encode(values_host)
    coeffs = domain.lagrange_to_coeff(evals)
    return commit_coeffs(params, coeffs)


def commit_coeffs(params, coeffs) -> object:
    """coeffs: (16, m) Montgomery device -> host G1 point."""
    return commit_coeffs_batch(params, [coeffs])[0]


def commit_coeffs_batch(params, coeffs_list) -> list:
    """Commit many polys (device (16, m) Montgomery arrays) over the shared
    SRS, preferring the NATIVE C++ Pippenger (halo2_tpu/native): measured
    round 4, the device MSM's first execution through the axon tunnel costs
    ~731 s of backend program load for n=2048 while its steady-state compute
    is 0.033 s — the native engine commits in milliseconds with zero program
    setup (NOTES_ROUND4.md).  Fallbacks: Python-int host MSM on CPU, the
    device Pippenger on TPU (forced via HALO2_TPU_COMMIT_BACKEND=device —
    the right choice only once many same-shape commits amortize the load)."""
    import os

    import jax
    import numpy as np

    from .. import native

    dfr = get_device_field(FR)
    m = coeffs_list[0].shape[-1]
    mode = os.environ.get("HALO2_TPU_COMMIT_BACKEND", "auto")
    if mode != "device" and native.available():
        cached = getattr(params, "_native_srs", None)
        if cached is None:
            cached = (
                native.pack_device(np.asarray(params.g1_x)),
                native.pack_device(np.asarray(params.g1_y)),
            )
            params._native_srs = cached
        px, py = cached[0][:m], cached[1][:m]
        if all(isinstance(c, np.ndarray) for c in coeffs_list):
            stacked = np.stack(coeffs_list)  # (B, 16, m) Montgomery, host
        else:
            # device inputs: ONE stacked fetch (per-array gets pay a tunnel
            # round trip each)
            stacked = np.asarray(jnp.stack(coeffs_list))
        packed = np.stack([native.pack_device(c) for c in stacked])
        canon = native.from_mont(packed.reshape(-1, 4), "fr").reshape(packed.shape)
        return [
            ec.g1_from_ints(x, y)
            for x, y in native.msm_g1_mont_batch(px, py, canon)
        ]
    if jax.default_backend() == "cpu":
        pts = params.g1_host()[:m]
        out = []
        for coeffs in coeffs_list:
            scalars = [int(v) for v in dfr.decode(coeffs)]
            out.append(ec.msm_host(pts, scalars))
        return out
    from ..ec.device import msm_points

    out = []
    for coeffs in coeffs_list:
        canon = dfr.from_mont_arr(coeffs)
        x, y = msm_points(params.g1_x[:, :m], params.g1_y[:, :m], canon)
        out.append(ec.g1_from_ints(x, y))
    return out


def _intt_columns(domain, dfr, values_lists, n):
    """Column value lists -> stacked (F, 16, n) Montgomery coefficient limbs.

    Native C++ NTT when available (host numpy result, no device programs —
    a cold keygen previously paid the tunnel's per-program setup for the
    device iNTT ladder); device NTT otherwise."""
    import numpy as np

    from .. import native

    if not values_lists:
        return np.zeros((0, 16, n), np.uint32)
    if native.available():
        cols = []
        for vals in values_lists:
            c = native.ntt_fr(
                native.pack_ints([int(v) % FR.p for v in vals]), inverse=True
            )
            cols.append(native.unpack_device(native.to_mont(c, "fr")))
        return np.stack(cols)
    return jnp.stack([domain.lagrange_to_coeff(dfr.encode(v)) for v in values_lists])


def _synthesize_columns(circuit, k: int, F):
    """Witness-free synthesis -> (structure, fixed/sigma value lists, coeffs).

    The shared body of keygen_vk / keygen_pk (halo2 runs this synthesis once
    per entry point too — reference src/circuits/utils.rs:31-36)."""
    circuit_no_wit = circuit.without_witnesses()
    cs, _config, assignment = run_synthesis(circuit_no_wit, k, [], witness=False, field=F)
    fin = assignment.finalize()
    structure = PlonkStructure(cs, k)
    dfr = get_device_field(FR)

    fixed_values = [list(col) for col in fin.fixed] + [list(s) for s in fin.selectors]
    sigma_values = structure.build_sigma_values(fin.copies)

    fixed_coeffs = _intt_columns(structure.domain, dfr, fixed_values, structure.n)
    sigma_coeffs = _intt_columns(structure.domain, dfr, sigma_values, structure.n)
    return structure, fixed_values, sigma_values, fixed_coeffs, sigma_coeffs


def _vk_from_coeffs(params, k, structure, nfixed, fixed_coeffs, sigma_coeffs):
    all_coeffs = [fixed_coeffs[i] for i in range(nfixed)] + [
        sigma_coeffs[i] for i in range(sigma_coeffs.shape[0])
    ]
    all_commitments = commit_coeffs_batch(params, all_coeffs) if all_coeffs else []
    fixed_commitments = all_commitments[:nfixed]
    sigma_commitments = all_commitments[nfixed:]

    import hashlib

    h = hashlib.blake2b(digest_size=32)
    h.update(f"halo2_tpu-vk-k{k}".encode())
    for pt in fixed_commitments + sigma_commitments:
        x, y = ec.g1_to_ints(pt)
        h.update(x.to_bytes(32, "little") + y.to_bytes(32, "little"))
    digest = int.from_bytes(h.digest(), "little") % FR.p
    return VerifyingKey(k, structure, fixed_commitments, sigma_commitments, digest)


def keygen_vk(params, circuit, k: int, F) -> VerifyingKey:
    """Verifying key alone: synthesis, fixed/sigma iNTTs, commitments, digest
    (halo2 `keygen_vk`, reference src/circuits/utils.rs:31-32)."""
    structure, fixed_values, _sv, fixed_coeffs, sigma_coeffs = _synthesize_columns(
        circuit, k, F
    )
    return _vk_from_coeffs(
        params, k, structure, len(fixed_values), fixed_coeffs, sigma_coeffs
    )


def keygen_pk(params, vk: VerifyingKey, circuit, k: int, F) -> ProvingKey:
    """Proving key from an existing vk: re-synthesizes and rebuilds the
    fixed/sigma polynomials (halo2 `keygen_pk` re-runs synthesis the same
    way, reference src/circuits/utils.rs:34-36)."""
    _st, fixed_values, sigma_values, fixed_coeffs, sigma_coeffs = (
        _synthesize_columns(circuit, k, F)
    )
    return ProvingKey(vk, fixed_values, sigma_values, fixed_coeffs, sigma_coeffs)


def keygen(params, circuit, k: int, F) -> ProvingKey:
    """vk+pk in one fused pass (synthesis/iNTT work shared; the split entry
    points above match halo2's API and are what full_prover times)."""
    structure, fixed_values, sigma_values, fixed_coeffs, sigma_coeffs = (
        _synthesize_columns(circuit, k, F)
    )
    vk = _vk_from_coeffs(
        params, k, structure, len(fixed_values), fixed_coeffs, sigma_coeffs
    )
    return ProvingKey(vk, fixed_values, sigma_values, fixed_coeffs, sigma_coeffs)


def keygen_cached(params, circuit, k: int, F, cache_path: str) -> ProvingKey:
    """keygen with a pk/vk disk cache (SURVEY §5 checkpoint/resume)."""
    import os

    if os.path.exists(cache_path):
        return ProvingKey.load(cache_path, circuit, k, F)
    pk = keygen(params, circuit, k, F)
    os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
    pk.save(cache_path)
    return pk
