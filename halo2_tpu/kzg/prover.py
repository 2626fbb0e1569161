"""KZG prover (halo2 `create_proof` with ProverSHPLONK) — TPU compute path.

Phase order mirrors SURVEY.md §3.2:
  synthesize -> commit advice -> theta -> lookup permuted columns -> beta,
  gamma -> permutation / lookup grand products -> random poly -> y -> quotient
  h(X) on the extended coset (instruction-VM, one jitted program) -> x ->
  evaluations -> SHPLONK multiopen (two G1 witnesses).

Device work: iNTT per column, MSM per commitment, the entire quotient
evaluation.  Host work: per-row grand-product witnesses, transcript, and the
multiopen polynomial division (small, sequential).
"""

from __future__ import annotations

import os
import random as _random
import time
from collections import Counter

import jax.numpy as jnp
import numpy as np

from ..field.device import get_device_field
from ..field.params import BN254_FR
from ..plonkish.assignment import run_synthesis
from ..plonkish.column import Column, ColumnKind, Rotation
from ..plonkish.evaluator import build_expr_batch_eval
from ..plonkish.expression import Query
from .expr_eval import batch_invert, eval_expr_rows
from .keygen import ProvingKey, _horner, commit_coeffs, commit_coeffs_batch
from .shplonk import shplonk_open
from .transcript import Blake2bWrite

P = BN254_FR.p


PHASE_TIMINGS: dict = {}


def _phase(name, t0):
    dt = time.perf_counter() - t0
    PHASE_TIMINGS[name] = PHASE_TIMINGS.get(name, 0.0) + dt
    if os.environ.get("HALO2_TPU_TIMING"):
        print(f"  [prover] {name}: {dt:.2f}s", flush=True)
    return time.perf_counter()


def create_proof(params, pk: ProvingKey, circuit, instances, rng=None) -> bytes:
    rng = rng or _random.Random()
    t = time.perf_counter()
    st = pk.vk.structure
    cs, k, n, u = st.cs, st.k, st.n, st.u
    domain = st.domain
    dfr = get_device_field(BN254_FR)
    transcript = Blake2bWrite()
    transcript.common_scalar(pk.vk.digest)

    # ---------------------------------------------------------- synthesize
    from ..field.host import Fr

    _cs2, _cfg, assignment = run_synthesis(
        circuit, k, instances, witness=True, field=Fr
    )
    fin = assignment.finalize()
    t = _phase("synthesize", t)

    for col in fin.instance:
        for v in col:
            transcript.common_scalar(v)

    # ------------------------------------------------- advice (blinded rows)
    advice_values = []
    for col in fin.advice:
        vals = list(col)
        for r in range(u, n):
            vals[r] = rng.randrange(P)
        advice_values.append(vals)

    def to_coeffs(vals):
        return domain.lagrange_to_coeff(dfr.encode(vals))

    advice_coeffs = [to_coeffs(v) for v in advice_values]
    if advice_coeffs:
        for pt in commit_coeffs_batch(params, advice_coeffs):
            transcript.write_point(pt)

    t = _phase("advice_commit", t)
    theta = int(transcript.squeeze_challenge())

    # host column table for per-row evaluation
    host_cols = {
        "advice": advice_values,
        "fixed": [list(c) for c in fin.fixed],
        "instance": [list(c) for c in fin.instance],
        "selector": [list(s) for s in fin.selectors],
    }

    # ------------------------------------------------- lookups: permute cols
    aux_theta = {("aux", st.aux.THETA): theta}
    lookup_data = []
    for lk in cs.lookups:
        a_expr = _horner([p_[0] for p_ in lk.pairs], _aux_query(st.aux.THETA))
        s_expr = _horner([p_[1] for p_ in lk.pairs], _aux_query(st.aux.THETA))
        a_vals = [int(v) for v in eval_expr_rows(a_expr, host_cols, n, u, aux_theta)]
        s_vals = [int(v) for v in eval_expr_rows(s_expr, host_cols, n, u, aux_theta)]
        ap = sorted(a_vals)
        leftover = Counter(s_vals)
        sp = [None] * u
        for i, v in enumerate(ap):
            if i == 0 or ap[i] != ap[i - 1]:
                if leftover[v] == 0:
                    raise ValueError("lookup input not contained in table")
                leftover[v] -= 1
                sp[i] = v
        fill = iter([v for v, cnt in leftover.items() for _ in range(cnt)])
        for i in range(u):
            if sp[i] is None:
                sp[i] = next(fill)
        ap_full = ap + [rng.randrange(P) for _ in range(n - u)]
        sp_full = sp + [rng.randrange(P) for _ in range(n - u)]
        lookup_data.append(
            {"a": a_vals, "s": s_vals, "ap": ap_full, "sp": sp_full}
        )

    lookup_perm_coeffs = []
    for ld in lookup_data:
        ld["ap_coeffs"] = to_coeffs(ld["ap"])
        ld["sp_coeffs"] = to_coeffs(ld["sp"])
        lookup_perm_coeffs += [ld["ap_coeffs"], ld["sp_coeffs"]]
    if lookup_perm_coeffs:
        for pt in commit_coeffs_batch(params, lookup_perm_coeffs):
            transcript.write_point(pt)

    t = _phase("lookup_permute", t)
    beta = int(transcript.squeeze_challenge())
    gamma = int(transcript.squeeze_challenge())

    # -------------------------------------------- permutation grand products
    delta_pows, omegas = _perm_labels(st)
    perm_cols = cs.permutation_columns
    perm_z_values = []
    carry = 1
    global_idx = 0
    omega_arr = np.array(omegas[:u], dtype=object)
    for cols in st.perm_chunks:
        # vectorized over rows: one object-array op per column instead of a
        # per-row Python loop (round-2 hot spot, kzg/prover.py:147-194)
        num_a = np.ones(u, dtype=object)
        den_a = np.ones(u, dtype=object)
        for ci, col in enumerate(cols):
            v = np.array(host_cols[col.kind.value][col.index][:u], dtype=object)
            gi = global_idx + ci
            lbl = (beta * delta_pows[gi] % P) * omega_arr
            num_a = num_a * ((v + lbl + gamma) % P) % P
            sig = np.array(pk.sigma_values[gi][:u], dtype=object)
            den_a = den_a * ((v + beta * sig + gamma) % P) % P
        den_inv = batch_invert(list(den_a))
        nums = list(num_a)
        z = [0] * n
        z[0] = carry
        for r in range(u):
            z[r + 1] = z[r] * nums[r] % P * den_inv[r] % P
        carry = z[u]
        for r in range(u + 1, n):
            z[r] = rng.randrange(P)
        perm_z_values.append(z)
        global_idx += len(cols)

    perm_z_coeffs = [to_coeffs(z) for z in perm_z_values]
    if perm_z_coeffs:
        for pt in commit_coeffs_batch(params, perm_z_coeffs):
            transcript.write_point(pt)

    # ------------------------------------------------ lookup grand products
    lookup_z_coeffs = []
    for ld in lookup_data:
        ap_a = np.array(ld["ap"][:u], dtype=object)
        sp_a = np.array(ld["sp"][:u], dtype=object)
        dens = list((ap_a + beta) % P * ((sp_a + gamma) % P) % P)
        den_inv = batch_invert(dens)
        a_a = np.array(ld["a"][:u], dtype=object)
        s_a = np.array(ld["s"][:u], dtype=object)
        nums = list((a_a + beta) % P * ((s_a + gamma) % P) % P)
        z = [0] * n
        z[0] = 1
        for r in range(u):
            z[r + 1] = z[r] * nums[r] % P * den_inv[r] % P
        for r in range(u + 1, n):
            z[r] = rng.randrange(P)
        ld["z"] = z
        ld["z_coeffs"] = to_coeffs(z)
        lookup_z_coeffs.append(ld["z_coeffs"])
    if lookup_z_coeffs:
        for pt in commit_coeffs_batch(params, lookup_z_coeffs):
            transcript.write_point(pt)

    t = _phase("grand_products", t)
    # ------------------------------------------------------ vanishing random
    random_poly = [rng.randrange(P) for _ in range(n)]
    random_coeffs = dfr.encode(random_poly)  # already coefficient form
    transcript.write_point(commit_coeffs(params, random_coeffs))

    t = _phase("random_poly", t)
    y = int(transcript.squeeze_challenge())

    # ----------------------------------------------------- quotient on coset
    ext_n = domain.extended_n
    rot_scale = ext_n // n

    def ext(coeffs):
        return domain.coeff_to_extended(coeffs)

    def enc_stack(arrs):
        if not arrs:
            return jnp.zeros((0, 16, ext_n), jnp.uint32)
        return jnp.stack(arrs)

    fixed_ext = [ext(pk.fixed_coeffs[i]) for i in range(len(fin.fixed))]
    selector_ext = [
        ext(pk.fixed_coeffs[len(fin.fixed) + i]) for i in range(len(fin.selectors))
    ]
    instance_coeffs = [to_coeffs(list(c)) for c in fin.instance]

    aux_ext = _aux_extended(st, domain, dfr, beta, gamma, theta, y)
    for c, zc in enumerate(perm_z_coeffs):
        aux_ext[st.aux.perm_z(c)] = ext(zc)
    for i, ld in enumerate(lookup_data):
        aux_ext[st.aux.lookup_permuted_input(i)] = ext(ld["ap_coeffs"])
        aux_ext[st.aux.lookup_permuted_table(i)] = ext(ld["sp_coeffs"])
        aux_ext[st.aux.lookup_z(i)] = ext(ld["z_coeffs"])
    for gi in range(len(perm_cols)):
        aux_ext[st._sigma_aux_index(gi)] = ext(pk.sigma_coeffs[gi])

    columns_ext = {
        "advice": enc_stack([ext(c) for c in advice_coeffs]),
        "fixed": enc_stack(fixed_ext),
        "instance": enc_stack([ext(c) for c in instance_coeffs]),
        "selector": enc_stack(selector_ext),
        "aux": enc_stack([aux_ext[i] for i in range(st.num_aux_total)]),
    }

    combined = _horner(st.quotient_exprs, _aux_query(st.aux.Y))
    evaluator = build_expr_batch_eval(cs, dfr, [combined], rot_scale=rot_scale)
    num_ext = evaluator(columns_ext)[0]  # (16, ext_n)
    h_ext = dfr.mul(num_ext, domain.vanishing_inv_extended())
    h_coeffs_full = domain.extended_to_coeff(h_ext)

    h_pieces = [
        h_coeffs_full[:, i * n : (i + 1) * n] for i in range(ext_n // n)
    ]
    for pt in commit_coeffs_batch(params, h_pieces):
        transcript.write_point(pt)

    t = _phase("quotient", t)
    x = int(transcript.squeeze_challenge())

    # ------------------------------------------------------------ evaluations
    polys = {}  # label -> host coeff list

    # batch every registered poly into ONE stacked decode: each device_get
    # pays a full tunnel round trip (~28 ms measured), so per-poly decodes
    # cost seconds at this poly count
    reg_list = [(("advice", i), c) for i, c in enumerate(advice_coeffs)]
    reg_list += [
        (("fixed", i), pk.fixed_coeffs[i]) for i in range(len(pk.fixed_values))
    ]  # includes selectors
    reg_list += [(("sigma", i), pk.sigma_coeffs[i]) for i in range(len(perm_cols))]
    reg_list += [(("perm_z", c), zc) for c, zc in enumerate(perm_z_coeffs)]
    for i, ld in enumerate(lookup_data):
        reg_list += [
            (("lookup_ap", i), ld["ap_coeffs"]),
            (("lookup_sp", i), ld["sp_coeffs"]),
            (("lookup_z", i), ld["z_coeffs"]),
        ]
    reg_list += [(("h_piece", i), piece) for i, piece in enumerate(h_pieces)]
    stacked = jnp.stack([arr for _, arr in reg_list])  # (M, 16, n)
    dec = dfr.decode(jnp.moveaxis(stacked, 1, 0))  # (M, n) object ints
    n_h = len(h_pieces)
    for (label, _), row in zip(reg_list[: len(reg_list) - n_h], dec):
        polys[label] = [int(v) for v in row]
    polys[("random", 0)] = random_poly
    # folded h: h(X) = sum x^{n i} h_i(X)
    xn = pow(x, n, P)
    h_np = np.zeros(n, dtype=object)
    factor = 1
    for row in dec[len(reg_list) - n_h :]:
        h_np = (h_np + factor * row) % P
        factor = factor * xn % P
    polys[("h", 0)] = [int(v) for v in h_np]

    from .queries import proof_queries

    queries, evals_order = proof_queries(st, x)

    # one power table per distinct point; each eval is then a vectorized
    # object-array dot (the sequential Horner loop was ~half the phase)
    pt_pows = {}
    for _, point in queries:
        if point not in pt_pows:
            pws = np.empty(n, dtype=object)
            acc = 1
            for i in range(n):
                pws[i] = acc
                acc = acc * point % P
            pt_pows[point] = pws
    poly_np = {}
    evals = {}
    for label, point in queries:
        if label not in poly_np:
            poly_np[label] = np.array(polys[label], dtype=object)
        prods = poly_np[label] * pt_pows[point] % P
        evals[(label, point)] = int(prods.sum()) % P
    for label, point in evals_order:
        transcript.write_scalar(evals[(label, point)])

    t = _phase("evaluations", t)
    # --------------------------------------------------------------- multiopen
    shplonk_open(params, transcript, polys, queries, evals)
    t = _phase("multiopen", t)

    return transcript.finalize()


def _aux_query(idx, rot: int = 0):
    return Query(Column(ColumnKind.AUX, idx), Rotation(rot))


def _perm_labels(st):
    from .keygen import _delta

    delta = _delta()
    deltas = [pow(delta, i, P) for i in range(len(st.cs.permutation_columns))]
    omegas = [1] * st.n
    for j in range(1, st.n):
        omegas[j] = omegas[j - 1] * st.domain.omega % P
    return deltas, omegas


_AUX_STATIC_CACHE = {}


def _aux_extended(st, domain, dfr, beta, gamma, theta, y):
    """Static aux tensors on the extended coset + challenge broadcasts."""
    key = (st.k, st.u, domain.extended_k)
    static = _AUX_STATIC_CACHE.get(key)
    ext_n = domain.extended_n
    if static is None:
        n = st.n
        ident = [
            domain.g_coset * pow(domain.extended_omega, i, P) % P for i in range(ext_n)
        ]
        l0_vals = [0] * n
        l0_vals[0] = 1
        l_last_vals = [0] * n
        l_last_vals[st.u] = 1
        l_blind_vals = [0] * n
        for r in range(st.u + 1, n):
            l_blind_vals[r] = 1
        static = {
            "identity": dfr.encode(ident),
            "l0": domain.coeff_to_extended(domain.lagrange_to_coeff(dfr.encode(l0_vals))),
            "l_last": domain.coeff_to_extended(
                domain.lagrange_to_coeff(dfr.encode(l_last_vals))
            ),
            "l_blind": domain.coeff_to_extended(
                domain.lagrange_to_coeff(dfr.encode(l_blind_vals))
            ),
        }
        _AUX_STATIC_CACHE[key] = static

    def bcast(v):
        return jnp.broadcast_to(dfr.encode_scalar(v)[:, None], (16, ext_n))

    aux = {
        st.aux.IDENTITY: static["identity"],
        st.aux.L0: static["l0"],
        st.aux.L_LAST: static["l_last"],
        st.aux.L_BLIND: static["l_blind"],
        st.aux.BETA: bcast(beta),
        st.aux.GAMMA: bcast(gamma),
        st.aux.THETA: bcast(theta),
        st.aux.Y: bcast(y),
    }
    return aux
