import os, random, sys, time

os.environ.setdefault("HALO2_TPU_TIMING", "1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from halo2_tpu.circuits.merkle_sum_tree import (
    MerkleSumTreeCircuit, Node, compute_merkle_sum_root,
)
from halo2_tpu.field import Fr
from halo2_tpu.kzg import ParamsKZG, create_proof
from halo2_tpu.kzg.keygen import keygen_cached
from halo2_tpu.kzg import engine as eng_mod

k, depth = 11, 15
rng = random.Random(0xA11CE)
leaf = Node(Fr.from_u64(10), Fr.from_u64(100))
elements = [Node(Fr.from_u64(rng.randrange(1 << 32)), Fr.from_u64(rng.randrange(1 << 20))) for _ in range(depth)]
indices = [Fr.from_u64(rng.randrange(2)) for _ in range(depth)]
root = compute_merkle_sum_root(Fr, leaf, elements, indices)
assets = root.balance + Fr.from_u64(1)
public = [leaf.hash, leaf.balance, root.hash, assets]
circuit = MerkleSumTreeCircuit(Fr, leaf.hash, leaf.balance,
                               [n.hash for n in elements], [n.balance for n in elements],
                               indices, assets)
params = ParamsKZG.setup_cached(k)
pk = keygen_cached(params, circuit, k, Fr, os.path.join("scripts", "..", ".srs", f"pk_mst_d{depth}_k{k}.pkl"))

acc = {}
def wrap(cls, name):
    orig = getattr(cls, name)
    def f(self, *a, **kw):
        t0 = time.perf_counter()
        r = orig(self, *a, **kw)
        acc[name] = acc.get(name, 0.0) + time.perf_counter() - t0
        return r
    setattr(cls, name, f)

for m in ["coeff_to_extended_many", "quotient_eval", "mul_ext",
          "extended_to_coeff", "commit_batch", "to_coeffs", "decode_many",
          "grand_product_z", "epoly_const", "vanishing_inv_extended"]:
    wrap(eng_mod.NativeEngine, m)

t0 = time.perf_counter()
proof = create_proof(params, pk, circuit, [list(public)], rng=random.Random(7))
print(f"total prove {time.perf_counter()-t0:.2f}s")
for kk, v in sorted(acc.items(), key=lambda x: -x[1]):
    print(f"  {kk}: {v:.3f}s")
print("ext_n:", pk.vk.structure.domain.extended_n, "n:", pk.vk.structure.n)
prog = pk.vk.structure.quotient_program(pk.vk.structure.domain.extended_n // pk.vk.structure.n)
print("program: queries", len(prog.queries), "consts", len(prog.consts), "instrs", len(prog.instrs))
