import os, time
import jax; jax.config.update("jax_platforms", "cpu")
from halo2_tpu.field import Fp, Fr, get_device_field
from halo2_tpu.poseidon import MySpec, poseidon_hash, generate_constants, hash_device
t0=time.time()
rcs, mds, mds_inv = generate_constants(Fp.SPEC, 3, 8, 56)
print(f"grain t=3: {time.time()-t0:.2f}s")
print("rc[0][0] =", hex(rcs[0][0]))
print("mds[0][0] =", hex(mds[0][0]))
# sanity: mds * mds_inv == I
p = Fp.SPEC.p
for i in range(3):
    for j in range(3):
        s = sum(mds[i][k]*mds_inv[k][j] for k in range(3)) % p
        assert s == (1 if i==j else 0)
print("mds*mds_inv == I ok")
d = poseidon_hash(Fp, MySpec(3,2), [Fp(1), Fp(2)])
print("hash(1,2) t=3 =", hex(int(d)))
d5 = poseidon_hash(Fp, MySpec(5,4), [Fp.from_u64(99)]*4)
print("hash(99*4) t=5 =", hex(int(d5)))
# device vs host
import jax.numpy as jnp
df = get_device_field(Fp.SPEC)
msgs = jnp.stack([df.encode([1, 7]), df.encode([2, 8])])  # (L=2, 16, B=2)
out = hash_device(df, MySpec(3,2), 2, msgs)
got = df.decode(out)
exp0 = int(poseidon_hash(Fp, MySpec(3,2), [Fp(1), Fp(2)]))
exp1 = int(poseidon_hash(Fp, MySpec(3,2), [Fp(7), Fp(8)]))
print("device matches host:", int(got[0]) == exp0 and int(got[1]) == exp1)
