"""Per-class profile of the headline bench workload.

Monkeypatches jax.block_until_ready with a forced device->host transfer
(the axon platform's block_until_ready is a no-op -- CLAUDE.md trap), so
JKEngine.profile per-class times are real.
"""
import sys
import time

import numpy as np
import jax

_orig = jax.block_until_ready
jax.block_until_ready = lambda x: np.asarray(x)

from bench import water_cluster
from joltqc_tpu.mol import Molecule
from joltqc_tpu.scf import RHF
from joltqc_tpu.scf.jk_contracted import JKEngine

accum = sys.argv[1] if len(sys.argv) > 1 else "scatter"
n_waters = int(sys.argv[2]) if len(sys.argv) > 2 else 27

mol = Molecule.from_atom_string(water_cluster(n_waters), basis="6-31g*")
mf = RHF(mol)
mf.jk = JKEngine(mf.layout, merge_nprim=True, accum=accum)
s = mf.get_ovlp()
h = mf.get_hcore()
dm = mf.init_guess(s, h)

t0 = time.time()
vj, vk = mf.jk.get_jk(dm)
print(f"warmup {time.time()-t0:.1f}s", flush=True)

mf.jk.profile = True
mf.jk.class_time = {}
t0 = time.time()
vj, vk = mf.jk.get_jk(dm)
tot = time.time() - t0
print(f"profiled get_jk: {tot:.2f}s  accum={accum}", flush=True)

stats = mf.jk.plan_stats
print(f"plan: {stats}")
rows = sorted(mf.jk.class_time.items(), key=lambda kv: -kv[1])
csum = 0.0
ntask_by = {}
for e in mf.jk._plans_full[0.0][0]:
    ntask_by[(e["ls"], e["nprims"], e["tier"])] = (
        ntask_by.get((e["ls"], e["nprims"], e["tier"]), 0) + e["ntasks"]
    )
for (ls, nprims, tier), t in rows[:25]:
    n = ntask_by.get((ls, nprims, tier), 0)
    csum += t
    print(f"{str(ls):14s} np={str(nprims):14s} {tier:5s} {t*1e3:9.1f} ms "
          f"{n:>10d} tasks  {n/max(t,1e-9)/1e6:7.2f} Mt/s")
print(f"sum of class times: {sum(t for _, t in rows):.2f}s")
