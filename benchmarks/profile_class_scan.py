"""Component-level timing of one JK class scan on the real chip.

Round-2 perf diagnostic: the (H2O)4/6-31g Fock build is ~4 ms per class
launch regardless of task count (CLAUDE.md round-1 findings).  This
script isolates WHERE that floor comes from by timing variants of the
same chunk body:
  eri       : contracted ERI batch only (sum-reduced)
  contract  : ERI + density contraction (sum-reduced, no scatter)
  scatter   : full body (ERI + contraction + limb scatter into nao^2)
  scatter_only: scatter of precomputed values (no ERI)
Run:  python benchmarks/profile_class_scan.py [ls...=1 0 1 0] [B=8192]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from joltqc_tpu.mol import Molecule
from joltqc_tpu.mol.layout import BasisLayout
from joltqc_tpu.ops import df64 as df
from joltqc_tpu.ops.accum import limbs_to_df64, scatter_limbs
from joltqc_tpu.ops.eri import contracted_eri_batch
from joltqc_tpu.scf.jk_contracted import JKEngine, _contract_blocks, _cat_vals, _nf
from joltqc_tpu.scf.tasks import build_quartet_tasks


def main():
    argv = sys.argv[1:]
    tier = "df64"
    if argv and argv[-1] in ("f32", "df64"):
        tier = argv[-1]
        argv = argv[:-1]
    args = [int(x) for x in argv]
    ls = tuple(args[:4]) if len(args) >= 4 else (1, 0, 1, 0)
    B = args[4] if len(args) > 4 else 8192

    mol = Molecule.from_atom_string(
        "; ".join(
            f"O {3*i} 0 0.1174; H {3*i-0.757} 0 -0.4696; H {3*i+0.757} 0 -0.4696"
            for i in range(4)
        ),
        basis="6-31g",
    )
    layout = BasisLayout(mol)
    eng = JKEngine(layout)
    nao = eng.nao

    # pick the first plan entry matching ls/tier and retile to B
    plan = eng._build_plan(0.7)
    entry = next(
        (e for e in plan if e["ls"] == ls and e["tier"] == tier), None
    )
    if entry is None:
        entry = max((e for e in plan if e["tier"] == tier), key=lambda e: e["ntasks"])
        ls = entry["ls"]
    nprims = entry["nprims"]
    print(f"class ls={ls} nprims={nprims} tier={tier} ntasks={entry['ntasks']} B={B}")

    tables = eng._tables(tier)
    tbls = tuple(tables[k] for k in entry["cls_idx"])
    # flatten tasks and retile to (nchunk, B); replicate to fill
    flat = [np.asarray(t).reshape(-1) for t in entry["tasks"]]
    n = len(flat[0])
    reps = max(1, (4 * B) // n + 1)
    flat = [np.tile(f, reps)[: max(B, (n * reps // B) * B)] for f in flat]
    nchunk = len(flat[0]) // B
    tasks = tuple(
        jnp.asarray(f[: nchunk * B].reshape(nchunk, B), jnp.int32 if i < 4 else jnp.float32)
        for i, f in enumerate(flat)
    )
    ntasks = nchunk * B

    rng = np.random.default_rng(0)
    dm64 = rng.standard_normal((nao, nao)) * 0.1
    dm = df.from_f64(dm64) if tier == "df64" else jnp.asarray(dm64, jnp.float32)
    isdf = tier == "df64"
    nfs = tuple(_nf(l) for l in ls)

    def gather_geom(t):
        ja, jb, jc, jd, wc = t
        geom = {}
        for name, tbl, idx in zip("abcd", tbls, (ja, jb, jc, jd)):
            coord, exps, coefs, _ = tbl
            from joltqc_tpu.scf.jk_contracted import _take

            geom[f"coord_{name}"] = _take(coord, idx)
            geom[f"exps_{name}"] = _take(exps, idx)
            geom[f"coefs_{name}"] = _take(coefs, idx)
        aos = tuple(
            jnp.take(tbl[3], idx) for tbl, idx in zip(tbls, (ja, jb, jc, jd))
        )
        return geom, aos, wc

    def body_eri(carry, t):
        geom, aos, wc = gather_geom(t)
        G = contracted_eri_batch(tier, ls, nprims, geom, 0.0)
        s = jnp.sum(G.hi) + jnp.sum(G.lo) if isdf else jnp.sum(G)
        return carry + s, None

    def contract_vals(t):
        geom, aos, wc = gather_geom(t)
        G = contracted_eri_batch(tier, ls, nprims, geom, 0.0)
        if isdf:
            G = df.DF64(G.hi * wc[:, None, None], G.lo * wc[:, None, None])
        else:
            G = G * wc[:, None, None]
        return _contract_blocks(tier, G, aos, nfs, dm, nao, True, True)

    def body_contract(carry, t):
        jstreams, kstreams = contract_vals(t)
        s = carry
        for _, v, _ in jstreams + kstreams:
            s = s + (jnp.sum(v.hi) if isdf else jnp.sum(v))
        return s, None

    def body_full(carry, t):
        from joltqc_tpu.scf.jk_contracted import _flat
        jstreams, kstreams = contract_vals(t)
        vj, vk = carry
        limbs, sexp = scatter_limbs(_cat_vals([_flat(v) for _, v, _ in jstreams]), jnp.concatenate([i.reshape(-1) for _, _, i in jstreams]), nao * nao)
        vj = df.add(vj, limbs_to_df64(limbs, sexp))
        limbs, sexp = scatter_limbs(_cat_vals([_flat(v) for _, v, _ in kstreams]), jnp.concatenate([i.reshape(-1) for _, _, i in kstreams]), nao * nao)
        vk = df.add(vk, limbs_to_df64(limbs, sexp))
        return (vj, vk), None

    z = jnp.float32(0.0)
    acc0 = (df.const(0.0, (nao * nao,)), df.const(0.0, (nao * nao,)))

    fns = {
        "eri": jax.jit(lambda tasks: jax.lax.scan(body_eri, z, tasks)[0]),
        "contract": jax.jit(lambda tasks: jax.lax.scan(body_contract, z, tasks)[0]),
        "full": jax.jit(lambda tasks: jax.lax.scan(body_full, acc0, tasks)[0]),
    }

    for name, fn in fns.items():
        t0 = time.perf_counter()
        out = fn(tasks)
        jax.block_until_ready(out)
        compile_t = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(tasks)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        print(
            f"{name:10s} compile {compile_t:6.1f}s  run {t*1e3:8.2f} ms "
            f" ({ntasks / t / 1e6:6.2f} Mtasks/s, {nchunk} chunks)"
        )


if __name__ == "__main__":
    main()
