"""Stage-split profile of the bench class scans on the real chip.

For the top-N classes of the 486-AO bench plan, times four variants of
the chunk body (4-chunk slices, async-outer dispatch per CLAUDE.md
measurement rules):

  eri       gather + contracted ERI batch only
  contract  + density contraction (_contract_blocks), summed (no accum)
  scatter   full scan body, per-element limb scatter
  block     full scan body, tile-grouped MXU block accumulation
            (block-plan entries only)

This attributes the class-scan cost to stages: round-3 found raw Pallas
ERI at 42-55 Mt/s while full scans run 0.6-3 Mt/s -- the delta is
contraction+accumulation, and this probe splits it.

Run after bench.py + tune_bench.py (plan/dm caches warm):
    PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/prof_accum.py
"""
import os
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    from bench import water_cluster

    import jax
    import jax.numpy as jnp

    from joltqc_tpu.mol import Molecule
    from joltqc_tpu.ops import df64 as df
    from joltqc_tpu.scf import RHF
    from joltqc_tpu.scf.jk_contracted import (
        JKEngine,
        _class_scan_fn,
        _contract_blocks,
        _nf,
        _take,
    )
    from joltqc_tpu.ops.eri import contracted_eri_batch

    n_waters = int(os.environ.get("JQC_BENCH_WATERS", "27"))
    topn = int(os.environ.get("JQC_PROF_TOPN", "6"))
    max_chunks = int(os.environ.get("JQC_PROF_CHUNKS", "4"))
    outer = int(os.environ.get("OUTER", "6"))

    mol = Molecule.from_atom_string(water_cluster(n_waters), basis="6-31g*")
    mf = RHF(mol)
    cache_dir = os.path.expanduser(
        os.environ.get("JQC_CACHE_DIR", "~/.cache/joltqc_tpu")
    )
    dm = np.load(os.path.join(cache_dir, f"bench_dm_w{n_waters}_{mol.nao}.npy"))

    # tile is the production accumulation (round-5 tuner: wins every
    # class); the stage fns (eri/contract) run on the tile plan's task
    # arrays directly ([:5] slices).  Set JQC_PROF_ALL_ACCUM=1 to also
    # build scatter/block plans for cross-strategy stage timing.
    all_accum = os.environ.get("JQC_PROF_ALL_ACCUM", "0") not in ("0", "")
    eng_t = JKEngine(mf.layout, merge_nprim=True, accum="tile")
    eng_t.build_plan(dm)
    eng_s = eng_t
    if all_accum:
        eng_s = JKEngine(mf.layout, merge_nprim=True, accum="scatter")
        eng_s.build_plan(dm)
        eng_b = JKEngine(mf.layout, merge_nprim=True, accum="block")
        eng_b.build_plan(dm)
    nao = eng_t.nao
    print(f"plans ready: {len(eng_t._plan)} entries", flush=True)

    def key(e):
        return (tuple(e["ls"]), tuple(e["nprims"]), e["tier"])

    block_by_key = {key(e): e for e in eng_b._plan} if all_accum else {}
    tile_by_key = {
        key(e): e for e in eng_t._plan if e.get("accum") == "tile"
    }

    def slice_tasks(entry):
        arrs = tuple(np.asarray(t) for t in entry["tasks"])
        k = min(arrs[0].shape[0], max_chunks)
        return tuple(jnp.asarray(a[:k]) for a in arrs), k, arrs[0].shape[1]

    def sync(out):
        # force a device->host transfer (block_until_ready is a no-op on
        # the axon platform, CLAUDE.md measurement trap)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(jnp.ravel(leaf)[:1])

    def time_fn(f, *args):
        t0 = time.time()
        sync(f(*args))
        compile_s = time.time() - t0
        t0 = time.time()
        out = None
        for _ in range(outer):
            out = f(*args)
        sync(out)
        return compile_s, (time.time() - t0) / outer

    entries = sorted(
        eng_s._plan,
        key=lambda e: -e["ntasks"] * int(np.prod([_nf(l) for l in e["ls"]])),
    )[:topn]

    for entry in entries:
        ls, nprims, tier = entry["ls"], entry["nprims"], entry["tier"]
        tables = eng_s._tables(tier)
        tbls = tuple(tables[kk] for kk in entry["cls_idx"])
        tasks, k, B = slice_tasks(entry)
        ntask = k * B
        dm_dev = (
            df.from_f64(np.full((nao, nao), 0.05))
            if tier == "df64"
            else jnp.full((nao, nao), 0.05, jnp.float32)
        )
        bound = jnp.asarray(np.float32(entry["bound"]))
        nfs = tuple(_nf(l) for l in ls)
        isdf = tier == "df64"

        # ---- stage fns (each scans over the k chunks like the real body)
        def eri_only(tbls, tasks):
            def chunk(acc, t):
                ja, jb, jc, jd = t[:4]
                geom = {}
                for name, tbl, idx in zip("abcd", tbls, (ja, jb, jc, jd)):
                    coord, exps, coefs, _ = tbl
                    geom[f"coord_{name}"] = _take(coord, idx)
                    geom[f"exps_{name}"] = _take(exps, idx)
                    geom[f"coefs_{name}"] = _take(coefs, idx)
                G = contracted_eri_batch(tier, ls, nprims, geom)
                s = (
                    jnp.sum(G.hi) + jnp.sum(G.lo) * 0.5
                    if isdf else jnp.sum(G)
                )
                return acc + s.astype(jnp.float32), None
            acc, _ = jax.lax.scan(chunk, jnp.float32(0.0), tasks[:4])
            return acc

        def contract_only(tbls, tasks, dmx):
            def chunk(acc, t):
                ja, jb, jc, jd, wc = t[:5]
                geom = {}
                for name, tbl, idx in zip("abcd", tbls, (ja, jb, jc, jd)):
                    coord, exps, coefs, _ = tbl
                    geom[f"coord_{name}"] = _take(coord, idx)
                    geom[f"exps_{name}"] = _take(exps, idx)
                    geom[f"coefs_{name}"] = _take(coefs, idx)
                G = contracted_eri_batch(tier, ls, nprims, geom)
                if isdf:
                    G = df.DF64(G.hi * wc[:, None, None],
                                G.lo * wc[:, None, None])
                else:
                    G = G * wc[:, None, None]
                aos = tuple(
                    jnp.take(tbl[3], idx)
                    for tbl, idx in zip(tbls, (ja, jb, jc, jd))
                )
                js, ks = _contract_blocks(
                    tier, G, aos, nfs, dmx, nao, True, True
                )
                s = jnp.float32(0.0)
                for _, v, _ in js + ks:
                    s = s + (
                        jnp.sum(v.hi) + jnp.sum(v.lo) * 0.5
                        if isdf else jnp.sum(v)
                    ).astype(jnp.float32)
                return acc + s, None
            acc, _ = jax.lax.scan(chunk, jnp.float32(0.0), tasks[:5])
            return acc

        rows = []
        c, t = time_fn(jax.jit(eri_only), tbls, tasks)
        rows.append(("eri", c, t))
        c, t = time_fn(jax.jit(contract_only), tbls, tasks, dm_dev)
        rows.append(("contract", c, t))

        fn = _class_scan_fn(ls, nprims, tier, nao, True, True, 0.0,
                            accum="scatter", tile=eng_s.tile, chunk_b=B)

        def scatter_full(tbls, tasks, dmx, bound):
            vj = df.const(0.0, (nao * nao,))
            vk = df.const(0.0, (nao * nao,))
            return fn(tbls, tasks[:5], dmx, vj, vk, bound)

        c, t = time_fn(scatter_full, tbls, tasks, dm_dev, bound)
        rows.append(("scatter", c, t))

        blk = block_by_key.get(key(entry))
        if blk is not None and blk.get("nrows", 0) > 8192:
            # occupancy analysis (CLAUDE.md round 3): at nrows >= chunk
            # the one-hot reduction does more MACs than the ERI; the
            # XLA fallback also materializes a >0.5 GB one-hot to HBM
            print(f"  block[r{blk['nrows']}]  skipped (occupancy too low)",
                  flush=True)
            blk = None
        if blk is not None and blk.get("accum") == "block":
            btasks, bk, bB = slice_tasks(blk)
            bntask = bk * bB
            bfn = _class_scan_fn(
                ls, nprims, tier, nao, True, True, 0.0, accum="block",
                nrows=blk.get("nrows", 0), tile=eng_b.tile, chunk_b=bB,
            )

            def block_full(tbls, tasks, dmx, bound):
                vj = df.const(0.0, (nao * nao,))
                vk = df.const(0.0, (nao * nao,))
                return bfn(tbls, tasks, dmx, vj, vk, bound)

            c, t = time_fn(block_full, tbls, btasks,
                           dm_dev, jnp.asarray(np.float32(blk["bound"])))
            rows.append((f"block[r{blk.get('nrows', 0)}]", c, t,
                         bntask))

        til = tile_by_key.get(key(entry))
        if til is not None:
            ttasks, tk, tB = slice_tasks(til)
            # real tasks in the slice (tile plans interleave group pads)
            tntask = int(np.count_nonzero(np.asarray(ttasks[4])))
            offs, E = eng_t._espace()
            eoffs = tuple(offs[kk] for kk in til["cls_idx"])
            tfn = _class_scan_fn(
                ls, nprims, tier, nao, True, True, 0.0, accum="tile",
                tile=eng_t.tile, chunk_b=tB, eoffs=eoffs,
                tile_w=eng_t.tile_w,
            )

            def tile_full(tbls, tasks, dmx, bound):
                ej = df.const(0.0, (E, E))
                ek = df.const(0.0, (E, E))
                return tfn(tbls, tasks, dmx, ej, ek, bound)

            c, t = time_fn(tile_full, tbls, ttasks,
                           dm_dev, jnp.asarray(np.float32(til["bound"])))
            rows.append(("tile", c, t, tntask))

        print(f"\n{ls} np={nprims} {tier} B={B} k={k} ({ntask} tasks)",
              flush=True)
        for r in rows:
            name, c, t = r[0], r[1], r[2]
            n = r[3] if len(r) > 3 else ntask
            print(f"  {name:14s} compile={c:7.1f}s  {t*1e3:9.2f} ms "
                  f"  {n/t/1e6:7.2f} Mt/s", flush=True)


if __name__ == "__main__":
    main()
