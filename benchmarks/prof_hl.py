"""Microbench: XLA vs Pallas ERI class batches on the real chip.

Times the contracted-ERI class batch for high-l classes with the Pallas
assembly cap raised, using the in-jit repetition harness (lax.scan over
dependent reps + a device->host transfer) per CLAUDE.md measurement
rules.
"""
import os
import sys
import time

REPS = int(os.environ.get("R", "8"))
T = int(os.environ.get("T", "2048"))

import numpy as np
import jax
import jax.numpy as jnp

from joltqc_tpu.ops import df64 as df


def pack(ls, nprims, tier, T, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    for name, l, npr in zip("abcd", ls, nprims):
        coords = rng.uniform(-1.5, 1.5, (T, 3))
        exps = rng.uniform(0.2, 3.0, (T, npr))
        coefs = rng.uniform(0.5, 1.0, (T, npr))
        if tier == "df64":
            out[f"coord_{name}"] = df.from_f64(coords)
            out[f"exps_{name}"] = df.from_f64(exps)
            out[f"coefs_{name}"] = df.from_f64(coefs)
        else:
            out[f"coord_{name}"] = jnp.float32(coords)
            out[f"exps_{name}"] = jnp.float32(exps)
            out[f"coefs_{name}"] = jnp.float32(coefs)
    return out


def bench_one(ls, nprims, tier, use_pallas):
    import joltqc_tpu.ops.eri as eri_mod
    eri_mod._USE_PALLAS = use_pallas
    from joltqc_tpu.ops.eri import contracted_eri_batch

    batch = pack(ls, nprims, tier, T)

    def once(b):
        out = contracted_eri_batch(tier, ls, nprims, b)
        if tier == "df64":
            return jnp.sum(out.hi) + jnp.sum(out.lo)
        return jnp.sum(out)

    def reps(b):
        def body(acc, _):
            # dependent perturbation so XLA can't CSE the reps
            e = b["exps_a"]
            if tier == "df64":
                b2 = dict(b, exps_a=df.DF64(e.hi + acc * 0.0, e.lo))
            else:
                b2 = dict(b, exps_a=e + acc * 0.0)
            return once(b2), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return acc

    f = jax.jit(reps)
    t0 = time.time()
    v = float(f(batch))
    compile_s = time.time() - t0
    # amortize the tunnel round trip over OUTER async dispatches too:
    # queue N calls back-to-back, sync once at the end.  total ~=
    # N*REPS*device_time + 1 RTT (vs REPS*device_time + RTT before,
    # where a ~25 ms RTT swamped ms-scale kernels).
    outer = int(os.environ.get("OUTER", "8"))
    t0 = time.time()
    vs = [f(batch) for _ in range(outer)]
    v = float(vs[-1])
    run_s = time.time() - t0
    per = run_s / (REPS * outer)
    mt = T / per / 1e6
    name = "pallas" if use_pallas else "xla"
    print(f"{ls} np={nprims} {tier:5s} {name:6s} compile={compile_s:7.1f}s "
          f"per-call={per*1e3:8.2f}ms  {mt:6.2f} Mtask/s  v={v:.3e}",
          flush=True)
    return per


if __name__ == "__main__":
    os.environ["JQC_PALLAS_ASM_MAX"] = os.environ.get("CAP", "200000")
    import joltqc_tpu.ops.eri_pallas as ep
    ep._PALLAS_ASM_MAX = int(os.environ["JQC_PALLAS_ASM_MAX"])
    cases = [
        ((2, 2, 2, 1), (1, 1, 1, 1)),
        ((2, 2, 2, 2), (1, 1, 1, 1)),
    ]
    tiers = sys.argv[1:] or ["df64", "f32"]
    for ls, nprims in cases:
        for tier in tiers:
            for up in (True, False):
                try:
                    bench_one(ls, nprims, tier, up)
                except Exception as e:
                    print(f"{ls} {tier} pallas={up} FAILED: {type(e).__name__}: {e}",
                          flush=True)
