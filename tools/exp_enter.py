#!/usr/bin/env python
"""Perf experiment: flagship ENTER config under one knob setting.

Usage: python exp_enter.py [reps]
Knobs via env: ECFFT_EXECUTOR, ECFFT_HBM_BUDGET, ECFFT_NO_PALLAS,
ECFFT_BENCH_N, ECFFT_BENCH_BATCH, EXP_CHUNK (explicit batch_chunk).
Prints one line: config, warm-rep times, polys/s. No correctness gate
(bench.py owns that); this is for mapping the knob space quickly.
"""
import json
import os
import sys
import time

sys.modules["zstandard"] = None


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np

    import ecfft_tpu as ec
    from ecfft_tpu.serialize_native import load_tables_npz

    FIELD = os.environ.get("ECFFT_BENCH_FIELD", "secp256k1")
    N = int(os.environ.get("ECFFT_BENCH_N", str(1 << 16)))
    BATCH = int(os.environ.get("ECFFT_BENCH_BATCH", "256"))
    REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(root, f".bench_tree_{FIELD}_{N}.npz")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        tree = load_tables_npz(cache)
        tree.prepare((N,), cache_dir=root)
    tree.place_on(jax.devices()[0])

    spec = ec.FIELDS[FIELD]
    L = spec.num_limbs
    top = spec.to_limbs(spec.p)[-1]
    import jax.numpy as jnp

    @jax.jit
    def fresh_input(key):
        if L == 1:
            return jax.random.randint(
                key, (BATCH, N, 1), 0, spec.p, dtype=jnp.uint32)
        limbs = jax.random.randint(
            key, (BATCH, N, L), 0, 1 << 16, dtype=jnp.uint32)
        tl = jax.random.randint(
            key, (BATCH, N, 1), 0, int(top), dtype=jnp.uint32)
        return jnp.concatenate([limbs[..., :-1], tl], axis=-1)

    cfg = dict(
        executor=os.environ.get("ECFFT_EXECUTOR", "scan"),
        no_pallas=os.environ.get("ECFFT_NO_PALLAS"),
        hbm=os.environ.get("ECFFT_HBM_BUDGET"))
    print(f"config: {cfg}", file=sys.stderr)
    t0 = time.time()
    out = tree.enter(fresh_input(jax.random.PRNGKey(99)))
    np.asarray(out[0, 0])
    print(f"first call: {time.time()-t0:.1f}s", file=sys.stderr)
    times = []
    for rep in range(REPS):
        fresh = fresh_input(jax.random.PRNGKey(rep))
        fresh.block_until_ready()
        np.asarray(fresh[0, 0])
        t0 = time.time()
        out = tree.enter(fresh)
        np.asarray(out[rep % BATCH, rep % N])
        times.append(time.time() - t0)
    best = min(times)
    print(json.dumps({
        "cfg": {k: v for k, v in cfg.items() if v},
        "times": [round(t, 3) for t in times],
        "polys_per_s": round(BATCH / best, 2),
    }))


if __name__ == "__main__":
    main()
