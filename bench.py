#!/usr/bin/env python
"""ecfft-tpu benchmark: batched ENTER throughput on one chip.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "polys/sec", "vs_baseline": N}

Workload (BASELINE.md target, env-overridable):
  field=secp256k1, n=2^14, batch=64 — batched coefficient->evaluation
  transform (the reference's `enter`, benches/fftree.rs:28-31 scaled up).

vs_baseline compares against a MEASURED single-core run of the same
workload on the native C++ engine (native/ecfft_native.cpp — arkworks-
class 4×64 Montgomery arithmetic, the same backend family as the Rust
reference, which itself publishes no numbers; see BASELINE.md). The
native baseline is re-measured on EVERY invocation (best-of-3) so the
ratio is self-contained: rounds 2–4 each compared against a baseline
cached on a differently-loaded machine, and the same TPU throughput
read as 74×, 24.6×, or 18.5× depending on which cache survived. The
raw per-poly seconds for both sides are included in the JSON.

Tree construction runs through the native builder and is cached as an
.npz next to this file (first run builds; later runs load) so the
measured region is the transform itself.
"""

import json
import os
import sys
import time

# zstandard.backend_c segfaults on JAX persistent-cache entries in
# long-lived processes; block it so the cache uses zlib (must match
# tests/conftest.py so every process reads/writes the same format)
sys.modules["zstandard"] = None


def log(*a):
    print(*a, file=sys.stderr)


FIELD = os.environ.get("ECFFT_BENCH_FIELD", "secp256k1")
# default = the BASELINE.md north-star config: ENTER n=2^16, batch 256
N = int(os.environ.get("ECFFT_BENCH_N", str(1 << 16)))
BATCH = int(os.environ.get("ECFFT_BENCH_BATCH", "256"))
REPS = int(os.environ.get("ECFFT_BENCH_REPS", "5"))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np

    import ecfft_tpu as ec
    from ecfft_tpu.serialize_native import load_tables_npz, save_tables_npz

    log(f"bench: field={FIELD} n={N} batch={BATCH} on {jax.devices()[0]}")

    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, f".bench_tree_{FIELD}_{N}.npz")
    if os.path.exists(cache):
        log("loading cached tree", cache)
        with jax.default_device(jax.devices("cpu")[0]):
            tree = load_tables_npz(cache)
    else:
        from ecfft_tpu.native import build_fftree_native

        log("building tree via native engine (one-time)...")
        t0 = time.time()
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            tree = build_fftree_native(FIELD, N)
        log(f"tree built in {time.time()-t0:.1f}s")
        save_tables_npz(tree, cache)

    # measure the single-core native baseline on the same workload, on
    # EVERY run: 3 reps, best-of. A cached single rep is at the mercy of
    # machine load at cache-build time — round 3 cached a 4.43 s rep
    # where an unloaded core does ~1.1-1.5 s, silently inflating
    # vs_baseline 3x, and rounds 2/4 disagreed the other way. Best-of-3
    # measured in the SAME run is the only self-contained protocol.
    from ecfft_tpu.native import NativeFFTree

    log("measuring native single-core ENTER baseline (3 reps)...")
    import random as _r

    nt = NativeFFTree(FIELD, N)
    rng_ = _r.Random(1)
    base_reps = []
    for _ in range(3):
        cs = [rng_.randrange(ec.FIELDS[FIELD].p) for _ in range(N)]
        t0 = time.time()
        nt.enter(cs)
        base_reps.append(time.time() - t0)
    native_enter_s = min(base_reps)
    del nt
    log(f"native single-core ENTER: {native_enter_s:.3f}s/poly "
        f"(reps {[round(t, 3) for t in base_reps]})")
    # pool + schedules build on CPU (fast, persistently cached), then move
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        tree.prepare((N,), cache_dir=here)
    tree.place_on(jax.devices()[0])

    spec = ec.FIELDS[FIELD]
    L = spec.num_limbs
    rng = np.random.RandomState(1)
    if L == 1:
        coeffs = rng.randint(0, spec.p, size=(BATCH, N, 1)).astype(np.uint32)
    else:
        # uniform 16-bit limbs with a constrained top limb keeps values < p
        top = spec.to_limbs(spec.p)[-1]
        coeffs = rng.randint(0, 1 << 16, size=(BATCH, N, L)).astype(np.uint32)
        coeffs[..., -1] = rng.randint(0, top, size=(BATCH, N))
    coeffs = jax.device_put(coeffs, jax.devices()[0])

    log("compiling enter...")
    t0 = time.time()
    out = tree.enter(coeffs)
    out.block_until_ready()
    log(f"first call (compile+run): {time.time()-t0:.1f}s")

    # correctness gate: TPU result must match the native engine bit-for-bit
    # on several polys of the batch, in BOTH directions (VERDICT r2 #9)
    from ecfft_tpu.native import NativeFFTree as _NT

    nt_check = _NT(FIELD, N)
    for bi in (0, BATCH // 2, BATCH - 1):
        check = [int(spec.from_limbs(l)) for l in np.asarray(coeffs[bi])]
        expected = nt_check.enter(check)
        got = [int(v) for v in tree.decode(out[bi])]
        assert got == expected, \
            f"TPU ENTER does not match the native engine (poly {bi})"
    back = tree.exit(out[:1])
    assert np.array_equal(np.asarray(back[0]), np.asarray(coeffs[0])), \
        "TPU EXIT does not round-trip ENTER (poly 0)"
    log("correctness gate passed (TPU == native: ENTER x3 polys, "
        "EXIT roundtrip)")

    # fresh inputs every rep so no caching effect can flatter the number;
    # generated ON DEVICE (host-generating 1 GB and pushing it through
    # the remote tunnel costs ~1 min/rep and times the wrong thing).
    # timing ends at a host readback of a result element — under this
    # environment's remote-execution tunnel, block_until_ready alone was
    # observed not to fence reliably
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

    times = []
    for rep in range(REPS):
        fresh = fresh_input(jax.random.PRNGKey(rep))
        fresh.block_until_ready()
        np.asarray(fresh[0, 0])  # fence the generation
        t0 = time.time()
        out = tree.enter(fresh)
        np.asarray(out[rep % BATCH, rep % N])  # fence: forces execution
        times.append(time.time() - t0)
    best = min(times)
    polys_per_sec = BATCH / best
    base = 1.0 / native_enter_s
    log(f"warm times: {[round(t, 4) for t in times]}; "
        f"throughput {polys_per_sec:.2f} polys/s; native 1-core {base:.2f}")

    print(json.dumps({
        "metric": f"batched ENTER throughput, {FIELD}, n=2^{N.bit_length()-1}, "
                  f"batch {BATCH}, 1 TPU chip",
        "value": round(polys_per_sec, 3),
        "unit": "polys/sec",
        "vs_baseline": round(polys_per_sec / base, 3),
        "tpu_s_per_poly": round(best / BATCH, 5),
        "native_1core_s_per_poly": round(native_enter_s, 4),
        "native_baseline_reps_s": [round(t, 4) for t in base_reps],
        "executor": os.environ.get("ECFFT_EXECUTOR", "scan"),
    }))


def _main_with_fallback():
    """Run main(); if a non-scan executor fails, retry on the scan
    executor in a FRESH SUBPROCESS. Round 3 taught the in-process
    lesson: a failed attempt's donated buffers and compiled programs
    keep holding HBM, so the retry itself OOMs (BENCH_r03.json). A
    child process releases everything by construction."""
    import subprocess

    try:
        main()
        return
    except Exception as e:
        if os.environ.get("ECFFT_EXECUTOR", "scan") == "scan":
            raise
        import traceback

        traceback.print_exc(file=sys.stderr)
        log(f"executor {os.environ['ECFFT_EXECUTOR']!r} failed "
            f"({type(e).__name__}); retrying on the scan executor in a "
            "fresh process")
    env = dict(os.environ, ECFFT_EXECUTOR="scan")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env,
        stdout=subprocess.PIPE)
    sys.stdout.buffer.write(proc.stdout)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    _main_with_fallback()
