"""Unrolled executor (ops/unrolled.py) vs the scan interpreter: identical
bits on the same schedules, including the fused pair-butterfly kernels in
interpret mode. Small sizes only — the unrolled form trades compile time
for runtime, which is the right trade on TPU (where bench.py's TPU==native
gate covers it at full size) but slow on the CPU suite."""

import random

import jax
import numpy as np

import ecfft_tpu as ec
from ecfft_tpu.native import build_fftree_native
from ecfft_tpu.ops import schedule as sch
from ecfft_tpu.ops.unrolled import _meta, run_unrolled


def _roundtrip(field: str, n: int, B: int, check_fused: bool):
    tree = build_fftree_native(field, n)
    tree.prepare((n,))
    p = ec.FIELDS[field].p
    rng = random.Random(1)
    vals = [[rng.randrange(p) for _ in range(n)] for _ in range(B)]
    enc = jax.numpy.asarray(np.asarray(tree.encode(vals)))
    for alg in ("enter", "exit"):
        s = tree._scheds[(alg, n)]
        ref = np.asarray(
            sch.run_schedule(tree.spec, tree._pool, s, enc, 2 * n, n, False)
        )
        got = np.asarray(
            run_unrolled(tree.spec, tree._pool, s, enc, 2 * n, n, False)
        )
        assert np.array_equal(ref, got), (field, alg, "generic")
        if check_fused:
            # at least one level must take the fused-butterfly path, and
            # interpret-mode Pallas must reproduce the bits exactly
            assert any(_meta(s).fusable), (field, alg)
            got_i = np.asarray(
                run_unrolled(tree.spec, tree._pool, s, enc, 2 * n, n,
                             False, interpret=True)
            )
            assert np.array_equal(ref, got_i), (field, alg, "fused")


def test_unrolled_matches_scan_m31():
    _roundtrip("m31", 64, 4, check_fused=True)


def test_unrolled_matches_scan_secp_small():
    # multi-limb generic path: at n=16 the window is narrower than
    # TW=128, so _analyze rejects every level (start/A fail the %TW
    # alignment) — no fused level exists to check
    _roundtrip("secp256k1", 16, 2, check_fused=False)


def test_unrolled_chunked_matches():
    tree = build_fftree_native("m31", 64)
    tree.prepare((64,))
    p = ec.FIELDS["m31"].p
    rng = random.Random(2)
    vals = [[rng.randrange(p) for _ in range(64)] for _ in range(4)]
    enc = jax.numpy.asarray(np.asarray(tree.encode(vals)))
    s = tree._scheds[("enter", 64)]
    full = np.asarray(
        run_unrolled(tree.spec, tree._pool, s, enc, 128, 64, False)
    )
    part = np.asarray(
        run_unrolled(tree.spec, tree._pool, s, enc, 128, 64, False,
                     batch_chunk=2)
    )
    assert np.array_equal(full, part)
