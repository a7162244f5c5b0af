"""Batch-chunked schedule execution must be bit-identical to the
monolithic run (the chunked path bounds the HBM peak — state + two
gathers + the step output are each (A, L, B) — so the BASELINE batch-256
n=2^16 config fits one chip)."""

import jax
import numpy as np

import ecfft_tpu as ec
from ecfft_tpu.native import build_fftree_native
from ecfft_tpu.ops import schedule as sch


def test_chunked_matches_unchunked():
    tree = build_fftree_native("m31", 64)
    tree.prepare((64,))
    rng = np.random.RandomState(3)
    coeffs = rng.randint(
        0, ec.FIELDS["m31"].p, size=(8, 64, 1)
    ).astype(np.uint32)
    s = tree._scheds[("enter", 64)]
    full = np.asarray(
        sch.run_schedule(tree.spec, tree._pool, s, coeffs, 128, 64,
                         False, None)
    )
    for chunk in (1, 2, 4):
        part = np.asarray(
            sch.run_schedule(tree.spec, tree._pool, s, coeffs, 128, 64,
                             False, chunk)
        )
        assert np.array_equal(full, part), f"chunk={chunk} diverged"


def test_multi_segment_secp_montgomery_matches(monkeypatch):
    """Segmentation × Montgomery/CIOS interaction (VERDICT-r2 weak #9):
    secp256k1's 16-limb path converts the pool to Montgomery form once
    per run_schedule call and carries the D/invD diagonals across
    segment boundaries — force a tiny step-row envelope so EXIT at
    n=256 splits into many segments and assert the result is
    bit-identical to the single-segment run."""
    n = 256
    tree = build_fftree_native("secp256k1", n)
    tree.prepare((n,))
    rng = np.random.RandomState(7)
    vals = [[int(v) for v in row]
            for row in rng.randint(0, 1 << 62, size=(2, n))]
    evals = tree.encode(vals)
    s = tree._scheds[("exit", n)]
    A = int(s.xs[5].shape[1])
    full = np.asarray(
        sch.run_schedule(tree.spec, tree._pool, s, evals, n, n,
                         False, None))
    # envelope of 8 window-rows per segment => ~nsteps/8 segments
    monkeypatch.setattr(sch, "STEP_ROW_ENVELOPE", 8 * A)
    split = np.asarray(
        sch.run_schedule(tree.spec, tree._pool, s, evals, n, n,
                         False, None))
    assert np.array_equal(full, split)


def test_multi_segment_exit_matches_oracle():
    """EXIT at m31 n=4096 crosses the ≤512-step-per-compiled-segment
    boundary (run_schedule executes long schedules as a chain of
    separately-jitted segments after a TPU-runtime envelope was hit at
    n≥2^17; see ops/schedule.py) — the segmented result must equal the
    host oracle exactly."""
    from ecfft_tpu.host.fftree import build_host_fftree

    n = 4096
    tree = build_fftree_native("m31", n)
    tree.prepare((n,))
    assert tree._scheds[("exit", n)].xs[0].shape[0] > 512, (
        "test no longer crosses the segment boundary; grow n")
    ht = build_host_fftree("m31", n)
    rng = np.random.RandomState(5)
    coeffs = [[int(v) for v in row]
              for row in rng.randint(0, ec.FIELDS["m31"].p, size=(2, n))]
    evals = [ht.enter(c) for c in coeffs]
    got = [[int(v) for v in row]
           for row in tree.decode(tree.exit(tree.encode(evals)))]
    assert got == coeffs


def test_oversized_state_preflight(monkeypatch):
    """The single-buffer HBM preflight (fftree.py::_run_sched): a state
    whose TILE-PADDED physical size exceeds the chip's HBM must raise a
    typed SizeError BEFORE any compile/execute — the secp n=2^20 lesson
    (bench_r05_n20.log: 17.18 GB at any batch, 10-min compile, opaque
    XLA allocation error). Faking the TPU backend is safe because the
    check fires before run_schedule."""
    import jax

    import pytest as _pytest

    from ecfft_tpu.errors import SizeError

    n = 64
    tree = build_fftree_native("secp256k1", n)
    tree.prepare((n,))
    enc = tree.encode([[1] * n])
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # W=130, L=16, B=1 -> padded phys = 130*16*128*4 = 1.06 MB; set the
    # "HBM" just below it
    monkeypatch.setenv("ECFFT_HBM_BYTES", str(int(5e5)))
    with _pytest.raises(SizeError, match="tile padding"):
        tree.enter(enc)
    # and comfortably above: must NOT raise from the preflight (pallas
    # on the CPU backend would fail later, so only check the guard path
    # by restoring a real budget and a fake backend barely above)
    monkeypatch.setenv("ECFFT_HBM_BYTES", str(int(1e12)))
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    out = tree.enter(enc)
    assert out.shape == (1, n, 16)


def test_run_split_matches_legacy_switch(monkeypatch):
    """The per-op-run segmentation (static-branch pieces, power-of-two
    canonicalized lengths) must produce the same bits as the legacy
    single-program switch interpreter (ECFFT_SCAN_SWITCH=legacy), for a
    schedule that exercises every op family (enter + exit + degree)."""
    n = 256
    tree = build_fftree_native("m31", n)
    tree.prepare((n,))
    rng = np.random.RandomState(7)
    coeffs = [[int(v) for v in row]
              for row in rng.randint(0, ec.FIELDS["m31"].p, size=(3, n))]
    enc = tree.encode(coeffs)
    monkeypatch.setenv("ECFFT_SCAN_SWITCH", "split")
    new_ev = np.asarray(tree.enter(enc))
    new_back = np.asarray(tree.exit(jax.numpy.asarray(new_ev)))
    new_deg = np.asarray(tree.degree(jax.numpy.asarray(new_ev)))
    monkeypatch.setenv("ECFFT_SCAN_SWITCH", "legacy")
    old_ev = np.asarray(tree.enter(enc))
    old_back = np.asarray(tree.exit(jax.numpy.asarray(old_ev)))
    old_deg = np.asarray(tree.degree(jax.numpy.asarray(old_ev)))
    assert np.array_equal(new_ev, old_ev)
    assert np.array_equal(new_back, old_back)
    assert np.array_equal(new_deg, old_deg)
