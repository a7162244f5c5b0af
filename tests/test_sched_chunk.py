"""Batch-chunked schedule execution must be bit-identical to the
monolithic run (the chunked path bounds the HBM peak — state + two
gathers + the step output are each (A, L, B) — so the BASELINE batch-256
n=2^16 config fits one chip)."""

import numpy as np

import ecfft_tpu as ec
from ecfft_tpu.ops import schedule as sch


def test_chunked_matches_unchunked():
    tree = ec.build_fftree("m31", 64)
    tree.prepare((64,))
    rng = np.random.RandomState(3)
    coeffs = rng.randint(
        0, ec.FIELDS["m31"].p, size=(8, 64, 1)
    ).astype(np.uint32)
    s = tree._scheds[("enter", 64)]
    full = np.asarray(
        sch.run_schedule(tree.spec, tree._pool, s.xs, coeffs, 128, 64,
                         s.W, False, None)
    )
    for chunk in (1, 2, 4):
        part = np.asarray(
            sch.run_schedule(tree.spec, tree._pool, s.xs, coeffs, 128, 64,
                             s.W, False, chunk)
        )
        assert np.array_equal(full, part), f"chunk={chunk} diverged"
