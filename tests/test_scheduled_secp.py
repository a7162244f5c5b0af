"""Scheduled-path correctness at bench-relevant sizes (secp256k1 n=256).

The driver benchmark exercises the schedule machine on secp256k1 at large
n; the per-size unit tests stop at n=16/64 because JAX tree construction
compile time grows with size. This file closes that gap (VERDICT r1 #10):
the native C++ engine builds the n=256 tree fast and serves as the
reference for every scheduled algorithm, on the CPU backend.
"""

import random

import numpy as np
import pytest

from ecfft_tpu.fields.registry import FIELDS
from ecfft_tpu.native import NativeFFTree, build_fftree_native

N = 256
FIELD = "secp256k1"


@pytest.fixture(scope="module")
def trees():
    dev = build_fftree_native(FIELD, N)
    dev.prepare((N,))
    nat = NativeFFTree(FIELD, N)
    return dev, nat


def test_scheduled_enter_exit_large(trees):
    dev, nat = trees
    p = FIELDS[FIELD].p
    rng = random.Random(21)
    batch = [[rng.randrange(p) for _ in range(N)] for _ in range(2)]
    enc = dev.encode(batch)
    evals = dev.enter(enc)
    for b in range(2):
        assert list(dev.decode(np.asarray(evals)[b])) == nat.enter(batch[b])
    back = dev.exit(evals)
    assert np.array_equal(np.asarray(back), np.asarray(enc))


def test_scheduled_degree_large(trees):
    dev, nat = trees
    p = FIELDS[FIELD].p
    rng = random.Random(22)
    degs = [0, 1, 100, N // 2, N - 1]
    coeffs = []
    for d in degs:
        c = [rng.randrange(p) for _ in range(d)] + [rng.randrange(1, p)]
        coeffs.append(c + [0] * (N - d - 1))
    evals = dev.enter(dev.encode(coeffs))
    assert list(dev.degree(evals)) == degs
    assert [nat.degree(nat.enter(c)) for c in coeffs] == degs


def test_scheduled_vanish_large(trees):
    dev, nat = trees
    p = FIELDS[FIELD].p
    rng = random.Random(23)
    pts = [rng.randrange(p) for _ in range(N // 2)]
    got = dev.vanish(dev.encode([pts]))
    assert list(dev.decode(np.asarray(got)[0])) == nat.vanish(pts)


def test_scheduled_general_mod_large(trees):
    dev, nat = trees
    p = FIELDS[FIELD].p
    rng = random.Random(24)
    vals = [rng.randrange(p) for _ in range(N)]
    enc = dev.encode([vals])
    a = dev.tables[N]["xnn_s"]
    c = dev.tables[N]["z0z0_rem_xnn_s"]
    a_l = list(dev.decode(np.asarray(a)))
    c_l = list(dev.decode(np.asarray(c)))
    got = dev.modular_reduce(enc, a, c)
    assert list(dev.decode(np.asarray(got)[0])) == nat.modular_reduce(
        vals, a_l, c_l
    )
    # canonical scheduled form must agree bit for bit
    assert np.array_equal(np.asarray(got), np.asarray(dev.modular_reduce(enc)))
    got_r = dev.redc_z0(enc, a)
    assert list(dev.decode(np.asarray(got_r)[0])) == nat.redc_z0(vals, a_l)
    assert np.array_equal(np.asarray(got_r), np.asarray(dev.redc_z0(enc)))
