"""Fresh-prime pipeline tests: FIND_CURVE (native + python) → registered
field → FFTree → transforms, on primes the reference never shipped
(BASELINE.json config 5's workflow)."""

import random

import pytest

from ecfft_tpu.ec.curve import GoodCurve, Point, two_adicity
from ecfft_tpu.fields.registry import FIELDS, field_from_curve_search
from ecfft_tpu.utils.poly import evaluate

M61 = (1 << 61) - 1


def test_native_find_curve_verified():
    from ecfft_tpu.native import find_curve_native

    n, a, bb, x, y = find_curve_native(M61, 10, seed=11)
    assert n >= 10
    c = GoodCurve.new_odd(a, bb, M61)
    pt = Point(x, y, c)
    assert c.contains(x, y)
    assert two_adicity(pt) == n


def test_fresh_prime_end_to_end():
    # fixed name + seed so jit caches hit across runs
    if "m61_test" not in FIELDS:
        field_from_curve_search("m61_test", M61, 6, random.Random(3))
    import ecfft_tpu as ec

    tree = ec.build_fftree("m61_test", 16)
    rng = random.Random(5)
    coeffs = [[rng.randrange(M61) for _ in range(16)] for _ in range(2)]
    evs = tree.enter(tree.encode(coeffs))
    dom = list(tree.eval_domain())
    for b in range(2):
        assert list(tree.decode(evs[b])) == [
            evaluate(coeffs[b], x, M61) for x in dom
        ]
    assert [list(r) for r in tree.decode(tree.exit(evs))] == coeffs


def test_find_curve_native_python_consistent():
    """Both searches must return verified generators (different RNGs, so
    different curves — the contract is the postcondition)."""
    from ecfft_tpu.find_curve import find_curve

    n_py, pt = find_curve(M61, 4, random.Random(8))
    assert n_py >= 4 and pt.curve.contains(pt.x, pt.y)
    assert two_adicity(pt) == n_py


def test_good_isogeny_chain_on_fresh_curve():
    """The b-label correction must keep the chain exact on discovered
    curves (regression for the non-cyclic-quotient stall)."""
    from ecfft_tpu.ec.curve import find_isogeny_chain
    from ecfft_tpu.native import find_curve_native

    n, a, bb, x, y = find_curve_native(M61, 8, seed=21)
    c = GoodCurve.new_odd(a, bb, M61)
    g = Point(x, y, c)
    # halve to a modest order, then the chain must run to the bottom
    for _ in range(n - 6):
        g = g.double()
    chain = find_isogeny_chain(g)
    assert len(chain) == 6


def test_parallel_curve_search():
    from ecfft_tpu.native import find_curve_parallel

    res = find_curve_parallel(M61, 8, threads=4, seed=9, chunk=5000)
    assert res is not None
    n, a, bb, x, y = res
    c = GoodCurve.new_odd(a, bb, M61)
    assert n >= 8 and c.contains(x, y)
    assert two_adicity(Point(x, y, c)) == n
