"""FFTree over GF(2^m) — the reference's field-generic `FFTree::new`
capability (fftree.rs:42, generic over any arkworks Field) exercised for a
binary field, which the reference declares (GoodCurve::Even, ec.rs:28-35)
but never instantiates. The host oracle threads a duck-typed field object
through all eight algorithms, so the SAME code that runs F_p runs GF(2^m).
"""

import random

import pytest

from ecfft_tpu.fields.binary import GF512
from ecfft_tpu.host.fftree import S0, S1, build_host_fftree_even


@pytest.fixture(scope="module")
def btree():
    t = build_host_fftree_even(GF512, 16)
    assert t is not None
    return t


def _naive_eval(F, coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = F.add(F.mul(acc, x), c)
    return acc


def test_even_tree_enter_matches_naive(btree):
    # lib.rs:109-120's oracle pattern over the curve-point domain
    F = GF512
    rng = random.Random(3)
    coeffs = [rng.randrange(F.order) for _ in range(16)]
    evals = btree.enter(coeffs)
    dom = btree.eval_domain()
    assert evals == [_naive_eval(F, coeffs, x) for x in dom]


def test_even_tree_exit_roundtrip(btree):
    # lib.rs:254-264: exit ∘ enter == id
    F = GF512
    rng = random.Random(4)
    coeffs = [rng.randrange(F.order) for _ in range(16)]
    assert btree.exit(btree.enter(coeffs)) == coeffs


def test_even_tree_extend_consistency(btree):
    # lib.rs:123-152: extend moves evals between moieties of one poly
    F = GF512
    rng = random.Random(5)
    coeffs = [rng.randrange(F.order) for _ in range(8)]
    dom = btree.eval_domain()
    e0 = [_naive_eval(F, coeffs, x) for x in dom[0::2]]
    e1 = [_naive_eval(F, coeffs, x) for x in dom[1::2]]
    assert btree.extend(e0, S1) == e1
    assert btree.extend(e1, S0) == e0


def test_even_tree_degree_and_vanish(btree):
    F = GF512
    rng = random.Random(6)
    for d in (0, 3, 7, 12, 15):
        coeffs = [rng.randrange(F.order) for _ in range(d)]
        coeffs.append(rng.randrange(1, F.order))
        coeffs += [0] * (16 - d - 1)
        assert btree.degree(btree.enter(coeffs)) == d
    # vanish: Z(x) = prod (x - a_i) evaluated over the domain
    pts = [rng.randrange(F.order) for _ in range(8)]
    got = btree.vanish(pts)
    dom = btree.eval_domain()
    for x, zv in zip(dom, got):
        expect = 1
        for a in pts:
            expect = F.mul(expect, F.sub(x, a))
        assert zv == expect


def test_even_tree_subtree_chain(btree):
    # subtree = even-indexed leaves (fftree.rs:465-482); sizes 16→2 all work
    F = GF512
    rng = random.Random(7)
    st = btree.subtree_with_size(8)
    coeffs = [rng.randrange(F.order) for _ in range(8)]
    dom = st.eval_domain()
    assert dom == btree.eval_domain()[0::2]
    assert st.enter(coeffs) == [_naive_eval(F, coeffs, x) for x in dom]
