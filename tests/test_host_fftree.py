"""Host-oracle FFTree tests: golden-value bit-exactness vs naive evaluation
with fixed seeds, algebraic round-trips, subtree semantics — the reference's
own test strategy (SURVEY.md §4; /root/reference/src/lib.rs:87-280)."""

import random

import pytest

from ecfft_tpu.fields.registry import FIELDS
from ecfft_tpu.host.fftree import S0, S1, build_host_fftree
from ecfft_tpu.utils.poly import evaluate

_TREES = {}


def get_tree(field: str, n: int = 64):
    # one shared tree per field, lazily built (lib.rs:102-106 pattern)
    key = (field, n)
    if key not in _TREES:
        _TREES[key] = build_host_fftree(field, n)
    return _TREES[key]


@pytest.fixture(params=["m31", "secp256k1"])
def field(request):
    return request.param


def test_evaluates_polynomial(field):
    # lib.rs:109-120 / lib.rs:240-251
    n = 64
    p = FIELDS[field].p
    tree = get_tree(field)
    rng = random.Random(1)
    coeffs = [rng.randrange(p) for _ in range(n)]
    evals = tree.enter(coeffs)
    dom = tree.subtree_with_size(n).eval_domain()
    assert evals == [evaluate(coeffs, x, p) for x in dom]


def test_extends_evaluations_s0_to_s1(field):
    # lib.rs:123-136
    n = 64
    p = FIELDS[field].p
    tree = get_tree(field)
    rng = random.Random(1)
    coeffs = [rng.randrange(p) for _ in range(n // 2)]
    dom = tree.subtree_with_size(n).eval_domain()
    s0_evals = [evaluate(coeffs, x, p) for x in dom[0::2]]
    actual = tree.extend(s0_evals, S1)
    assert actual == [evaluate(coeffs, x, p) for x in dom[1::2]]


def test_extends_evaluations_s1_to_s0(field):
    # lib.rs:139-152
    n = 64
    p = FIELDS[field].p
    tree = get_tree(field)
    rng = random.Random(1)
    coeffs = [rng.randrange(p) for _ in range(n // 2)]
    dom = tree.subtree_with_size(n).eval_domain()
    s1_evals = [evaluate(coeffs, x, p) for x in dom[1::2]]
    actual = tree.extend(s1_evals, S0)
    assert actual == [evaluate(coeffs, x, p) for x in dom[0::2]]


def test_interpolates_evaluations(field):
    # lib.rs:254-264: exit ∘ enter == id
    p = FIELDS[field].p
    tree = get_tree(field)
    coeffs = [1, 1, 5, 0, 0, 1, 0, 0]
    evals = tree.enter(coeffs)
    assert tree.exit(evals) == coeffs


def test_determines_degree(field):
    # lib.rs:267-278
    tree = get_tree(field)
    coeffs = [1, 1, 1, 0, 0, 1, 0, 0]
    evals = tree.enter(coeffs)
    assert tree.degree(evals) == 5


def test_degree_of_low_degree_table(field):
    tree = get_tree(field)
    coeffs = [7, 3, 0, 0, 0, 0, 0, 0]
    evals = tree.enter(coeffs)
    assert tree.degree(evals) == 1


def test_mextend_monic(field):
    # mextend extends monic polys of degree exactly n/2 (fftree.rs:128-141)
    n = 16
    p = FIELDS[field].p
    tree = get_tree(field)
    rng = random.Random(5)
    # monic degree-n/2 polynomial
    coeffs = [rng.randrange(p) for _ in range(n // 2)] + [1]
    dom = tree.subtree_with_size(n).eval_domain()
    s0_evals = [evaluate(coeffs, x, p) for x in dom[0::2]]
    actual = tree.mextend(s0_evals, S1)
    assert actual == [evaluate(coeffs, x, p) for x in dom[1::2]]


def test_vanish(field):
    # fftree.rs:291-316: Z(x) = ∏ (x - a_i) over S
    n = 64
    p = FIELDS[field].p
    tree = get_tree(field)
    rng = random.Random(7)
    pts = [rng.randrange(p) for _ in range(n // 2)]
    vz = tree.vanish(pts)
    dom = tree.subtree_with_size(n).eval_domain()
    for x, v in zip(dom, vz):
        acc = 1
        for a in pts:
            acc = acc * (x - a) % p
        assert v == acc


def test_modular_reduce_xnn(field):
    # MOD with a = X^(n/2): result should be evals of P mod X^(n/2)
    n = 32
    p = FIELDS[field].p
    tree = get_tree(field).subtree_with_size(n)
    rng = random.Random(9)
    coeffs = [rng.randrange(p) for _ in range(n)]
    evals = tree.enter(coeffs)
    reduced = tree.modular_reduce(evals, tree.xnn_s, tree.z0z0_rem_xnn_s)
    lo = coeffs[: n // 2]
    dom = tree.eval_domain()
    assert reduced == [evaluate(lo, x, p) for x in dom]


def test_subtree_domain_is_even_strided(field):
    # fftree.rs:465-482
    tree = get_tree(field)
    st = tree.subtree
    assert st.eval_domain() == tree.eval_domain()[0::2]
    assert len(st.rational_maps) == len(tree.rational_maps) - 1


def test_subtree_with_size_too_large_raises(field):
    tree = get_tree(field)
    with pytest.raises(ValueError):
        tree.subtree_with_size(128)


def test_build_fftree_size_limit():
    # lib.rs:62-64: None when n exceeds subgroup two-adicity
    from ecfft_tpu.fields.registry import FIELDS, build_domain

    assert build_domain(FIELDS["secp256k1"], 1 << 36) is None
