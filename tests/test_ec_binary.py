"""Even-characteristic GoodCurve tests over GF(2^m).

Mirrors the reference's EC property tests (ec.rs:563-586 — 2-torsion
points have order two, 2-isogenies map their kernel to identity) for the
`GoodCurve::Even` variant (ec.rs:28-35,47-52,63-73), which the reference
declares but never exercises (it instantiates no binary field). A passing
chain test here is therefore coverage the reference itself lacks.
"""

import random

import pytest

from ecfft_tpu.ec.binary import (
    GoodCurveEven,
    PointB,
    curve_points,
    find_isogeny_chain_even,
    is_odd,
)
from ecfft_tpu.ec.curve import two_adicity
from ecfft_tpu.errors import CurveError
from ecfft_tpu.fields.binary import GF512, F2m, is_irreducible


def test_is_odd_dispatch():
    # utils.rs:350-352: characteristic parity selects the curve variant
    assert is_odd((1 << 31) - 1)
    assert is_odd(
        0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
    )
    assert not is_odd(GF512)


def test_f2m_field_axioms():
    F = GF512
    rng = random.Random(2)
    for _ in range(100):
        a, b, c = (rng.randrange(F.order) for _ in range(3))
        assert F.mul(a, F.add(b, c)) == F.add(F.mul(a, b), F.mul(a, c))
        assert F.mul(F.mul(a, b), c) == F.mul(a, F.mul(b, c))
        assert F.add(a, a) == 0  # char 2
        assert F.square(F.sqrt(a)) == a  # Frobenius bijection
        if a:
            assert F.mul(a, F.inv(a)) == 1


def test_f2m_rejects_reducible_modulus():
    assert not is_irreducible((1 << 9) | 1)  # x^9 + 1 = (x+1)(...)
    with pytest.raises(ValueError):
        F2m(9, (1 << 9) | 1)


def test_quadratic_solver_both_parities():
    # odd m (half-trace) and even m (delta-fold) paths
    for F in (GF512, F2m(6, (1 << 6) | (1 << 1) | 1)):
        solvable = 0
        for c in range(F.order):
            z = F.solve_quadratic(c)
            if z is None:
                assert F.trace(c) == 1
            else:
                assert F.add(F.square(z), z) == c
                solvable += 1
        assert solvable == F.order // 2


def test_new_even_rejects_singular():
    with pytest.raises(CurveError):
        GoodCurveEven.new_even(GF512, 0)  # ec.rs:49


def test_good_point_and_two_torsion():
    # ec.rs:563-572 analogue: (0,0) is on E_B and has order exactly two;
    # the good point (b, b) is on the curve
    c = GoodCurveEven.new_even(GF512, 2)
    gp = c.good_point()
    assert gp.x == gp.y == c.b  # ec.rs:56
    assert c.contains(gp.x, gp.y)
    t = PointB(0, 0, c)
    assert c.contains(0, 0)
    assert not t.is_zero()
    assert t.double().is_zero()


def test_group_law_closure_and_structure():
    F = GF512
    c = GoodCurveEven.new_even(F, 2)
    pts = curve_points(c)
    # every enumerated point is on the curve; order = #pts + infinity
    assert all(c.contains(p.x, p.y) for p in pts)
    n = len(pts) + 1
    assert n == 512  # 2-power group: the ideal even good curve
    rng = random.Random(3)
    sample = rng.sample(pts, 12)
    for i in range(0, 12, 3):
        a, b, d = sample[i], sample[i + 1], sample[i + 2]
        s = a + b
        if not s.is_zero():
            assert c.contains(s.x, s.y)  # closure
        assert (a + b) + d == a + (b + d)  # associativity
        assert a + (-a) == PointB.zero()  # inverses
        assert (a * n).is_zero()  # Lagrange
    # Silverman negation in char 2 with a1=1: -(x,y) = (x, y+x)
    p0 = sample[0]
    assert (-p0).y == F.add(p0.y, p0.x)


def test_good_isogeny_kernel_and_codomain():
    # ec.rs:575-586 analogue for the even closed form (ec.rs:63-73):
    # kernel {O, (0,0)} maps to identity; images land on the codomain
    F = GF512
    c = GoodCurveEven.new_even(F, 2)
    iso = c.good_isogeny()
    assert iso.codomain.b == F.sqrt(c.b)  # B' = b (ec.rs:65)
    assert iso.map(PointB.zero()).is_zero()
    assert iso.map(PointB(0, 0, c)).is_zero()  # x-map pole at kernel
    pts = curve_points(c)
    rng = random.Random(4)
    for p in rng.sample(pts, 10):
        q = iso.map(p)
        if not q.is_zero():
            assert iso.codomain.contains(q.x, q.y)
    # homomorphism: φ(P + Q) = φ(P) + φ(Q)
    for _ in range(5):
        p, q = rng.sample(pts, 2)
        assert iso.map(p + q) == iso.map(p) + iso.map(q)


def test_good_isogeny_two_to_one_on_x():
    # the FFTree 2-to-1 invariant (fftree.rs:63-66): r(x(P)) = r(x(P+T))
    # for the kernel point T = (0,0)
    c = GoodCurveEven.new_even(GF512, 2)
    iso = c.good_isogeny()
    t = PointB(0, 0, c)
    pts = curve_points(c)
    rng = random.Random(5)
    for p in rng.sample(pts, 10):
        q = p + t
        if p.x == 0 or q.x == 0:
            continue
        assert iso.r(p.x) == iso.r(q.x)


def test_find_isogeny_chain_even_full_depth():
    # ec.rs:177-189 with the Even arm: a full 2^9-order generator walks a
    # 9-step chain, adicity dropping by exactly one per step. Char-2
    # chains cannot stall (sqrt is total), unlike the odd case.
    F = GF512
    c = GoodCurveEven.new_even(F, 2)
    pts = curve_points(c)
    gen = max(pts, key=lambda p: two_adicity(p) or 0)
    k = two_adicity(gen)
    assert k == 9
    chain = find_isogeny_chain_even(gen)
    assert len(chain) == k
    g = gen
    for i, iso in enumerate(chain):
        assert iso.domain == g.curve
        g = iso.map(g)
        assert two_adicity(g) == k - i - 1
    assert g.is_zero()
