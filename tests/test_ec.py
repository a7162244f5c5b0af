"""EC-layer property tests (mirrors /root/reference/src/ec.rs:556-587 plus
constant-validation against the reference's hardcoded field test vectors)."""

from ecfft_tpu.ec.curve import (
    GoodCurve,
    Point,
    ShortWeierstrass,
    find_isogeny_chain,
    two_adicity,
)
from ecfft_tpu.fields.registry import (
    M31_COSET_OFFSET,
    M31_CURVE,
    M31_P,
    M31_SUBGROUP_GENERATOR,
    M31_SUBGROUP_TWO_ADICITY,
    SECP_COSET_OFFSET_X,
    SECP_COSET_OFFSET_Y,
    SECP_CURVE_A,
    SECP_CURVE_BB,
    SECP_P,
    SECP_SUBGROUP_GEN_X,
    SECP_SUBGROUP_GEN_Y,
    SECP_SUBGROUP_TWO_ADICITY,
)


def test_two_torsion_points_have_order_two():
    # ec.rs:563-572
    curve = ShortWeierstrass(1, 0, M31_P)
    pts = curve.two_torsion_points()
    assert pts
    for p in pts:
        assert not p.is_zero()
        assert (p + p).is_zero()


def test_two_isogenies_map_kernel_to_identity():
    # ec.rs:575-586: kernel x-coords are poles of the x-map
    curve = ShortWeierstrass(1, 0, M31_P)
    for p in curve.two_torsion_points():
        for iso in curve.two_isogenies():
            assert iso.r(p.x) is None


def test_m31_reference_constants_on_curve():
    # lib.rs:200-206 constants are points on y^2 = x^3 + x
    assert M31_CURVE.contains(M31_COSET_OFFSET.x, M31_COSET_OFFSET.y)
    assert M31_CURVE.contains(
        M31_SUBGROUP_GENERATOR.x, M31_SUBGROUP_GENERATOR.y
    )
    assert two_adicity(M31_SUBGROUP_GENERATOR) == M31_SUBGROUP_TWO_ADICITY


def test_secp_reference_constants_on_curve():
    # lib.rs:45-59 constants lie on the good curve; generator has 2-adicity 36
    curve = GoodCurve.new_odd(SECP_CURVE_A, SECP_CURVE_BB, SECP_P)
    assert curve.contains(SECP_COSET_OFFSET_X, SECP_COSET_OFFSET_Y)
    assert curve.contains(SECP_SUBGROUP_GEN_X, SECP_SUBGROUP_GEN_Y)
    gen = Point(SECP_SUBGROUP_GEN_X, SECP_SUBGROUP_GEN_Y, curve)
    assert two_adicity(gen) == SECP_SUBGROUP_TWO_ADICITY


def test_good_isogeny_chain_halves_adicity():
    # ec.rs:177-189: each good isogeny drops two-adicity by exactly 1
    curve = GoodCurve.new_odd(SECP_CURVE_A, SECP_CURVE_BB, SECP_P)
    gen = Point(SECP_SUBGROUP_GEN_X, SECP_SUBGROUP_GEN_Y, curve)
    # halve down to order 2^4 first to keep the test fast (lib.rs:67-70)
    for _ in range(SECP_SUBGROUP_TWO_ADICITY - 4):
        gen = gen.double()
    chain = find_isogeny_chain(gen)
    assert len(chain) == 4


def test_group_law_associativity_m31():
    g = M31_SUBGROUP_GENERATOR
    h = M31_COSET_OFFSET
    assert (g + g) + h == g + (g + h)
    assert g + (-g) == Point.zero()
    assert g * 5 == g + g + g + g + g
