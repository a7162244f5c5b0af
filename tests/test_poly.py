"""Polynomial toolbox tests (mirrors /root/reference/src/utils.rs:392-457)."""

import random

from ecfft_tpu.fields.registry import M31_P
from ecfft_tpu.utils.poly import (
    add,
    derivative,
    div_rem,
    evaluate,
    find_roots,
    gcd,
    mul,
    pow_mod,
    rand_poly,
    xgcd,
)

P = M31_P


def test_finds_roots_of_cubic():
    # x^3 - 4x over m31 (utils.rs:401-414)
    f = [0, (-4) % P, 0, 1]
    assert find_roots(f, P) == [0, 2, 2147483645]


def test_xgcd_bezout_random():
    rng = random.Random(0)
    a = rand_poly(5, P, rng)
    b = rand_poly(5, P, rng)
    s, t, g = xgcd(a, b, P)
    assert add(mul(a, s, P), mul(b, t, P), P) == g


def test_xgcd_with_zero_polynomial():
    rng = random.Random(0)
    b = rand_poly(5, P, rng)
    s, t, g = xgcd([], b, P)
    assert s == []
    assert mul(b, t, P) == g
    assert g != []


def test_gcd_common_factor():
    # (x+1)(x-1) and (x+1)x share x+1
    a = mul([1, 1], [(-1) % P, 1], P)
    b = mul([1, 1], [0, 1], P)
    assert gcd(a, b, P) == [1, 1]


def test_pow_mod_matches_naive():
    rng = random.Random(3)
    a = rand_poly(4, P, rng)
    m = rand_poly(6, P, rng)
    e = 13
    naive = [1]
    for _ in range(e):
        naive = div_rem(mul(naive, a, P), m, P)
    assert pow_mod(a, e, m, P) == naive


def test_derivative():
    # d/dx (3 + 2x + 5x^2) = 2 + 10x
    assert derivative([3, 2, 5], P) == [2, 10]


def test_evaluate_horner():
    f = [1, 2, 3]
    x = 7
    assert evaluate(f, x, P) == (1 + 2 * 7 + 3 * 49) % P
