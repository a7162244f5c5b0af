"""Device limb-arithmetic tests: bit-exact vs python ints with fixed seeds
(SURVEY.md §7.2 step 1), including adversarial carry-chain patterns and
deep operation chains that would expose residual-bound bugs in the
pseudo-Mersenne fold reduction."""

import random
from functools import partial

import jax
import pytest

from ecfft_tpu.fields import device as dev
from ecfft_tpu.fields.registry import FIELDS


@pytest.fixture(params=["m31", "secp256k1"])
def spec(request):
    return FIELDS[request.param]


def rand_ints(spec, n, seed=1):
    rng = random.Random(seed)
    return [rng.randrange(spec.p) for _ in range(n)]


def test_encode_decode_roundtrip(spec):
    vals = rand_ints(spec, 32) + [0, 1, spec.p - 1]
    assert list(dev.decode(spec, dev.encode(spec, vals))) == vals


def test_add_sub_mul_neg(spec):
    p = spec.p
    a_int, b_int = rand_ints(spec, 64, 1), rand_ints(spec, 64, 2)
    a, b = dev.encode(spec, a_int), dev.encode(spec, b_int)
    assert list(dev.decode(spec, jax.jit(partial(dev.add, spec))(a, b))) == [
        (x + y) % p for x, y in zip(a_int, b_int)
    ]
    assert list(dev.decode(spec, jax.jit(partial(dev.sub, spec))(a, b))) == [
        (x - y) % p for x, y in zip(a_int, b_int)
    ]
    assert list(dev.decode(spec, jax.jit(partial(dev.mul, spec))(a, b))) == [
        (x * y) % p for x, y in zip(a_int, b_int)
    ]
    assert list(dev.decode(spec, jax.jit(partial(dev.neg, spec))(a))) == [
        (-x) % p for x in a_int
    ]


def test_edge_values(spec):
    p = spec.p
    edge = [0, 1, p - 1, p - 2, p // 2, (p - 1) // 2, 2**16 - 1, 2**16]
    if p.bit_length() > 64:
        edge += [int("ffff" * 16, 16) % p, (1 << 255) % p, (1 << 255) - 1]
    ea = dev.encode(spec, edge)
    eb = dev.encode(spec, list(reversed(edge)))
    jmul = jax.jit(partial(dev.mul, spec))
    jadd = jax.jit(partial(dev.add, spec))
    jsub = jax.jit(partial(dev.sub, spec))
    pairs = list(zip(edge, reversed(edge)))
    assert list(dev.decode(spec, jmul(ea, eb))) == [x * y % p for x, y in pairs]
    assert list(dev.decode(spec, jadd(ea, eb))) == [(x + y) % p for x, y in pairs]
    assert list(dev.decode(spec, jsub(ea, eb))) == [(x - y) % p for x, y in pairs]


def test_pow_and_inv(spec):
    p = spec.p
    a_int = rand_ints(spec, 32, 3)
    a = dev.encode(spec, a_int)
    assert list(dev.decode(spec, jax.jit(lambda x: dev.pow_int(spec, x, 5))(a))) == [
        pow(x, 5, p) for x in a_int
    ]
    assert list(
        dev.decode(spec, jax.jit(lambda x: dev.pow_int(spec, x, 123456789))(a))
    ) == [pow(x, 123456789, p) for x in a_int]
    assert list(dev.decode(spec, jax.jit(partial(dev.inv, spec))(a))) == [
        pow(x, -1, p) for x in a_int
    ]
    # inv(0) == 0 (arkworks batch_inversion skip-zeros semantics)
    z = dev.zeros(spec, (3,))
    assert list(dev.decode(spec, jax.jit(partial(dev.inv, spec))(z))) == [0, 0, 0]


def test_deep_mul_chain(spec):
    """50 rounds of x ← x² + y: any fold/carry bound violation compounds."""
    p = spec.p
    a_int, b_int = rand_ints(spec, 32, 4), rand_ints(spec, 32, 5)
    a, b = dev.encode(spec, a_int), dev.encode(spec, b_int)

    def chain(x, y):
        for _ in range(50):
            x = dev.add(spec, dev.mul(spec, x, x), y)
        return x

    got = list(dev.decode(spec, jax.jit(chain)(a, b)))
    exp = []
    for x, y in zip(a_int, b_int):
        for _ in range(50):
            x = (x * x + y) % p
        exp.append(x)
    assert got == exp


def test_mat2_apply(spec):
    p = spec.p
    rng = random.Random(6)
    m_int = [[[rng.randrange(p) for _ in range(2)] for _ in range(2)] for _ in range(32)]
    v0_int, v1_int = rand_ints(spec, 32, 7), rand_ints(spec, 32, 8)
    m, v0, v1 = (dev.encode(spec, x) for x in (m_int, v0_int, v1_int))
    r0, r1 = jax.jit(partial(dev.mat2_apply, spec))(m, v0, v1)
    assert list(dev.decode(spec, r0)) == [
        (mm[0][0] * x + mm[0][1] * y) % p for mm, x, y in zip(m_int, v0_int, v1_int)
    ]
    assert list(dev.decode(spec, r1)) == [
        (mm[1][0] * x + mm[1][1] * y) % p for mm, x, y in zip(m_int, v0_int, v1_int)
    ]


def test_randomized_bulk(spec):
    p = spec.p
    a_int, b_int = rand_ints(spec, 2048, 9), rand_ints(spec, 2048, 10)
    a, b = dev.encode(spec, a_int), dev.encode(spec, b_int)
    got = list(dev.decode(spec, jax.jit(partial(dev.mul, spec))(a, b)))
    assert got == [x * y % p for x, y in zip(a_int, b_int)]
