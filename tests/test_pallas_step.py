"""Pallas fused-step kernel: interpret-mode exactness vs python ints
(the TPU-compiled path is validated on hardware by bench/calibration)."""

import random

import jax.numpy as jnp
import pytest

from ecfft_tpu.fields import device as fd
from ecfft_tpu.fields.registry import FIELDS
from ecfft_tpu.ops.pallas_step import pallas_muladd1, pallas_muladd2


def test_pallas_muladd2_matches_ints():
    spec = FIELDS["secp256k1"]
    p = spec.p
    W, B = 16, 4
    rng = random.Random(3)
    A_i = [rng.randrange(p) for _ in range(W)]
    B_i = [rng.randrange(p) for _ in range(W)]
    x1_i = [[rng.randrange(p) for _ in range(B)] for _ in range(W)]
    x2_i = [[rng.randrange(p) for _ in range(B)] for _ in range(W)]
    A = fd.encode(spec, A_i)
    Bc = fd.encode(spec, B_i)
    x1 = jnp.transpose(fd.encode(spec, x1_i), (0, 2, 1))
    x2 = jnp.transpose(fd.encode(spec, x2_i), (0, 2, 1))
    out = pallas_muladd2(spec, A, Bc, x1, x2, True)
    got = fd.decode(spec, jnp.transpose(out, (0, 2, 1)))
    for w in range(W):
        for b in range(B):
            assert got[w][b] == (A_i[w] * x1_i[w][b] + B_i[w] * x2_i[w][b]) % p


def test_pallas_muladd2_edge_values():
    spec = FIELDS["secp256k1"]
    p = spec.p
    B = 4
    E = [0, 1, p - 1, p - 2, p // 2, 2**16, 2**255 % p, (p - 1) // 2] * 2
    Ae = fd.encode(spec, E)
    x1e = jnp.transpose(fd.encode(spec, [[v] * B for v in E]), (0, 2, 1))
    out = pallas_muladd2(spec, Ae, Ae, x1e, x1e, True)
    got = fd.decode(spec, jnp.transpose(out, (0, 2, 1)))
    for w, v in enumerate(E):
        for b in range(B):
            assert got[w][b] == 2 * v * v % p


def test_pallas_mont_kernel_matches_ints():
    """Fold-unfriendly prime (the comparison bench's STARK prime): the
    CIOS Montgomery kernel computes (A·x1 + B·x2)·R⁻¹ on Montgomery-form
    residents — composing with the schedule's entry/exit conversions
    this is exact field arithmetic (ops/schedule.py run_schedule)."""
    from ecfft_tpu.fields.registry import spec_for_prime
    from ecfft_tpu.ntt import STARK_P

    spec = spec_for_prime(STARK_P, "stark_pallas_test")
    assert spec.fold_terms is None
    p = spec.p
    R = 1 << (16 * spec.num_limbs)
    R_inv = pow(R, -1, p)
    W, B = 16, 4
    rng = random.Random(7)
    A_i = [rng.randrange(p) for _ in range(W)]
    B_i = [rng.randrange(p) for _ in range(W)]
    x1_i = [[rng.randrange(p) for _ in range(B)] for _ in range(W)]
    x2_i = [[rng.randrange(p) for _ in range(B)] for _ in range(W)]
    A = fd.encode(spec, A_i)
    Bc = fd.encode(spec, B_i)
    x1 = jnp.transpose(fd.encode(spec, x1_i), (0, 2, 1))
    x2 = jnp.transpose(fd.encode(spec, x2_i), (0, 2, 1))
    out = pallas_muladd2(spec, A, Bc, x1, x2, True)
    got = fd.decode(spec, jnp.transpose(out, (0, 2, 1)))
    for w in range(W):
        for b in range(B):
            exp = (A_i[w] * x1_i[w][b] + B_i[w] * x2_i[w][b]) * R_inv % p
            assert got[w][b] == exp


def test_pallas_muladd1_matches_ints():
    """The 1-mul OP_AFF1 kernel: x1 + C·x2 (scaled butterfly levels)."""
    spec = FIELDS["secp256k1"]
    p = spec.p
    W, B = 16, 4
    rng = random.Random(11)
    C_i = [rng.randrange(p) for _ in range(W)]
    x1_i = [[rng.randrange(p) for _ in range(B)] for _ in range(W)]
    x2_i = [[rng.randrange(p) for _ in range(B)] for _ in range(W)]
    C = fd.encode(spec, C_i)
    x1 = jnp.transpose(fd.encode(spec, x1_i), (0, 2, 1))
    x2 = jnp.transpose(fd.encode(spec, x2_i), (0, 2, 1))
    out = pallas_muladd1(spec, C, x1, x2, True)
    got = fd.decode(spec, jnp.transpose(out, (0, 2, 1)))
    for w in range(W):
        for b in range(B):
            assert got[w][b] == (x1_i[w][b] + C_i[w] * x2_i[w][b]) % p


def test_pallas_muladd1_mont_matches_ints():
    """Montgomery variant: x1 + (C·x2)·R⁻¹ on Montgomery residents
    composes to exact x1 + C·x2 through the schedule's conversions."""
    from ecfft_tpu.fields.registry import spec_for_prime
    from ecfft_tpu.ntt import STARK_P

    spec = spec_for_prime(STARK_P, "stark_pallas_test1")
    p = spec.p
    R_inv = pow(1 << (16 * spec.num_limbs), -1, p)
    W, B = 16, 4
    rng = random.Random(13)
    C_i = [rng.randrange(p) for _ in range(W)]
    x1_i = [[rng.randrange(p) for _ in range(B)] for _ in range(W)]
    x2_i = [[rng.randrange(p) for _ in range(B)] for _ in range(W)]
    C = fd.encode(spec, C_i)
    x1 = jnp.transpose(fd.encode(spec, x1_i), (0, 2, 1))
    x2 = jnp.transpose(fd.encode(spec, x2_i), (0, 2, 1))
    out = pallas_muladd1(spec, C, x1, x2, True)
    got = fd.decode(spec, jnp.transpose(out, (0, 2, 1)))
    for w in range(W):
        for b in range(B):
            exp = (x1_i[w][b] + C_i[w] * x2_i[w][b] * R_inv) % p
            assert got[w][b] == exp


def _mk_state(spec, W, B, rng):
    vals = [[rng.randrange(spec.p) for _ in range(B)] for _ in range(W)]
    return vals, jnp.transpose(fd.encode(spec, vals), (0, 2, 1))


def test_pallas_inplace_aff1s_matches_ints():
    """In-place self-read 1-mul step (OP_AFF1S): the window
    [start, start+A) becomes state + C·x2 and every row outside the
    window is untouched."""
    from ecfft_tpu.ops.pallas_step import pallas_aff1s_ip

    spec = FIELDS["secp256k1"]
    p = spec.p
    W, A, B, start = 32, 16, 4, 8
    rng = random.Random(17)
    st_i, state = _mk_state(spec, W, B, rng)
    x2_i, x2 = _mk_state(spec, A, B, rng)
    C_i = [rng.randrange(p) for _ in range(A)]
    C = fd.encode(spec, C_i)
    out = pallas_aff1s_ip(spec, C, state, x2, jnp.int32(start), True)
    got = fd.decode(spec, jnp.transpose(out, (0, 2, 1)))
    for w in range(W):
        for b in range(B):
            if start <= w < start + A:
                q = w - start
                exp = (st_i[w][b] + C_i[q] * x2_i[q][b]) % p
            else:
                exp = st_i[w][b]
            assert got[w][b] == exp, (w, b)


def test_pallas_inplace_aff1g_and_aff2g_match_ints():
    """In-place gathered-x1 variants (OP_AFF1 / OP_AFFINE)."""
    from ecfft_tpu.ops.pallas_step import pallas_aff1g_ip, pallas_aff2g_ip

    spec = FIELDS["secp256k1"]
    p = spec.p
    W, A, B, start = 32, 16, 4, 16
    rng = random.Random(19)
    st_i, state = _mk_state(spec, W, B, rng)
    x1_i, x1 = _mk_state(spec, A, B, rng)
    x2_i, x2 = _mk_state(spec, A, B, rng)
    A_i = [rng.randrange(p) for _ in range(A)]
    B_i = [rng.randrange(p) for _ in range(A)]
    Ac = fd.encode(spec, A_i)
    Bc = fd.encode(spec, B_i)
    out = pallas_aff1g_ip(spec, Bc, state, x1, x2, jnp.int32(start), True)
    got = fd.decode(spec, jnp.transpose(out, (0, 2, 1)))
    for w in range(W):
        for b in range(B):
            if start <= w < start + A:
                q = w - start
                exp = (x1_i[q][b] + B_i[q] * x2_i[q][b]) % p
            else:
                exp = st_i[w][b]
            assert got[w][b] == exp, (w, b)
    out2 = pallas_aff2g_ip(spec, Ac, Bc, state, x1, x2, jnp.int32(start),
                           True)
    got2 = fd.decode(spec, jnp.transpose(out2, (0, 2, 1)))
    for w in range(W):
        for b in range(B):
            if start <= w < start + A:
                q = w - start
                exp = (A_i[q] * x1_i[q][b] + B_i[q] * x2_i[q][b]) % p
            else:
                exp = st_i[w][b]
            assert got2[w][b] == exp, (w, b)


def test_pallas_rejects_unpadded_width():
    spec = FIELDS["secp256k1"]
    z = jnp.zeros((10, 16, 4), jnp.uint32)
    c = jnp.zeros((10, 16), jnp.uint32)
    with pytest.raises(AssertionError):
        pallas_muladd2(spec, c, c, z, z, True)
