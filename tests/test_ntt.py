"""Classical NTT on the schedule machine (benches/comparison.rs parity):
exactness vs naive evaluation at root powers, roundtrip, both the STARK
prime and a small generic prime."""

import random

import pytest

from ecfft_tpu.ntt import STARK_P, NTTPlan
from ecfft_tpu.utils.poly import evaluate


def test_ntt_stark_prime_matches_naive():
    n = 32
    plan = NTTPlan(n)
    rng = random.Random(3)
    coeffs = [[rng.randrange(STARK_P) for _ in range(n)] for _ in range(2)]
    ev = plan.ntt(plan.encode(coeffs))
    w = pow(3, (STARK_P - 1) // n, STARK_P)
    dom = [pow(w, i, STARK_P) for i in range(n)]
    for b in range(2):
        assert list(plan.decode(ev[b])) == [
            evaluate(coeffs[b], x, STARK_P) for x in dom
        ]


def test_intt_roundtrip():
    n = 64
    plan = NTTPlan(n)
    rng = random.Random(4)
    coeffs = [[rng.randrange(STARK_P) for _ in range(n)]]
    assert [
        list(r) for r in plan.decode(plan.intt(plan.ntt(plan.encode(coeffs))))
    ] == coeffs


def test_ntt_small_prime():
    p, n = 97, 32
    plan = NTTPlan(n, p=p, generator=5)
    rng = random.Random(5)
    coeffs = [[rng.randrange(p) for _ in range(n)]]
    ev = plan.ntt(plan.encode(coeffs))
    w = pow(5, (p - 1) // n, p)
    assert list(plan.decode(ev[0])) == [
        evaluate(coeffs[0], pow(w, i, p), p) for i in range(n)
    ]


def test_ntt_rejects_insufficient_two_adicity():
    with pytest.raises(AssertionError):
        NTTPlan(64, p=97, generator=5)  # 97-1 has 2-adicity 5 < 6
