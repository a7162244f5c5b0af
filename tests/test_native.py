"""Native C++ engine tests: cross-implementation validation against the
host oracle, and native-built device trees vs jax-built (bit-exact)."""

import random

import numpy as np
import pytest

from ecfft_tpu.fields.registry import FIELDS
from ecfft_tpu.host.fftree import S0, S1, build_host_fftree
from ecfft_tpu.native import NativeFFTree, build_fftree_native, mont_mul_ns

_CACHE = {}


def pair(field, n):
    if (field, n) not in _CACHE:
        _CACHE[(field, n)] = (
            NativeFFTree(field, n),
            build_host_fftree(field, n),
        )
    return _CACHE[(field, n)]


CASES = [("m31", 64), ("secp256k1", 64)]


@pytest.fixture(params=CASES, ids=[f"{f}-{n}" for f, n in CASES])
def trees(request):
    field, n = request.param
    return (FIELDS[field], n, *pair(field, n))


def test_native_tables_match_oracle(trees):
    spec, n, nt, host = trees
    m = 2
    while m <= n:
        ht = host.subtree_with_size(m)
        for key, hv in [
            ("leaves", ht.eval_domain()),
            ("xnn_s", ht.xnn_s),
            ("xnn_s_inv", ht.xnn_s_inv),
            ("z0_s1", ht.z0_s1),
            ("z1_s0", ht.z1_s0),
            ("z0z0_rem_xnn_s", ht.z0z0_rem_xnn_s),
            ("z1z1_rem_xnn_s", ht.z1z1_rem_xnn_s),
        ]:
            assert nt.table(m, key) == list(hv), f"size {m} {key}"
        m *= 2


def test_native_algorithms_match_oracle(trees):
    spec, n, nt, host = trees
    rng = random.Random(3)
    coeffs = [rng.randrange(spec.p) for _ in range(n)]
    evals = host.enter(coeffs)
    assert nt.enter(coeffs) == evals
    assert nt.exit(evals) == coeffs
    half = [rng.randrange(spec.p) for _ in range(n // 2)]
    assert nt.extend(half, 1) == host.extend(half, S1)
    assert nt.extend(half, 0) == host.extend(half, S0)
    assert nt.mextend(half, 1) == host.mextend(half, S1)
    assert nt.degree(evals) == host.degree(evals)
    pts = [rng.randrange(spec.p) for _ in range(n // 2)]
    assert nt.vanish(pts) == host.vanish(pts)
    assert nt.redc_z0(evals, host.xnn_s) == host.redc_z0(evals, host.xnn_s)
    assert nt.modular_reduce(evals, host.xnn_s, host.z0z0_rem_xnn_s) == (
        host.modular_reduce(evals, host.xnn_s, host.z0z0_rem_xnn_s)
    )


def test_native_built_device_tree_bit_exact():
    """The native fast-construction path and the on-device bootstrap must
    produce identical device tables."""
    from ecfft_tpu.fftree import FFTree

    field, n = "m31", 32
    nt = build_fftree_native(field, n)
    jt = FFTree.build(field, n)
    for m in jt.tables:
        for key in (
            "leaves", "xnn_s", "xnn_s_inv", "z0_s1", "z1_s0", "z0_inv_s1",
            "z1_inv_s0", "z0z0_rem_xnn_s", "z1z1_rem_xnn_s",
        ):
            assert np.array_equal(
                np.asarray(nt.tables[m][key]), np.asarray(jt.tables[m][key])
            ), (m, key)
        for a4, b4 in zip(nt.tables[m]["mats"], jt.tables[m]["mats"]):
            for x, y in zip(a4, b4):
                assert np.array_equal(np.asarray(x), np.asarray(y))


def test_native_oversize_raises():
    with pytest.raises(ValueError):
        NativeFFTree("secp256k1", 1 << 36)


def test_mont_mul_benchmark_runs():
    ns = mont_mul_ns("secp256k1", 100_000)
    assert 5 < ns < 5000  # sane single-core Montgomery mul latency
