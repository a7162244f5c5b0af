"""Device FFTree vs host oracle: table-level golden parity plus all eight
algorithms, batched (SURVEY.md §7.2 step 4). secp256k1 runs at n=16 to
keep first-run XLA CPU compile time in check (results are cached
persistently); m31 runs at the reference's own test size n=64
(lib.rs:105)."""

import random

import numpy as np
import pytest

from ecfft_tpu.fftree import S0, S1, FFTree
from ecfft_tpu.fields.registry import FIELDS
from ecfft_tpu.host.fftree import build_host_fftree

_CACHE = {}


def get_trees(field: str, n: int):
    key = (field, n)
    if key not in _CACHE:
        _CACHE[key] = (FFTree.build(field, n), build_host_fftree(field, n))
    return _CACHE[key]


CASES = [("m31", 64), ("secp256k1", 16)]


@pytest.fixture(params=CASES, ids=[f"{f}-{n}" for f, n in CASES])
def trees(request):
    field, n = request.param
    return (FIELDS[field], n, *get_trees(field, n))


def test_tables_match_host_oracle(trees):
    spec, n, dev, host = trees
    m = 2
    while m <= n:
        ht = host.subtree_with_size(m)
        dt = dev.tables[m]
        for key, hv in [
            ("leaves", ht.eval_domain()),
            ("xnn_s", ht.xnn_s),
            ("xnn_s_inv", ht.xnn_s_inv),
            ("z0_s1", ht.z0_s1),
            ("z1_s0", ht.z1_s0),
            ("z0_inv_s1", ht.z0_inv_s1),
            ("z1_inv_s0", ht.z1_inv_s0),
            ("z0z0_rem_xnn_s", ht.z0z0_rem_xnn_s),
            ("z1z1_rem_xnn_s", ht.z1z1_rem_xnn_s),
        ]:
            assert list(dev.decode(dt[key])) == list(hv), f"size {m}: {key}"
        m *= 2


def test_enter_matches_oracle_batched(trees):
    spec, n, dev, host = trees
    rng = random.Random(1)
    coeffs = [[rng.randrange(spec.p) for _ in range(n)] for _ in range(3)]
    evs = dev.enter(dev.encode(coeffs))
    for bi in range(3):
        assert list(dev.decode(evs[bi])) == host.enter(coeffs[bi])


def test_exit_roundtrip(trees):
    spec, n, dev, host = trees
    rng = random.Random(2)
    coeffs = [[rng.randrange(spec.p) for _ in range(n)] for _ in range(2)]
    evs = dev.enter(dev.encode(coeffs))
    back = dev.exit(evs)
    assert [list(r) for r in dev.decode(back)] == coeffs


def test_extend_both_moieties(trees):
    spec, n, dev, host = trees
    rng = random.Random(3)
    half = [[rng.randrange(spec.p) for _ in range(n // 2)] for _ in range(2)]
    enc = dev.encode(half)
    for moiety in (S0, S1):
        got = dev.extend(enc, moiety)
        for bi in range(2):
            assert list(dev.decode(got[bi])) == host.extend(half[bi], moiety)


def test_mextend(trees):
    spec, n, dev, host = trees
    rng = random.Random(4)
    half = [[rng.randrange(spec.p) for _ in range(n // 2)]]
    enc = dev.encode(half)
    for moiety in (S0, S1):
        got = dev.mextend(enc, moiety)
        assert list(dev.decode(got[0])) == host.mextend(half[0], moiety)


def test_degree_batched_mixed(trees):
    spec, n, dev, host = trees
    rng = random.Random(5)
    degs = [0, 1, n // 2 - 1, n // 2, n - 1]
    coeffs = []
    for d in degs:
        c = [rng.randrange(spec.p) for _ in range(d)]
        c.append(rng.randrange(1, spec.p))
        c += [0] * (n - d - 1)
        coeffs.append(c)
    evs = dev.enter(dev.encode(coeffs))
    assert list(np.asarray(dev.degree(evs))) == degs


def test_vanish(trees):
    spec, n, dev, host = trees
    rng = random.Random(6)
    pts = [[rng.randrange(spec.p) for _ in range(n // 2)]]
    got = dev.vanish(dev.encode(pts))
    assert list(dev.decode(got[0])) == host.vanish(pts[0])


def test_redc_and_mod(trees):
    spec, n, dev, host = trees
    rng = random.Random(7)
    vals = [rng.randrange(spec.p) for _ in range(n)]
    enc = dev.encode([vals])
    a = dev.tables[n]["xnn_s"]
    got = dev.redc_z0(enc, a)
    assert list(dev.decode(got[0])) == host.redc_z0(vals, host.xnn_s)
    got = dev.modular_reduce(enc, a, dev.tables[n]["z0z0_rem_xnn_s"])
    assert list(dev.decode(got[0])) == host.modular_reduce(
        vals, host.xnn_s, host.z0z0_rem_xnn_s
    )
    # z1 variant against the host oracle (fftree.rs:272-275)
    a1 = dev.tables[n]["z1z1_rem_xnn_s"]
    got = dev.redc_z1(enc, a1)
    assert list(dev.decode(got[0])) == host.redc_z1(
        vals, host.z1z1_rem_xnn_s
    )


def test_subtree_dispatch(trees):
    """A size-n tree serves smaller power-of-two inputs
    (fftree.rs:489-496)."""
    spec, n, dev, host = trees
    rng = random.Random(8)
    m = n // 2
    coeffs = [[rng.randrange(spec.p) for _ in range(m)]]
    got = dev.enter(dev.encode(coeffs))
    assert list(dev.decode(got[0])) == host.enter(coeffs[0])


def test_size_checks(trees):
    spec, n, dev, host = trees
    with pytest.raises(ValueError):
        dev.enter(dev.encode([[1] * (n * 2)]))


def test_eval_domain(trees):
    spec, n, dev, host = trees
    assert list(dev.eval_domain()) == host.eval_domain()
    assert list(dev.eval_domain(n // 2)) == host.subtree.eval_domain()


def test_canonical_mod_scheduled_path(trees):
    """Canonical MOD/REDC (no explicit modulus) must route through the
    schedule machine and agree with the generic path bit-for-bit."""
    import numpy as np

    spec, n, dev, host = trees
    rng = random.Random(11)
    vals = [rng.randrange(spec.p) for _ in range(n)]
    enc = dev.encode([vals])
    a = dev.tables[n]["xnn_s"]
    c = dev.tables[n]["z0z0_rem_xnn_s"]
    fast = dev.modular_reduce(enc)
    assert list(dev.decode(fast[0])) == host.modular_reduce(
        vals, host.xnn_s, host.z0z0_rem_xnn_s
    )
    slow = dev.modular_reduce(enc, a, c)
    assert np.array_equal(np.asarray(fast), np.asarray(slow))
    fast_r = dev.redc_z0(enc)
    assert list(dev.decode(fast_r[0])) == host.redc_z0(vals, host.xnn_s)
    # canonical redc_z1 mirrors redc_z0 (fftree.rs:272-275)
    fast_r1 = dev.redc_z1(enc)
    assert list(dev.decode(fast_r1[0])) == host.redc_z1(vals, host.xnn_s)
    with pytest.raises(TypeError):
        dev.modular_reduce(enc, a)


def test_device_bootstrap_midscale_matches_native():
    """Mid-scale certification of the DEVICE construction path (VERDICT
    r4 #8): FFTree.build at m31 n=2^12 — 13 size levels through the full
    jitted bootstrap (_z_step at up to n=2^11 windows) — must produce
    bit-identical tables to the native C++ builder, every table family
    at every level (incl. the nested extend-matrix planes). Production
    trees are built natively (bench.py, serialize_native); this pins the
    device bootstrap as a certified equal at non-toy scale.
    ~41 s warm / ~134 s cold on the 1-core CPU box (compile-dominated)."""
    import jax

    from ecfft_tpu.native import build_fftree_native

    n = 1 << 12
    dev = FFTree.build("m31", n)
    nat = build_fftree_native("m31", n)
    m = 2
    while m <= n:
        dt, nt = dev.tables[m], nat.tables[m]
        assert set(dt.keys()) == set(nt.keys()), m
        for k in dt:
            dl = jax.tree_util.tree_leaves(dt[k])
            nl = jax.tree_util.tree_leaves(nt[k])
            assert len(dl) == len(nl), (m, k)
            for a, b in zip(dl, nl):
                assert np.array_equal(np.asarray(a), np.asarray(b)), (m, k)
        m *= 2
