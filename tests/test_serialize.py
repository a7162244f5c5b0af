"""Serialization tests: round-trips in both modes, compressed-mode inverse
regeneration, and compute-after-load (mirrors the reference's serde tests,
lib.rs:155-186)."""

import random

import pytest

from ecfft_tpu.fftree import FFTree
from ecfft_tpu.fields.registry import FIELDS
from ecfft_tpu.serialize import deserialize_fftree, serialize_fftree

_CACHE = {}


def get_tree(field, n):
    if (field, n) not in _CACHE:
        _CACHE[(field, n)] = FFTree.build(field, n)
    return _CACHE[(field, n)]


CASES = [("m31", 64), ("secp256k1", 16)]


@pytest.mark.parametrize("field,n", CASES, ids=[f"{f}-{n}" for f, n in CASES])
@pytest.mark.parametrize("compress", [True, False], ids=["compressed", "uncompressed"])
def test_roundtrip_bytes_identical(field, n, compress):
    tree = get_tree(field, n)
    data = serialize_fftree(tree, compress=compress)
    t2 = deserialize_fftree(field, data, compress=compress)
    assert serialize_fftree(t2, compress=compress) == data


@pytest.mark.parametrize("field,n", CASES, ids=[f"{f}-{n}" for f, n in CASES])
@pytest.mark.parametrize("compress", [True, False], ids=["compressed", "uncompressed"])
def test_deserialized_tree_works(field, n, compress):
    # lib.rs:155-186: deserialize then verify enter against expectations
    tree = get_tree(field, n)
    p = FIELDS[field].p
    t2 = deserialize_fftree(field, serialize_fftree(tree, compress=compress),
                            compress=compress)
    rng = random.Random(1)
    coeffs = [[rng.randrange(p) for _ in range(n)]]
    expected = list(tree.decode(tree.enter(tree.encode(coeffs))[0]))
    assert list(t2.decode(t2.enter(t2.encode(coeffs))[0])) == expected


@pytest.mark.parametrize("field,n", CASES, ids=[f"{f}-{n}" for f, n in CASES])
def test_compressed_smaller_and_inverses_regenerated(field, n):
    tree = get_tree(field, n)
    comp = serialize_fftree(tree, compress=True)
    uncomp = serialize_fftree(tree, compress=False)
    assert len(comp) < len(uncomp)
    t2 = deserialize_fftree(field, comp, compress=True)
    # regenerated inverse tables match the originals (fftree.rs:620-628)
    for m in t2.tables:
        for key in ("xnn_s_inv", "z0_inv_s1", "z1_inv_s0"):
            assert list(t2.decode(t2.tables[m][key])) == list(
                tree.decode(tree.tables[m][key])
            ), f"size {m} {key}"


def test_native_built_tree_serializes_identically():
    """The native fast-construction path and the device bootstrap must
    produce byte-identical ark serializations (full-stack equivalence)."""
    from ecfft_tpu.native import build_fftree_native

    nt = build_fftree_native("m31", 32)
    jt = FFTree.build("m31", 32)
    assert serialize_fftree(nt) == serialize_fftree(jt)
