"""Serialization tests: round-trips in both modes, compressed-mode inverse
regeneration, and compute-after-load (mirrors the reference's serde tests,
lib.rs:155-186)."""

import random

import pytest

from ecfft_tpu.errors import EcfftError, SerializationError
from ecfft_tpu.fftree import FFTree
from ecfft_tpu.fields.registry import FIELDS
from ecfft_tpu.serialize import deserialize_fftree, serialize_fftree

_CACHE = {}


def get_tree(field, n):
    # the native C++ builder: the on-device JAX bootstrap costs minutes
    # of XLA:CPU compile per (field, n) and is already proven byte- and
    # table-identical by test_native_built_tree_serializes_identically
    # and test_native.py::test_native_built_device_tree_bit_exact
    if (field, n) not in _CACHE:
        from ecfft_tpu.native import build_fftree_native

        _CACHE[(field, n)] = build_fftree_native(field, n)
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


# ------------------------- malformed-input robustness (VERDICT r3 #8) ----
# the reference merely stubs validation (Valid::check is a no-op,
# fftree.rs:593-598); here every corrupt input must raise the typed
# SerializationError, never a bare numpy/struct error.


def _m31_bytes():
    return serialize_fftree(get_tree("m31", 64), compress=True)


def test_truncated_input_raises_typed_error():
    data = _m31_bytes()
    # cut inside the first length prefix, inside the first table, at a
    # section boundary neighborhood, and just before the end
    for cut in (0, 4, 7, 8, 100, len(data) // 2, len(data) - 1):
        with pytest.raises(SerializationError):
            deserialize_fftree("m31", data[:cut], compress=True)


def test_garbage_input_raises_typed_error():
    with pytest.raises(SerializationError):
        # u64 length prefix of ~2^64: implausible vs remaining bytes
        deserialize_fftree("m31", b"\xff" * 64, compress=True)
    with pytest.raises(SerializationError):
        deserialize_fftree("m31", b"", compress=True)


def test_bad_subtree_flag_raises_typed_error():
    data = _m31_bytes()
    # the final byte is the terminating has_subtree=0x00 flag
    assert data[-1:] == b"\x00"
    with pytest.raises(SerializationError):
        deserialize_fftree("m31", data[:-1] + b"\x02", compress=True)


def test_non_canonical_felt_raises_typed_error():
    data = bytearray(_m31_bytes())
    # f heap element 1 (the root) sits after the 8-byte length prefix
    # and the 4-byte zero at heap index 0; patch it to 2^32-1 >= p
    data[12:16] = b"\xff\xff\xff\xff"
    with pytest.raises(SerializationError):
        deserialize_fftree("m31", bytes(data), compress=True)


def test_corrupt_errors_are_ecfft_and_value_errors():
    # the typed hierarchy promise: catchable as EcfftError AND ValueError
    data = _m31_bytes()
    for exc in (EcfftError, ValueError):
        with pytest.raises(exc):
            deserialize_fftree("m31", data[: len(data) // 3], compress=True)
