"""Independent ark-serialize byte-layout writer for FFTree fixtures.

This module re-derives the reference's on-disk format DIRECTLY from
ark-serialize's documented primitive semantics and the reference's field
order (/root/reference/src/fftree.rs:510-554), sharing NO code with
ecfft_tpu/serialize.py. It is the adjudicator for the byte-parity claim
(VERDICT r3 #7): tests/test_ark_fixture.py asserts that
serialize_fftree's output equals this writer's output byte-for-byte on
the frozen m31 fixtures, so any layout bug in either writer surfaces as
a fixture mismatch.

ark-serialize primitive semantics used (ark-serialize 0.4):
- ``Fp``: the canonical (non-Montgomery) residue as little-endian bytes,
  in ``buffer_byte_size(MODULUS_BIT_SIZE)`` = ceil(bits(p)/8) bytes —
  4 bytes for m31 (p = 2^31 - 1), 32 for secp256k1.
- ``Vec<T>``: u64 little-endian length prefix, then each element. The
  same encoding backs ``BinaryTree<T>`` (a newtype over ``Vec<T>``,
  utils.rs:229) and ``DensePolynomial`` (a struct whose only field is
  ``coeffs: Vec<F>``; from_coefficients_slice trims trailing zeros, so
  the zero polynomial is the empty vec).
- fixed-size arrays ``[T; N]``: elements in order, NO length prefix —
  ``Mat2x2`` (a newtype over ``[[F; 2]; 2]``, utils.rs:318) is its four
  entries row-major.
- ``bool``: one byte, 0x00 / 0x01.

FFTree field order (fftree.rs:532-552): f, recombine_matrices,
decompose_matrices, rational_maps, xnn_s, z0_s1, z1_s0,
[xnn_s_inv, z0_inv_s1, z1_inv_s0 iff uncompressed], z0z0_rem_xnn_s,
z1z1_rem_xnn_s, has_subtree bool, then the subtree recursively down to
the 1-leaf tree.

Heap layouts (utils.rs:228-315, fftree.rs:50-51, fftree.rs:341-342):
- the domain tree ``f`` is a 2n-long heap: index 0 holds F::zero()
  (``vec![F::zero(); 2 * n]``, fftree.rs:50, never overwritten), layer j
  (leaves = layer 0) occupies [n >> j, 2 * (n >> j)).
- each matrix tree is an n-long heap initialized to
  ``vec![Mat2x2::identity(); n]`` (fftree.rs:341-342): index 0 and any
  layer the builder skips (the 2-wide f layer, where d == 1,
  fftree.rs:349-351) stay IDENTITY, layer j occupies
  [n/2 >> j, 2 * (n/2 >> j)).
"""

import struct


def _trim(coeffs):
    """DensePolynomial::from_coefficients_slice drops trailing zeros."""
    c = list(coeffs)
    while c and int(c[-1]) == 0:
        c.pop()
    return c


class ArkWriter:
    def __init__(self, felt_size: int):
        self.felt_size = felt_size
        self.out = bytearray()
        self.offsets = []  # (offset, label) for auditability

    def mark(self, label: str):
        self.offsets.append((len(self.out), label))

    def felt(self, x: int):
        self.out += int(x).to_bytes(self.felt_size, "little")

    def u64(self, n: int):
        self.out += struct.pack("<Q", n)

    def boolean(self, b: bool):
        self.out += b"\x01" if b else b"\x00"

    def vec_felt(self, xs, label=None):
        if label:
            self.mark(label)
        self.u64(len(xs))
        for x in xs:
            self.felt(x)

    def mat2x2(self, m):
        # [[a, b], [c, d]] row-major, no prefix (fixed-size array)
        for row in m:
            for x in row:
                self.felt(x)

    def poly(self, coeffs):
        c = _trim(coeffs)
        self.u64(len(c))
        for x in c:
            self.felt(x)


def _f_heap(tree) -> list:
    """2n-long domain heap: [zero, root, ..., leaves]."""
    heap = [0]
    for layer in reversed(tree.f_layers):
        heap.extend(layer)
    return heap


def _mat_heap(tree, layers) -> list:
    """n-long matrix heap; unfilled slots (index 0, skipped layers) are
    the identity matrix the builder initialized with (fftree.rs:341)."""
    n = len(tree.f_layers[0])
    ident = [[1, 0], [0, 1]]
    if n == 1:
        return [ident]
    heap = [ident]
    num_layers = n.bit_length() - 1
    # layers[li] pairs with f layer li (li = 0 → leaves); heap order is
    # top-down, so append in reverse
    padded = list(layers)
    while len(padded) < num_layers:
        padded.append([ident] * (n >> (len(padded) + 1)))
    for layer in reversed(padded):
        heap.extend(layer)
    assert len(heap) == n
    return heap


def write_tree(w: ArkWriter, tree, compress: bool, depth=0):
    """Serialize one HostFFTree section + its subtree chain."""
    tag = f"[n={len(tree.f_layers[0])}]"
    w.mark(f"{tag} f")
    w.vec_felt(_f_heap(tree))
    w.mark(f"{tag} recombine_matrices")
    rec = _mat_heap(tree, tree.recombine_layers)
    w.u64(len(rec))
    for m in rec:
        w.mat2x2(m)
    w.mark(f"{tag} decompose_matrices")
    dec = _mat_heap(tree, tree.decompose_layers)
    w.u64(len(dec))
    for m in dec:
        w.mat2x2(m)
    w.mark(f"{tag} rational_maps")
    w.u64(len(tree.rational_maps))
    for rm in tree.rational_maps:
        w.poly(rm.numerator)
        w.poly(rm.denominator)
    w.vec_felt(tree.xnn_s, f"{tag} xnn_s")
    w.vec_felt(tree.z0_s1, f"{tag} z0_s1")
    w.vec_felt(tree.z1_s0, f"{tag} z1_s0")
    if not compress:
        w.vec_felt(tree.xnn_s_inv, f"{tag} xnn_s_inv")
        w.vec_felt(tree.z0_inv_s1, f"{tag} z0_inv_s1")
        w.vec_felt(tree.z1_inv_s0, f"{tag} z1_inv_s0")
    w.vec_felt(tree.z0z0_rem_xnn_s, f"{tag} z0z0_rem_xnn_s")
    w.vec_felt(tree.z1z1_rem_xnn_s, f"{tag} z1z1_rem_xnn_s")
    w.mark(f"{tag} has_subtree")
    w.boolean(tree.subtree is not None)
    if tree.subtree is not None:
        write_tree(w, tree.subtree, compress, depth + 1)


def ark_bytes_for_host_tree(tree, felt_size: int, compress: bool):
    """(bytes, [(offset, label)]) for a HostFFTree in ark layout."""
    w = ArkWriter(felt_size)
    write_tree(w, tree, compress)
    return bytes(w.out), w.offsets
