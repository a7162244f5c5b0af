"""FFTree serialization, byte-compatible with the reference's ark-serialize
layout (/root/reference/src/fftree.rs:507-660).

This is the framework's checkpoint/persist subsystem (SURVEY.md §5): trees
are built once (offline or on device) and shipped as bytes; loading
reconstructs the device tables directly — no re-bootstrap.

Byte layout per tree section, in the reference's field order
(fftree.rs:532-552):

    f                   BinaryTree<F>      = Vec<F> (u64 LE len + elems),
                                             index 0 unused (zero), layers
                                             top-down, leaves last
    recombine_matrices  BinaryTree<Mat2x2> = Vec of 4-element row-major F
    decompose_matrices  BinaryTree<Mat2x2>
    rational_maps       Vec<RationalMap>   = per map: numerator Vec<F>,
                                             denominator Vec<F>
    xnn_s, z0_s1, z1_s0 Vec<F>
    [xnn_s_inv, z0_inv_s1, z1_inv_s0]      only when uncompressed
                                           (fftree.rs:539-544)
    z0z0_rem_xnn_s, z1z1_rem_xnn_s         Vec<F>
    has_subtree         bool (1 byte)
    subtree             recursively, down to the 1-leaf tree

Field elements are canonical integers, little-endian, in
ceil(bits(p)/8) bytes (arkworks Fp serialization: 32 bytes for secp256k1,
4 for m31). Compressed mode omits the three inverse tables and regenerates
them by batch inversion on load (fftree.rs:620-628).
"""

from __future__ import annotations

import io
import struct

from ecfft_tpu.fields.host import batch_inv_mod
from ecfft_tpu.fields.registry import FIELDS, FieldSpec


def _felt_size(spec: FieldSpec) -> int:
    return (spec.p.bit_length() + 7) // 8


def _w_felt(buf, spec, v: int):
    buf.write(int(v).to_bytes(_felt_size(spec), "little"))


def _r_felt(buf, spec) -> int:
    return int.from_bytes(buf.read(_felt_size(spec)), "little")


def _w_vec_felt(buf, spec, vals):
    buf.write(struct.pack("<Q", len(vals)))
    for v in vals:
        _w_felt(buf, spec, v)


def _r_vec_felt(buf, spec) -> list[int]:
    (n,) = struct.unpack("<Q", buf.read(8))
    return [_r_felt(buf, spec) for _ in range(n)]


def _w_vec_mat(buf, spec, mats):
    """BinaryTree<Mat2x2>: Vec of matrices, each 4 row-major elements."""
    buf.write(struct.pack("<Q", len(mats)))
    for m in mats:
        for r in range(2):
            for c in range(2):
                _w_felt(buf, spec, m[r][c])


def _r_vec_mat(buf, spec):
    (n,) = struct.unpack("<Q", buf.read(8))
    out = []
    for _ in range(n):
        out.append([[_r_felt(buf, spec) for _ in range(2)] for _ in range(2)])
    return out


def _w_maps(buf, spec, maps):
    buf.write(struct.pack("<Q", len(maps)))
    for num, den in maps:
        _w_vec_felt(buf, spec, num)
        _w_vec_felt(buf, spec, den)


def _r_maps(buf, spec):
    (n,) = struct.unpack("<Q", buf.read(8))
    return [(_r_vec_felt(buf, spec), _r_vec_felt(buf, spec)) for _ in range(n)]


def _layers_to_heap(layers: list[list[int]]) -> list[int]:
    """[leaves, ..., root] layer list → flat heap vec with index 0 unused
    (utils.rs:240-293 BinaryTree layout)."""
    out = [0]
    for layer in reversed(layers):
        out.extend(layer)
    return out


def _heap_to_layers(vec: list) -> list[list]:
    """Inverse of _layers_to_heap; returns [leaves, ..., root]."""
    n = len(vec) // 2
    layers = []
    size = n
    while size >= 1:
        layers.append(vec[size : 2 * size])
        size //= 2
    return layers


def _identity_mat():
    return [[1, 0], [0, 1]]


class TreeSection:
    """Host-int view of one tree size's data — the unit of (de)serialization
    and the bridge to/from device tables."""

    def __init__(self, f_layers, rec_layers, dec_layers, maps, tables):
        self.f_layers = f_layers  # [leaves, ..., root] python ints
        self.rec_layers = rec_layers  # per layer: list of 2x2 int mats
        self.dec_layers = dec_layers
        self.maps = maps  # [(num_coeffs, den_coeffs)]
        self.tables = tables  # dict name -> list[int]


def _write_section(buf, spec, sec: TreeSection, compress: bool):
    n = len(sec.f_layers[0])
    _w_vec_felt(buf, spec, _layers_to_heap(sec.f_layers))
    # matrix heaps have n entries for an n-leaf tree (fftree.rs:341-342);
    # unfilled layers (top, d==1) hold identities
    for layers in (sec.rec_layers, sec.dec_layers):
        heap = [_identity_mat()]
        padded = list(layers)
        while len(padded) < max(n.bit_length() - 1, 0):
            padded.append([_identity_mat()] * (n >> (len(padded) + 1)))
        for layer in reversed(padded):
            heap.extend(layer)
        if n == 1:
            heap = [_identity_mat()]
        _w_vec_mat(buf, spec, heap)
    _w_maps(buf, spec, sec.maps)
    t = sec.tables
    _w_vec_felt(buf, spec, t["xnn_s"])
    _w_vec_felt(buf, spec, t["z0_s1"])
    _w_vec_felt(buf, spec, t["z1_s0"])
    if not compress:
        _w_vec_felt(buf, spec, t["xnn_s_inv"])
        _w_vec_felt(buf, spec, t["z0_inv_s1"])
        _w_vec_felt(buf, spec, t["z1_inv_s0"])
    _w_vec_felt(buf, spec, t["z0z0_rem_xnn_s"])
    _w_vec_felt(buf, spec, t["z1z1_rem_xnn_s"])


def _read_section(buf, spec, compress: bool) -> TreeSection:
    f_layers = _heap_to_layers(_r_vec_felt(buf, spec))
    n = len(f_layers[0])
    rec_heap = _r_vec_mat(buf, spec)
    dec_heap = _r_vec_mat(buf, spec)
    num_layers = max(n.bit_length() - 1, 0)
    rec_layers = _heap_to_layers(rec_heap)[:num_layers] if n > 1 else []
    dec_layers = _heap_to_layers(dec_heap)[:num_layers] if n > 1 else []
    maps = _r_maps(buf, spec)
    t = {}
    t["xnn_s"] = _r_vec_felt(buf, spec)
    t["z0_s1"] = _r_vec_felt(buf, spec)
    t["z1_s0"] = _r_vec_felt(buf, spec)
    if compress:
        t["xnn_s_inv"] = batch_inv_mod(t["xnn_s"], spec.p)
        t["z0_inv_s1"] = batch_inv_mod(t["z0_s1"], spec.p)
        t["z1_inv_s0"] = batch_inv_mod(t["z1_s0"], spec.p)
        t["z0z0_rem_xnn_s"] = _r_vec_felt(buf, spec)
        t["z1z1_rem_xnn_s"] = _r_vec_felt(buf, spec)
    else:
        t["xnn_s_inv"] = _r_vec_felt(buf, spec)
        t["z0_inv_s1"] = _r_vec_felt(buf, spec)
        t["z1_inv_s0"] = _r_vec_felt(buf, spec)
        t["z0z0_rem_xnn_s"] = _r_vec_felt(buf, spec)
        t["z1z1_rem_xnn_s"] = _r_vec_felt(buf, spec)
    return TreeSection(f_layers, rec_layers, dec_layers, maps, t)


def serialize_fftree(tree, compress: bool = True) -> bytes:
    """Serialize a device FFTree to reference-compatible bytes.

    Mirrors serialize_with_mode (fftree.rs:510-554): the subtree chain is
    written recursively (even-strided layers, last rational map dropped,
    fftree.rs:465-482) down to the 1-leaf tree.
    """
    from ecfft_tpu.fftree import FFTree  # local import to avoid cycle

    assert isinstance(tree, FFTree)
    assert tree.f_layers is not None, "tree lacks host domain layers"
    buf = io.BytesIO()
    n = tree.n
    size = n
    while size >= 1:
        stride = n // size
        f_layers = [layer[::stride] for layer in tree.f_layers[
            : size.bit_length()
        ]]
        maps = [
            (list(m.numerator), list(m.denominator))
            for m in tree.maps[: max(size.bit_length() - 1, 0)]
        ]
        if size >= 2:
            dt = tree.tables[size]
            rec_layers, dec_layers = [], []
            for dec_s0, dec_s1, rec_s0, rec_s1 in dt["mats"]:
                # undo moiety selection: full layer = interleave(sel1, sel0)
                # for dec (skips 0/1 resp.), (sel0, sel1) for rec
                def interleave_mats(a, b):
                    out = []
                    am = tree.decode(a)
                    bm = tree.decode(b)
                    for i in range(a.shape[0]):
                        out.append([[am[i][0][0], am[i][0][1]],
                                    [am[i][1][0], am[i][1][1]]])
                        out.append([[bm[i][0][0], bm[i][0][1]],
                                    [bm[i][1][0], bm[i][1][1]]])
                    return out

                dec_layers.append(interleave_mats(dec_s1, dec_s0))
                rec_layers.append(interleave_mats(rec_s0, rec_s1))
            tables = {
                k: list(tree.decode(dt[k]))
                for k in (
                    "xnn_s",
                    "xnn_s_inv",
                    "z0_s1",
                    "z1_s0",
                    "z0_inv_s1",
                    "z1_inv_s0",
                    "z0z0_rem_xnn_s",
                    "z1z1_rem_xnn_s",
                )
            }
        else:
            rec_layers, dec_layers = [], []
            tables = {
                "xnn_s": [1],
                "xnn_s_inv": [1],
                "z0_s1": [],
                "z1_s0": [],
                "z0_inv_s1": [],
                "z1_inv_s0": [],
                "z0z0_rem_xnn_s": [],
                "z1z1_rem_xnn_s": [],
            }
        sec = TreeSection(f_layers, rec_layers, dec_layers, maps, tables)
        _write_section(buf, tree.spec, sec, compress)
        buf.write(b"\x01" if size > 1 else b"\x00")
        size //= 2
    return buf.getvalue()


def deserialize_fftree(field: str | FieldSpec, data: bytes, compress: bool = True):
    """Reconstruct a device FFTree from reference-layout bytes
    (fftree.rs:602-660). Compressed mode regenerates the three inverse
    tables by host batch inversion (fftree.rs:620-628)."""
    from ecfft_tpu.ec.curve import RationalMap
    from ecfft_tpu.fftree import FFTree
    from ecfft_tpu.fields import device as fd

    spec = FIELDS[field] if isinstance(field, str) else field
    buf = io.BytesIO(data)
    sections = []
    while True:
        sections.append(_read_section(buf, spec, compress))
        has_sub = buf.read(1)
        if has_sub != b"\x01":
            break

    top = sections[0]
    n = len(top.f_layers[0])
    tables = {}
    for sec in sections:
        m = len(sec.f_layers[0])
        if m < 2:
            continue
        t = {}
        t["leaves"] = fd.encode(spec, sec.f_layers[0])
        mats = []
        for li in range(max(m.bit_length() - 2, 0)):
            dec = fd.encode(spec, sec.dec_layers[li])
            rec = fd.encode(spec, sec.rec_layers[li])
            mats.append((dec[1::2], dec[0::2], rec[0::2], rec[1::2]))
        t["mats"] = mats
        for k, v in sec.tables.items():
            t[k] = fd.encode(spec, v)
        tables[m] = t

    from ecfft_tpu.fftree import finalize_tables

    finalize_tables(spec, tables)
    tree = FFTree(spec, n, tables)
    tree.f_layers = top.f_layers
    tree.maps = [
        RationalMap(tuple(num), tuple(den), spec.p) for num, den in top.maps
    ]
    return tree
