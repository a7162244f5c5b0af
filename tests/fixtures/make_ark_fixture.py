"""Generate the frozen ark-layout FFTree fixtures (VERDICT r3 #7).

Builds the m31 size-4 tree with the HOST oracle (exact python ints;
deterministic — the Vélu root search is seeded, utils/poly.py) and writes
its bytes in both ark-serialize modes through tests/ark_layout.py — the
independent layout writer that shares no code with ecfft_tpu/serialize.py
— plus an annotated offset map for auditing.

Run from the repo root:  python tests/fixtures/make_ark_fixture.py
The outputs are committed; tests/test_ark_fixture.py asserts that both
the host build and serialize_fftree still reproduce them byte-for-byte.
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root
sys.path.insert(0, os.path.dirname(HERE))  # tests/ (for ark_layout)

from ark_layout import ark_bytes_for_host_tree  # noqa: E402

from ecfft_tpu.host.fftree import build_host_fftree  # noqa: E402


def main():
    tree = build_host_fftree("m31", 4)
    assert tree is not None
    for compress, name in ((True, "m31_n4_compressed"),
                           (False, "m31_n4_uncompressed")):
        data, offsets = ark_bytes_for_host_tree(tree, 4, compress)
        with open(os.path.join(HERE, name + ".bin"), "wb") as f:
            f.write(data)
        with open(os.path.join(HERE, name + ".offsets.txt"), "w") as f:
            f.write(f"# {name}.bin — {len(data)} bytes\n")
            f.write("# offset  section\n")
            for off, label in offsets:
                f.write(f"{off:8d}  {label}\n")
        print(f"{name}.bin: {len(data)} bytes")


if __name__ == "__main__":
    main()
