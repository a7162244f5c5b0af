"""Curve-search demo mirroring the reference's examples/find_curve.rs:
race parallel searches for good curves with record 2-adicity over
secp256k1's base field, printing each new record.

    python examples/find_curve.py [k] [threads]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecfft_tpu.ec.curve import GoodCurve, Point, two_adicity
from ecfft_tpu.fields.registry import SECP_P
from ecfft_tpu.native import find_curve_parallel


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    threads = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    t0 = time.time()
    res = find_curve_parallel(SECP_P, k, threads=threads)
    n, a, bb, x, y = res
    curve = GoodCurve.new_odd(a, bb, SECP_P)
    pt = Point(x, y, curve)
    assert curve.contains(x, y) and two_adicity(pt) == n
    print(f"found n={n} in {time.time()-t0:.1f}s ({threads} threads)")
    print(f"  curve: y^2 = x(x^2 + {a}x + {bb})")
    print(f"  generator: ({x}, {y})")


if __name__ == "__main__":
    main()
