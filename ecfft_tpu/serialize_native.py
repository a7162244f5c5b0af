"""Fast native checkpoint format for FFTrees: one .npz of device tables.

The ark-compatible byte format (ecfft_tpu/serialize.py) is the interop
path; this is the *fast* path — raw uint32 limb arrays, zero python-int
conversion, used by the benchmark harness and anyone persisting trees for
reload on the same framework (the reference's build.rs/include_bytes!
workflow, README.md:22-66, without the byte-level tax).
"""

from __future__ import annotations


import numpy as np

from ecfft_tpu.fields.registry import FIELDS


def save_tables_npz(tree, path: str) -> None:
    flat = {}
    for m, t in tree.tables.items():
        for k, v in t.items():
            if k == "ext":
                continue  # derived from mats on load
            if k == "mats":
                for d, parts in enumerate(v):
                    for pi, arr in enumerate(parts):
                        flat[f"{m}/mats/{d}/{pi}"] = np.asarray(arr)
            else:
                flat[f"{m}/{k}"] = np.asarray(v)
    flat["__n__"] = np.asarray([tree.n], dtype=np.int64)
    flat["__field__"] = np.frombuffer(
        tree.spec.name.encode(), dtype=np.uint8
    )
    np.savez(path, **flat)


def load_tables_npz(path: str):
    from ecfft_tpu.fftree import FFTree
    import jax.numpy as jnp

    z = np.load(path)
    field = bytes(z["__field__"]).decode()
    spec = FIELDS[field]
    n = int(z["__n__"][0])
    tables: dict[int, dict] = {}
    mats_acc: dict[int, dict[int, list]] = {}
    for key in z.files:
        if key.startswith("__"):
            continue
        parts = key.split("/")
        m = int(parts[0])
        t = tables.setdefault(m, {})
        if parts[1] == "mats":
            d, pi = int(parts[2]), int(parts[3])
            mats_acc.setdefault(m, {}).setdefault(d, [None] * 4)[pi] = jnp.asarray(
                z[key]
            )
        else:
            t[parts[1]] = jnp.asarray(z[key])
    for m, byd in mats_acc.items():
        tables[m]["mats"] = [tuple(byd[d]) for d in sorted(byd)]
    for m in tables:
        tables[m].setdefault("mats", [])
    return FFTree(spec, n, tables)
