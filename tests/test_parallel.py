"""Multi-chip tests on the 8-virtual-device CPU mesh (SURVEY §4 (e)):
batch sharding with replicated tables must be bit-exact and leave the
batch dim sharded."""

import random

import jax
import numpy as np

from ecfft_tpu.fftree import FFTree
from ecfft_tpu.fields.registry import FIELDS
from ecfft_tpu.host.fftree import build_host_fftree
from ecfft_tpu.parallel.sharding import (
    BATCH_AXIS,
    ShardedFFTree,
    make_mesh,
    shard_batch,
)

_CACHE = {}


def get():
    if not _CACHE:
        from ecfft_tpu.native import build_fftree_native

        _CACHE["tree"] = build_fftree_native("m31", 32)
        _CACHE["host"] = build_host_fftree("m31", 32)
    return _CACHE["tree"], _CACHE["host"]


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_enter_exit_exact():
    tree, host = get()
    p = FIELDS["m31"].p
    mesh = make_mesh()
    stree = ShardedFFTree(tree, mesh)
    rng = random.Random(1)
    n, B = 32, 16
    coeffs = [[rng.randrange(p) for _ in range(n)] for _ in range(B)]
    enc = stree.encode(coeffs)
    evals = stree.enter(enc)
    for b in range(B):
        assert list(stree.decode(evals[b])) == host.enter(coeffs[b])
    back = stree.exit(evals)
    assert [list(r) for r in stree.decode(back)] == coeffs


def test_batch_dim_is_sharded():
    tree, host = get()
    mesh = make_mesh()
    arr = shard_batch(mesh, jax.numpy.zeros((16, 32, 1), jax.numpy.uint32))
    # the batch axis must be split across all 8 devices
    assert len(arr.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(2, 32, 1)}


def test_sharded_degree_matches():
    tree, host = get()
    p = FIELDS["m31"].p
    mesh = make_mesh()
    stree = ShardedFFTree(tree, mesh)
    rng = random.Random(2)
    degs = [3, 17, 0, 31] * 2
    coeffs = []
    for d in degs:
        c = [rng.randrange(p) for _ in range(d)] + [rng.randrange(1, p)]
        c += [0] * (32 - len(c))
        coeffs.append(c)
    evals = stree.enter(stree.encode(coeffs))
    assert list(np.asarray(stree.degree(evals))) == degs


def test_sharded_enter_hlo_has_no_collectives():
    """The zero-collectives claim (sharding.py:13-14), asserted against
    compiled HLO: batch-sharded ENTER with replicated tables must lower
    to a pure SPMD program — no all-gather/all-reduce/collective-permute
    anywhere (VERDICT r4 #7)."""
    tree, host = get()
    tree.prepare((32,))
    mesh = make_mesh()
    stree = ShardedFFTree(tree, mesh)
    sharded = shard_batch(
        mesh, jax.numpy.zeros((16, 32, 1), jax.numpy.uint32))
    with mesh:
        txt = (jax.jit(stree.tree.enter).lower(sharded)
               .compile().as_text())
    bad = [op for op in ("all-reduce", "all-gather", "collective-permute",
                         "all-to-all", "reduce-scatter") if op in txt]
    assert not bad, f"sharded ENTER HLO contains collectives: {bad}"


def test_sharded_redc_mod_vanish_exact():
    """REDC/MOD/VANISH under batch sharding (previously never sharded
    anywhere — VERDICT r4 weak #4): sharded outputs must equal the
    unsharded schedule-machine outputs bit-for-bit."""
    tree, host = get()
    tree.prepare((32,))
    p = FIELDS["m31"].p
    rng = random.Random(5)
    n, B = 32, 16
    coeffs = [[rng.randrange(p) for _ in range(n)] for _ in range(B)]
    evals = tree.enter(jax.numpy.asarray(tree.encode(coeffs)))
    ref_r0 = np.asarray(tree.redc_z0(evals))
    ref_r1 = np.asarray(tree.redc_z1(evals))
    ref_md = np.asarray(tree.modular_reduce(evals))
    pts = [[rng.randrange(p) for _ in range(n // 2)] for _ in range(B)]
    pts_enc = jax.numpy.asarray(tree.encode(pts))
    ref_vz = np.asarray(tree.vanish(pts_enc))

    mesh = make_mesh()
    stree = ShardedFFTree(tree, mesh)
    assert np.array_equal(np.asarray(stree.redc_z0(evals)), ref_r0)
    assert np.array_equal(np.asarray(stree.redc_z1(evals)), ref_r1)
    assert np.array_equal(np.asarray(stree.modular_reduce(evals)), ref_md)
    assert np.array_equal(np.asarray(stree.vanish(pts_enc)), ref_vz)
    # and the host oracle agrees on one lane
    ev0 = host.enter(coeffs[0])
    assert list(tree.decode(ref_r0[0])) == host.redc_z0(ev0, host.xnn_s)
    assert list(tree.decode(ref_vz[0])) == host.vanish(pts[0])


def test_sharded_secp_scheduled_with_chunking():
    """The production path under sharding: secp256k1 n=256 on the
    schedule machine over the 8-device mesh, with batch CHUNKING active
    inside each compiled segment (lax.map over lane-tile chunks —
    fftree.py bounds HBM this way on TPU). Sharded + chunked must equal
    unsharded bit-for-bit (VERDICT r2 weak #4: this combination was
    previously never tested)."""
    from ecfft_tpu.native import build_fftree_native
    from ecfft_tpu.ops import schedule as sch

    n, B = 256, 16
    tree = build_fftree_native("secp256k1", n)
    tree.prepare((n,))
    p = FIELDS["secp256k1"].p
    rng = random.Random(3)
    coeffs = [[rng.randrange(p) for _ in range(n)] for _ in range(B)]
    enc = np.asarray(tree.encode(coeffs))
    s = tree._scheds[("enter", n)]
    ref = np.asarray(
        sch.run_schedule(tree.spec, tree._pool, s, jax.numpy.asarray(enc),
                         2 * n, n, False, None)
    )
    mesh = make_mesh()
    stree = ShardedFFTree(tree, mesh).prepare((n,))
    sharded_in = shard_batch(mesh, enc)
    with mesh:
        got = sch.run_schedule(stree.tree.spec, stree.tree._pool, s,
                               sharded_in, 2 * n, n, False, 2)
        jax.block_until_ready(got)
    assert np.array_equal(np.asarray(got), ref)
    # and the public sharded API agrees
    evals = stree.enter(sharded_in)
    assert np.array_equal(np.asarray(evals), ref)
