"""Unrolled schedule executor with fused pair-butterfly DMA kernels.

The scan executor (ops/schedule.py::run_schedule) runs every step through
one compiled interpreter: index rows are synthesized in-scan and each
step's window moves through HBM ~9 times (gather temps, kernel reads,
kernel write, dynamic_update_slice). That is the right trade when compile
time dominates (CPU tests, tiny sizes). On TPU at bench sizes the wall is
HBM traffic + u32 multiplies, so THIS executor unrolls the schedule at
trace time instead — every step's parameters are host-visible constants —
and lowers each butterfly level to ONE Pallas kernel:

    grid step g:   DMA in   x[t], x[t^half]          (TW rows each)
                   compute  out[t]      = x[t]      + C[t]·x[t^half]
                            out[t^half] = x[t^half] + C[t^half]·x[t]
                   DMA out  both tiles (output aliases the state buffer)

Each window row is read once and written once per level — the 2-traversal
minimum for an out-of-VMEM level — instead of ~9. Both halves of a pair
are handled by the same grid step, so in-place execution is race-free
(pairs partition the window). Better still, for half < TW the partner
sits inside the tile (the xor is a static reshape swap), and CONSECUTIVE
in-tile levels fuse into one cascade kernel (_fused_cascade): an extend's
halves run bs/2 … 1 … bs/2, so all its levels with half ≤ TW/2 — up to
2·log(TW) of them plus the final recombine — execute as ONE kernel with
a single DMA in/out, the state riding VMEM between levels. Non-butterfly
steps (source-fold levels, ENTER's combine, REDC's elementwise stages,
OP_MUL, OP_CMPSEL) fall back to the same XLA ops the scan executor uses,
with static starts and trace-time index synthesis.

Outputs are bit-identical to the scan executor: every step produces
canonical residues, which are unique — cross-validated by
tests/test_unrolled.py and bench.py's TPU==native gate.

Butterfly coefficients still come from the O(n) compact matrix planes:
the running-diagonal engine (see schedule.py's module docstring) executes
at trace time, only on the steps that carry a D-engine micro-op.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecfft_tpu.fields import device as fd
from ecfft_tpu.fields.registry import FieldSpec
from ecfft_tpu.ops.schedule import (
    CP_AHI, CP_ALO, CP_C0, CP_C1, CP_DC, CP_DD, CP_DK, CP_KM, CP_M1,
    CP_M2, CP_M3, CP_OFF, CP_S2, CP_SB, CP_SPAN, CP_XX,
    DOP_FINAL, DOP_LEVEL, DOP_LEVEL0, DOP_NONE,
    DP_DOP, DP_HALF, DP_HM, DP_MP0, DP_MP1, DP_MS0, DP_MS1, DP_MSI0,
    DP_MSI1, DP_SHALF,
    OP_AFF1, OP_AFF1_C, OP_AFF1S, OP_AFF1S_C, OP_AFFINE, OP_AFFINE_C,
    OP_CMPSEL, OP_MUL,
    Schedule, _mul_rows, _muladd1_cols, _muladd2_cols, _mulss,
    _pack_state, _pool_to_mont, _synth_np, _unpack_state,
)

TW = 128  # fused-kernel row tile (pair variant needs TW | half)

# the fused kernels' scratch tiles + the tile-fn compute temps exceed the
# default 16 MB scoped-VMEM cap at (L=16, tb=128): measured 27.2 MB for
# the 2-mul tile at n=2^16 b=256. v5e has 128 MB of VMEM; raise the cap
# so the compiler stops refusing a working configuration.
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
MIN_FUSED_HALF = 1  # the reshape-based in-tile swap is cheap at any half

SEG_STEPS = 64  # steps per jitted segment (bounds program size)

# Mosaic allocates each cascade level's compute temps on the kernel's
# scoped-vmem stack WITHOUT reuse across the unrolled level loop
# (measured ~8.9 MB/level at L=16, tb=128 — an 11-level cascade OOM'd
# the 96 MB scope), so _segment caps levels-per-kernel to this budget.
# Module-level so tests can monkeypatch it to force small max_k and
# cover the cascade-chunk boundary bookkeeping.
CASCADE_VMEM_BUDGET = 60 << 20


# ------------------------------------------------------- trace-time synth


def _synth_tracer(cp: np.ndarray, start: int, A: int):
    """Trace-time mirror of schedule._synth_jnp with STATIC parameters:
    emits only the live terms, so XLA sees a short iota-arithmetic chain
    instead of a materialized (A,) constant."""
    cp = [int(v) for v in cp]
    p = start + jnp.arange(A, dtype=jnp.int32)
    t = p - cp[CP_OFF] if cp[CP_OFF] else p
    s2 = cp[CP_S2]
    u = t if s2 == 0 else (t >> s2 if s2 > 0 else t << -s2)
    v = jnp.full((A,), cp[CP_C0], jnp.int32)
    if cp[CP_C1] != cp[CP_C0] and cp[CP_SB] < 31:
        v = jnp.where(((t >> cp[CP_SB]) & 1) == 1, cp[CP_C1], cp[CP_C0])
    if cp[CP_M1]:
        v = v + (t & cp[CP_M1])
    if cp[CP_M2]:
        v = v + (u & cp[CP_M2])
    if cp[CP_M3]:
        v = v + (((u + cp[CP_DD]) ^ cp[CP_XX]) & cp[CP_M3])
    act = (t >= 0) & (t < cp[CP_SPAN])
    if cp[CP_KM] != -1 or cp[CP_ALO] != 0 or cp[CP_AHI] != cp[CP_SPAN]:
        inb = t & cp[CP_KM]
        act = act & (inb >= cp[CP_ALO]) & (inb < cp[CP_AHI])
    dflt = p if cp[CP_DK] == 0 else jnp.full((A,), cp[CP_DC], jnp.int32)
    return jnp.where(act, v, dflt)


def _col_np(xs_np, t: int, ci: int, W: int) -> np.ndarray:
    """Full-width numpy ground truth of column ci of step t."""
    rid = int(xs_np["rid"][t, ci])
    if rid >= 0:
        start, A = int(xs_np["starts"][t]), xs_np["bank"].shape[1]
        dk, dc = int(xs_np["colp"][t, ci, CP_DK]), int(
            xs_np["colp"][t, ci, CP_DC])
        base = (np.arange(W, dtype=np.int32) if dk == 0
                else np.full(W, dc, np.int32))
        base[start:start + A] = xs_np["bank"][rid]
        return base
    return _synth_np(xs_np["colp"][t, ci], W)


def _col_tracer(xs_np, t: int, ci: int):
    """(A,)-window index row of column ci of step t as traced ops."""
    start = int(xs_np["starts"][t])
    A = xs_np["bank"].shape[1]
    rid = int(xs_np["rid"][t, ci])
    if rid >= 0:
        return jnp.asarray(xs_np["bank"][rid])
    return _synth_tracer(xs_np["colp"][t, ci], start, A)


# ------------------------------------------------- fused butterfly kernels


# python-int constants: jnp scalars become captured consts, which
# pallas_call rejects inside kernel bodies
_M31 = (1 << 31) - 1
_M16 = 0xFFFF


def _m31_mul_t(a, b):
    """fd._m31_mul with python-int constants (identical op sequence —
    full 62-bit product via 16-bit splits, Mersenne shift-add fold)."""
    a_lo = a & _M16
    a_hi = a >> 16
    b_lo = b & _M16
    b_hi = b >> 16
    t0 = a_lo * b_lo
    mid = a_lo * b_hi + a_hi * b_lo
    hi = a_hi * b_hi
    s = (t0 >> 16) + mid
    lo32 = (t0 & _M16) | ((s & _M16) << 16)
    hi30 = (s >> 16) + hi
    r = 2 * hi30 + (lo32 >> 31) + (lo32 & _M31)
    r = (r & _M31) + (r >> 31)
    r = (r & _M31) + (r >> 31)
    return jnp.where(r >= _M31, r - _M31, r)


def _m31_add_t(a, b):
    s = a + b  # < 2p < 2^32
    return jnp.where(s >= _M31, s - _M31, s)


def _m31_aff1_tile(c, x1, x2):
    return _m31_add_t(x1, _m31_mul_t(c[:, :, None], x2))


def _m31_aff2_tile(a, b, x1, x2):
    return _m31_add_t(_m31_mul_t(a[:, :, None], x1),
                      _m31_mul_t(b[:, :, None], x2))


def _tile_fns(spec: FieldSpec):
    if spec.num_limbs == 1 and spec.p == fd.M31_P:
        return _m31_aff1_tile, _m31_aff2_tile
    from ecfft_tpu.ops.pallas_step import _make_helpers, aff1_tile, aff2_tile

    h = _make_helpers(spec)
    return (lambda c, x1, x2: aff1_tile(h, c, x1, x2),
            lambda a, b, x1, x2: aff2_tile(h, a, b, x1, x2))


def _intile_partner(x, half: int):
    """x[r ^ half] along axis 0 for half < TW: reshape to expose the
    butterfly bit as its own (leading) axis of size 2 and swap it — two
    static slices + one stack regardless of half, so even half = 1 costs
    a handful of register moves instead of TW/half concatenated rows."""
    g = x.shape[0] // (2 * half)
    y = x.reshape((g, 2, half) + x.shape[1:])
    y = jnp.stack([y[:, 1], y[:, 0]], axis=1)
    return y.reshape(x.shape)


@partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8))
def _fused_cascade(spec: FieldSpec, state, cwins, awins, start: int,
                   halves: tuple, kinds: tuple, tb: int, interpret: bool):
    """A RUN of consecutive in-tile butterfly levels as ONE kernel:

        for level li:  x[p] = x[p] + C_li[p]·x[p^half_li]      (kind 0)
                   or  x[p] = A[p]·x[p] + B_li[p]·x[p^half_li] (kind 1)

    for p in [start, start+A), in place. Every half < TW with
    TW % 2·half == 0, so each 128-row tile is closed under all the xors:
    the whole run is one DMA in + k register-resident levels + one DMA
    out — k× fewer HBM traversals than k single-level kernels. This is
    the multi-level VMEM-residency lever: an EXTEND's level halves run
    bs/2 … 1 then 1 … bs/2, so all levels with half ≤ TW/2 (up to
    2·log(TW) of them, plus the final 2-mul recombine when it lands
    in-tile) sit in one contiguous fusable run.

    cwins: (k, A, L) stacked per-level C (or B) rows; awins: (k2, A, L)
    rows for the kind-1 levels only (k2 ≥ 1; a dummy row when none)."""
    W, L, B = state.shape
    A = cwins.shape[1]
    aff1, aff2 = _tile_fns(spec)
    k = len(halves)
    k2 = awins.shape[0]

    def kernel(st_ref, c_ref, a_ref, out_ref, xt, ot, sems):
        g = pl.program_id(0)
        j = pl.program_id(1)
        t0 = start + g * TW
        din = pltpu.make_async_copy(
            st_ref.at[pl.ds(t0, TW), :, pl.ds(j * tb, tb)], xt, sems.at[0])
        din.start()
        din.wait()
        x = xt[...]
        ai = 0
        for li in range(k):
            part = _intile_partner(x, halves[li])
            if kinds[li] == 0:
                x = aff1(c_ref[li], x, part)
            else:
                x = aff2(a_ref[ai], c_ref[li], x, part)
                ai += 1
        ot[...] = x
        do = pltpu.make_async_copy(
            ot, out_ref.at[pl.ds(t0, TW), :, pl.ds(j * tb, tb)],
            sems.at[1])
        do.start()
        do.wait()

    return pl.pallas_call(
        kernel,
        grid=(A // TW, B // tb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((k, TW, L), lambda g, j: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, TW, L), lambda g, j: (0, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((W, L, B), jnp.uint32),
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((TW, L, tb), jnp.uint32),
            pltpu.VMEM((TW, L, tb), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(state, cwins, awins)


@partial(jax.jit, static_argnums=(0, 3, 4, 5, 6, 7))
def _fused_bf1(spec: FieldSpec, state, cwin, start: int, half: int,
               A: int, tb: int, interpret: bool):
    """One butterfly level, 1-mul form: state[p] += C[p]·state[p^half]
    for p in [start, start+A), in place (state donated/aliased).
    Pair variant only (half ≥ TW; in-tile levels ride _fused_cascade)."""
    W, L, B = state.shape
    aff1, _ = _tile_fns(spec)

    assert half >= TW
    ht = half // TW
    npairs = A // (2 * TW)

    def kernel(st_ref, ct_ref, cp_ref, out_ref, xt, xp, ot, op_, sems):
        g = pl.program_id(0)
        j = pl.program_id(1)
        q = g // ht
        r = g % ht
        trel = (q * 2 * ht + r) * TW
        t0 = start + trel
        p0 = t0 + half
        din1 = pltpu.make_async_copy(
            st_ref.at[pl.ds(t0, TW), :, pl.ds(j * tb, tb)], xt,
            sems.at[0])
        din2 = pltpu.make_async_copy(
            st_ref.at[pl.ds(p0, TW), :, pl.ds(j * tb, tb)], xp,
            sems.at[1])
        din1.start()
        din2.start()
        din1.wait()
        din2.wait()
        ot[...] = aff1(ct_ref[...], xt[...], xp[...])
        op_[...] = aff1(cp_ref[...], xp[...], xt[...])
        do1 = pltpu.make_async_copy(
            ot, out_ref.at[pl.ds(t0, TW), :, pl.ds(j * tb, tb)],
            sems.at[2])
        do2 = pltpu.make_async_copy(
            op_, out_ref.at[pl.ds(p0, TW), :, pl.ds(j * tb, tb)],
            sems.at[3])
        do1.start()
        do2.start()
        do1.wait()
        do2.wait()

    def cmap_t(g, j):
        return ((g // ht) * 2 * ht + g % ht, 0)

    def cmap_p(g, j):
        return ((g // ht) * 2 * ht + g % ht + ht, 0)

    return pl.pallas_call(
        kernel,
        grid=(npairs, B // tb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TW, L), cmap_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((TW, L), cmap_p, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((W, L, B), jnp.uint32),
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((TW, L, tb), jnp.uint32),
            pltpu.VMEM((TW, L, tb), jnp.uint32),
            pltpu.VMEM((TW, L, tb), jnp.uint32),
            pltpu.VMEM((TW, L, tb), jnp.uint32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(state, cwin, cwin)


@partial(jax.jit, static_argnums=(0, 4, 5, 6, 7, 8))
def _fused_bf2(spec: FieldSpec, state, awin, bwin, start: int, half: int,
               A: int, tb: int, interpret: bool):
    """One butterfly level, 2-mul form (the unscaling final recombine):
    state[p] = A[p]·state[p] + B[p]·state[p^half], in place.
    Pair variant only (half ≥ TW; in-tile levels ride _fused_cascade)."""
    W, L, B = state.shape
    _, aff2 = _tile_fns(spec)

    assert half >= TW
    ht = half // TW
    npairs = A // (2 * TW)

    def kernel(st_ref, at_ref, bt_ref, ap_ref, bp_ref, out_ref,
               xt, xp, ot, op_, sems):
        g = pl.program_id(0)
        j = pl.program_id(1)
        q = g // ht
        r = g % ht
        t0 = start + (q * 2 * ht + r) * TW
        p0 = t0 + half
        din1 = pltpu.make_async_copy(
            st_ref.at[pl.ds(t0, TW), :, pl.ds(j * tb, tb)], xt,
            sems.at[0])
        din2 = pltpu.make_async_copy(
            st_ref.at[pl.ds(p0, TW), :, pl.ds(j * tb, tb)], xp,
            sems.at[1])
        din1.start()
        din2.start()
        din1.wait()
        din2.wait()
        ot[...] = aff2(at_ref[...], bt_ref[...], xt[...], xp[...])
        op_[...] = aff2(ap_ref[...], bp_ref[...], xp[...], xt[...])
        do1 = pltpu.make_async_copy(
            ot, out_ref.at[pl.ds(t0, TW), :, pl.ds(j * tb, tb)],
            sems.at[2])
        do2 = pltpu.make_async_copy(
            op_, out_ref.at[pl.ds(p0, TW), :, pl.ds(j * tb, tb)],
            sems.at[3])
        do1.start()
        do2.start()
        do1.wait()
        do2.wait()

    def cmap_t(g, j):
        return ((g // ht) * 2 * ht + g % ht, 0)

    def cmap_p(g, j):
        return ((g // ht) * 2 * ht + g % ht + ht, 0)

    return pl.pallas_call(
        kernel,
        grid=(npairs, B // tb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((TW, L), cmap_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((TW, L), cmap_t, memory_space=pltpu.VMEM),
            pl.BlockSpec((TW, L), cmap_p, memory_space=pltpu.VMEM),
            pl.BlockSpec((TW, L), cmap_p, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((W, L, B), jnp.uint32),
        input_output_aliases={0: 0},
        scratch_shapes=[
            pltpu.VMEM((TW, L, tb), jnp.uint32),
            pltpu.VMEM((TW, L, tb), jnp.uint32),
            pltpu.VMEM((TW, L, tb), jnp.uint32),
            pltpu.VMEM((TW, L, tb), jnp.uint32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
        compiler_params=_VMEM_PARAMS,
    )(state, awin, bwin, awin, bwin)


# --------------------------------------------------------------- executor


class _SchedMeta:
    """Host-side view of a Schedule plus per-step fusion analysis."""

    __slots__ = ("xs", "W", "A", "bs_max", "out_perm", "fusable")

    def __init__(self, sched: Schedule):
        # prefer host copies: sched.xs may live on a remote accelerator,
        # and this executor consumes every index at trace time
        src = sched.host_xs if sched.host_xs is not None else sched.xs
        ops_a, starts, colp, dp, rid = (np.asarray(a) for a in src[:5])
        bank = np.asarray(src[5])
        self.xs = dict(ops=ops_a, starts=starts, colp=colp, dp=dp,
                       rid=rid, bank=bank)
        self.W = sched.W
        self.A = int(bank.shape[1])
        self.bs_max = sched.bs_max
        self.out_perm = sched.out_perm
        self.fusable = [self._analyze(t) for t in range(len(ops_a))]

    def _analyze(self, t: int):
        """Return half if step t is a fusable in-place butterfly
        (both halves of each pair in-window, partner = global xor,
        inactive rows carried by C = scratch row 0), else 0."""
        xs = self.xs
        op = int(xs["ops"][t])
        if op not in (OP_AFF1S_C, OP_AFFINE_C):
            return 0
        dop = int(xs["dp"][t, DP_DOP])
        if dop == DOP_NONE:
            return 0
        half = int(xs["dp"][t, DP_HALF])
        if half < MIN_FUSED_HALF:
            return 0
        start, A, W = int(xs["starts"][t]), self.A, self.W
        if start % TW or A % TW:
            return 0
        # the xor pairing must partition the window: pair variant groups
        # tiles in blocks of 2·half rows, in-tile variant needs the whole
        # pair group inside one tile
        if half >= TW and A % (2 * half):
            return 0
        if half < TW and TW % (2 * half):
            return 0
        p = np.arange(start, start + A, dtype=np.int64)
        brow = _col_np(xs, t, 2, W)[start:start + A]
        g2 = _col_np(xs, t, 3, W)[start:start + A]
        active = brow != 0
        if not np.array_equal(g2[active], (p ^ half)[active]):
            return 0
        if op == OP_AFFINE_C:
            g1 = _col_np(xs, t, 1, W)[start:start + A]
            arow = _col_np(xs, t, 0, W)[start:start + A]
            # inactive rows of a 2-mul step pass through via A=one, B=zero
            if not np.array_equal(g1[active], p[active]):
                return 0
            if not (np.all(arow[~active] == 0) and np.all(brow[~active] == 0)
                    and np.all(arow[active] > 0)):
                return 0
        if half >= TW:
            if half % TW:
                return 0
            tiles = np.arange(start, start + A, TW, dtype=np.int64)
            part = tiles ^ half
            if part.min() < 0 or part.max() + TW > W:
                return 0
        return half


_META_CACHE: dict = {}


def _meta(sched: Schedule) -> _SchedMeta:
    key = id(sched)
    hit = _META_CACHE.get(key)
    if hit is None or hit[0] is not sched:
        hit = (sched, _SchedMeta(sched))
        _META_CACHE[key] = hit
    return hit[1]


def _plane(pool, b0: int, b1: int, half: int, rows: int):
    """Static-slice build of a (rows, L) plane: period-2·half interleave
    of pool[b0:b0+half] and pool[b1:b1+half] (schedule.py's D-engine
    `plane` gather, constant-folded at trace time)."""
    tile = jnp.concatenate([pool[b0:b0 + half], pool[b1:b1 + half]], axis=0)
    return jnp.tile(tile, (rows // (2 * half), 1))


def run_unrolled(spec: FieldSpec, pool, sched: Schedule, batch,
                 one_pos: int, m_out: int, use_pallas: bool = False,
                 batch_chunk: int | None = None, interpret: bool = False):
    """Execute a schedule by unrolling its steps at trace time (see module
    docstring). Same signature/semantics as schedule.run_schedule."""
    meta = _meta(sched)
    if spec.num_limbs > 1 and spec.fold_terms is None:
        pool = _pool_to_mont(spec, pool)
    perm = None if meta.out_perm is None else jnp.asarray(meta.out_perm)
    first = batch[0] if isinstance(batch, tuple) else batch
    B = first.shape[0]
    if batch_chunk is not None and batch_chunk < B and B % batch_chunk == 0:
        # pack/run/unpack PER CHUNK so HBM holds one chunk's (W, L, c)
        # state at a time — round 3 packed the full batch first and kept
        # it (plus every finished chunk's full-width state) alive across
        # chunk runs, which OOM'd the flagship (BENCH_r03.json)
        outs = []
        for c0 in range(0, B, batch_chunk):
            sl = slice(c0, c0 + batch_chunk)
            sub = (tuple(a[sl] if a.ndim == 3 else a for a in batch)
                   if isinstance(batch, tuple) else batch[sl])
            x = _pack_state(spec, sub, sched.W, one_pos)
            x = _run_chunk(spec, pool, meta, x, use_pallas, interpret)
            outs.append(_unpack_state(spec, x, m_out, perm))
        return jnp.concatenate(outs, axis=0)
    x = _pack_state(spec, batch, sched.W, one_pos)
    x = _run_chunk(spec, pool, meta, x, use_pallas, interpret)
    return _unpack_state(spec, x, m_out, perm)


_SEG_CACHE: dict = {}


def _run_chunk(spec, pool, meta, x, use_pallas, interpret):
    import os as _os
    import sys as _sys
    import time as _time

    dbg = _os.environ.get("ECFFT_UNROLL_DEBUG")
    nsteps = len(meta.xs["ops"])
    L = spec.num_limbs
    D = jnp.zeros((max(meta.bs_max, 1), L), jnp.uint32)
    iD = D
    B = x.shape[-1]
    for lo in range(0, nsteps, SEG_STEPS):
        hi = min(lo + SEG_STEPS, nsteps)
        key = (id(meta), lo, hi, B, use_pallas, interpret, spec.name)
        fn = _SEG_CACHE.get(key)
        t0 = _time.time() if dbg else 0.0
        if fn is None:
            fn = jax.jit(
                partial(_segment, spec, meta, lo, hi, use_pallas, interpret),
                donate_argnums=(1,),
            )
            _SEG_CACHE[key] = fn
        x, D, iD = fn(pool, x, D, iD)
        if dbg:
            jax.block_until_ready(x)
            print(f"[unroll] seg {lo}:{hi}/{nsteps} {_time.time()-t0:.2f}s",
                  file=_sys.stderr, flush=True)
    return x


def _segment(spec, meta, lo, hi, use_pallas, interpret, pool, x, D, iD):
    xs = meta.xs
    A, W = meta.A, meta.W
    bsx = max(meta.bs_max, 1)
    B = x.shape[-1]
    tb = 128 if B % 128 == 0 else B
    P = pool.shape[0]
    # Mosaic requires DMA slices along the (last) batch dim to be
    # 128-aligned on real hardware — a tb < 128 tile compiles only in
    # interpret mode ("Slice shape along dimension 2 must be aligned to
    # tiling (128), but is 3"). Non-128-multiple batches take the
    # generic XLA path on hardware.
    fuse_ok = interpret or (use_pallas and tb % 128 == 0)

    # pending run of consecutive in-tile butterfly levels (see
    # _fused_cascade): [start, halves, kinds, cwins, awins]
    pend = None
    # levels-per-cascade-kernel cap (see CASCADE_VMEM_BUDGET). The
    # per-level estimate is anchored to the measured L=16/tb=128 point:
    # 4 state-sized temps of (2L+2) u32 columns each per level; if
    # aff1_tile/aff2_tile's temp count changes, re-measure the budget.
    per_level = TW * tb * 4 * (2 * spec.num_limbs + 2) * 4
    max_k = max(1, CASCADE_VMEM_BUDGET // per_level)

    def flush():
        nonlocal x, pend
        if pend is None:
            return
        p_start, p_halves, p_kinds, p_cwins, p_awins = pend
        pend = None
        ai = 0
        for c0 in range(0, len(p_halves), max_k):
            c1 = min(c0 + max_k, len(p_halves))
            kinds = tuple(p_kinds[c0:c1])
            n2 = sum(kinds)
            cw = jnp.stack(p_cwins[c0:c1])
            aw = (jnp.stack(p_awins[ai:ai + n2]) if n2
                  else jnp.zeros((1, cw.shape[1], cw.shape[2]), cw.dtype))
            ai += n2
            x = _fused_cascade(spec, x, cw, aw, p_start,
                               tuple(p_halves[c0:c1]), kinds, tb, interpret)

    for t in range(lo, hi):
        op = int(xs["ops"][t])
        start = int(xs["starts"][t])
        dps = xs["dp"][t]
        dop = int(dps[DP_DOP])

        # ---- D-engine (trace time, only on level steps) ----
        CAx = CBx = None
        if dop != DOP_NONE:
            half = int(dps[DP_HALF])
            Ms = _plane(pool, int(dps[DP_MS0]), int(dps[DP_MS1]), half, bsx)
            Mp = _plane(pool, int(dps[DP_MP0]), int(dps[DP_MP1]), half, bsx)
            Msi = _plane(pool, int(dps[DP_MSI0]), int(dps[DP_MSI1]), half,
                         bsx)
            r = np.arange(bsx)
            perm = jnp.asarray(np.minimum(r ^ half, bsx - 1))
            Dp = jnp.take(D, perm, axis=0)
            ratio = _mul_rows(spec, Mp, Msi)
            if dop == DOP_LEVEL0:
                CB = ratio
                CA = _mul_rows(spec, Ms, D)
                D, iD = Ms, Msi
            elif dop == DOP_LEVEL:
                CB = _mul_rows(spec, _mul_rows(spec, ratio, Dp), iD)
                CA = _mul_rows(spec, Ms, D)
                D = _mul_rows(spec, Ms, D)
                iD = _mul_rows(spec, Msi, iD)
            else:  # DOP_FINAL
                CB = _mul_rows(spec, Mp, Dp)
                CA = _mul_rows(spec, Ms, D)
            CAx = jnp.concatenate([pool[1:2], CA], axis=0)
            CBx = jnp.concatenate([pool[0:1], CB], axis=0)

        # ---- fused butterfly path ----
        bf_half = meta.fusable[t] if fuse_ok else 0
        if bf_half:
            brow = _col_tracer(xs, t, 2)
            cwin = jnp.take(CBx, jnp.clip(brow, 0, bsx), axis=0)
            awin = None
            if op != OP_AFF1S_C:
                arow = _col_tracer(xs, t, 0)
                awin = jnp.take(CAx, jnp.clip(arow, 0, bsx), axis=0)
            if bf_half >= TW:  # pair variant: its own single-level kernel
                flush()
                if op == OP_AFF1S_C:
                    x = _fused_bf1(spec, x, cwin, start, bf_half, A, tb,
                                   interpret)
                else:
                    x = _fused_bf2(spec, x, awin, cwin, start, bf_half, A,
                                   tb, interpret)
                continue
            # in-tile level: join (or open) the pending cascade run
            if pend is not None and pend[0] != start:
                flush()
            if pend is None:
                pend = [start, [], [], [], []]
            pend[1].append(bf_half)
            pend[2].append(0 if op == OP_AFF1S_C else 1)
            pend[3].append(cwin)
            if awin is not None:
                pend[4].append(awin)
            continue

        flush()
        # ---- generic path (scan-executor ops with static params) ----
        p = start + jnp.arange(A, dtype=jnp.int32)

        def gather_state(row):
            return jnp.take(x, jnp.clip(row, 0, W - 1), axis=0)

        def x1_of(op=op, t=t):
            if op in (OP_AFF1S, OP_AFF1S_C):
                return jax.lax.dynamic_slice(
                    x, (start, 0, 0), (A,) + x.shape[1:])
            return gather_state(_col_tracer(xs, t, 1))

        x2 = gather_state(_col_tracer(xs, t, 3))
        pk = use_pallas and spec.num_limbs > 1 and (
            spec.fold_terms is None
            or sum(d for _, d in spec.fold_terms) < (1 << 10))

        if op in (OP_AFF1, OP_AFF1S, OP_AFF1_C, OP_AFF1S_C):
            if op in (OP_AFF1, OP_AFF1S):
                C = jnp.take(pool, jnp.clip(_col_tracer(xs, t, 2), 0, P - 1),
                             axis=0)
            else:
                C = jnp.take(CBx, jnp.clip(_col_tracer(xs, t, 2), 0, bsx),
                             axis=0)
            if pk:
                from ecfft_tpu.ops.pallas_step import pallas_muladd1

                out = pallas_muladd1(spec, C, x1_of(), x2, interpret)
            else:
                out = _muladd1_cols(spec, C[:, :, None], x1_of(), x2)
        elif op in (OP_AFFINE, OP_AFFINE_C):
            if op == OP_AFFINE:
                Ac = jnp.take(pool, jnp.clip(_col_tracer(xs, t, 0), 0, P - 1),
                              axis=0)
                Bc = jnp.take(pool, jnp.clip(_col_tracer(xs, t, 2), 0, P - 1),
                              axis=0)
            else:
                Ac = jnp.take(CAx, jnp.clip(_col_tracer(xs, t, 0), 0, bsx),
                              axis=0)
                Bc = jnp.take(CBx, jnp.clip(_col_tracer(xs, t, 2), 0, bsx),
                              axis=0)
            if pk:
                from ecfft_tpu.ops.pallas_step import pallas_muladd2

                out = pallas_muladd2(spec, Ac, Bc, x1_of(), x2, interpret)
            else:
                out = _muladd2_cols(spec, Ac[:, :, None], x1_of(),
                                    Bc[:, :, None], x2)
        elif op == OP_MUL:
            out = _mulss(spec, x1_of(), x2)
        elif op == OP_CMPSEL:
            c1 = gather_state(_col_tracer(xs, t, 0))
            c2 = gather_state(_col_tracer(xs, t, 2))
            comp = jnp.all(c1 == c2, axis=(0, 1))
            out = jnp.where(comp[None, None, :], x1_of(), x2)
        else:  # pragma: no cover - unknown opcode
            raise ValueError(f"unknown opcode {op}")
        x = jax.lax.dynamic_update_slice(x, out, (start, 0, 0))
    flush()
    return x, D, iD
