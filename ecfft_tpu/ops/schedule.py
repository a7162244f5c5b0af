"""The schedule machine: ECFFT transforms as data.

Motivation: on TPU every distinct XLA computation pays a large compile
cost (tens of seconds through this environment's remote-compile path, and
minutes for the multi-scan ENTER/EXIT traces). But every ECFFT algorithm
is a composition of one primitive shape:

    out[p] = A[p] · x[g1[p]]  +  B[p] · x[g2[p]]

- EXTEND's butterflies: A/B the pre-scattered Lemma-3.2 coefficients,
  g1 = p, g2 = p XOR half (ops/core.py::extend derivation);
- ENTER's combine P = U + X^(k/2)·V: A = 1, B = xnn, block-affine g's
  (fftree.rs:155-159);
- REDC/MOD/EXIT's elementwise stages: (e − g·a)·z⁻¹ etc. are affine in
  the state with coefficients that are *products of precomputed tables*
  (fused into the pool ahead of time);
- interleave/deinterleave/subsample: pure index permutations, absorbed
  into g1/g2 for free.

So a whole transform compiles to ONE ``lax.scan`` over per-step tensors
(op, a_idx, b_idx, g1, g2) — the "schedule" — with coefficients fetched
from a flat "pool" of table rows. The FFTree stops being code and becomes
a program: one tiny compiled interpreter runs ALL EIGHT algorithms
(ENTER, EXIT, EXTEND, MEXTEND, DEGREE, REDC, MOD, VANISH — matching the
reference's uniform treatment, fftree.rs:123-316) for every size, and
adding an algorithm adds data, not a compile.

Five step opcodes cover everything:
- OP_AFFINE: out[p] = pool[a[p]]·x[g1[p]] + pool[b[p]]·x[g2[p]]
- OP_AFF1:   out[p] = x[g1[p]] + pool[b[p]]·x[g2[p]] — the 1-mul
  workhorse: scaled butterfly levels (see _emit_extend), ENTER's
  combine, pure scales (x1 = the always-zero pad row) and mul-free
  copies (C = 0)
- OP_AFF1S:  OP_AFF1 with x1 read as the window slice itself (g1 ≡
  identity) — skips one whole-state gather per step
- OP_MUL:    out[p] = x[g1[p]]·x[g2[p]]  — state×state products
  (VANISH's pairwise merges, DEGREE's t1 term, general-modulus REDC's
  e·a⁻¹ / g·a products, and the scheduled Fermat inversion chain)
- OP_CMPSEL: comp_b = ∀p: x[a[p]] == x[b[p]] (one bool per batch lane);
  out[p] = comp ? x[g1[p]] : x[g2[p]] — DEGREE's data-dependent branch
  (fftree.rs:180-191) as a lane-wise select.

Butterfly networks are emitted SCALED (the TPU twiddle-absorption
analogue): all but the last level of every EXTEND run as OP_AFF1S with
one absorbed coefficient per row, and the last recombine level applies
the accumulated per-row diagonal as a normal 2-mul OP_AFFINE — outputs
are bit-identical to the reference's algorithm at ~55% of the multiply
work (u32 multiplies are the VPU bottleneck; adds are ~4× cheaper).

State layout: (W, B, L) — position-major so each gather moves a
contiguous (B, L) row (batch rides the TPU lane dimension), limb-minor so
the field kernels apply unchanged. For ENTER/EXIT, W = 2n+1: positions
[0, n) are the value lane, [n, 2n) the extend/scratch lane, and position
2n is a constant 1 so additive table terms (MEXTEND's +Z) stay affine.

Step counts: ENTER ≈ log²n, EXIT ≈ 4·log²n — the same O(n log² n) work
as the reference's recursion (README.md:7-8), one n-wide step per level.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ecfft_tpu.fields import device as fd
from ecfft_tpu.fields.registry import FieldSpec
from ecfft_tpu.ops.core import S0, S1, _ilog2

ZERO = 0  # pool row of zeros
ONE = 1   # pool row of one

OP_AFFINE = 0
OP_MUL = 1
OP_CMPSEL = 2
OP_AFF1 = 3   # out[p] = x[g1[p]] + pool[b[p]]·x[g2[p]] — 1-mul step
OP_AFF1S = 4  # same, but x1 = the window slice itself (g1 ≡ identity)


class Schedule(NamedTuple):
    """A compiled-to-data transform: ``W`` is the state width (python
    int, static), ``xs`` = (op, start, fa, fg1, fb, fg2, a_bank,
    g1_bank, b_bank, g2_bank): six per-step (steps,) int32 scalars plus
    four deduplicated row banks (rows_i, A) of window-compacted indices
    — step t's a-indices are a_bank[fa[t]] and so on. Window
    compaction: each step computes only a fixed-width A-row window of
    the state and writes it back with one dynamic_update_slice (most
    ECFFT steps touch ≤ n of the 2n+1-wide state). Bank dedupe exploits
    schedules repeating index rows heavily (EXIT's four extends per
    level are structurally identical). ``out_perm`` optionally maps
    output rows to state rows post-scan (one gather), letting builders
    keep moiety-planar layouts with tight windows and still deliver
    domain-ordered results."""

    W: int
    xs: tuple
    out_perm: np.ndarray | None = None


# ----------------------------------------------------------------- pool


def _batch_inv(spec: FieldSpec, a):
    """Batched modular inverse of (N, L) rows: two associative product
    scans + ONE Fermat chain on the total product (Montgomery's batch-
    inversion trick, log-depth — the reference leans on
    ark_ff::batch_inversion the same way, fftree.rs:330-333)."""
    mulf = lambda x, y: fd.mul(spec, x, y)  # noqa: E731
    pre = jax.lax.associative_scan(mulf, a, axis=0)
    suf = jax.lax.associative_scan(mulf, a, axis=0, reverse=True)
    inv_tot = fd.inv(spec, pre[-1])
    ones = fd.ones(spec, (1,))
    pre_excl = jnp.concatenate([ones, pre[:-1]], axis=0)
    suf_excl = jnp.concatenate([suf[1:], ones], axis=0)
    return mulf(mulf(pre_excl, suf_excl), inv_tot)


def _scaled_extend_levels(spec: FieldSpec, mats, m: int, mo: int):
    """Per-level absorbed butterfly coefficients for a size-2m extend.

    The Lemma-3.2 network (fftree.rs:72-120) applies, per row p and
    level, out[p] = Mself·x[p] + Mpart·x[p^half] — two field muls per
    row. Here each non-final level is rewritten as the 1-mul form
    out[p] = x[p] + C·x[p^half] by tracking a per-row diagonal scale
    D[p] (out' = out/D, D ← Mself·D); the LAST level applies
    A = Mself·D[p], B = Mpart·D[p^half] (2-mul), so extend outputs are
    exactly unscaled. Returns (numerators, denominators, finalA, finalB):
    C tables = numer·inv(denom), with the inversions deferred so the
    whole pool build shares one batched inversion (_batch_inv)."""
    logm = m.bit_length() - 1
    pi_dec = 0 if mo == S0 else 1
    pi_rec = 2 if mo == S0 else 3
    levels = [(pi_dec, d) for d in range(logm)]
    levels += [(pi_rec, d) for d in reversed(range(logm))]
    p = np.arange(m)
    mselfs, mparts, perms = [], [], []
    for pi, d in levels:
        half = m >> (d + 1)
        sel = jnp.take(jnp.asarray(mats[d][pi]), p & (half - 1), axis=0)
        bit = jnp.asarray((p & half) != 0)[:, None]
        mselfs.append(jnp.where(bit, sel[:, 1, 1, :], sel[:, 0, 0, :]))
        mparts.append(jnp.where(bit, sel[:, 1, 0, :], sel[:, 0, 1, :]))
        perms.append(p ^ half)
    ms = jnp.stack(mselfs)
    mp = jnp.stack(mparts)
    pe = jnp.asarray(np.stack(perms))

    # D-chain as a lax.scan so the field-mul graph is traced ONCE per
    # size (an unrolled python loop made the pool build's XLA graph so
    # large that CPU compilation took minutes at n=2^11)
    def step(D, inp):
        mself, mpart, perm = inp
        numer = fd.mul(spec, mpart, jnp.take(D, perm, axis=0))
        denom = fd.mul(spec, mself, D)
        return denom, (numer, denom)

    d_fin, (numers, denoms) = jax.lax.scan(
        step, fd.ones(spec, (m,)), (ms[:-1], mp[:-1], pe[:-1]))
    fin_a = fd.mul(spec, ms[-1], d_fin)
    fin_b = fd.mul(spec, mp[-1], jnp.take(d_fin, pe[-1], axis=0))
    L = spec.num_limbs
    return numers.reshape(-1, L), denoms.reshape(-1, L), fin_a, fin_b


@partial(jax.jit, static_argnums=(0, 2))
def _scaled_parts(spec: FieldSpec, tables, sizes: tuple):
    """Phase 1 of the pool build: stacked scaled-extend numerators,
    denominators and final (A, B) tables for every (size ≥ 4, moiety).
    The denominators are inverted on the HOST between the two jitted
    phases (native batch inversion — a CPU XLA product scan measured
    minutes at n=2^16)."""
    nu, de, fins = [], [], []
    for k in sizes:
        if k < 4:
            continue
        for mo in (S0, S1):
            nu_i, de_i, fa, fb = _scaled_extend_levels(
                spec, tables[k]["mats"], k // 2, mo)
            nu.append(nu_i)
            de.append(de_i)
            fins.extend([fa, fb])
    return jnp.concatenate(nu, axis=0), jnp.concatenate(de, axis=0), fins


def _host_batch_inv(spec: FieldSpec, denoms) -> jnp.ndarray:
    """Invert (N, L) denominators host-side via the native engine when
    possible, else the jnp product-scan fallback (_batch_inv)."""
    if spec.limb_bits == 16 and spec.num_limbs <= 16:
        try:
            from ecfft_tpu.native import batch_inv_limbs

            return jnp.asarray(batch_inv_limbs(spec, np.asarray(denoms)))
        except Exception:  # no toolchain: fall through to the XLA path
            pass
    return _batch_inv(spec, denoms)


@partial(jax.jit, static_argnums=(0, 2))
def _build_pool_arrays(spec: FieldSpec, tables, sizes: tuple, scaled=None):
    """One jitted computation for the whole pool: tiny eager ops would
    each pay this environment's per-computation remote-compile cost."""
    L = spec.num_limbs
    rows = [jnp.zeros((1, L), jnp.uint32), fd.ones(spec, (1,))]
    if scaled is not None:
        nu_all, inv_all, fins = scaled
        c_all = fd.mul(spec, nu_all, inv_all)  # every C table in one mul
        cur = 0
        fi = 0
        for k in sizes:
            if k < 4:
                continue
            m = k // 2
            cnt = (2 * (m.bit_length() - 1) - 1) * m
            for mo in (S0, S1):
                rows.append(c_all[cur:cur + cnt])
                cur += cnt
                rows.append(fins[fi])
                rows.append(fins[fi + 1])
                fi += 2
    for k in sorted(tables):
        t = tables[k]
        for name in ("xnn_s", "xnn_s_inv", "z0_s1", "z1_s0", "z0_inv_s1",
                     "z1_inv_s0", "z0z0_rem_xnn_s"):
            rows.append(t[name])
        # fused vectors for the EXIT/MOD pipeline with a = X^(k/2),
        # c = <Z0² mod a ≀ S> (fftree.rs:200-289)
        xnn = t["xnn_s"]
        xnninv = t["xnn_s_inv"]
        z0inv = t["z0_inv_s1"]
        z00 = t["z0z0_rem_xnn_s"]
        rows.append(fd.neg(spec, fd.mul(spec, xnn[1::2], z0inv)))
        rows.append(fd.mul(spec, z00[0::2], xnninv[0::2]))
        rows.append(fd.mul(spec, z0inv, z00[1::2]))
        rows.append(fd.neg(spec, xnninv))
        # negated inverse tables (DEGREE's t1 term, general-modulus REDC)
        rows.append(fd.neg(spec, z0inv))
        rows.append(fd.neg(spec, t["z1_inv_s0"]))
        # const k/2 (DEGREE's accumulator increment, fftree.rs:188)
        rows.append(fd.encode(spec, [k // 2]))
    # negated 2-leaf domain (VANISH's base case x − l_b, fftree.rs:293-298)
    rows.append(fd.neg(spec, tables[sizes[0]]["leaves2"]))
    return jnp.concatenate(rows, axis=0)


def build_pool(tree) -> tuple[jnp.ndarray, dict]:
    """Concatenate every table row a schedule can reference into one
    (P, L) array; returns (pool, offsets). Includes fused/negated
    coefficient vectors so REDC/MOD/EXIT stages stay single-step affine.
    Offsets are computed host-side from shapes; the array build is a
    single jitted computation.
    """
    spec = tree.spec
    tables = {
        k: {kk: tree.tables[k][kk]
            for kk in ("mats", "xnn_s", "xnn_s_inv", "z0_s1", "z1_s0",
                       "z0_inv_s1", "z1_inv_s0", "z0z0_rem_xnn_s")}
        for k in tree.tables
    }
    sizes = tuple(sorted(tables))
    tables[sizes[0]]["leaves2"] = tree.tables[2]["leaves"]
    off = {}
    cursor = 2
    # scaled-extend tables: per (size ≥ 4, moiety), the per-position
    # 1-mul coefficients sc_{k}_{mo}_{level} (levels in emission order:
    # dec 0..logm−1 then rec logm−1..1) and the final-level absorbed
    # (A, B) pair sfa/sfb (see _scaled_extend_levels / _emit_extend)
    for k in sizes:
        if k < 4:
            continue
        m = k // 2
        logm = m.bit_length() - 1
        for mo in (S0, S1):
            for li in range(2 * logm - 1):
                off[f"sc_{k}_{mo}_{li}"] = cursor
                cursor += m
            off[f"sfa_{k}_{mo}"] = cursor
            cursor += m
            off[f"sfb_{k}_{mo}"] = cursor
            cursor += m
    for k in sizes:
        t = tables[k]
        for name in ("xnn_s", "xnn_s_inv", "z0_s1", "z1_s0", "z0_inv_s1",
                     "z1_inv_s0", "z0z0_rem_xnn_s"):
            off[f"{name}_{k}"] = cursor
            cursor += t[name].shape[0]
        half = k // 2
        for name, cnt in (("neg_a1_z0inv", half), ("c0_a0inv", half),
                          ("zc1", half), ("neg_xnninv", k),
                          ("neg_z0_inv_s1", half), ("neg_z1_inv_s0", half),
                          ("half_const", 1)):
            off[f"{name}_{k}"] = cursor
            cursor += cnt
    off["neg_leaf2"] = cursor
    cursor += 2
    scaled = None
    if any(k >= 4 for k in sizes):
        nu_all, de_all, fins = _scaled_parts(spec, tables, sizes)
        scaled = (nu_all, _host_batch_inv(spec, de_all), fins)
    return _build_pool_arrays(spec, tables, sizes, scaled), off


# ------------------------------------------------------------- schedules


class _Builder:
    """Accumulates schedule steps; default row is a passthrough.

    Width is rounded up to a multiple of 128 so the Pallas step kernel
    can use a large position tile (a multiple-of-8 width forced an 8-row
    tile => 16k grid programs at n=2^16, and per-program overhead
    dominated the kernel); the pad rows stay passthrough forever.

    ``one_pos`` (required for OP_MUL steps) is the state position holding
    the constant 1: a mul step's passthrough form is x[p]·x[one_pos]."""

    def __init__(self, W: int, one_pos: int | None = None):
        self._orig_w = W
        self.W = (W + 127) & ~127
        self.one_pos = one_pos
        self.steps = []

    def new_step(self):
        W = self.W
        ar = np.full(W, ONE, np.int32)
        g1 = np.arange(W, dtype=np.int32)
        br = np.full(W, ZERO, np.int32)
        g2 = np.arange(W, dtype=np.int32)
        self.steps.append((OP_AFFINE, ar, g1, br, g2))
        return self.steps[-1][1:]

    def new_mul_step(self):
        """out[p] = x[g1[p]]·x[g2[p]]; defaults to x[p]·1."""
        assert self.one_pos is not None, "mul steps need one_pos"
        W = self.W
        ar = np.full(W, ZERO, np.int32)  # unused by OP_MUL
        g1 = np.arange(W, dtype=np.int32)
        br = np.full(W, ZERO, np.int32)
        g2 = np.full(W, self.one_pos, np.int32)
        self.steps.append((OP_MUL, ar, g1, br, g2))
        return self.steps[-1][1:]

    def new_aff1_step(self, self_read: bool = False):
        """out[p] = x[g1[p]] + pool[b[p]]·x[g2[p]] — the 1-mul step.
        With ``self_read`` the runtime reads x1 as the window slice
        itself (OP_AFF1S) and g1 is ignored — every row, active or
        passthrough, must read its own position (g1 ≡ identity)."""
        W = self.W
        ar = np.full(W, ZERO, np.int32)  # unused by OP_AFF1*
        g1 = np.arange(W, dtype=np.int32)
        br = np.full(W, ZERO, np.int32)  # C = 0 → passthrough
        g2 = np.arange(W, dtype=np.int32)
        self.steps.append(
            (OP_AFF1S if self_read else OP_AFF1, ar, g1, br, g2))
        return self.steps[-1][1:]

    @property
    def zero_pos(self) -> int:
        """A state row that is zero forever: the last pad row (state
        widths are odd pre-padding, so at least one pad row exists).
        Lets pure-scale steps ride OP_AFF1: out = x[zero] + C·x[g2]."""
        assert self.W > self._orig_w, "no pad row available"
        return self.W - 1

    def new_cmpsel_step(self):
        """comp = ∀p x[ar[p]] == x[br[p]] (per batch lane);
        out[p] = comp ? x[g1[p]] : x[g2[p]]. Defaults: trivially-true
        compare, passthrough select."""
        W = self.W
        ar = np.arange(W, dtype=np.int32)  # state idx (compare lhs)
        g1 = np.arange(W, dtype=np.int32)
        br = np.arange(W, dtype=np.int32)  # state idx (compare rhs)
        g2 = np.arange(W, dtype=np.int32)
        self.steps.append((OP_CMPSEL, ar, g1, br, g2))
        return self.steps[-1][1:]

    def arrays(self) -> Schedule:
        """Window-compact the accumulated steps into a Schedule.

        Per step, the active rows are those whose output differs from a
        passthrough (and, for OP_CMPSEL, rows contributing a non-trivial
        compare); the schedule stores only a fixed-width window
        [start, start+A) covering every step's active span, A = the max
        span padded to the 128-row position tile. Rows inside a window
        that aren't active keep their identity defaults, so correctness
        is unaffected — only wasted compute and index memory shrink.
        """
        W = self.W
        iota = np.arange(W, dtype=np.int32)
        spans = []
        for op, a, g1, b, g2 in self.steps:
            if op == OP_AFFINE:
                iden = (a == ONE) & (b == ZERO) & (g1 == iota)
            elif op == OP_MUL:
                iden = (g1 == iota) & (g2 == self.one_pos)
            elif op == OP_AFF1:
                iden = (b == ZERO) & (g1 == iota)
            elif op == OP_AFF1S:
                iden = b == ZERO  # x1 is the slice itself
            else:  # OP_CMPSEL: both select arms self AND trivial compare
                iden = (g1 == iota) & (g2 == iota) & (a == b)
            act = np.nonzero(~iden)[0]
            spans.append((int(act[0]), int(act[-1]) + 1) if act.size
                         else (0, 1))
        A = max(hi - lo for lo, hi in spans)
        A = min(W, (A + 127) & ~127)
        ops, starts, cols = [], [], ([], [], [], [])
        zrow = np.zeros(A, np.int32)
        for (op, a, g1, b, g2), (lo, hi) in zip(self.steps, spans):
            start = min(lo, W - A)
            ops.append(op)
            starts.append(start)
            # zero the columns an opcode never reads so identical work
            # dedupes into one bank row regardless of the window start
            rows = [a[start:start + A], g1[start:start + A],
                    b[start:start + A], g2[start:start + A]]
            if op in (OP_AFF1, OP_AFF1S, OP_MUL):
                rows[0] = zrow
            if op == OP_AFF1S:
                rows[1] = zrow
            for acc, arr in zip(cols, rows):
                acc.append(arr)
        # per-column row BANKS with exact dedupe: schedules repeat index
        # rows heavily (EXIT runs four structurally identical extends
        # per level; butterfly partner maps repeat between the down and
        # up sweeps), so storing unique rows + a per-step row id cuts
        # schedule memory ~4-5x — the difference between EXIT at n=2^18
        # fitting in one chip's HBM or not
        banks, ids = [], []
        for acc in cols:
            # hash-based dedupe: np.unique(axis=0) lexsorts gigabytes
            # at n=2^18; a bytes-key dict is one linear pass
            seen: dict = {}
            rows_out = []
            idx = np.empty(len(acc), np.int32)
            for t, row in enumerate(acc):
                row = np.ascontiguousarray(row, dtype=np.int32)
                j = seen.get(row.tobytes())
                if j is None:
                    j = len(rows_out)
                    seen[row.tobytes()] = j
                    rows_out.append(row)
                idx[t] = j
            banks.append(np.stack(rows_out))
            ids.append(idx)
        xs = (np.asarray(ops, np.int32), np.asarray(starts, np.int32),
              ids[0], ids[1], ids[2], ids[3],
              banks[0], banks[1], banks[2], banks[3])
        return Schedule(W, xs)


def _emit_extend(bld, off, k: int, moiety: int, region, src_region=None):
    """Butterfly steps of EXTEND over tree size k on a packed region.

    ``region(j, i) -> global position`` maps (block j, offset i < k/2) and
    must accept numpy arrays (all emitters are fully vectorized — python
    per-position loops cost O(n log n) per schedule and dominated build
    time beyond n=2^12); the first down-step reads from ``src_region``
    (defaults to region), folding lane-to-lane copies into the butterfly.
    Blocks share coefficients (ops/core.py::extend).

    SCALED EMISSION: every level but the last is the 1-mul OP_AFF1S
    form out[p] = x[p] + C·x[p^half] (coefficients sc_{k}_{mo}_{li}
    from _scaled_extend_levels, which absorbs the self-coefficient into
    a per-row running diagonal); the last recombine level applies the
    accumulated diagonal with a full 2-mul OP_AFFINE (sfa/sfb), so the
    extend's outputs are exactly the reference's (fftree.rs:72-120) —
    ~2× less multiply work per butterfly network on the step kernel.
    """
    bs = k // 2
    if bs == 1:
        return  # size-1 extend is the identity (fftree.rs:74-76)
    logm = _ilog2(bs)
    mo = moiety
    nblocks = bld.nblocks
    J, I = np.meshgrid(np.arange(nblocks), np.arange(bs), indexing="ij")
    J, I = J.ravel(), I.ravel()
    P = np.asarray(region(J, I))

    li = 0
    for d in range(logm):
        half = bs >> (d + 1)
        ext_src = d == 0 and src_region is not None
        src = src_region if ext_src else region
        ar, g1, br, g2 = bld.new_aff1_step(self_read=not ext_src)
        br[P] = off[f"sc_{k}_{mo}_{li}"] + I
        if ext_src:
            g1[P] = src(J, I)
        g2[P] = src(J, I ^ half)
        li += 1
    for d in reversed(range(logm)):
        half = bs >> (d + 1)
        if d == 0:  # final level: unscale with the absorbed (A, B)
            ar, g1, br, g2 = bld.new_step()
            ar[P] = off[f"sfa_{k}_{mo}"] + I
            br[P] = off[f"sfb_{k}_{mo}"] + I
            g1[P] = P
            g2[P] = region(J, I ^ half)
        else:
            ar, g1, br, g2 = bld.new_aff1_step(self_read=True)
            br[P] = off[f"sc_{k}_{mo}_{li}"] + I
            g2[P] = region(J, I ^ half)
            li += 1


def extend_schedule(tree, m: int, moiety: int, mextend: bool = False):
    """Standalone EXTEND/MEXTEND of an m-point input (tree size 2m).

    State width m+1 (const-one slot feeds MEXTEND's +Z table term,
    fftree.rs:128-135)."""
    off = tree.pool_offsets
    W = m + 1
    bld = _Builder(W)
    bld.nblocks = 1
    region = lambda j, i: i  # noqa: E731
    _emit_extend(bld, off, 2 * m, moiety, region)
    if mextend:
        zkey = "z0_s1" if moiety == S1 else "z1_s0"
        zoff = off[f"{zkey}_{2 * m}"]
        ar, g1, br, g2 = bld.new_aff1_step(self_read=True)
        idx = np.arange(m)
        br[idx] = zoff + idx
        g2[idx] = m  # const-one slot
    return bld.arrays()


def enter_schedule(tree, n: int):
    """ENTER as a schedule (fftree.rs:143-167): per block size k, fold the
    lane copy into depth-0 butterflies on the scratch lane, then one
    combine step interleaving U + X^(k/2)·V."""
    off = tree.pool_offsets
    W = 2 * n + 1
    bld = _Builder(W)
    size = 2
    while size <= n:
        k, bs = size, size // 2
        bld.nblocks = n // bs  # every block extends (u and v alike)
        region = lambda j, i: n + j * bs + i  # noqa: E731
        src = lambda j, i: j * bs + i  # noqa: E731
        _emit_extend(bld, off, k, S1, region, src_region=src)
        # combine (fftree.rs:155-159): u + xnn·v is the 1-mul form
        xnn_off = off[f"xnn_s_{k}"]
        ar, g1, br, g2 = bld.new_aff1_step()
        Jc, Rc = np.meshgrid(np.arange(n // k), np.arange(k), indexing="ij")
        Jc, Rc = Jc.ravel(), Rc.ravel()
        Ic = Rc // 2
        P = Jc * k + Rc
        # u1/v1 come from the scratch lane (lane0 when bs == 1: the
        # size-1 extend was the identity)
        base = np.where(Rc % 2 == 0, 0, 0 if bs == 1 else n)
        g1[P] = base + Jc * k + Ic
        g2[P] = base + Jc * k + bs + Ic
        br[P] = xnn_off + Rc
        size *= 2
    return bld.arrays()


def exit_schedule(tree, n: int):
    """EXIT as a schedule (fftree.rs:200-230): per level k (n down to 2),
    MOD by X^(k/2) = REDC ∘ (·c) ∘ REDC with the ·c and a₀⁻¹ stages fused
    into pool coefficients, then the u0/v0 split. Scratch lane regions:
    Sa = first half of each block, Sb = second half.
    """
    off = tree.pool_offsets
    W = 2 * n + 1
    bld = _Builder(W)
    k = n
    while k >= 2:
        bs = k // 2
        nb = n // k
        bld.nblocks = nb
        sa = lambda j, i: n + j * k + i  # noqa: E731
        sb = lambda j, i: n + j * k + bs + i  # noqa: E731
        lane0 = lambda j, i: j * k + i  # noqa: E731
        a0inv = off[f"xnn_s_inv_{k}"]  # even entries via stride-2 index
        z0inv = off[f"z0_inv_s1_{k}"]
        negaz = off[f"neg_a1_z0inv_{k}"]
        c0a0 = off[f"c0_a0inv_{k}"]
        zc1 = off[f"zc1_{k}"]
        xnninv = off[f"xnn_s_inv_{k}"]
        negxi = off[f"neg_xnninv_{k}"]

        J, I = np.meshgrid(np.arange(nb), np.arange(bs), indexing="ij")
        J, I = J.ravel(), I.ravel()
        SA, SB = np.asarray(sa(J, I)), np.asarray(sb(J, I))

        # -- REDC 1 (moiety S0, a = xnn) --
        # t0 = e0·a0inv → Sa (fftree.rs:238): pure scale = 1-mul step
        # reading the always-zero pad row as x1
        ar, g1, br, g2 = bld.new_aff1_step()
        g1[SA] = bld.zero_pos
        br[SA] = a0inv + 2 * I
        g2[SA] = lane0(J, 2 * I)
        # g1v = extend(t0, S1) on Sa
        _emit_extend(bld, off, k, S1, sa)
        # h1 = z0inv·e1 + negaz·g1v → Sb  (fftree.rs:253-255)
        ar, g1, br, g2 = bld.new_step()
        ar[SB] = z0inv + I
        g1[SB] = lane0(J, 2 * I + 1)
        br[SB] = negaz + I
        g2[SB] = SA
        # h0 = extend(h1, S0): read Sb, work in Sa (h1 must survive)
        _emit_extend(bld, off, k, S0, sa, src_region=sb)
        h0_region, h1_region = (sa, sb) if bs > 1 else (sb, sb)
        H0 = np.asarray(h0_region(J, I))
        H1 = np.asarray(h1_region(J, I))

        # -- fuse ·c and REDC 2 (fftree.rs:277-281) --
        # t0' = (h0·c_even)·a0inv = c0a0·h0 → Sa (1-mul scale)
        ar, g1, br, g2 = bld.new_aff1_step()
        g1[SA] = bld.zero_pos
        br[SA] = c0a0 + I
        g2[SA] = H0
        _emit_extend(bld, off, k, S1, sa)
        # h1' = zc1·h1 + negaz·g1v' → Sb
        ar, g1, br, g2 = bld.new_step()
        ar[SB] = zc1 + I
        g1[SB] = H1
        br[SB] = negaz + I
        g2[SB] = SA
        _emit_extend(bld, off, k, S0, sa, src_region=sb)
        U0 = np.asarray((sa if bs > 1 else sb)(J, I))

        # -- split: a-half = u0, b-half = (e0 − u0)·xnninv_even --
        # (fftree.rs:206-221; u0 = MOD's even entries = h0')
        ar, g1, br, g2 = bld.new_step()
        PA = J * k + I
        PB = J * k + bs + I
        g1[PA] = U0
        ar[PB] = xnninv + 2 * I
        g1[PB] = lane0(J, 2 * I)
        br[PB] = negxi + 2 * I
        g2[PB] = U0
        k //= 2
    return bld.arrays()


def mod_schedule(tree, k: int, redc_only: bool = False, moiety: int = S0):
    """Standalone MOD (or single REDC) by a = X^(k/2) with the canonical
    c = z0z0 table (the fftree.rs:286-289 public entry specialized to the
    precomputed-modulus case). Output replaces the value lane with the
    interleaved (h0', h1') table.
    """
    off = tree.pool_offsets
    n = k
    W = 2 * n + 1
    bld = _Builder(W)
    bs = k // 2
    bld.nblocks = 1
    sa = lambda j, i: n + i  # noqa: E731
    sb = lambda j, i: n + bs + i  # noqa: E731
    lane0 = lambda j, i: i  # noqa: E731
    a0inv = off[f"xnn_s_inv_{k}"]
    z0inv = off[f"z0_inv_s1_{k}"] if moiety == S0 else off[f"z1_inv_s0_{k}"]
    negaz = off[f"neg_a1_z0inv_{k}"]
    c0a0 = off[f"c0_a0inv_{k}"]
    zc1 = off[f"zc1_{k}"]

    I = np.arange(bs)
    Z = np.zeros(bs, dtype=np.int64)
    SA, SB = np.asarray(sa(Z, I)), np.asarray(sb(Z, I))
    ar, g1, br, g2 = bld.new_aff1_step()
    g1[SA] = bld.zero_pos
    br[SA] = a0inv + 2 * I
    g2[SA] = lane0(Z, 2 * I)
    _emit_extend(bld, off, k, S1 if moiety == S0 else S0, sa)
    ar, g1, br, g2 = bld.new_step()
    ar[SB] = z0inv + I
    g1[SB] = lane0(Z, 2 * I + 1)
    br[SB] = negaz + I
    g2[SB] = SA
    _emit_extend(bld, off, k, moiety, sa, src_region=sb)
    h0_region, h1_region = (sa, sb) if bs > 1 else (sb, sb)
    if not redc_only:
        ar, g1, br, g2 = bld.new_aff1_step()
        g1[SA] = bld.zero_pos
        br[SA] = c0a0 + I
        g2[SA] = np.asarray(h0_region(Z, I))
        _emit_extend(bld, off, k, S1, sa)
        ar, g1, br, g2 = bld.new_step()
        ar[SB] = zc1 + I
        g1[SB] = np.asarray(h1_region(Z, I))
        br[SB] = negaz + I
        g2[SB] = SA
        _emit_extend(bld, off, k, S0, sa, src_region=sb)
        h0_region = sa if bs > 1 else sb
        h1_region = sb
    # interleave result back onto the value lane (mul-free copy step)
    ar, g1, br, g2 = bld.new_aff1_step()
    g1[2 * I] = np.asarray(h0_region(Z, I))
    g1[2 * I + 1] = np.asarray(h1_region(Z, I))
    return bld.arrays()


def degree_schedule(tree, n: int):
    """DEGREE as a schedule (fftree.rs:169-198).

    Per level k: extend the even evals onto S₁, compare against the odd
    evals (one OP_CMPSEL bool per batch lane), and select either the
    low path (keep e₀) or the high path t₀ = extend((e₁−g₁)·z₀⁻¹, S₀),
    accumulating k/2 on the high path. The accumulator rides the state
    as a field element; the wrapper decodes it to int32.

    State: V [0,n) evals · acc at n · acc+k/2 at n+1 · one at n+2 ·
    SA [n+3, n+3+n/2) extend scratch · SB t₁/t₀ scratch. Every step is
    laid out to keep its active span ≤ n/2+1: the accumulator update is
    its own one-row step; the branch select is TWO cmpsel steps (V rows,
    then acc) whose compare index pairs ride as free-riders on
    passthrough rows inside each window — so the whole schedule windows
    to ~n/2 instead of ~2n (4× less per-step work after compaction).
    """
    off = tree.pool_offsets
    acc, acc_s = n, n + 1
    one_pos = n + 2
    sa = n + 3
    sb = sa + n // 2
    bld = _Builder(sb + n // 2, one_pos=one_pos)
    k = n
    while k >= 2:
        bs = k // 2
        I = np.arange(bs)
        SA, SB = sa + I, sb + I
        # acc_s = acc + k/2 (one-row 1-mul step)
        ar, g1, br, g2 = bld.new_aff1_step()
        g1[acc_s] = acc
        br[acc_s] = off[f"half_const_{k}"]
        g2[acc_s] = one_pos
        if bs == 1:
            ar, g1, br, g2 = bld.new_aff1_step()  # identity extend = copy
            g1[SA] = 2 * I
        else:
            bld.nblocks = 1
            _emit_extend(bld, off, k, S1,
                         lambda j, i: sa + i, src_region=lambda j, i: 2 * i)
        # t1 = z0inv·e1 − z0inv·g1 → SB
        ar, g1, br, g2 = bld.new_step()
        ar[SB] = off[f"z0_inv_s1_{k}"] + I
        g1[SB] = 2 * I + 1
        br[SB] = off[f"neg_z0_inv_s1_{k}"] + I
        g2[SB] = SA
        if bs > 1:
            bld.nblocks = 1
            _emit_extend(bld, off, k, S0,
                         lambda j, i: sb + i, src_region=lambda j, i: sb + i)
        # low path iff extend(e₀) == e₁. cmpsel 1: acc row FIRST (the
        # V-select below overwrites the odd evals the compare reads) —
        # the compare pairs ride as free-riders on passthrough rows just
        # below acc, so the window stays [acc−bs, acc]
        ar, g1, br, g2 = bld.new_cmpsel_step()
        rows = acc - bs + I
        ar[rows] = SA
        br[rows] = 2 * I + 1
        g1[acc] = acc
        g2[acc] = acc_s
        # cmpsel 2: V rows — compare pairs sit on the SAME rows being
        # written (ar/br are compare indices, g1/g2 the select)
        ar, g1, br, g2 = bld.new_cmpsel_step()
        ar[I] = SA
        br[I] = 2 * I + 1
        g1[I] = 2 * I
        g2[I] = SB
        k //= 2
    # expose acc at row 0 for from_state (mul-free copy step)
    ar, g1, br, g2 = bld.new_aff1_step()
    g1[0] = acc
    return bld.arrays()


def vanish_schedule(tree, v: int):
    """VANISH of v arbitrary points over the size-2v (sub)tree as a
    schedule (fftree.rs:291-316): base values [α−l₀, α−l₁] via the
    negated 2-leaf domain, then per level one OP_MUL pairwise merge and
    a batched MEXTEND.

    Values live MOIETY-PLANAR: two v-row planes (S0 values, S1 values)
    that ping-pong with the two v-row scratch planes each level — a
    merged group's S0 plane IS the product plane and its S1 plane IS
    the mextend output, so there are no interleave steps and every
    step's active span is exactly v (the naive interleaved layout
    spanned 2v and doubled the post-compaction window). The final
    domain-ordered interleave is a post-scan output permutation
    (run_schedule's out_perm).

    Returns (schedule, out_perm).
    """
    off = tree.pool_offsets
    one_pos = 4 * v
    bld = _Builder(4 * v + 1, one_pos=one_pos)
    I = np.arange(v)
    # base planes (input points arrive at rows [0, v)): S1 plane first —
    # the S0 plane overwrites the inputs in place
    ar, g1, br, g2 = bld.new_aff1_step()
    g1[v + I] = I
    br[v + I] = off["neg_leaf2"] + 1
    g2[v + I] = one_pos
    ar, g1, br, g2 = bld.new_aff1_step(self_read=True)
    br[I] = off["neg_leaf2"] + 0
    g2[I] = one_pos
    base = 0  # current planes at [base, base+2v); scratch at the other
    cur = 2
    while cur < 2 * v:
        ng = 2 * v // cur // 2  # merged groups this level
        scratch = 2 * v - base
        mc = cur // 2  # per-moiety size of a child group
        J, T = np.meshgrid(np.arange(ng), np.arange(cur), indexing="ij")
        J, T = J.ravel(), T.ravel()
        # child value at domain position t: even → S0 plane, odd → S1
        def child(c, t):
            return base + np.where(t % 2 == 0, 0, v) + c * mc + t // 2
        SA = scratch + J * cur + T
        SB = scratch + v + J * cur + T
        # q_s0[g, t] = left(t) · right(t) (state×state)
        ar, g1, br, g2 = bld.new_mul_step()
        g1[SA] = child(2 * J, T)
        g2[SA] = child(2 * J + 1, T)
        # mextend q onto S1 of the size-2·cur tree → the new S1 plane
        bld.nblocks = ng
        _emit_extend(bld, off, 2 * cur, S1,
                     lambda j, i: scratch + v + j * cur + i,
                     src_region=lambda j, i: scratch + j * cur + i)
        ar, g1, br, g2 = bld.new_aff1_step(self_read=True)
        br[SB] = off[f"z0_s1_{2 * cur}"] + T
        g2[SB] = one_pos
        base = scratch
        cur *= 2
    perm = np.empty(2 * v, dtype=np.int32)
    perm[0::2] = base + np.arange(v)
    perm[1::2] = base + v + np.arange(v)
    return bld.arrays()._replace(out_perm=perm)


def general_mod_schedule(tree, m: int, moiety: int = S0,
                         redc_only: bool = False):
    """REDC (and MOD) with a RUNTIME modulus table, fully scheduled
    (fftree.rs:232-289): the caller packs [evals ‖ a] (REDC) or
    [evals ‖ a ‖ c] (MOD) along the position axis. a₀⁻¹ is computed by
    a scheduled Fermat chain (square-and-multiply over p−2, OP_MUL
    steps) — the reference burns a batch_inversion per call here
    (fftree.rs:236); we burn ~2·log p scan steps and stay inside the
    single compiled interpreter.

    State: V [0,m) evals/result · A [m,2m) · C [2m,3m) (MOD only) ·
    AI a₀⁻¹ · SA · SB (each m/2) · one.
    """
    off = tree.pool_offsets
    spec = tree.spec
    bs = m // 2
    base = 2 * m if redc_only else 3 * m
    ai, sa, sb = base, base + bs, base + 2 * bs
    one_pos = base + 3 * bs
    bld = _Builder(one_pos + 1, one_pos=one_pos)
    I = np.arange(bs)
    AI, SA, SB = ai + I, sa + I, sb + I
    A0, A1 = m + 2 * I, m + 2 * I + 1
    E0, E1 = 2 * I, 2 * I + 1

    # --- scheduled Fermat: AI = a₀^(p−2) ---
    ar, g1, br, g2 = bld.new_aff1_step()
    g1[AI] = A0  # acc = base (top exponent bit); mul-free copy
    ebits = bin(spec.p - 2)[2:]
    for bit in ebits[1:]:
        ar, g1, br, g2 = bld.new_mul_step()
        g1[AI] = AI
        g2[AI] = AI  # square
        if bit == "1":
            ar, g1, br, g2 = bld.new_mul_step()
            g1[AI] = AI
            g2[AI] = A0  # multiply by base

    other = S1 if moiety == S0 else S0
    zinv = (off[f"z0_inv_s1_{m}"] if moiety == S0
            else off[f"z1_inv_s0_{m}"])
    neg_zinv = (off[f"neg_z0_inv_s1_{m}"] if moiety == S0
                else off[f"neg_z1_inv_s0_{m}"])

    def redc_pass(e0_src, e1_src):
        """SA ← h0, SB ← h1 for input evals at (e0_src, e1_src)."""
        # t0 = e0·a0inv → SA
        ar, g1, br, g2 = bld.new_mul_step()
        g1[SA] = e0_src
        g2[SA] = AI
        # g1v = extend(t0, other) in place
        if bs > 1:
            bld.nblocks = 1
            _emit_extend(bld, off, m, other, lambda j, i: sa + i)
        # g1v·a1 in place
        ar, g1, br, g2 = bld.new_mul_step()
        g1[SA] = SA
        g2[SA] = A1
        # h1 = zinv·e1 + neg_zinv·(g1v·a1) → SB
        ar, g1, br, g2 = bld.new_step()
        ar[SB] = zinv + I
        g1[SB] = e1_src
        br[SB] = neg_zinv + I
        g2[SB] = SA
        # h0 = extend(h1, moiety) → SA
        if bs > 1:
            bld.nblocks = 1
            _emit_extend(bld, off, m, moiety, lambda j, i: sa + i,
                         src_region=lambda j, i: sb + i)
        else:
            ar, g1, br, g2 = bld.new_step()
            g1[SA] = SB

    redc_pass(E0, E1)
    if not redc_only:
        # scale by c (hc0 = h0·c_even, hc1 = h1·c_odd), second REDC
        ar, g1, br, g2 = bld.new_mul_step()
        g1[SA] = SA
        g2[SA] = 2 * m + 2 * I
        g1[SB] = SB
        g2[SB] = 2 * m + 2 * I + 1
        redc_pass(SA, SB)
    # interleave (h0, h1) onto V (mul-free copy step)
    ar, g1, br, g2 = bld.new_aff1_step()
    g1[2 * I] = SA
    g1[2 * I + 1] = SB
    return bld.arrays()


# --------------------------------------------------------------- runtime
#
# State layout (W, L, B): limbs on the sublane axis, BATCH on the lane
# axis. With the natural (..., L) layout the 16-wide trailing dim is
# padded to the 128-lane tile — an 8× memory bloat on every op (measured:
# 31 ms/step at (8193, 64, 16); the roofline is ~1 ms). Batch-last keeps
# lanes full when B is a multiple of 128 and limbs land on whole sublane
# tiles. The step math below is the device.py pipeline re-indexed to
# limb-axis = -2, with the conv done by shift-accumulate (no (L, L)
# outer-product materialization) and both products of the affine step
# summed before a single fold/normalize chain.

_MASKc = jnp.uint32(0xFFFF)


def _normalize_cols(c):
    """Carry-normalize along axis -2 (cols < 2^32 → canonical, width+1)."""
    g = c >> 16
    lo = c & _MASKc
    zc = jnp.zeros_like(g[..., :1, :])
    t1 = jnp.concatenate([lo, zc], -2) + jnp.concatenate([zc, g], -2)
    g2 = (t1 >> 16).astype(bool)
    p2 = (t1 & _MASKc) == _MASKc

    def combine(lhs, rhs):
        gl, pl = lhs
        gr, pr = rhs
        return gr | (pr & gl), pr & pl

    G, _ = jax.lax.associative_scan(combine, (g2, p2), axis=-2)
    carry = jnp.concatenate(
        [jnp.zeros_like(G[..., :1, :]), G[..., :-1, :]], -2
    ).astype(jnp.uint32)
    return (t1 + carry) & _MASKc


def _fold_cols(spec: FieldSpec, c):
    """Fold columns ≥ L (axis -2) via the pseudo-Mersenne terms."""
    L = spec.num_limbs
    w = c.shape[-2]
    lo = c[..., :L, :]
    hi = c[..., L:, :]
    hw = w - L
    out_w = max(L, max(off for off, _ in spec.fold_terms) + hw)

    def place(x, off):
        pre = jnp.zeros((*x.shape[:-2], off, x.shape[-1]), jnp.uint32)
        post = jnp.zeros(
            (*x.shape[:-2], out_w - off - x.shape[-2], x.shape[-1]),
            jnp.uint32,
        )
        return jnp.concatenate([pre, x, post], -2)

    out = place(lo, 0)
    for off, digit in spec.fold_terms:
        out = out + place(hi * jnp.uint32(digit), off)
    return out


def _conv_cols(spec: FieldSpec, a, x):
    """Shift-accumulate product columns: a (W, L, 1) × x (W, L, B) →
    (W, 2L, B), every column < 2L·2^16."""
    L = spec.num_limbs
    c = jnp.zeros((*x.shape[:-2], 2 * L, x.shape[-1]), jnp.uint32)
    for i in range(L):
        prod = a[..., i : i + 1, :] * x
        c = c.at[..., i : i + L, :].add(prod & _MASKc)
        c = c.at[..., i + 1 : i + L + 1, :].add(prod >> 16)
    return c


def _mont_reduce_cols(spec: FieldSpec, c):
    """Word-serial Montgomery reduction (CIOS) in the (W, cols, B)
    layout: product columns (< 2^22, width ≥ L+1) → canonical value·R⁻¹.

    For fold-unfriendly primes the schedule keeps every resident value in
    Montgomery form (value·R), so each affine/mul step needs exactly ONE
    of these reductions — the reference's arkworks backend works the same
    way (Fp256<MontBackend>, lib.rs:37). L unrolled iterations of
    whole-tensor ops; the redundant-column invariant (< 2^22 plus one
    sub-2^17 addend per iteration) keeps everything exact in uint32."""
    L = spec.num_limbs
    n_prime = jnp.uint32(spec.n_prime)
    p_limbs = spec.to_limbs(spec.p)
    w = c.shape[-2]
    if w < 2 * L + 1:
        c = jnp.concatenate(
            [c, jnp.zeros((*c.shape[:-2], 2 * L + 1 - w, c.shape[-1]),
                          jnp.uint32)], -2)
    cols = [c[..., i, :] for i in range(c.shape[-2])]
    for _ in range(L):
        m = (cols[0] * n_prime) & _MASKc
        for i in range(L):
            prod = m * jnp.uint32(p_limbs[i])
            cols[i] = cols[i] + (prod & _MASKc)
            cols[i + 1] = cols[i + 1] + (prod >> 16)
        carry = cols[0] >> 16  # low 16 bits are exactly zero now
        cols = cols[1:]
        cols[0] = cols[0] + carry
    # CIOS bound: result < orig/2^(16L) + p < 2^(16L+7), so L+1 columns
    # suffice (the normalize spill column is provably zero)
    x = _normalize_cols(jnp.stack(cols[: L + 1], axis=-2))[..., : L + 1, :]
    # canonicalize (CMPSEL equality needs canonical values): binary
    # conditional-subtract chain over p·2^j, j from the bound down to 0
    W1 = L + 1
    slack = 16 * L - spec.p.bit_length()
    for j in range(slack + 7, -1, -1):
        comp = jnp.asarray(
            [((1 << (16 * W1)) - (spec.p << j)) >> (16 * i) & 0xFFFF
             for i in range(W1)],
            dtype=jnp.uint32,
        )[:, None]
        y = _normalize_cols(x + comp)
        need = y[..., W1, :] > 0
        x = jnp.where(need[..., None, :], y[..., :W1, :], x)
    return x[..., :L, :]


def _to_mont_cols(spec: FieldSpec, x):
    """Canonical (.., L, B) → Montgomery form (value·R) via one
    conv-with-R² + reduction."""
    r2 = jnp.asarray(spec.to_limbs(spec.r2_mod_p), jnp.uint32)
    return _mont_reduce_cols(spec, _conv_cols(spec, r2[None, :, None], x))


def _from_mont_cols(spec: FieldSpec, x):
    """Montgomery form → canonical: reduce once more (·R⁻¹)."""
    return _mont_reduce_cols(spec, x)


def _muladd2_cols(spec: FieldSpec, A, x1, B, x2):
    """Fused A·x1 + B·x2 in the (W, L, B) layout. For fold-unfriendly
    primes all operands are in Montgomery form and the sum of products
    takes a single CIOS reduction (A·R · x·R · R⁻¹ = (Ax)·R)."""
    if spec.num_limbs == 1 and spec.p == fd.M31_P:
        # m31: plain elementwise fast path
        return fd._m31_add(fd._m31_mul(A, x1), fd._m31_mul(B, x2))
    c = _conv_cols(spec, A, x1) + _conv_cols(spec, B, x2)
    if spec.fold_terms is None:
        return _mont_reduce_cols(spec, c)
    return _reduce_cols(spec, c)


def _reduce_cols(spec: FieldSpec, c):
    """Product columns (W, 2L, B) → canonical field value (W, L, B):
    fold, normalize, then the conditional-subtract chain."""
    L = spec.num_limbs
    c = _normalize_cols(_fold_cols(spec, c))
    c = _normalize_cols(_fold_cols(spec, c))
    slack = 16 * L - spec.p.bit_length()
    js = [0] if slack == 0 else list(range(slack + 1, -1, -1))
    x = c[..., : L + 1, :]
    W1 = L + 1
    for j in js:
        comp = jnp.asarray(
            [((1 << (16 * W1)) - (spec.p << j)) >> (16 * i) & 0xFFFF
             for i in range(W1)],
            dtype=jnp.uint32,
        )[:, None]
        y = _normalize_cols(x + comp)
        need = y[..., W1, :] > 0
        x = jnp.where(need[..., None, :], y[..., :W1, :], x)
    return x[..., :L, :]


def _add_canon(spec: FieldSpec, a, b):
    """Canonical (W, L, B) + (W, L, B) mod p: one conditional subtract."""
    if spec.num_limbs == 1 and spec.p == fd.M31_P:
        return fd._m31_add(a, b)
    L = spec.num_limbs
    W1 = L + 1
    x = _normalize_cols(a + b)[..., :W1, :]
    comp = jnp.asarray(
        [((1 << (16 * W1)) - spec.p) >> (16 * i) & 0xFFFF
         for i in range(W1)], dtype=jnp.uint32)[:, None]
    y = _normalize_cols(x + comp)
    need = y[..., W1, :] > 0
    return jnp.where(need[..., None, :], y[..., :W1, :], x)[..., :L, :]


def _muladd1_cols(spec: FieldSpec, C, x1, x2):
    """Fused x1 + C·x2 in the (W, L, B) layout (OP_AFF1/OP_AFF1S)."""
    if spec.num_limbs == 1 and spec.p == fd.M31_P:
        return fd._m31_add(x1, fd._m31_mul(C, x2))
    c = _conv_cols(spec, C, x2)
    if spec.fold_terms is None:
        # Montgomery residents: reduce the product, then one canonical add
        return _add_canon(spec, _mont_reduce_cols(spec, c), x1)
    # inject x1 into the product columns pre-reduction (its contribution
    # is strictly smaller than a second product, so muladd2's bounds hold)
    L = spec.num_limbs
    pad = jnp.zeros((*x1.shape[:-2], c.shape[-2] - L, x1.shape[-1]),
                    jnp.uint32)
    return _reduce_cols(spec, c + jnp.concatenate([x1, pad], axis=-2))


def _mulss(spec: FieldSpec, x1, x2):
    """State×state field product in the (W, L, B) layout (OP_MUL)."""
    if spec.num_limbs == 1 and spec.p == fd.M31_P:
        return fd._m31_mul(x1, x2)
    c = _conv_cols(spec, x1, x2)  # broadcasting handles a = (W, L, B)
    if spec.fold_terms is None:  # Montgomery residents: one reduction
        return _mont_reduce_cols(spec, c)
    return _reduce_cols(spec, c)


def run_schedule(spec: FieldSpec, pool, sched_xs, batch, one_pos: int,
                 m_out: int, w: int, use_pallas: bool = False,
                 batch_chunk: int | None = None, out_perm=None):
    """Execute a schedule: state packing, the step scans, unpacking.

    ``batch``: (B, m, L) input; ``sched_xs`` = (op, start, a_idx, g1,
    b_idx, g2), op/start (steps,) int32 and the rest (steps, A) int32
    window-compacted indices (see _Builder.arrays); ``pool``: (P, L);
    ``w``: the full state width. Each step gathers its window's inputs
    from anywhere in the state, computes only the A-row window, and
    writes it back with one dynamic_update_slice — the rest of the state
    rides the scan carry untouched. With ``use_pallas`` the fused VMEM
    kernel (ops/pallas_step.py) replaces the XLA muladd2 pipeline for
    affine steps — gathers stay in XLA either way (they measured cheap).

    ``batch_chunk``: process the batch in lane-tile-sized chunks
    (lax.map over the chunk axis inside each compiled segment). HBM peak
    scales with the per-chunk state (state + two gathers + the step
    output are each (A, L, B) — batch 256 at n=2^16 secp256k1 is ~10 GB
    live and faults a 16 GB chip; chunks of 128 halve it while the
    transform still serves the full batch per call).

    Long schedules execute as a CHAIN of separately-jitted ≤512-step
    segments with the state staying on device between them: a single
    compiled program containing the EXIT schedule's ~1200 steps crashed
    the TPU runtime at n=2^17 (even split into several lax.scans inside
    one jit), while the same steps as separate executables run fine and
    bit-match the native engine. Segments of equal step count share one
    compiled trace, so this also compiles faster than one giant scan.
    """
    x = _pack_state(spec, batch, w, one_pos)
    scalars, banks = sched_xs[:6], sched_xs[6:]
    nsteps = int(scalars[0].shape[0])
    # empirically-calibrated TPU-runtime envelope: one compiled program
    # whose scan covers more than ~2^26 step-rows (steps × window A)
    # crashes the worker (512 steps at A=2^17 ran fine; 512 at A=2^18
    # did not, while 324 at A=2^18 did), so the cap adapts to A
    A = int(sched_xs[9].shape[1])
    # no fixed floor: a 64-step floor would let steps×A exceed the
    # envelope once A ≥ 2^21 (the same product that crashed the runtime
    # at 512 steps × A=2^18), reinstating the crash at n ≥ 2^20
    seg = max(1, min(512, (1 << 26) // max(A, 1)))
    # fold-unfriendly primes keep the pool Montgomery-resident: convert
    # ONCE per call, outside the segment bodies (jit caches compiled
    # programs, not values — converting inside _run_segment re-executed
    # the O(pool) CIOS on every call of every segment)
    if spec.num_limbs > 1 and spec.fold_terms is None:
        pool = _pool_to_mont(spec, pool)
    for lo in range(0, nsteps, seg):
        hi = min(lo + seg, nsteps)
        x = _run_segment(spec, pool,
                         tuple(s[lo:hi] for s in scalars) + tuple(banks),
                         x, use_pallas, batch_chunk)
    return _unpack_state(
        spec, x, m_out,
        None if out_perm is None else jnp.asarray(out_perm))


@partial(jax.jit, static_argnums=(0, 2, 3))
def _pack_state(spec: FieldSpec, batch, w: int, one_pos: int):
    x = to_state(batch, w, one_pos)
    # fold-unfriendly primes (e.g. the 2-adic STARK prime of the
    # comparison bench): keep the pool and the whole resident state in
    # MONTGOMERY form (value·R) so every step needs exactly one CIOS
    # reduction — the same representation the reference's arkworks
    # backend uses (Fp256<MontBackend>, lib.rs:37). Conversion costs one
    # mul per element at entry/exit vs O(log² n) muls inside.
    if spec.num_limbs > 1 and spec.fold_terms is None:
        x = _to_mont_cols(spec, x)
    return x


@partial(jax.jit, static_argnums=(0, 2))
def _unpack_state(spec: FieldSpec, state, m_out: int, out_perm=None):
    if out_perm is None:
        out = state[:m_out]
    else:
        out = jnp.take(state, out_perm, axis=0)
    if spec.num_limbs > 1 and spec.fold_terms is None:
        out = _from_mont_cols(spec, out)
    return jnp.transpose(out, (2, 0, 1))


@partial(jax.jit, static_argnums=(0,))
def _pool_to_mont(spec: FieldSpec, pool):
    """(P, L) canonical pool → Montgomery form (run once per call chain)."""
    return _to_mont_cols(spec, pool[:, :, None])[..., 0]


@partial(jax.jit, static_argnums=(0, 4, 5))
def _run_segment(spec: FieldSpec, pool, sched_xs, x, use_pallas: bool,
                 batch_chunk: int | None):
    """One ≤512-step segment of a schedule as its own compiled program
    (see run_schedule). For fold-unfriendly primes the pool arrives
    already Montgomery-converted (run_schedule hoists the conversion)."""
    mont = spec.num_limbs > 1 and spec.fold_terms is None
    pallas_ok = (
        use_pallas
        and spec.num_limbs > 1
        and (mont or sum(d for _, d in spec.fold_terms) < (1 << 10))
    )

    scalars = sched_xs[:6]
    a_bank, g1_bank, b_bank, g2_bank = sched_xs[6:]
    A = g2_bank.shape[1]

    def body(state, inp):
        op_t, start, fa, fg1, fb, fg2 = inp
        a_i = jnp.take(a_bank, fa, axis=0)
        g1 = jnp.take(g1_bank, fg1, axis=0)
        b_i = jnp.take(b_bank, fb, axis=0)
        g2 = jnp.take(g2_bank, fg2, axis=0)
        x2 = jnp.take(state, g2, axis=0)

        def affine(_):
            x1 = jnp.take(state, g1, axis=0)
            if pallas_ok:
                from ecfft_tpu.ops.pallas_step import pallas_muladd2

                Ac = jnp.take(pool, a_i, axis=0)  # (A, L)
                Bc = jnp.take(pool, b_i, axis=0)
                return pallas_muladd2(spec, Ac, Bc, x1, x2)
            Ac = jnp.take(pool, a_i, axis=0)[:, :, None]  # (A, L, 1)
            Bc = jnp.take(pool, b_i, axis=0)[:, :, None]
            return _muladd2_cols(spec, Ac, x1, Bc, x2)

        def mul(_):
            x1 = jnp.take(state, g1, axis=0)
            return _mulss(spec, x1, x2)

        def cmpsel(_):
            x1 = jnp.take(state, g1, axis=0)
            c1 = jnp.take(state, a_i, axis=0)
            c2 = jnp.take(state, b_i, axis=0)
            comp = jnp.all(c1 == c2, axis=(0, 1))  # (B,)
            return jnp.where(comp[None, None, :], x1, x2)

        def aff1_with(x1):
            if pallas_ok:
                from ecfft_tpu.ops.pallas_step import pallas_muladd1

                Cc = jnp.take(pool, b_i, axis=0)
                return pallas_muladd1(spec, Cc, x1, x2)
            Cc = jnp.take(pool, b_i, axis=0)[:, :, None]
            return _muladd1_cols(spec, Cc, x1, x2)

        def aff1(_):
            return aff1_with(jnp.take(state, g1, axis=0))

        def aff1s(_):
            x1 = jax.lax.dynamic_slice(
                state, (start, 0, 0), (A,) + state.shape[1:])
            return aff1_with(x1)

        out = jax.lax.switch(op_t, [affine, mul, cmpsel, aff1, aff1s],
                             None)
        state = jax.lax.dynamic_update_slice(state, out, (start, 0, 0))
        return state, None

    def run_one(xc):
        out, _ = jax.lax.scan(body, xc, scalars)
        return out

    B = x.shape[-1]
    if batch_chunk is not None and batch_chunk < B and B % batch_chunk == 0:
        xc = x.reshape(*x.shape[:-1], B // batch_chunk, batch_chunk)
        xc = jnp.moveaxis(xc, -2, 0)  # (chunks, W, L, Bc)
        out = jax.lax.map(run_one, xc)
        out = jnp.moveaxis(out, 0, -2).reshape(*x.shape)
    else:
        out = run_one(x)
    return out


def to_state(batch_arr, W: int, one_pos: int):
    """(B, m, L) batch → (W, L, B) state with a constant 1 at one_pos
    (skipped when the schedule has no tail slots, e.g. the NTT).

    ``batch_arr`` may be a tuple of parts concatenated along the position
    axis (general-modulus REDC/MOD pack [evals ‖ a ‖ c]); unbatched
    (m, L) parts broadcast against the first part's batch dims.
    """
    if isinstance(batch_arr, (tuple, list)):
        lead = batch_arr[0].shape[:-2]
        batch_arr = jnp.concatenate(
            [batch_arr[0]]
            + [jnp.broadcast_to(p, lead + p.shape[-2:])
               for p in batch_arr[1:]],
            axis=-2,
        )
    B, m, L = batch_arr.shape
    x = jnp.transpose(batch_arr, (1, 2, 0))  # (m, L, B)
    if W == m:
        return x
    pad = jnp.zeros((W - m, L, B), jnp.uint32)
    pad = pad.at[one_pos - m, 0, :].set(1)
    return jnp.concatenate([x, pad], axis=0)


def from_state(state, m: int):
    """(W, L, B) state → (B, m, L) values from the value lane."""
    return jnp.transpose(state[:m], (2, 0, 1))
