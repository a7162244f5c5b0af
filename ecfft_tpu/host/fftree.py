"""Host-side golden FFTree: exact python-int implementation of all eight
ECFFT algorithms (ENTER, EXIT, DEGREE, EXTEND, MEXTEND, MOD, REDC, VANISH).

This is the correctness oracle for the TPU path and the small-n fallback.
It holds capability parity with /root/reference/src/fftree.rs but is an
independent implementation over python ints. The device implementation
(ecfft_tpu/ops + ecfft_tpu/fftree.py) re-architects the same math as
iterative batched layer scans; THIS class keeps the recursive shape because
on the host, clarity wins and n is small.

Structure notes (see SURVEY.md §2.3 invariants):
- moieties: S0 = even-indexed leaves, S1 = odd-indexed leaves;
  extend(evals, S1) means "input on S0 → values on S1"
- the subtree chain: subtree's layers are the even-indexed entries of every
  layer, dropping the last rational map (fftree.rs:465-482)
- bootstrap order in construction is load-bearing: matrices → z0_s1 (via
  subtree tables + extend) → z1_s0 (via vanish, which needs z0_s1) →
  z0z0/z1z1_rem tables (via subtree MOD + extend) (fftree.rs:318-463)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ecfft_tpu.ec.curve import RationalMap
from ecfft_tpu.fields.host import batch_inv_mod, inv_mod

S0 = 0  # moiety S0 (even leaf positions)
S1 = 1  # moiety S1 (odd leaf positions)


def _mat2_inv(m: list[list[int]], p: int) -> list[list[int]]:
    det = (m[0][0] * m[1][1] - m[0][1] * m[1][0]) % p
    di = inv_mod(det, p)
    return [
        [m[1][1] * di % p, -m[0][1] * di % p],
        [-m[1][0] * di % p, m[0][0] * di % p],
    ]


@dataclass
class HostFFTree:
    p: int
    # f_layers[0] = leaves (size n), f_layers[i] halves each level, up to [root]
    f_layers: list[list[int]]
    # matrix layers: decompose/recombine_layers[i] has n/2^(i+1) 2x2 matrices
    recombine_layers: list[list[list[list[int]]]]
    decompose_layers: list[list[list[list[int]]]]
    rational_maps: list[RationalMap]
    subtree: "HostFFTree | None"
    xnn_s: list[int] = field(default_factory=list)
    xnn_s_inv: list[int] = field(default_factory=list)
    z0_s1: list[int] = field(default_factory=list)
    z1_s0: list[int] = field(default_factory=list)
    z0_inv_s1: list[int] = field(default_factory=list)
    z1_inv_s0: list[int] = field(default_factory=list)
    z0z0_rem_xnn_s: list[int] = field(default_factory=list)
    z1z1_rem_xnn_s: list[int] = field(default_factory=list)

    # ---------------------------------------------------------------- build

    @classmethod
    def build(cls, leaves: list[int], rational_maps: list[RationalMap],
              p: int) -> "HostFFTree":
        """FFTree::new (fftree.rs:42-70): fill internal domain layers by
        applying rational map i to layer i, then run the bootstrap."""
        n = len(leaves)
        assert n & (n - 1) == 0
        log_n = n.bit_length() - 1
        assert log_n == len(rational_maps)
        f_layers = [list(leaves)]
        for i, rmap in enumerate(rational_maps):
            prev = f_layers[-1]
            half = len(prev) // 2
            layer = []
            for j in range(half):
                v = rmap(prev[j])
                assert v is not None
                # 2-to-1 map property (fftree.rs:65)
                assert v == rmap(prev[j + half])
                layer.append(v)
            f_layers.append(layer)
        return cls.from_layers(f_layers, rational_maps, p)

    @classmethod
    def from_layers(cls, f_layers: list[list[int]],
                    rational_maps: list[RationalMap], p: int) -> "HostFFTree":
        """from_tree (fftree.rs:318-463)."""
        n = len(f_layers[0])
        subtree = cls._derive_subtree(f_layers, rational_maps, p)
        s = f_layers[0]
        nn = n // 2
        nnnn = n // 4

        xnnnn_s = [pow(x, nnnn, p) for x in s]
        xnnnn_s_inv = batch_inv_mod(xnnnn_s, p)
        xnn_s = [pow(x, nn, p) for x in s]
        xnn_s_inv = batch_inv_mod(xnn_s, p)

        s0 = s[0::2]
        s1 = s[1::2]

        # decomposition matrices, Lemma 3.2 of ECFFT-I (fftree.rs:338-363)
        recombine_layers: list = []
        decompose_layers: list = []
        num_mat_layers = max(n.bit_length() - 1, 0)
        for li in range(num_mat_layers):
            size = n >> (li + 1)
            ident = [[1, 0], [0, 1]]
            recombine_layers.append([[r[:] for r in ident] for _ in range(size)])
            decompose_layers.append([[r[:] for r in ident] for _ in range(size)])
        for li, (layer, rmap) in enumerate(zip(f_layers, rational_maps)):
            d = len(layer) // 2
            if d == 1:
                continue  # identity matrices at the 2-wide layer
            v = list(rmap.denominator)
            from ecfft_tpu.utils.poly import evaluate

            e = d // 2 - 1
            for i in range(d):
                sa = layer[i]
                sb = layer[i + d]
                v0 = pow(evaluate(v, sa, p), e, p)
                v1 = pow(evaluate(v, sb, p), e, p)
                rmat = [[v0, sa * v0 % p], [v1, sb * v1 % p]]
                recombine_layers[li][i] = rmat
                decompose_layers[li][i] = _mat2_inv(rmat, p)

        tree = cls(
            p=p,
            f_layers=f_layers,
            recombine_layers=recombine_layers,
            decompose_layers=decompose_layers,
            rational_maps=list(rational_maps),
            subtree=subtree,
            xnn_s=xnn_s,
            xnn_s_inv=xnn_s_inv,
        )

        # bootstrap z tables (fftree.rs:381-460)
        if n > 2:
            st = tree.subtree
            st_z0_s0 = [y for z in st.z0_s1 for y in (0, z)]
            st_z1_s0 = [y for z in st.z1_s0 for y in (z, 0)]
            st_z0_s1 = tree.extend(st_z0_s0, S1)
            st_z1_s1 = tree.extend(st_z1_s0, S1)
            tree.z0_s1 = [a * b % p for a, b in zip(st_z0_s1, st_z1_s1)]
            z1_s = tree.vanish(s1)
            tree.z1_s0 = z1_s[0::2]
        elif n == 2:
            tree.z0_s1 = [(s1[0] - s0[0]) % p]
            tree.z1_s0 = [(s0[0] - s1[0]) % p]

        tree.z0_inv_s1 = batch_inv_mod(tree.z0_s1, p)
        tree.z1_inv_s0 = batch_inv_mod(tree.z1_s0, p)

        if n > 2:
            st = tree.subtree
            # z0z0_rem_xnn_s in O(n log n) (fftree.rs:419-446)
            z0_rem_xnnnn_sq_s0 = [
                a * b % p for a, b in zip(st.z0z0_rem_xnn_s, st.z1z1_rem_xnn_s)
            ]
            z0z0_rem_xnnnn_s0 = st.modular_reduce(
                z0_rem_xnnnn_sq_s0, st.xnn_s, st.z0z0_rem_xnn_s
            )
            z0z0_rem_xnnnn_s1 = tree.extend(z0z0_rem_xnnnn_s0, S1)
            z0z0_rem_xnnnn_s = [
                y for ab in zip(z0z0_rem_xnnnn_s0, z0z0_rem_xnnnn_s1) for y in ab
            ]
            z0_s = [y for z in tree.z0_s1 for y in (0, z)]
            z0_rem_xnn_sq_s = [
                (z0 - xnn) ** 2 % p for z0, xnn in zip(z0_s, tree.xnn_s)
            ]
            z0_rem_xnn_sq_div_xnnnn_s = [
                (sq - rem) * xi % p
                for sq, rem, xi in zip(
                    z0_rem_xnn_sq_s, z0z0_rem_xnnnn_s, xnnnn_s_inv
                )
            ]
            z0z0_div_xnnnn_rem_xnnnn_s = tree.modular_reduce(
                z0_rem_xnn_sq_div_xnnnn_s, xnnnn_s, z0z0_rem_xnnnn_s
            )
            tree.z0z0_rem_xnn_s = [
                (lo + x * hi) % p
                for lo, hi, x in zip(
                    z0z0_rem_xnnnn_s, z0z0_div_xnnnn_rem_xnnnn_s, xnnnn_s
                )
            ]
            # z1z1_rem_xnn_s (fftree.rs:448-452)
            z1_s = [y for z in tree.z1_s0 for y in (z, 0)]
            z1z1 = [(z1 - xnn) ** 2 % p for z1, xnn in zip(z1_s, tree.xnn_s)]
            tree.z1z1_rem_xnn_s = tree.modular_reduce(
                z1z1, tree.xnn_s, tree.z0z0_rem_xnn_s
            )
        elif n == 2:
            tree.z0z0_rem_xnn_s = [s0[0] * s0[0] % p] * 2
            tree.z1z1_rem_xnn_s = [s1[0] * s1[0] % p] * 2

        return tree

    @classmethod
    def _derive_subtree(cls, f_layers, rational_maps, p) -> "HostFFTree | None":
        """Even-indexed entries of every layer; drop the last rational map
        (fftree.rs:465-482)."""
        n = len(f_layers[0]) // 2
        if n == 0:
            return None
        sub_layers = [layer[0::2] for layer in f_layers[:-1]]
        return cls.from_layers(sub_layers, rational_maps[:-1], p)

    # ------------------------------------------------------------ accessors

    @property
    def n(self) -> int:
        return len(self.f_layers[0])

    def eval_domain(self) -> list[int]:
        return self.f_layers[0]

    def subtree_with_size(self, n: int) -> "HostFFTree":
        """Walk the chain so one big tree serves all sizes ≤ its own
        (fftree.rs:489-496)."""
        assert n & (n - 1) == 0
        if n < self.n:
            return self.subtree.subtree_with_size(n)
        if n == self.n:
            return self
        raise ValueError("FFTree is too small")

    # ----------------------------------------------------------- algorithms

    def _extend_impl(self, evals: list[int], moiety: int) -> list[int]:
        """EXTEND core (fftree.rs:72-120): decompose through the layer's
        2x2 matrices, recurse at half size, recombine."""
        p = self.p
        n = len(evals)
        if n == 1:
            return list(evals)
        log_n = n.bit_length() - 1
        # reference: layer = num_layers(f) - 2 - log2(n); with our layer
        # list indexed from leaves this is simply log2(self.n) - 1 - log2(n)
        layer = (self.n.bit_length() - 1) - 1 - log_n

        half = n // 2
        dec = self.decompose_layers[layer]
        skip = 1 if moiety == S0 else 0
        evals0 = [0] * half
        evals1 = [0] * half
        for i in range(half):
            m = dec[skip + 2 * i]
            a, b = evals[i], evals[i + half]
            evals0[i] = (m[0][0] * a + m[0][1] * b) % p
            evals1[i] = (m[1][0] * a + m[1][1] * b) % p

        e0p = self._extend_impl(evals0, moiety)
        e1p = self._extend_impl(evals1, moiety)

        rec = self.recombine_layers[layer]
        skip = 0 if moiety == S0 else 1
        res = [0] * n
        for i in range(half):
            m = rec[skip + 2 * i]
            a, b = e0p[i], e1p[i]
            res[i] = (m[0][0] * a + m[0][1] * b) % p
            res[i + half] = (m[1][0] * a + m[1][1] * b) % p
        return res

    def extend(self, evals: list[int], moiety: int) -> list[int]:
        """extend(evals, S1): input on S0 → output on S1 (fftree.rs:123-126)."""
        return self.subtree_with_size(len(evals) * 2)._extend_impl(evals, moiety)

    def _mextend_impl(self, evals: list[int], moiety: int) -> list[int]:
        e = self._extend_impl(evals, moiety)
        z = self.z0_s1 if moiety == S1 else self.z1_s0
        return [(a + b) % self.p for a, b in zip(e, z)]

    def mextend(self, evals: list[int], moiety: int) -> list[int]:
        """EXTEND for monic polys of degree exactly n/2 (fftree.rs:128-141)."""
        return self.subtree_with_size(len(evals) * 2)._mextend_impl(evals, moiety)

    def _enter_impl(self, coeffs: list[int]) -> list[int]:
        """ENTER (fft): coeffs → evals (fftree.rs:143-161)."""
        p = self.p
        n = len(coeffs)
        if n == 1:
            return list(coeffs)
        st = self.subtree
        u0 = st.enter(coeffs[: n // 2])
        v0 = st.enter(coeffs[n // 2 :])
        u1 = self.extend(u0, S1)
        v1 = self.extend(v0, S1)
        res = []
        for i in range(n // 2):
            res.append((u0[i] + v0[i] * self.xnn_s[2 * i]) % p)
            res.append((u1[i] + v1[i] * self.xnn_s[2 * i + 1]) % p)
        return res

    def enter(self, coeffs: list[int]) -> list[int]:
        return self.subtree_with_size(len(coeffs))._enter_impl(coeffs)

    def _degree_impl(self, evals: list[int]) -> int:
        """DEGREE (fftree.rs:169-192)."""
        p = self.p
        n = len(evals)
        if n == 1:
            return 0
        st = self.subtree
        e0 = evals[0::2]
        e1 = evals[1::2]
        g1 = self._extend_impl(e0, S1)
        if g1 == e1:
            return st._degree_impl(e0)
        t1 = [(b - g) * zi % p for b, g, zi in zip(e1, g1, self.z0_inv_s1)]
        t0 = self._extend_impl(t1, S0)
        return n // 2 + st._degree_impl(t0)

    def degree(self, evals: list[int]) -> int:
        return self.subtree_with_size(len(evals))._degree_impl(evals)

    def _exit_impl(self, evals: list[int]) -> list[int]:
        """EXIT (ifft): evals → coeffs (fftree.rs:200-224)."""
        p = self.p
        n = len(evals)
        if n == 1:
            return list(evals)
        u0 = self._modular_reduce_impl(
            evals, self.xnn_s, self.z0z0_rem_xnn_s
        )[0::2]
        st = self.subtree
        a = st._exit_impl(u0)
        v0 = [
            (e - u) * xi % p
            for e, u, xi in zip(evals[0::2], u0, self.xnn_s_inv[0::2])
        ]
        b = st._exit_impl(v0)
        return a + b

    def exit(self, evals: list[int]) -> list[int]:
        return self.subtree_with_size(len(evals))._exit_impl(evals)

    def _redc_impl(self, evals: list[int], a: list[int], moiety: int) -> list[int]:
        """Polynomial Montgomery REDC: <P·Z⁻¹ mod a ≀ S> (fftree.rs:232-259)."""
        p = self.p
        e0, e1 = evals[0::2], evals[1::2]
        a0, a1 = a[0::2], a[1::2]
        a0_inv = batch_inv_mod(a0, p)
        t0 = [e * ai % p for e, ai in zip(e0, a0_inv)]
        g1 = self._extend_impl(t0, S0 if moiety == S1 else S1)
        z_inv = self.z0_inv_s1 if moiety == S0 else self.z1_inv_s0
        h1 = [
            (e - g * av) * zi % p for e, g, av, zi in zip(e1, g1, a1, z_inv)
        ]
        h0 = self._extend_impl(h1, moiety)
        return [y for hh in zip(h0, h1) for y in hh]

    def redc_z0(self, evals: list[int], a: list[int]) -> list[int]:
        return self.subtree_with_size(len(evals))._redc_impl(evals, a, S0)

    def redc_z1(self, evals: list[int], a: list[int]) -> list[int]:
        return self.subtree_with_size(len(evals))._redc_impl(evals, a, S1)

    def _modular_reduce_impl(self, evals, a, c) -> list[int]:
        """MOD = REDC ∘ (·c) ∘ REDC (fftree.rs:277-281)."""
        h = self._redc_impl(evals, a, S0)
        hc = [x * y % self.p for x, y in zip(h, c)]
        return self._redc_impl(hc, a, S0)

    def modular_reduce(self, evals, a, c) -> list[int]:
        return self.subtree_with_size(len(evals))._modular_reduce_impl(evals, a, c)

    def _vanish_impl(self, domain: list[int]) -> list[int]:
        """VANISH: eval of Z(x)=∏(x−aᵢ) over S (fftree.rs:291-308,
        ECFFT-I §7.1 product tree)."""
        p = self.p
        n = len(domain)
        if n == 1:
            leaves = self.f_layers[0]
            assert len(leaves) == 2
            alpha = domain[0]
            return [(alpha - leaves[0]) % p, (alpha - leaves[1]) % p]
        st = self.subtree
        qp = st._vanish_impl(domain[: n // 2])
        qpp = st._vanish_impl(domain[n // 2 :])
        q_s0 = [a * b % p for a, b in zip(qp, qpp)]
        q_s1 = self.mextend(q_s0, S1)
        return [y for q in zip(q_s0, q_s1) for y in q]

    def vanish(self, domain: list[int]) -> list[int]:
        return self.subtree_with_size(len(domain) * 2)._vanish_impl(domain)


def build_host_fftree(field_name: str, n: int) -> HostFFTree | None:
    """F::build_fftree(n) analogue (lib.rs:14-16) on the host oracle."""
    from ecfft_tpu.fields.registry import build_domain, get_spec

    spec = get_spec(field_name)
    dom = build_domain(spec, n)
    if dom is None:
        return None
    leaves, maps = dom
    return HostFFTree.build(leaves, maps, spec.p)
