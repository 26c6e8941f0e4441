"""Fixed-limb prime-field arithmetic on TPU.

This is the L1 layer of the stack (role of `ark-ff` in the reference's
dependency closure; see reference use-sites at
`barnett-smart-card-protocol/src/discrete_log_cards/mod.rs:7-11`).

Representation
--------------
A field element is a ``uint32[..., L]`` array of L little-endian 16-bit limbs.
All arithmetic uses only native 32-bit integer ops (TPU VPU friendly):

- a 16x16-bit product fits exactly in a uint32;
- schoolbook partial-product accumulators stay below 2^22 (for L <= 32), so
  sums never overflow before the explicit carry-propagation passes.

Elements are kept in **Montgomery form** (`x*R mod p`, `R = 2^(16 L)`) on
device; `mont_mul` is a full product followed by Montgomery reduction (REDC).
Conversion helpers go to/from canonical form and Python ints at the host
boundary.

The layer is modulus-generic: instantiated for the Stark curve base and scalar
fields (primary target, as `starknet-curve` in the reference `tests.rs:16`) and
for BLS12-377 (genericity check, as `examples/parameter_selection.rs:25`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1


def int_to_limbs(x: int, nlimbs: int) -> np.ndarray:
    """Convert a non-negative Python int to little-endian 16-bit limbs."""
    if x < 0:
        raise ValueError("negative")
    out = np.zeros((nlimbs,), dtype=np.uint32)
    for i in range(nlimbs):
        out[i] = (x >> (LIMB_BITS * i)) & MASK
    if x >> (LIMB_BITS * nlimbs):
        raise ValueError(f"{x.bit_length()}-bit value does not fit in {nlimbs} limbs")
    return out


def limbs_to_int(a) -> int:
    """Convert little-endian 16-bit limbs (1-D) back to a Python int."""
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(a))


class Field:
    """A prime field GF(p) with device-side limb arithmetic.

    All device methods take/return ``uint32[..., L]`` arrays; batch dimensions
    broadcast. Values passed to `mont_mul`/`add`/`sub` must be reduced
    (< p) and in Montgomery form unless noted.
    """

    def __init__(self, modulus: int, name: str = "F", nlimbs: int | None = None):
        self.p = modulus
        self.name = name
        bits = modulus.bit_length()
        L = nlimbs if nlimbs is not None else -(-bits // LIMB_BITS)
        # Ensure at least one spare bit so a+b (< 2p) fits in L limbs.
        if 2 * modulus >= 1 << (LIMB_BITS * L):
            L += 1
        self.L = L
        self.bits = bits
        self.R = 1 << (LIMB_BITS * L)
        self.n0 = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        # Static numpy constants (become literals in jitted programs).
        self.p_limbs = int_to_limbs(modulus, L)
        self.r_mod_p = self.R % modulus
        self.r2_limbs = int_to_limbs((self.R * self.R) % modulus, L)
        self.one_mont = int_to_limbs(self.r_mod_p, L)  # 1 in Montgomery form
        self.zero_limbs = np.zeros((L,), dtype=np.uint32)
        self.raw_one = int_to_limbs(1, L)
        # N' = -p^-1 mod R (full-width), for the parallel Montgomery reduction.
        self.nprime_limbs = int_to_limbs((-pow(modulus, -1, self.R)) % self.R, L)
        # Jit every public device entry point (compiled once per input shape,
        # cached persistently). Without this the stack runs eagerly — hundreds
        # of thousands of per-op dispatches per scalar multiplication.
        self.add = jax.jit(self.add)
        self.sub = jax.jit(self.sub)
        self.neg = jax.jit(self.neg)
        self.mont_mul = jax.jit(self.mont_mul)
        self.sqr = jax.jit(self.sqr)
        self.to_mont = jax.jit(self.to_mont)
        self.from_mont = jax.jit(self.from_mont)
        self.pow_const = jax.jit(self.pow_const, static_argnums=1)
        self.inv = jax.jit(self.inv)
        self.batch_inv = jax.jit(self.batch_inv, static_argnames=("axis",))

    # ------------------------------------------------------------------ host
    def from_int(self, x: int) -> np.ndarray:
        """Canonical int -> Montgomery-form limbs (host)."""
        return int_to_limbs((x % self.p) * self.R % self.p, self.L)

    def to_int(self, a) -> int:
        """Montgomery-form limbs -> canonical int (host)."""
        return limbs_to_int(np.asarray(a)) * pow(self.R, -1, self.p) % self.p

    def from_int_array(self, xs) -> np.ndarray:
        """List/array of ints -> [len, L] Montgomery limbs (host)."""
        return np.stack([self.from_int(int(x)) for x in xs])

    def to_int_array(self, a) -> list:
        a = np.asarray(a)
        flat = a.reshape(-1, self.L)
        return [self.to_int(row) for row in flat]

    # ---------------------------------------------------------------- device
    def zeros(self, batch_shape=()) -> jnp.ndarray:
        return jnp.zeros(batch_shape + (self.L,), jnp.uint32)

    def ones(self, batch_shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(jnp.asarray(self.one_mont), batch_shape + (self.L,))

    @staticmethod
    def _prefix_gp(g, p):
        """Inclusive prefix combine of (generate, propagate) carry flags along
        the last axis — Kogge-Stone style, log-depth, fully vectorized.

        combined.g[i] = carry out of limbs 0..i assuming no carry in.
        """

        def op(lo, hi):
            gl, pl = lo
            gh, ph = hi
            return gh | (ph & gl), pl & ph

        return jax.lax.associative_scan(op, (g, p), axis=-1)

    def _carry(self, x: jnp.ndarray, nout: int) -> jnp.ndarray:
        """Propagate carries: raw limbs < 2^22 in -> clean 16-bit limbs out.

        Flat (loop-free): one shift-add round brings limbs into the
        single-carry regime (< 2^16 + 2^6), then a log-depth prefix scan
        resolves the remaining 0/1 ripple carries exactly.
        Discards any carry out of limb `nout-1` (caller guarantees none).
        """
        K = x.shape[-1]
        if K < nout:
            x = jnp.concatenate(
                [x, jnp.zeros(x.shape[:-1] + (nout - K,), x.dtype)], axis=-1
            )
        elif K > nout:
            x = x[..., :nout]
        pad = [(0, 0)] * (x.ndim - 1)
        # Round 1: v[i] = (x[i] & MASK) + (x[i-1] >> 16); v[i] < 2^16 + 2^6.
        v = (x & MASK) + jnp.pad((x >> LIMB_BITS)[..., :-1], pad + [(1, 0)])
        # Exact 0/1 ripple carries via (generate, propagate) prefix scan.
        g = v >> LIMB_BITS  # 0 or 1
        p = (v == MASK).astype(jnp.uint32)
        cg, _ = self._prefix_gp(g, p)
        cin = jnp.pad(cg[..., :-1], pad + [(1, 0)])
        return (v + cin) & MASK

    def _sub_limbs(self, a, b):
        """(a - b) mod 2^(16L) plus borrow flag (1 if a < b). Flat."""
        g = (a < b).astype(jnp.uint32)  # generate borrow
        p = (a == b).astype(jnp.uint32)  # propagate borrow
        bg, _ = self._prefix_gp(g, p)
        pad = [(0, 0)] * (a.ndim - 1)
        bin_ = jnp.pad(bg[..., :-1], pad + [(1, 0)])
        out = (a + jnp.uint32(1 << LIMB_BITS) - b - bin_) & MASK
        return out, bg[..., -1]

    def _add_limbs(self, a, b):
        """(a + b) mod 2^(16L), clean 16-bit limbs."""
        return self._carry(a + b, self.L)

    def _cond_sub_p(self, a):
        """a in [0, 2p) -> a mod p (branchless)."""
        p = jnp.asarray(self.p_limbs)
        d, brw = self._sub_limbs(a, jnp.broadcast_to(p, a.shape))
        return jnp.where((brw != 0)[..., None], a, d)

    def add(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        return self._cond_sub_p(self._add_limbs(a, b))

    def sub(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        d, brw = self._sub_limbs(a, b)
        d2 = self._add_limbs(d, jnp.broadcast_to(jnp.asarray(self.p_limbs), d.shape))
        return jnp.where((brw != 0)[..., None], d2, d)

    def neg(self, a):
        """-a mod p (0 -> 0)."""
        p = jnp.broadcast_to(jnp.asarray(self.p_limbs), a.shape)
        d, _ = self._sub_limbs(p, a)
        is_zero = self.is_zero(a)
        return jnp.where(is_zero[..., None], a, d)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    @staticmethod
    def _antidiag_sums(m):
        """c[k] = sum_i m[..., i, k-i] for m [..., L, L] -> c [..., 2L-1].

        Gather-free "skew" trick: pad rows to width 2L, flatten, and re-view
        with row stride 2L-1 — element [i, j] lands at row i, column i+j of
        the new view, so anti-diagonal sums become one plain axis reduction.
        Pure pad/reshape/sum: tiny HLO, no gathers (TPUs hate minor-dim
        gathers), vectorizes over any batch shape.
        """
        L = m.shape[-1]
        if L == 1:
            return m[..., 0, :]
        pad = [(0, 0)] * (m.ndim - 1)
        mp = jnp.pad(m, pad + [(0, L)])  # [..., L, 2L]
        flat = mp.reshape(m.shape[:-2] + (L * 2 * L,))
        view = flat[..., : L * (2 * L - 1)].reshape(m.shape[:-2] + (L, 2 * L - 1))
        return jnp.sum(view, axis=-2)

    def _raw_product(self, a, b):
        """Raw anti-diagonal sums of the schoolbook product, [.., 2L] limbs
        each < 2L*2^16 < 2^22 (L <= 31). Outer product + skewed-reshape
        reduction: no scatters, no gathers, no loops.
        """
        L = self.L
        op = a[..., :, None] * b[..., None, :]  # [.., L, L] exact in uint32
        lo = self._antidiag_sums(op & MASK)  # [.., 2L-1], term (i, j) at i+j
        hi = self._antidiag_sums(op >> LIMB_BITS)  # term (i, j) at i+j (+1 below)
        pad = [(0, 0)] * (lo.ndim - 1)
        return jnp.pad(lo, pad + [(0, 1)]) + jnp.pad(hi, pad + [(1, 0)])

    def mont_mul(self, a, b):
        """Montgomery product a*b*R^-1 mod p (inputs/outputs reduced).

        On TPU backends dispatches to the fused Pallas kernel
        (ops/pallas/field.py — one VMEM-resident program; bit-identical).
        jnp fallback: fully parallel separated-operand form — no sequential
        limb loop:
          T  = a*b                      (full product)
          m  = (T mod R) * N' mod R     (one low product; N' = -p^-1 mod R)
          S  = T + m*p                  (low L limbs cancel to 0)
          out= S / R, minus p if >= p
        Everything reduces to three outer-product convolutions plus log-depth
        carry resolution.
        """
        from .pallas import field as pallas_field

        if pallas_field.use_pallas():
            return pallas_field.mont_mul(self, a, b)
        L = self.L
        a, b = jnp.broadcast_arrays(a, b)
        T = self._carry(self._raw_product(a, b), 2 * L)  # clean a*b
        # m = T_low * N' mod R (truncated product; discarded carry == mod R)
        m = self._carry(self._raw_product(T[..., :L], jnp.broadcast_to(jnp.asarray(self.nprime_limbs), a.shape)), L)
        mp = self._raw_product(m, jnp.broadcast_to(jnp.asarray(self.p_limbs), a.shape))
        S = self._carry(T + mp, 2 * L)  # (T + m*p) < 2^(32L): top carry is 0
        res = S[..., L:]  # low L limbs are 0 by construction; S/R < 2p
        return self._cond_sub_p(res)

    def sqr(self, a):
        return self.mont_mul(a, a)

    def to_mont(self, a):
        """Canonical limbs -> Montgomery form (device)."""
        return self.mont_mul(a, jnp.asarray(self.r2_limbs))

    def from_mont(self, a):
        """Montgomery form -> canonical limbs (device)."""
        return self.mont_mul(a, jnp.asarray(self.raw_one))

    def pow_const(self, a, e: int):
        """a^e for a *static* Python-int exponent, via scan over exponent bits."""
        if e == 0:
            return jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)
        bits = np.array([(e >> i) & 1 for i in range(e.bit_length())][::-1], np.uint32)

        def body(acc, bit):
            acc = self.mont_mul(acc, acc)
            acc = jnp.where(bit, self.mont_mul(acc, a), acc)
            return acc, None

        # First bit is the MSB == 1: start from a to save one square+mul.
        acc, _ = jax.lax.scan(body, a, bits[1:])
        return acc

    def inv(self, a):
        """a^-1 mod p via Fermat (a^(p-2)); maps 0 -> 0."""
        return self.pow_const(a, self.p - 2)

    def _prefix_prod_scan(self, a):
        """Inclusive prefix product along axis 0 via `lax.scan` (ONE traced
        mont_mul; depth B). Chosen over associative_scan for trace size —
        runtime depth is irrelevant at the batch sizes this serves."""

        def body(acc, row):
            nxt = self.mont_mul(acc, row)
            return nxt, nxt

        init = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape[1:])
        _, pref = jax.lax.scan(body, init, a)
        return pref

    def batch_inv(self, a, axis: int = -2):
        """Batched inversion with one field inversion (Montgomery's trick).

        `a`: [..., B, L] (with `axis` indexing B). Zeros map to zero.
        """
        if axis != -2:
            a = jnp.moveaxis(a, axis, -2)
        one = jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape)
        safe = jnp.where(self.is_zero(a)[..., None], one, a)
        moved = jnp.moveaxis(safe, -2, 0)  # [B, ..., L]
        prefix = jnp.moveaxis(self._prefix_prod_scan(moved), 0, -2)
        total_inv = self.inv(prefix[..., -1, :])
        # suffix[i] = a[i+1]*...*a[B-1]; inv(a[i]) = prefix[i-1]*suffix[i]*total_inv
        rev = jnp.flip(moved, axis=0)
        suffix = jnp.flip(
            jnp.moveaxis(self._prefix_prod_scan(rev), 0, -2), axis=-2
        )
        pre_shift = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape[:-2] + (1, self.L)), prefix[..., :-1, :]],
            axis=-2,
        )
        suf_shift = jnp.concatenate(
            [suffix[..., 1:, :], jnp.broadcast_to(jnp.asarray(self.one_mont), a.shape[:-2] + (1, self.L))],
            axis=-2,
        )
        out = self.mont_mul(self.mont_mul(pre_shift, suf_shift), total_inv[..., None, :])
        out = jnp.where(self.is_zero(a)[..., None], jnp.zeros_like(out), out)
        if axis != -2:
            out = jnp.moveaxis(out, -2, axis)
        return out

    def select(self, cond, a, b):
        """Elementwise (over batch dims) select: cond ? a : b."""
        return jnp.where(cond[..., None], a, b)

    # ------------------------------------------------- vector algebra (mont)
    def sum_mod(self, a, axis: int = -2):
        """Modular sum along an axis: log-depth halving tree of `add`."""
        a = jnp.moveaxis(a, axis, 0) if axis not in (0,) else a
        n = a.shape[0]
        if n == 0:
            return jnp.broadcast_to(jnp.zeros((self.L,), jnp.uint32), a.shape[1:])
        npow = 1 if n <= 1 else 1 << (n - 1).bit_length()
        if npow != n:
            a = jnp.concatenate(
                [a, jnp.zeros((npow - n,) + a.shape[1:], a.dtype)], axis=0
            )
        m = npow
        while m > 1:
            h = m // 2
            a = self.add(a[:h], a[h:m])
            m = h
        return a[0]

    def prod_mod(self, a, axis: int = -2):
        """Modular product (Montgomery form) along an axis: halving tree of
        `mont_mul`, identity padding = 1 in Montgomery form."""
        a = jnp.moveaxis(a, axis, 0)
        n = a.shape[0]
        one = jnp.asarray(self.one_mont)
        if n == 0:
            return jnp.broadcast_to(one, a.shape[1:])
        npow = 1 if n <= 1 else 1 << (n - 1).bit_length()
        if npow != n:
            a = jnp.concatenate(
                [a, jnp.broadcast_to(one, (npow - n,) + a.shape[1:])], axis=0
            )
        m = npow
        while m > 1:
            h = m // 2
            a = self.mont_mul(a[:h], a[h:m])
            m = h
        return a[0]

    def powers(self, x, k: int, start: int = 1):
        """[x^start, ..., x^(start+k-1)] (Montgomery form), stacked on a new
        axis -2. Scan-based prefix products (ONE traced mont_mul)."""
        xs = jnp.broadcast_to(x[..., None, :], x.shape[:-1] + (k, self.L))
        moved = jnp.moveaxis(xs, -2, 0)
        pref = jnp.moveaxis(self._prefix_prod_scan(moved), 0, -2)  # x^1..x^k
        if start == 1:
            return pref
        if start == 0:
            one = jnp.broadcast_to(
                jnp.asarray(self.one_mont), x.shape[:-1] + (1, self.L)
            )
            return jnp.concatenate([one, pref[..., : k - 1, :]], axis=-2)
        shift = self.pow_const(x, start - 1)
        return self.mont_mul(pref, shift[..., None, :])

    def dot_mod(self, a, b, axis: int = -2):
        """<a, b> mod p (both Montgomery form) along an axis."""
        return self.sum_mod(self.mont_mul(a, b), axis=axis)

    def small_int_limbs(self, values) -> np.ndarray:
        """Static small non-negative ints -> canonical uint32[..., L] limbs
        (host, deterministic constants)."""
        vals = np.asarray(values, dtype=np.int64)
        out = np.zeros(vals.shape + (self.L,), np.uint32)
        rem = vals.astype(np.uint64)
        for i in range(self.L):
            out[..., i] = (rem & np.uint64(MASK)).astype(np.uint32)
            rem = rem >> np.uint64(LIMB_BITS)
        return out

    # ------------------------------------------------- canonical-form helpers
    def canonical_lt(self, a, b):
        """a < b limbwise (canonical or Montgomery, compares raw limb value)."""
        _, brw = self._sub_limbs(a, b)
        return brw != 0

    def __repr__(self):
        return f"Field({self.name}, {self.bits} bits, L={self.L})"


# --------------------------------------------------------------------------
# Concrete fields
# --------------------------------------------------------------------------

# Stark curve (reference's primary curve via `starknet-curve`,
# tests.rs:16-17): base field p = 2^251 + 17*2^192 + 1.
STARK_P = 2**251 + 17 * 2**192 + 1
# Group order of the Stark curve.
STARK_R = 0x0800000000000010FFFFFFFFFFFFFFFFB781126DCAE7B2321E66A241ADC64D2F

# BLS12-377 (reference benchmark curve, examples/parameter_selection.rs:25).
BLS12_377_P = 0x01AE3A4617C510EAC63B05C06CA1493B1A22D9F300F5138F1EF3622FBA094800170B5D44300000008508C00000000001
BLS12_377_R = 0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001


@functools.cache
def stark_fq() -> Field:
    return Field(STARK_P, "stark_fq")


@functools.cache
def stark_fr() -> Field:
    return Field(STARK_R, "stark_fr")


@functools.cache
def bls12_377_fq() -> Field:
    return Field(BLS12_377_P, "bls377_fq")


@functools.cache
def bls12_377_fr() -> Field:
    return Field(BLS12_377_R, "bls377_fr")
