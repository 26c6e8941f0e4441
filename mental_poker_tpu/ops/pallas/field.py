"""Pallas TPU kernel for Montgomery field multiplication (L1 hot op).

Role in the stack: `Field.mont_mul` (ops/field.py) is the atom under every
curve/MSM/argument op — the reference's cost model bottoms out in limb
multiplication inside `ark-ff` (`examples/parameter_selection.rs:3`'s m*N
exponentiations are ~6k limb-muls each). This kernel fuses the three
schoolbook convolutions + carry pipelines + conditional subtraction of REDC
into ONE VMEM-resident program: HBM traffic is exactly 2 operands in, 1
result out (the XLA lowering of the jnp path materializes intermediate
[., 2L] tensors between fusions).

Layout: the kernel runs limb-major — operands are transposed to
[L, B] (limbs on SUBLANES, batch on LANES) so every limb-axis shift is a
cheap static sublane slice and the batch axis fills all 128 VPU lanes.
Blocks: [L, BT] with BT = 512 lanes per grid step.

Values: uint32 arrays of L 16-bit limbs, Montgomery form, reduced (< p).
Bit-exactness vs the jnp path is pinned by tests/test_pallas_field.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

MASK = 0xFFFF  # Python int: folds into ops without becoming a traced constant


def _shift_down(x, k: int):
    """Shift rows down by k along axis 0 (zeros in): out[i] = x[i-k]."""
    if k == 0:
        return x
    pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[:-k]], axis=0)


def _carry16(x, nout: int):
    """Raw limbs (< 2^22) [K, B] -> clean 16-bit limbs [nout, B].

    One shift-add round to the single-carry regime, then a Kogge-Stone
    (generate, propagate) prefix scan along the limb (sublane) axis.
    """
    K = x.shape[0]
    if K < nout:
        x = jnp.concatenate([x, jnp.zeros((nout - K,) + x.shape[1:], x.dtype)], 0)
    elif K > nout:
        x = x[:nout]
    v = (x & MASK) + _shift_down(x >> 16, 1)
    g = v >> 16  # 0/1 carry generate
    p = (v == MASK).astype(jnp.uint32)
    # inclusive prefix combine: g[i] = carry out of limbs 0..i
    d = 1
    while d < nout:
        gs = _shift_down(g, d)
        ps = _shift_down(p, d)
        g = g | (p & gs)
        p = p & ps
        d *= 2
    cin = _shift_down(g, 1)
    return (v + cin) & MASK


def _borrow_sub(a, b):
    """(a - b) mod 2^(16L) along limb axis 0 + borrow-out flag [B]."""
    L = a.shape[0]
    g = (a < b).astype(jnp.uint32)
    p = (a == b).astype(jnp.uint32)
    d = 1
    while d < L:
        gs = _shift_down(g, d)
        ps = _shift_down(p, d)
        g = g | (p & gs)
        p = p & ps
        d *= 2
    bin_ = _shift_down(g, 1)
    out = (a + jnp.uint32(1 << 16) - b - bin_) & MASK
    return out, g[L - 1]


def _pad0(x, lo: int, hi: int):
    """Zero-pad along axis 0 (static): concat-based, no scatter ops."""
    return jnp.pad(x, ((lo, hi),) + ((0, 0),) * (x.ndim - 1))


def _conv_full(a, b, L: int):
    """Full product convolution: [L, B] x [L, B] -> raw [2L, B] (< 2^21)."""
    B = a.shape[1:]
    acc = jnp.zeros((2 * L,) + B, jnp.uint32)
    for i in range(L):
        prod = a[i][None] * b  # [L, B] exact u32 (16x16-bit)
        lo = prod & MASK
        hi = prod >> 16
        acc = acc + _pad0(lo, i, L - i) + _pad0(hi, i + 1, L - i - 1)
    return acc


def _conv_low(a, b, L: int):
    """Truncated product (low L limbs only): raw [L, B] (< 2^21)."""
    B = a.shape[1:]
    acc = jnp.zeros((L,) + B, jnp.uint32)
    for i in range(L):
        prod = a[i][None] * b[: L - i]
        lo = prod & MASK
        acc = acc + _pad0(lo, i, 0)
        if i + 1 < L:
            acc = acc + _pad0((prod >> 16)[: L - i - 1], i + 1, 0)
    return acc


def _mont_mul_block(a, b, p_col, np_col, L: int):
    """REDC on one [L, B] block; returns [L, B] reduced Montgomery product.
    `p_col`/`np_col`: modulus and -p^-1 mod R as [L, 1] columns."""
    T = _carry16(_conv_full(a, b, L), 2 * L)  # clean a*b
    npb = jnp.broadcast_to(np_col, (L,) + a.shape[1:])
    pb = jnp.broadcast_to(p_col, (L,) + a.shape[1:])
    m = _carry16(_conv_low(T[:L], npb, L), L)  # (T mod R) * N' mod R
    mp = _conv_full(m, pb, L)
    S = _carry16(T + mp, 2 * L)  # low L limbs cancel to 0
    res = S[L:]
    d, brw = _borrow_sub(res, pb)
    return jnp.where((brw != 0)[None], res, d)


def _mont_mul_kernel(p_ref, np_ref, a_ref, b_ref, out_ref, *, L):
    out_ref[:] = _mont_mul_block(a_ref[:], b_ref[:], p_ref[:], np_ref[:], L)


@functools.cache
def _build(L: int, p_key: bytes, np_key: bytes, BT: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_col = np.frombuffer(p_key, dtype=np.uint32).reshape(L, 1)
    np_col = np.frombuffer(np_key, dtype=np.uint32).reshape(L, 1)

    kernel = functools.partial(_mont_mul_kernel, L=L)

    @jax.jit
    def run(a_t, b_t):  # [L, B] with B % BT == 0
        B = a_t.shape[1]
        grid = (B // BT,)
        spec = pl.BlockSpec((L, BT), lambda i: (0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((L, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, B), jnp.uint32),
            grid=grid,
            in_specs=[cspec, cspec, spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(jnp.asarray(p_col), jnp.asarray(np_col), a_t, b_t)

    return run


def available() -> bool:
    """True when the runtime can execute the kernel compiled (TPU backend)."""
    try:
        return jax.default_backend().startswith("tpu") or jax.default_backend() == "axon"
    except Exception:
        return False


def use_pallas() -> bool:
    """Trace-time switch for the fused field/point kernels: on for TPU
    backends; config.pallas / MPTPU_PALLAS=0/1 overrides (1 = interpret
    mode off-TPU, test-only). Shared by `Field.mont_mul` and `Curve.add`."""
    from ...config import get_config

    cfg = get_config().pallas
    if cfg is not None:
        return cfg
    return available()


def mont_mul(field, a, b, block_lanes: int = 512, interpret: bool | None = None):
    """Pallas Montgomery product, drop-in for `Field.mont_mul`.

    a, b: uint32[..., L] Montgomery-form reduced limbs (broadcastable).
    Transposes to limb-major [L, B], pads B to a lane-block multiple, runs the
    fused kernel, and restores the caller's layout.
    """
    if interpret is None:
        interpret = not available()
    L = field.L
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]
    B = int(np.prod(batch)) if batch else 1
    a2 = a.reshape(B, L).T  # [L, B]
    b2 = b.reshape(B, L).T
    BT = min(block_lanes, max(128, 1 << (B - 1).bit_length() if B > 1 else 128))
    Bp = -(-B // BT) * BT
    if Bp != B:
        a2 = jnp.pad(a2, ((0, 0), (0, Bp - B)))
        b2 = jnp.pad(b2, ((0, 0), (0, Bp - B)))
    run = _build(
        L,
        np.asarray(field.p_limbs, np.uint32).tobytes(),
        np.asarray(field.nprime_limbs, np.uint32).tobytes(),
        BT,
        bool(interpret),
    )
    out = run(a2, b2)
    return out[:, :B].T.reshape(batch + (L,))
