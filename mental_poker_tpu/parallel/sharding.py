"""Multi-chip sharding for batched proving (SURVEY §2.3).

The reference has NO parallelism (single-threaded Rust; SURVEY §2.3) — this
module is the new capability. Two mesh axes:

- ``dp`` (data parallel): independent decks/proofs. Pure SPMD — no cross-device
  traffic except the final gather.
- ``sp`` (sequence parallel): the deck axis (N = m*n cards) for large decks.
  Elementwise card ops (mask/remask/permuted-gather) shard freely; deck-wide
  MSMs compute per-shard partial sums and combine with an ``all_gather`` of the
  (tiny) partial points followed by a local EC tree-sum — the EC analogue of a
  ``psum``, riding ICI.

All functions here are `shard_map`-based and jit-compatible; fixed-base tables
are closed over as replicated constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..crypto.elgamal import Ciphertexts
from ..ops.curve import Curve, PointP
from ..ops import msm as msm_mod


def make_mesh(n_dp: int | None = None, n_sp: int = 1, devices=None) -> Mesh:
    """A (dp, sp) device mesh. Defaults: all devices on dp."""
    devices = devices if devices is not None else jax.devices()
    n_dp = n_dp if n_dp is not None else len(devices) // n_sp
    assert n_dp * n_sp <= len(devices), (n_dp, n_sp, len(devices))
    dev = np.asarray(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(dev, axis_names=("dp", "sp"))


def _cipher_spec(spec) -> Ciphertexts:
    return Ciphertexts(PointP(spec, spec, spec), PointP(spec, spec, spec))


def shard_deck(mesh: Mesh, deck: Ciphertexts) -> Ciphertexts:
    """Place a [B, N, L] deck batch with B over dp and N over sp."""
    sh = NamedSharding(mesh, P("dp", "sp", None))
    return jax.tree.map(lambda a: jax.device_put(a, sh), deck)


def remask_shuffled_step(cv: Curve, gen_table, pk_table):
    """Build the jittable, mesh-sharded shuffle+remask device step.

    Returned fn: (deck [B,N], pi [B,N] int32, rho [B,N,L]) -> shuffled deck.
    The permuted gather is dp/sp-local when N is replicated on sp; with sp
    sharding the gather crosses shards, so we all_gather the deck along sp
    first (cards are small; ICI-bound, overlapping with compute).
    """

    def step(deck: Ciphertexts, pi: jnp.ndarray, rho: jnp.ndarray) -> Ciphertexts:
        def permute(coord):
            return jnp.take_along_axis(
                coord, pi[..., None].astype(jnp.int32), axis=-2
            )

        permuted = jax.tree.map(permute, deck)
        c0 = gen_table.mul(rho)
        c1 = pk_table.mul(rho)
        return Ciphertexts(
            PointP(*(cv.add(permuted.c0, c0))),
            PointP(*(cv.add(permuted.c1, c1))),
        )

    return step


def sharded_remask_step(cv: Curve, gen_table, pk_table, mesh: Mesh):
    """dp/sp-sharded version of `remask_shuffled_step`.

    The deck is gathered along sp before the permuted gather (output card i
    may come from any input shard), then each device remasks only its local
    output shard — the heavy fixed-base muls stay fully sharded.
    """
    inner = remask_shuffled_step(cv, gen_table, pk_table)

    def local(deck_sh: Ciphertexts, pi_sh, rho_sh):
        # deck: [B_loc, N_loc] on each device -> full N locally (sp gather)
        full = jax.tree.map(
            lambda a: jax.lax.all_gather(a, "sp", axis=1, tiled=True), deck_sh
        )

        def permute(coord):
            return jnp.take_along_axis(
                coord, pi_sh[..., None].astype(jnp.int32), axis=-2
            )

        permuted = jax.tree.map(permute, full)
        c0 = gen_table.mul(rho_sh)
        c1 = pk_table.mul(rho_sh)
        return Ciphertexts(
            PointP(*(cv.add(permuted.c0, c0))),
            PointP(*(cv.add(permuted.c1, c1))),
        )

    spec_deck = _cipher_spec(P("dp", "sp", None))
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(spec_deck, P("dp", "sp"), P("dp", "sp", None)),
            out_specs=spec_deck,
        )
    )


def sharded_deck_msm(cv: Curve, mesh: Mesh, window: int = 4):
    """dp/sp-sharded ciphertext MSM: out[b] = sum_i k[b,i] * deck[b,i].

    Each sp shard computes its partial MSM over local cards; partials are
    all_gathered along sp (2 points per deck — tiny) and tree-summed locally.
    Output is replicated along sp, sharded along dp.

    The per-shard MSM runs in a fully vma-checked shard_map; only the tiny
    EC combine (all_gather + identical local tree-sum, which replicates along
    sp by construction but is not a reduction the varying-axes checker can
    recognize) runs with `check_vma=False`, so future edits to the MSM body
    keep full static replication checking.
    """

    def local_msm(c0: PointP, c1: PointP, k):
        p0 = msm_mod.msm(cv, c0, k, window)  # [B_loc, L]
        p1 = msm_mod.msm(cv, c1, k, window)
        # add a leading sp-partial axis of size 1 so out_specs can shard it
        return (
            PointP(*(q[None] for q in p0)),
            PointP(*(q[None] for q in p1)),
        )

    def local_combine(p0: PointP, p1: PointP):
        def combine(Pt: PointP) -> PointP:
            g = jax.tree.map(
                lambda a: jax.lax.all_gather(a, "sp", axis=0, tiled=True), Pt
            )  # [n_sp, B_loc, L]
            return cv.sum_points(PointP(*g), axis=0)

        return combine(p0), combine(p1)

    pt = P("dp", "sp", None)
    part = P("sp", "dp", None)  # [1 per sp shard, B_loc, L]
    out_pt = P("dp", None)
    msm_sharded = jax.shard_map(
        local_msm,
        mesh=mesh,
        in_specs=(PointP(pt, pt, pt), PointP(pt, pt, pt), P("dp", "sp", None)),
        out_specs=(PointP(part, part, part), PointP(part, part, part)),
    )
    combine_sharded = jax.shard_map(
        local_combine,
        mesh=mesh,
        in_specs=(PointP(part, part, part), PointP(part, part, part)),
        out_specs=(PointP(out_pt, out_pt, out_pt), PointP(out_pt, out_pt, out_pt)),
        check_vma=False,  # scoped: combine only (see docstring)
    )

    def run(c0: PointP, c1: PointP, k):
        p0, p1 = msm_sharded(c0, c1, k)
        return combine_sharded(p0, p1)

    return jax.jit(run)


def sharded_window_msm(cv: Curve, mesh: Mesh, axis: str = "sp", window: int = 4):
    """TP-sharded variable-base MSM: partition the Pippenger bucket WINDOWS
    across the `axis` mesh dimension (SURVEY §2.3 TP row).

    out[b] = sum_i k[b, i] * pts[b, i], computed as sum_w 2^(c*w) * S_w with
    S_w = sum_i digit_w(k_i) * pts_i. Each device owns a contiguous chunk of
    windows and computes only those windows' digit-table gathers + tree sums —
    the dominant O(W*N) bucket-accumulation work splits D ways. The (cheap)
    weighted combine — an all_gather of the W window sums (points, tiny)
    followed by one Horner ladder of W adds + c*W doublings — runs replicated.

    Points/scalars are replicated along `axis` (TP trades memory for compute
    balance; use `sharded_deck_msm` to split the points axis instead).
    """
    c = window
    nbits = cv.fr.bits
    W = -(-nbits // c)
    D = mesh.shape[axis]
    Wd = -(-W // D)  # windows per device (last device may own padding)

    def local(pts: PointP, k):
        d = jax.lax.axis_index(axis)
        digits = msm_mod.scalar_digits(k, c, nbits)  # [W, B, N]
        pad = jnp.zeros((Wd * D - W,) + digits.shape[1:], digits.dtype)
        digits = jnp.concatenate([digits, pad], 0)  # [Wd*D, B, N]
        mine = jax.lax.dynamic_slice_in_dim(digits, d * Wd, Wd, axis=0)
        table = msm_mod.build_tables(cv, pts, c)  # [B, N, 2^c, L]

        def body(_, dig):
            gathered = msm_mod._gather_points(table, dig)  # [B, N, L]
            s = cv.sum_points(gathered, axis=gathered.x.ndim - 2)
            return None, tuple(s)

        _, sums = jax.lax.scan(body, None, mine)  # coords [Wd, B, L]
        S = PointP(*sums)
        # all_gather the window sums: [D*Wd, B, L] in window order
        g = jax.tree.map(lambda a: jax.lax.all_gather(a, axis, axis=0, tiled=True), S)
        # Horner over windows, MSB first: acc = 2^c * acc + S_w
        rev = PointP(*(jnp.flip(q[:W], axis=0) for q in g))

        def horner(acc, row):
            for _ in range(c):
                acc = cv.dbl(acc)
            return cv.add(acc, PointP(*row)), None

        acc, _ = jax.lax.scan(
            horner, cv.identity_like(rev.x[0]), tuple(rev)
        )
        return acc

    other = [ax for ax in mesh.axis_names if ax != axis]
    dp = other[0] if other else None
    pt = P(dp, None, None)  # batch over the data axis, replicated along TP
    out = P(dp, None)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(PointP(pt, pt, pt), pt),
        out_specs=PointP(out, out, out),
        check_vma=False,  # dynamic-slice by axis_index varies; result replicates
    )
    return jax.jit(fn)


def sharded_prefix_prod(field, mesh: Mesh, axis: str = "sp"):
    """SP: inclusive modular prefix product with the SEQUENCE axis sharded
    across the mesh (SURVEY §2.3 SP row; the product argument's cross-deck
    prefix products at large N).

    in/out: [B, N, L] Montgomery-form limbs, N sharded over `axis`, B over the
    other mesh axis. Scheme: local inclusive scan per shard, all_gather of the
    per-shard totals (one [D, B, L] exchange over ICI), exclusive prefix of
    the totals locally, then one broadcast multiply — the classic
    scan-then-offset decomposition.
    """

    def local(a_sh):
        # a_sh: [B_loc, N_loc, L]
        moved = jnp.moveaxis(a_sh, 1, 0)  # [N_loc, B, L]
        pref = jnp.moveaxis(field._prefix_prod_scan(moved), 0, 1)  # [B, N_loc, L]
        total = pref[:, -1]  # [B, L]
        tots = jax.lax.all_gather(total, axis, axis=0)  # [D, B, L]
        d = jax.lax.axis_index(axis)
        one = jnp.broadcast_to(jnp.asarray(field.one_mont), total.shape)
        # exclusive prefix of shard totals up to this shard
        D = tots.shape[0]
        mask = (jnp.arange(D) < d)[:, None, None]
        masked = jnp.where(mask, tots, jnp.broadcast_to(one, tots.shape))
        offset = field.prod_mod(masked, axis=0)  # [B, L]
        return field.mont_mul(pref, offset[:, None, :])

    other = [ax for ax in mesh.axis_names if ax != axis]
    dp = other[0] if other else None
    spec = P(dp, axis, None)
    return jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec,
                      check_vma=False)
    )


def sharded_commit_step(ck, mesh: Mesh):
    """dp-sharded Pedersen row commitments: vecs [B, m, n, L], rs [B, m, L]
    -> PointP [B, m]. Rows replicated over sp (commit key is per-game fixed)."""

    def local(vecs, rs):
        return ck.commit(vecs, rs)

    spec_in = P("dp", None, None, None)
    spec_r = P("dp", None, None)
    spec_out = PointP(P("dp", None, None), P("dp", None, None), P("dp", None, None))
    return jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=(spec_in, spec_r), out_specs=spec_out)
    )
