"""On-device seed lookup + diagonal voting: the TPU half of the aligner.

Replaces minimap2's seed-and-chain stage (the reference calls mappy's C
implementation per read in a thread pool, /root/reference/boss/mapper.py:69-127).
Here the whole batch is one jitted program over a padded [R, L] read matrix:

  1. 2-bit pack k-mers (k shifted adds) + validity via rolling max,
  2. 31-bit mix hash, two rolling mins (lax.reduce_window) select canonical
     minimizers — identical (k, w, hash) scheme to the host-built index so
     read and reference select the same minimizers,
  3. a fixed per-read budget of minimizer slots is compacted by argsort,
  4. binary search (searchsorted) into the sorted index keys, gather up to C
     occurrences per minimizer -> anchors,
  5. per-strand diagonal voting: anchors vote for their diagonal within a
     tolerance T via per-read sorted searchsorted counts; the best anchor
     yields (strand, predicted target start, votes); the runner-up on a
     distinct diagonal yields a mapq-style uniqueness signal.

Everything is int32 (no x64 mode needed); genomes up to 2^31 sites. The
winning candidate window goes to the native banded-DP extension
(native/banded_align.cpp) for a base-exact CIGAR.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .index import K, MinimizerIndex, W

ANCHOR_BUDGET = 1024   # minimizer slots kept per read (A)
OCC_CAP = 4            # index occurrences used per minimizer (C)
DIAG_TOL = 256         # diagonal clustering tolerance (bases)
SENTINEL = np.int32(2**31 - 2**24)  # beyond any real diagonal


def _pow2(n: int, floor: int = 1 << 10) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


# process-wide pad hysteresis: an AEONS experiment rebuilds the pool/contig
# index every batch with a wobbling minimizer count; each distinct padded
# shape costs a full remote XLA compile of the seeding kernels on the axon
# toolchain. Reuse the previous pad when it is within 2x of the need (so
# wobble across a pow2 boundary keeps one shape) but never inflate beyond
# 2x — the sort-join lookup cost scales with the padded index size, so a
# small index must not inherit a huge previous pad.
_PAD_PREV = {"keys": 1 << 10, "pos": 1 << 10}


def _pad_hysteresis(n: int, which: str) -> int:
    pad = _pow2(max(n, 1))
    prev = _PAD_PREV[which]
    if pad < prev <= 2 * pad:
        return prev
    _PAD_PREV[which] = pad
    return pad


class DeviceIndex:
    """Device-resident copy of the minimizer index (int32).

    Arrays pad to power-of-two lengths (with 2x-bounded hysteresis, see
    _pad_hysteresis) so rebuilt indexes (AEONS rebuilds the pool index every
    batch) hit the jit cache instead of recompiling the seeding kernels: pad
    keys are INT32_MAX sentinels (> any 30-bit k-mer code, so lookups never
    match) with zero occurrence counts."""

    def __init__(self, idx: MinimizerIndex, min_keys_pad: int = 1,
                 min_pos_pad: int = 1):
        """min_*_pad: caller-supplied pad floors — callers that rebuild the
        index repeatedly around a known working size (the AEONS pool) pin the
        pad so growth through that size never changes shapes."""
        assert idx.positions.max(initial=0) < 2**31
        self.k, self.w = idx.k, idx.w
        nk = idx.keys.shape[0]
        nkp = _pad_hysteresis(max(nk, min_keys_pad), "keys")
        keys = np.full(nkp, np.iinfo(np.int32).max, np.int32)
        keys[:nk] = idx.keys
        offsets = np.full(nkp + 1, idx.offsets[-1], np.int64)
        offsets[: nk + 1] = idx.offsets
        npos = idx.positions.shape[0]
        npp = _pad_hysteresis(max(npos, min_pos_pad), "pos")
        positions = np.zeros(npp, np.int64)
        positions[:npos] = idx.positions
        strands = np.zeros(npp, np.int8)
        strands[:npos] = idx.strands
        self.keys = jnp.asarray(keys, jnp.int32)        # 30-bit codes
        self.offsets = jnp.asarray(offsets, jnp.int32)
        self.positions = jnp.asarray(positions, jnp.int32)
        self.strands = jnp.asarray(strands, jnp.int32)
        self.n_keys = nk


def _rolling_min(x, w):
    init = np.asarray(np.iinfo(np.int32).max, dtype=x.dtype)
    return jax.lax.reduce_window(x, init, jax.lax.min, (1, w), (1, 1), "valid")


def _rolling_max(x, w):
    init = np.asarray(np.iinfo(np.int32).min, dtype=x.dtype)
    return jax.lax.reduce_window(x, init, jax.lax.max, (1, w), (1, 1), "valid")


def _hash31(x):
    """31-bit selection hash; MUST match aligner.index.selection_hash."""
    h = x.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x45D9F3B)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x45D9F3B)
    h = h ^ (h >> 16)
    return (h >> 1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "w"))
def read_minimizers(reads, k: int = K, w: int = W):
    """Canonical minimizers of a padded read matrix.

    reads: [R, L] int8 codes (0..3, >=4 pad/N).
    Returns (canonical [R, Lk] int32, strand [R, Lk] int32, is_min bool).
    """
    r, L = reads.shape
    n = L - k + 1
    c = reads.astype(jnp.int32)
    fwd = jnp.zeros((r, n), jnp.int32)
    rc = jnp.zeros((r, n), jnp.int32)
    for j in range(k):
        fwd = (fwd << 2) | (c[:, j : j + n] & 3)
        rc = (rc << 2) | (3 - (c[:, k - 1 - j : k - 1 - j + n] & 3))
    valid = _rolling_max(c, k) < 4
    canonical = jnp.minimum(fwd, rc)
    strand = (rc < fwd).astype(jnp.int32)
    valid = valid & (fwd != rc)
    hmax = jnp.iinfo(jnp.int32).max
    h = jnp.where(valid, _hash31((canonical ^ (canonical >> 15)).astype(jnp.uint32)), hmax)
    pad_hi = jnp.full((r, w - 1), hmax, jnp.int32)
    wmin = _rolling_min(jnp.concatenate([h, pad_hi], axis=1), w)
    m2 = _rolling_min(jnp.concatenate([pad_hi, wmin], axis=1), w)
    is_min = valid & (h == m2)
    return canonical, strand, is_min


@partial(jax.jit, static_argnames=("budget",))
def compact_minimizers(canonical, strand, is_min, budget: int = ANCHOR_BUDGET):
    """Keep up to `budget` minimizer slots per read (position-stable)."""
    r, n = canonical.shape
    posidx = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    sort_key = jnp.where(is_min, posidx, n + posidx)
    order = jnp.argsort(sort_key, axis=1)[:, :budget]
    take = lambda arr: jnp.take_along_axis(arr, order, axis=1)
    return take(canonical), take(strand), take(posidx), take(is_min)


def _lookup_join(keys, offsets, ck, valid):
    """Gather-free index lookup via sort-join.

    Binary-search gathers run ~40k/ms on this TPU; joining the sorted index
    keys with the query k-mers through one multi-operand sort + cumulative
    maxima costs two sorts' worth of bandwidth instead. Carried payloads:
    the key's offsets[i] and offsets[i+1] (both monotone in sorted order, so
    cummax propagates the last key <= query), and the key value itself for
    the exact-match test.

    keys [U] sorted int32 (pad INT32_MAX); offsets [U+1] int32;
    ck [N] int32 queries; valid [N] bool.
    Returns (hit [N] bool, base [N] int32, count [N] int32).
    """
    U = keys.shape[0]
    n = ck.shape[0]
    big = jnp.iinfo(jnp.int32).max
    v = jnp.concatenate([keys, ck])
    tag = jnp.concatenate([jnp.zeros(U, jnp.int32), jnp.ones(n, jnp.int32)])
    kv = jnp.concatenate([keys, jnp.full(n, -1, jnp.int32)])
    off_lo = jnp.concatenate([offsets[:U], jnp.full(n, -1, jnp.int32)])
    off_hi = jnp.concatenate([offsets[1 : U + 1], jnp.full(n, -1, jnp.int32)])
    slot = jnp.concatenate([jnp.full(U, big, jnp.int32), jnp.arange(n, dtype=jnp.int32)])
    sv, _st, skv, slo, shi, sslot = jax.lax.sort(
        (v, tag, kv, off_lo, off_hi, slot), num_keys=2
    )
    ckv = jax.lax.cummax(skv)
    clo = jax.lax.cummax(slo)
    chi = jax.lax.cummax(shi)
    out_val = jnp.zeros(n, jnp.int32).at[sslot].set(ckv, mode="drop")
    out_lo = jnp.zeros(n, jnp.int32).at[sslot].set(clo, mode="drop")
    out_hi = jnp.zeros(n, jnp.int32).at[sslot].set(chi, mode="drop")
    hit = valid & (out_val == ck)
    return hit, jnp.maximum(out_lo, 0), jnp.maximum(out_hi - out_lo, 0)


def _vote(keys_flat, tol=DIAG_TOL):
    """votes[i] = #anchors within tol of keys_flat[i]; -1 for sentinels.

    Row-wise sort-join instead of vmapped binary searches (gathers are the
    bottleneck on this TPU): each row sorts (anchor values, +tol queries,
    -tol queries) together; a cumulative max of carried ranks yields
    rank(last anchor <= q) per query, and votes = rank(v+tol) - rank(v-tol-1).
    Diagonals are integers, so "< v-tol" == "<= v-tol-1".
    """
    r, n = keys_flat.shape
    big = jnp.iinfo(jnp.int32).max
    v = jnp.concatenate([keys_flat, keys_flat + tol, keys_flat - tol - 1], axis=1)
    tag = jnp.concatenate(
        [jnp.zeros((r, n), jnp.int32), jnp.ones((r, n), jnp.int32),
         jnp.ones((r, n), jnp.int32)], axis=1
    )
    # slot: where to scatter each query's carried rank (flattened, hi then lo)
    qslot = jax.lax.broadcasted_iota(jnp.int32, (r, 2 * n), 1) + jax.lax.broadcasted_iota(
        jnp.int32, (r, 2 * n), 0
    ) * (2 * n)
    slot = jnp.concatenate([jnp.full((r, n), big, jnp.int32), qslot], axis=1)
    sv, stag, sslot = jax.lax.sort((v, tag, slot), num_keys=2, dimension=1)
    # rank at a query slot = #anchors sorted before it (anchors sort first on
    # value ties) = running count of anchor entries
    crank = jnp.cumsum((stag == 0).astype(jnp.int32), axis=1)
    flat = jnp.zeros(r * 2 * n, jnp.int32).at[sslot.reshape(-1)].set(
        crank.reshape(-1), mode="drop"
    ).reshape(r, 2 * n)
    votes = flat[:, :n] - flat[:, n:]
    return jnp.where(keys_flat < SENTINEL, votes, -1)


@partial(jax.jit, static_argnames=("k", "w", "budget"))
def _seed_and_vote_jit(reads, read_lens, keys, offsets, positions, strands, n_keys_arr,
                       k: int, w: int = W, budget: int = ANCHOR_BUDGET):
    canonical, strand, is_min = read_minimizers(reads, k, w)
    ck, cs, cpos, cvalid = compact_minimizers(canonical, strand, is_min, budget)
    r, a = ck.shape

    hit_f, base_f, count_f = _lookup_join(
        keys, offsets, ck.reshape(-1), cvalid.reshape(-1)
    )
    hit = hit_f.reshape(r, a)
    base = base_f.reshape(r, a)
    count = count_f.reshape(r, a)

    occ = jnp.arange(OCC_CAP, dtype=jnp.int32)
    occ_ok = hit[:, :, None] & (occ[None, None, :] < count[:, :, None])
    pidx = jnp.minimum(base[:, :, None] + occ[None, None, :], positions.shape[0] - 1)
    gpos = positions[pidx]
    gstrand = strands[pidx]

    same = gstrand == cs[:, :, None]
    diag_f = gpos - cpos[:, :, None]
    diag_r = gpos + cpos[:, :, None]
    key_f = jnp.where(occ_ok & same, diag_f, SENTINEL).reshape(r, a * OCC_CAP)
    key_r = jnp.where(occ_ok & ~same, diag_r, SENTINEL).reshape(r, a * OCC_CAP)

    votes_f = _vote(key_f)
    votes_r = _vote(key_r)
    bf = jnp.argmax(votes_f, axis=1)
    br = jnp.argmax(votes_r, axis=1)
    vf = jnp.take_along_axis(votes_f, bf[:, None], axis=1)[:, 0]
    vr = jnp.take_along_axis(votes_r, br[:, None], axis=1)[:, 0]
    kf = jnp.take_along_axis(key_f, bf[:, None], axis=1)[:, 0]
    kr = jnp.take_along_axis(key_r, br[:, None], axis=1)[:, 0]

    rev = vr > vf
    bvotes = jnp.maximum(vf, vr)
    bkey = jnp.where(rev, kr, kf)
    # diagonal spread of the winning cluster: observed indel drift across the
    # read, used by the extension stage to size the DP band (far tighter than
    # a worst-case length-proportional band)
    big = jnp.int32(1 << 30)
    win_keys = jnp.where(rev[:, None], key_r, key_f)
    in_cluster = (jnp.abs(win_keys - bkey[:, None]) <= DIAG_TOL) & (win_keys < SENTINEL)
    dmax = jnp.max(jnp.where(in_cluster, win_keys, -big), axis=1)
    dmin = jnp.min(jnp.where(in_cluster, win_keys, big), axis=1)
    dspan = jnp.maximum(dmax - dmin, 0)
    # runner-up: best vote count far from the winner (either strand)
    far_f = jnp.abs(key_f - bkey[:, None]) > 2 * DIAG_TOL
    far_r = jnp.abs(key_r - bkey[:, None]) > 2 * DIAG_TOL
    far_f = far_f | rev[:, None]       # other strand always counts as distinct
    far_r = far_r | (~rev[:, None])
    second = jnp.maximum(
        jnp.max(jnp.where(far_f, votes_f, -1), axis=1),
        jnp.max(jnp.where(far_r, votes_r, -1), axis=1),
    )

    m = read_lens.astype(jnp.int32)
    tstart = jnp.where(rev, bkey - (m - k), bkey)
    # ONE packed int32 output [6, R] (a D2H pull costs a ~33 ms tunnel round
    # trip regardless of size; per-field pulls would dominate the kernel)
    return jnp.stack([
        (bvotes > 0).astype(jnp.int32),
        rev.astype(jnp.int32),
        tstart,
        bvotes,
        jnp.maximum(second, 0),
        dspan,
    ])


def anchor_budget(L: int, w: int) -> int:
    """Minimizer-slot budget for reads of padded length L: expected density
    is 2/(w+1) positions, so a pow2 just above that (plus slack) loses no
    anchors while keeping the vote sorts ~L/w wide instead of a fixed 1024
    (the vote sort is the seeding kernel's dominant cost)."""
    need = int(2.2 * L / (w + 1)) + 16
    return min(_pow2(need, floor=64), ANCHOR_BUDGET)


def seed_and_vote(reads, dev_idx: DeviceIndex, read_lens):
    """[R, L] padded reads -> per-read best candidate dict of [R] arrays."""
    packed = np.asarray(_seed_and_vote_jit(
        reads,
        read_lens,
        dev_idx.keys,
        dev_idx.offsets,
        dev_idx.positions,
        dev_idx.strands,
        None,
        dev_idx.k,
        dev_idx.w,
        anchor_budget(reads.shape[1], dev_idx.w),
    ))  # single D2H transfer
    names = ("mapped", "strand", "tstart", "votes", "second", "dspan")
    out = {n: packed[i] for i, n in enumerate(names)}
    out["mapped"] = out["mapped"].astype(bool)
    return out


@partial(jax.jit, static_argnames=("k", "ncand", "tol", "w", "budget"))
def _seed_candidates_jit(reads, keys, offsets, positions, strands, k: int, ncand: int,
                         tol: int = DIAG_TOL, w: int = W, budget: int = ANCHOR_BUDGET):
    """Multi-candidate seeding for all-vs-all overlap discovery (AEONS).

    Returns per read, per candidate [R, 2*ncand] arrays: votes, strand,
    qmin/qmax (read k-mer span), tmin/tmax (target span). Candidates are the
    top-voted diagonal clusters per strand space (minimap2-ava style chain
    extents without base-level extension).
    """
    canonical, strand, is_min = read_minimizers(reads, k, w)
    ck, cs, cpos, cvalid = compact_minimizers(canonical, strand, is_min, budget)
    r, a = ck.shape

    hit_f, base_f, count_f = _lookup_join(
        keys, offsets, ck.reshape(-1), cvalid.reshape(-1)
    )
    hit = hit_f.reshape(r, a)
    base = base_f.reshape(r, a)
    count = count_f.reshape(r, a)

    occ = jnp.arange(OCC_CAP, dtype=jnp.int32)
    occ_ok = hit[:, :, None] & (occ[None, None, :] < count[:, :, None])
    pidx = jnp.minimum(base[:, :, None] + occ[None, None, :], positions.shape[0] - 1)
    gpos = positions[pidx]
    gstrand = strands[pidx]

    same = gstrand == cs[:, :, None]
    diag_f = gpos - cpos[:, :, None]
    diag_r = gpos + cpos[:, :, None]
    rp = jnp.broadcast_to(cpos[:, :, None], (r, a, OCC_CAP)).reshape(r, a * OCC_CAP)
    gp = gpos.reshape(r, a * OCC_CAP)

    big = jnp.int32(1 << 30)
    results = []
    for strand_space, key0 in ((0, jnp.where(occ_ok & same, diag_f, SENTINEL)),
                               (1, jnp.where(occ_ok & ~same, diag_r, SENTINEL))):
        keys_flat = key0.reshape(r, a * OCC_CAP)
        votes = _vote(keys_flat, tol)
        v = votes
        for _ in range(ncand):
            best = jnp.argmax(v, axis=1)
            bkey = jnp.take_along_axis(keys_flat, best[:, None], axis=1)[:, 0]
            bvote = jnp.take_along_axis(v, best[:, None], axis=1)[:, 0]
            cluster = (jnp.abs(keys_flat - bkey[:, None]) <= tol) & (keys_flat < SENTINEL)
            qmin = jnp.min(jnp.where(cluster, rp, big), axis=1)
            qmax = jnp.max(jnp.where(cluster, rp, -big), axis=1)
            tmin = jnp.min(jnp.where(cluster, gp, big), axis=1)
            tmax = jnp.max(jnp.where(cluster, gp, -big), axis=1)
            results.append((bvote, jnp.full_like(bvote, strand_space), qmin, qmax, tmin, tmax))
            v = jnp.where(jnp.abs(keys_flat - bkey[:, None]) <= 2 * tol, -1, v)
    # ONE packed int32 output [R, 6, 2*ncand]: a device->host pull costs a
    # ~33 ms tunnel round trip regardless of size, so six separate field
    # transfers would cost more than the seeding compute
    stack = lambda i: jnp.stack([res[i] for res in results], axis=1)
    return jnp.stack([stack(i) for i in range(6)], axis=1)


def seed_candidates(reads, dev_idx: DeviceIndex, ncand: int = 4, tol: int | None = None):
    """[R, L] padded reads -> top diagonal clusters per strand space.

    tol: diagonal clustering tolerance; long sequences accumulate indel
    drift ~1% of their length, so callers scale it with read length.
    """
    if tol is None:
        tol = max(DIAG_TOL, reads.shape[1] // 32)
    out = _seed_candidates_jit(
        reads, dev_idx.keys, dev_idx.offsets, dev_idx.positions, dev_idx.strands,
        dev_idx.k, ncand, int(tol), dev_idx.w,
        anchor_budget(reads.shape[1], dev_idx.w),
    )
    packed = np.asarray(out)  # single D2H transfer
    names = ("votes", "strand", "qmin", "qmax", "tmin", "tmax")
    return {n: packed[:, i] for i, n in enumerate(names)}
