"""The per-sequence memoised pool-index build (aligner/index.py::
build_index_cached, used by aeons.ava.PoolIndex every batch) must be
bit-identical to scanning the real gap-padded concatenation with
build_index — the memo is a pure perf optimisation."""
import numpy as np

from bossruns_tpu.aeons.ava import GAP, PoolIndex
from bossruns_tpu.aligner import encode
from bossruns_tpu.aligner.index import (
    _SEQ_SCAN_CACHE,
    _digest,
    build_index,
    build_index_cached,
    scan_seq_minimizers,
)

BASES = np.array(list("ACGT"))


def _random_pool(rng, n=12, lo=60, hi=5000, with_n=True):
    seqs = {}
    for i in range(n):
        L = int(rng.integers(lo, hi))
        s = "".join(BASES[rng.integers(0, 4, L)])
        if with_n and L > 100 and i % 3 == 0:
            # inject ambiguous bases (encode -> 4): gap-equivalence must
            # hold around invalid codes inside sequences too
            p = int(rng.integers(10, L - 20))
            s = s[:p] + "NNN" + s[p + 3 :]
        seqs[f"s{i}"] = s
    return seqs


def _concat_index(seqs, k, w, max_occ):
    enc = [encode(s) for s in seqs.values()]
    lengths = np.array([e.shape[0] for e in enc], np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths + GAP)[:-1]]).astype(np.int64)
    total = int((lengths + GAP).sum())
    concat = np.full(total, 4, np.int8)
    for s0, e in zip(starts, enc):
        concat[s0 : s0 + e.shape[0]] = e
    valid = concat < 4
    return build_index(
        np.where(valid, concat, 0).astype(np.uint8), valid, k=k, w=w, max_occ=max_occ
    ), starts


def test_cached_build_matches_concat_scan():
    rng = np.random.default_rng(7)
    for k, w, max_occ in ((15, 10, 32), (13, 5, 64)):
        seqs = _random_pool(rng)
        ref, starts = _concat_index(seqs, k, w, max_occ)
        got = build_index_cached(list(seqs.values()), starts, k=k, w=w, max_occ=max_occ)
        np.testing.assert_array_equal(got.keys, ref.keys)
        np.testing.assert_array_equal(got.offsets, ref.offsets)
        np.testing.assert_array_equal(got.positions, ref.positions)
        np.testing.assert_array_equal(got.strands, ref.strands)


def test_cached_build_with_repeats_and_short_seqs():
    rng = np.random.default_rng(11)
    core = "".join(BASES[rng.integers(0, 4, 800)])
    seqs = {
        "dup1": core, "dup2": core,  # identical seqs share one memo entry
        "tiny": "ACGTACGTAC",        # < k: contributes no minimizers
        "rc": core[::-1].translate(str.maketrans("ACGT", "TGCA")),
    }
    ref, starts = _concat_index(seqs, 15, 10, 8)
    got = build_index_cached(list(seqs.values()), starts, k=15, w=10, max_occ=8)
    np.testing.assert_array_equal(got.keys, ref.keys)
    np.testing.assert_array_equal(got.positions, ref.positions)
    np.testing.assert_array_equal(got.strands, ref.strands)


def test_poolindex_memo_hits_across_rebuilds():
    rng = np.random.default_rng(3)
    seqs = _random_pool(rng, n=6, with_n=False)
    _SEQ_SCAN_CACHE.clear()
    PoolIndex(seqs)
    n_after_first = len(_SEQ_SCAN_CACHE)
    assert n_after_first == len(seqs)
    # rebuilding with one extra sequence re-scans only the new one
    seqs2 = dict(seqs, extra="".join(BASES[rng.integers(0, 4, 900)]))
    PoolIndex(seqs2)
    assert len(_SEQ_SCAN_CACHE) == n_after_first + 1


def test_layout_build_matches_full_scan():
    """build_index_layout (per-contig memoised, used by aligners with
    source=None) == build_index over the padded concatenation — including
    N bases, which the layout maps to base 0 with site_valid True
    (reference _seq2int semantics), unlike encode()."""
    from bossruns_tpu.aligner.index import build_index_layout
    from bossruns_tpu.models.layout import build_layout

    rng = np.random.default_rng(17)
    contigs = {}
    for i in range(4):
        L = int(rng.integers(2_000, 150_000))
        s = "".join(BASES[rng.integers(0, 4, L)])
        if i % 2 == 0:
            p = L // 3
            s = s[:p] + "NN" + s[p + 2 :]
        contigs[f"c{i}"] = s
    layout = build_layout(contigs, min_len=500)
    for k, w, occ in ((15, 10, 64), (13, 5, 32)):
        ref = build_index(layout.seq_int, layout.site_valid(), k=k, w=w, max_occ=occ)
        got = build_index_layout(layout, k=k, w=w, max_occ=occ)
        got2 = build_index_layout(layout, k=k, w=w, max_occ=occ)  # memo-hit pass
        for a in ("keys", "offsets", "positions", "strands"):
            np.testing.assert_array_equal(getattr(got, a), getattr(ref, a))
            np.testing.assert_array_equal(getattr(got2, a), getattr(ref, a))


def test_find_overlaps_pre_scan_reuse_identical():
    """find_overlaps' memo-scan reuse for queries (host path) must produce
    exactly the rows of the from-scratch query scan."""
    from bossruns_tpu.aeons.ava import find_overlaps

    rng = np.random.default_rng(23)
    pool = _random_pool(rng, n=30, lo=3000, hi=9000, with_n=False)
    new = {f"n{i}": s for i, s in enumerate(list(_random_pool(
        rng, n=10, lo=3000, hi=9000, with_n=False).values()))}
    # warm path: queries are members of the indexed pool (the ingest_ava
    # shape) so their scans are memoised by the index build
    _SEQ_SCAN_CACHE.clear()
    pidx_warm = PoolIndex(dict(pool, **new))
    rows_warm = find_overlaps(new, pidx_warm, host=True)
    # cold path: force memo misses for the queries -> batch-scan fallback
    _SEQ_SCAN_CACHE.clear()
    pidx_cold = PoolIndex(dict(pool, **new))
    evicted = 0
    for q in new.values():  # evict ONLY the query entries
        evicted += _SEQ_SCAN_CACHE.pop(
            (_digest(q.encode()), len(q), 15, 10), None) is not None
    assert evicted == len(new)  # the memo keys find_overlaps uses are live
    rows_cold = find_overlaps(new, pidx_cold, host=True)
    assert rows_warm.keys() == rows_cold.keys()
    for f in rows_warm:
        assert rows_warm[f] == rows_cold[f], f"field {f} differs"


def test_scan_memo_returns_same_arrays():
    s = "".join(BASES[np.random.default_rng(0).integers(0, 4, 500)])
    a = scan_seq_minimizers(s)
    b = scan_seq_minimizers(s)
    assert a[0] is b[0] and a[1] is b[1]
