"""Parity of the native host-path kernels against their Python fallbacks:
parse_paf_blob (one-call PAF -> columnar + packed cigars) and
prep_read_windows (encode + revcomp + slice windows feeding the CIGAR
expansion). The fallbacks are the executable spec; the C paths must be
bit-identical on every field."""
import numpy as np
import pytest

import bossruns_tpu.io.paf as pafmod
from bossruns_tpu.aligner.native import _load
from bossruns_tpu.io.coo_native import (
    _build_packed_runs_numpy,
    _pack_cigar,
    build_packed_runs,
)
from bossruns_tpu.io.paf import PafRecords, _parse_paf_native, parse_paf
from bossruns_tpu.models.layout import build_layout

pytestmark = pytest.mark.skipif(_load() in (None, False), reason="no native lib")

PAF_FIELDS = (
    "qname qlen qstart qend rev tname tlen tstart tend nmatch blocklen "
    "mapq align_score s1 primary"
).split()


PAF_TEXT = (
    # primary with cigar + AS/s1 tags
    "r1\t1000\t10\t990\t+\tcX\t5000\t100\t1080\t900\t980\t60\t"
    "tp:A:P\tAS:i:850\ts1:i:700\tcg:Z:500M10D20I460M\n"
    # reverse strand, no AS tag
    "r2\t800\t0\t800\t-\tcY\t4000\t200\t1000\t780\t800\t50\ttp:A:P\tcg:Z:800M\n"
    # secondary (dropped under primary_only)
    "r2\t800\t0\t800\t+\tcX\t5000\t0\t800\t700\t800\t0\ttp:A:S\tcg:Z:800M\n"
    # short block (dropped when min_len > 60)
    "r3\t60\t0\t60\t+\tcY\t4000\t0\t60\t55\t60\t30\ttp:A:P\tcg:Z:60M\n"
    # no cigar tag at all
    "r4\t500\t5\t495\t+\tcX\t5000\t50\t540\t480\t490\t40\ttp:A:P\tAS:i:400\n"
    # malformed short line is skipped
    "garbage\tline\n"
)


def _python_parse(text, min_len=1, primary_only=True) -> PafRecords:
    orig = pafmod._parse_paf_native
    pafmod._parse_paf_native = lambda *a, **k: None
    try:
        return parse_paf(text, min_len, primary_only)
    finally:
        pafmod._parse_paf_native = orig


def _assert_same(a: PafRecords, b: PafRecords):
    assert len(a) == len(b)
    for f in PAF_FIELDS:
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)
    for i in range(len(a)):
        ca, cb = a.cigars[i], b.cigars[i]
        if cb is None:
            assert ca is None
        else:
            np.testing.assert_array_equal(
                ca, cb if isinstance(cb, np.ndarray) else _pack_cigar(cb),
                err_msg=f"cigar {i}",
            )


@pytest.mark.parametrize("min_len,primary_only", [(1, True), (1, False), (100, True)])
def test_parse_paf_native_matches_python(min_len, primary_only):
    a = _parse_paf_native(PAF_TEXT, min_len, primary_only)
    assert a is not None
    _assert_same(a, _python_parse(PAF_TEXT, min_len, primary_only))


def test_parse_paf_native_empty_and_nonascii():
    assert len(_parse_paf_native("", 1, True)) == 0
    assert _parse_paf_native("ré\t1\t0\t1\t+\tc\t2\t0\t1\t1\t1\t0\n", 1, True) is None


def test_parse_paf_packed_cigar_semantics():
    rec = _parse_paf_native(PAF_TEXT, 1, True)
    cig = rec.cigars[0]
    assert cig.dtype == np.uint32
    lens, ops = cig >> 4, cig & 0xF
    np.testing.assert_array_equal(lens, [500, 10, 20, 460])
    np.testing.assert_array_equal(ops, [0, 2, 1, 0])  # M D I M


def _window_case(rng):
    contigs = {
        "cA": rng.integers(0, 4, 60_000).astype(np.uint8),
        "cB": rng.integers(0, 4, 40_000).astype(np.uint8),
    }
    layout = build_layout(contigs, min_len=1_000)
    n = 40
    qlen = rng.integers(300, 1200, n)
    qs = rng.integers(0, 50, n)
    qe = qlen - rng.integers(0, 50, n)
    rev = rng.integers(0, 2, n).astype(np.int8)
    span = qe - qs  # all-M cigars keep window == target span
    tname = np.array([("cA", "cB")[i % 2] for i in range(n)], object)
    tstart = rng.integers(0, 30_000, n)
    seqs, quals = {}, {}
    rids = np.array([f"r{i}" for i in range(n)], object)
    bases = "ACGTN"
    for i in range(n):
        seqs[rids[i]] = "".join(
            bases[j] for j in rng.integers(0, 5, qlen[i])
        )
        if i % 3 != 0:  # every third read has no quality string
            quals[rids[i]] = "".join(
                chr(33 + q) for q in rng.integers(0, 60, qlen[i])
            )
    rec = PafRecords(
        qname=rids, qlen=qlen.astype(np.int64), qstart=qs.astype(np.int64),
        qend=qe.astype(np.int64), rev=rev,
        tname=tname, tlen=np.full(n, 60_000, np.int64),
        tstart=tstart.astype(np.int64), tend=(tstart + span).astype(np.int64),
        nmatch=span.astype(np.int64), blocklen=span.astype(np.int64),
        mapq=np.full(n, 60, np.int64), align_score=np.zeros(n, np.int64),
        s1=np.zeros(n, np.int64), primary=np.ones(n, np.int8),
        cigars=[np.array([(int(w) << 4) | 0], np.uint32) for w in span],
    )
    return layout, [(rec, list(range(n)), seqs, quals)]


def test_build_packed_runs_native_matches_numpy(rng):
    layout, record_sets = _window_case(rng)
    a = build_packed_runs(layout, record_sets, None)
    b = _build_packed_runs_numpy(layout, record_sets, None)
    for x, y, name in zip(a, b, ["sym", "qual", "rstart", "rspan", "rbc"]):
        np.testing.assert_array_equal(
            x, np.asarray(y, x.dtype), err_msg=name
        )
    assert a[0].shape[0] == int(a[3].sum())


@pytest.mark.parametrize("k", [13, 15])
def test_kmer_scan_native_matches_numpy(rng, k):
    import bossruns_tpu.aligner.native as native_mod
    from bossruns_tpu.aligner import index as ix

    codes = rng.integers(0, 4, 100_000).astype(np.int8)
    codes[rng.integers(0, codes.shape[0], 400)] = 4  # invalid patches
    a = ix._kmer_scan_arrays(codes, k)
    saved = native_mod._lib
    native_mod._lib = False  # force the NumPy spec path
    try:
        b = ix._kmer_scan_arrays(codes, k)
    finally:
        native_mod._lib = saved
    for x, y, name in zip(a, b, ["canonical", "strand", "h", "ok"]):
        np.testing.assert_array_equal(x, np.asarray(y, x.dtype), err_msg=name)


def test_build_index_native_matches_numpy(rng):
    import bossruns_tpu.aligner.native as native_mod
    from bossruns_tpu.aligner import index as ix

    codes = rng.integers(0, 4, 80_000).astype(np.int8)
    valid = np.ones(codes.shape[0], bool)
    valid[5000:5200] = False
    a = ix.build_index(codes.astype(np.uint8), valid)
    saved = native_mod._lib
    native_mod._lib = False
    try:
        b = ix.build_index(codes.astype(np.uint8), valid)
    finally:
        native_mod._lib = saved
    np.testing.assert_array_equal(a.keys, b.keys)
    np.testing.assert_array_equal(a.offsets, b.offsets)
    np.testing.assert_array_equal(a.positions, b.positions)
    np.testing.assert_array_equal(a.strands, b.strands)


def test_build_packed_runs_skips_unknown_contigs(rng):
    layout, record_sets = _window_case(rng)
    rec, rows, seqs, quals = record_sets[0]
    rec.tname[5] = "not_a_contig"
    a = build_packed_runs(layout, [(rec, rows, seqs, quals)], None)
    b = _build_packed_runs_numpy(layout, [(rec, rows, seqs, quals)], None)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, np.asarray(y, x.dtype))


def test_myers_dp_matches_scalar_band_oracle():
    """The production bit-parallel Myers kernel must agree with the
    strict-band 3-pass scalar kernel (kept in the .so as the oracle) on
    cost, and emit internally consistent CIGARs (spans + recomputed cost).
    The Myers band is block-granular/permissive, so cost <= scalar is the
    contract; on well-centred ONT-like jobs it is equal in practice."""
    import ctypes

    from bossruns_tpu.aligner import native

    lib = native._load()
    if not lib:
        import pytest

        pytest.skip("native library unavailable")
    lib.banded_align_batch_scalar.argtypes = lib.banded_align_batch.argtypes
    lib.banded_align_batch_scalar.restype = None

    rng = np.random.default_rng(7)
    target = rng.integers(0, 4, 400_000).astype(np.int8)
    half, err, n = 96, 0.12, 64
    qs, offs, ws_, we_, pads = [], [0], [], [], []
    for _ in range(n):
        m = max(60, int(rng.normal(1500, 500)))
        ts = int(rng.integers(half + 20, target.shape[0] - 2 * m - half - 600))
        q, i = [], ts
        while len(q) < m:
            u = rng.random()
            if u < err / 3:
                i += 1
            elif u < 2 * err / 3:
                q.append(int(rng.integers(0, 4)))
            elif u < err:
                q.append(int((target[i] + 1 + rng.integers(0, 3)) % 4))
                i += 1
            else:
                q.append(int(target[i]))
                i += 1
        qs.append(np.array(q, np.int8))
        offs.append(offs[-1] + len(q))
        ws_.append(ts - half - 16)
        we_.append(ts + len(q) + half + 16)
        pads.append(half + 16)
    q_cat = np.concatenate(qs)
    q_off = np.array(offs, np.int64)
    win_s = np.array(ws_, np.int64)
    win_e = np.array(we_, np.int64)
    pad = np.array(pads, np.int32)
    halfa = np.full(n, half, np.int32)

    def run(fn):
        cost = np.empty(n, np.int32)
        ts = np.empty(n, np.int64)
        te = np.empty(n, np.int64)
        cap = 8192
        cbuf = np.zeros((n, cap), np.uint32)
        clen = np.zeros(n, np.int32)
        c = lambda a: a.ctypes.data_as(ctypes.c_void_p)
        fn(c(q_cat), c(q_off), n, c(target), len(target), c(win_s), c(win_e),
           c(pad), c(halfa), 2, c(cost), c(ts), c(te), c(cbuf), cap, c(clen))
        return cost, ts, te, cbuf, clen

    cm, tsm, tem, cbm, clm = run(lib.banded_align_batch)
    cs, _, _, _, _ = run(lib.banded_align_batch_scalar)
    assert ((cm <= cs) | (cs < 0)).all()
    assert (cm == cs).mean() > 0.95
    for r in range(n):
        assert clm[r] > 0
        cig = cbm[r, : clm[r]][::-1]
        lens = (cig >> 4).astype(np.int64)
        ops = cig & 0xF
        m = int(q_off[r + 1] - q_off[r])
        assert int(lens[ops != 2].sum()) == m  # M+I spans the query
        assert tsm[r] + int(lens[ops != 1].sum()) == tem[r]  # M+D spans target
        ql = q_cat[q_off[r] : q_off[r + 1]]
        i, j, c2 = 0, int(tsm[r]), 0
        for L, o in zip(lens, ops):
            if o == 0:
                sq, st = ql[i : i + L], target[j : j + L]
                c2 += int((~((sq == st) & (sq < 4))).sum())
                i += L
                j += L
            elif o == 1:
                c2 += int(L)
                i += L
            else:
                c2 += int(L)
                j += L
        assert c2 == cm[r]  # CIGAR replays to the reported cost


def test_native_minimizer_mask_matches_scipy():
    """The C monotonic-deque minimizer mask must equal the scipy two-pass
    spec for every window size and edge case."""
    import bossruns_tpu.aligner.native as nm
    from bossruns_tpu.aligner.index import minimizer_mask
    from scipy.ndimage import minimum_filter1d

    rng = np.random.default_rng(5)
    assert nm._load() and hasattr(nm._load(), "minimizer_mask_c")
    for n in (1, 5, 13, 1000, 65537):
        for w in (1, 2, 5, 10, 16):
            h = rng.integers(0, 50, n).astype(np.int32)
            got = minimizer_mask(h, w)
            wmin = minimum_filter1d(h, size=w, mode="nearest", origin=-(w // 2))
            m2 = minimum_filter1d(wmin, size=w, mode="nearest", origin=(w - 1) // 2)
            np.testing.assert_array_equal(got, h == m2, err_msg=f"n={n} w={w}")


def test_native_seed_votes_matches_searchsorted():
    """seed_votes_c (two-pointer over sorted composite keys) == the
    searchsorted spec in host_seed._votes."""
    import ctypes

    import bossruns_tpu.aligner.native as nm

    lib = nm._load()
    assert lib and hasattr(lib, "seed_votes_c")
    lib.seed_votes_c.restype = None
    lib.seed_votes_c.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
    ]
    rng = np.random.default_rng(9)
    for n in (1, 2, 100, 50_000):
        for tol in (0, 1, 25, 500):
            # segment-structured keys like the real composite layout
            seg = np.sort(rng.integers(0, 8, n)).astype(np.int64)
            diag = rng.integers(0, 2000, n).astype(np.int64)
            comp = np.sort((seg << 35) | diag)
            spec = (
                np.searchsorted(comp, comp + tol, side="right")
                - np.searchsorted(comp, comp - tol - 1, side="right")
            ).astype(np.int64)
            got = np.empty(n, np.int64)
            lib.seed_votes_c(
                comp.ctypes.data_as(ctypes.c_void_p), np.int64(n),
                np.int64(tol), got.ctypes.data_as(ctypes.c_void_p),
            )
            np.testing.assert_array_equal(got, spec, err_msg=f"n={n} tol={tol}")


def test_native_peel_mask_matches_diff_array():
    """peel_mask_c == the numpy difference-array spec, overlapping and
    clipped ranges included."""
    import ctypes

    import bossruns_tpu.aligner.native as nm

    lib = nm._load()
    assert lib and hasattr(lib, "peel_mask_c")
    lib.peel_mask_c.restype = None
    lib.peel_mask_c.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
    ]
    rng = np.random.default_rng(13)
    for n, m in ((10, 3), (1000, 40), (100_000, 500)):
        votes = rng.integers(0, 50, n).astype(np.int64)
        lo = rng.integers(0, n, m).astype(np.int64)
        hi = np.minimum(lo + rng.integers(0, n // 2, m), n).astype(np.int64)
        spec = votes.copy()
        mark = np.zeros(n + 1, np.int32)
        np.add.at(mark, lo, 1)
        np.add.at(mark, hi, -1)
        spec[np.cumsum(mark[:n]) > 0] = -1
        got = votes.copy()
        lib.peel_mask_c(
            got.ctypes.data_as(ctypes.c_void_p), np.int64(n),
            lo.ctypes.data_as(ctypes.c_void_p),
            hi.ctypes.data_as(ctypes.c_void_p), np.int64(m),
        )
        np.testing.assert_array_equal(got, spec, err_msg=f"n={n} m={m}")


def test_native_interval_minmax_matches_spec():
    """interval_minmax_c == host_seed's reduceat spec (incl. empty
    intervals and hi == len(vals))."""
    import ctypes

    import bossruns_tpu.aligner.native as nm
    from bossruns_tpu.aligner import host_seed as hs

    lib = nm._load()
    assert lib and hasattr(lib, "interval_minmax_c")
    rng = np.random.default_rng(21)
    for n, m in ((5, 4), (1000, 64), (200_000, 900)):
        vals = rng.integers(-(10**6), 10**6, n).astype(np.int64)
        lo = rng.integers(0, n, m).astype(np.int64)
        hi = np.minimum(lo + rng.integers(0, 200, m), n).astype(np.int64)
        lo[0] = hi[0] = 0  # empty interval
        hi[-1] = n         # touches the end
        lo[-1] = max(0, n - 50)
        empty = np.int64(1) << 33
        # numpy spec (the pre-native body of _interval_minmax)
        mn = np.full(m, empty, np.int64)
        mx = np.full(m, -empty, np.int64)
        ok = hi > lo
        li, hi_i = lo[ok], hi[ok]
        idx = np.empty(2 * li.shape[0], np.int64)
        idx[0::2] = li
        idx[1::2] = np.minimum(hi_i, n - 1)
        mn[ok] = np.minimum(np.minimum.reduceat(vals, idx)[0::2], vals[hi_i - 1])
        mx[ok] = np.maximum(np.maximum.reduceat(vals, idx)[0::2], vals[hi_i - 1])
        got_mn, got_mx = hs._interval_minmax(vals, lo, hi, empty)
        np.testing.assert_array_equal(got_mn, mn, err_msg=f"n={n} m={m}")
        np.testing.assert_array_equal(got_mx, mx, err_msg=f"n={n} m={m}")


def test_native_bucket_votes_matches_numpy_spec():
    """seed_votes_bucket_c (one O(n) run-length pass per staggered grid) ==
    the numpy run-length spec in host_seed._votes, negative diagonals and
    segment boundaries included."""
    import ctypes

    import bossruns_tpu.aligner.native as nm

    lib = nm._load()
    assert lib and hasattr(lib, "seed_votes_bucket_c")
    lib.seed_votes_bucket_c.restype = None
    lib.seed_votes_bucket_c.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_void_p,
    ]
    rng = np.random.default_rng(12)

    def spec(seg, diag, tol):
        width = 2 * tol

        def run_counts(b):
            newrun = np.empty(b.shape[0], bool)
            newrun[0] = True
            np.not_equal(b[1:], b[:-1], out=newrun[1:])
            starts = np.flatnonzero(newrun)
            lens = np.diff(np.append(starts, b.shape[0]))
            return np.repeat(lens, lens)

        m = np.int64(1) << 40
        return np.maximum(run_counts(seg * m + diag // width),
                          run_counts(seg * m + (diag + tol) // width))

    for n in (1, 2, 100, 50_000):
        for tol in (1, 25, 256, 4096):
            seg = np.sort(rng.integers(0, 8, n)).astype(np.int64)
            diag = rng.integers(-30_000, 30_000, n).astype(np.int64)
            order = np.lexsort((diag, seg))
            seg, diag = seg[order], diag[order]
            got = np.zeros(n, np.int64)
            c = lambda a: a.ctypes.data_as(ctypes.c_void_p)
            lib.seed_votes_bucket_c(c(seg), c(diag), np.int64(n),
                                    np.int64(tol), c(got))
            np.testing.assert_array_equal(got, spec(seg, diag, tol),
                                          err_msg=f"n={n} tol={tol}")


def test_threaded_scans_match_sequential():
    """kmer_scan_mt / minimizer_mask_mt must equal the sequential kernels
    bit for bit at every thread count, including chunk-boundary-heavy sizes
    and invalid-base runs straddling chunks."""
    import ctypes

    import bossruns_tpu.aligner.native as nm

    lib = nm._load()
    assert lib and hasattr(lib, "kmer_scan_mt") and hasattr(lib, "minimizer_mask_mt")
    lib.kmer_scan.restype = lib.kmer_scan_mt.restype = None
    lib.kmer_scan.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.kmer_scan_mt.argtypes = lib.kmer_scan.argtypes + [ctypes.c_int32]
    lib.minimizer_mask_c.restype = lib.minimizer_mask_mt.restype = None
    lib.minimizer_mask_c.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p]
    lib.minimizer_mask_mt.argtypes = lib.minimizer_mask_c.argtypes + [ctypes.c_int32]
    c = lambda a: a.ctypes.data_as(ctypes.c_void_p)
    rng = np.random.default_rng(77)
    for n_codes in (40, 1000, 100_003):
        for k in (13, 15):
            codes = rng.integers(0, 4, n_codes).astype(np.int8)
            bad = rng.random(n_codes) < 0.01
            codes[bad] = 4
            n = n_codes - k + 1
            ref = [np.empty(n, np.int64), np.empty(n, np.int8),
                   np.empty(n, np.int32), np.empty(n, np.int8)]
            lib.kmer_scan(c(codes), np.int64(n_codes), np.int32(k),
                          *[c(a) for a in ref])
            for nt in (1, 2, 3, 7):
                got = [np.empty(n, np.int64), np.empty(n, np.int8),
                       np.empty(n, np.int32), np.empty(n, np.int8)]
                lib.kmer_scan_mt(c(codes), np.int64(n_codes), np.int32(k),
                                 *[c(a) for a in got], np.int32(nt))
                for a, b in zip(got, ref):
                    np.testing.assert_array_equal(a, b, err_msg=f"{n_codes},{k},{nt}")
            for w in (5, 10):
                h = ref[2]
                mref = np.empty(n, np.int8)
                lib.minimizer_mask_c(c(h), np.int64(n), np.int32(w), c(mref))
                for nt in (1, 2, 3, 7):
                    mgot = np.empty(n, np.int8)
                    lib.minimizer_mask_mt(c(h), np.int64(n), np.int32(w),
                                          c(mgot), np.int32(nt))
                    np.testing.assert_array_equal(mgot, mref,
                                                  err_msg=f"{n_codes},{k},{w},{nt}")
