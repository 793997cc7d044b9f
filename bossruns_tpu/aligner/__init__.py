"""TPU-native read-to-reference aligner (mappy/minimap2 replacement).

Pipeline per batch:
  host encode -> device minimizer seeding + diagonal voting (seed.py, jitted)
  -> native banded-DP extension with CIGAR traceback (native/banded_align.cpp)
  -> PafRecords compatible with the rest of the data plane.

Replaces the reference's Mapper.map_sequences (boss/mapper.py:52-65): same
facade contract ({read_id: seq} -> alignment records, optional mu-truncation
for AEONS sims, min alignment length mu/2), but batched on device instead of
per-read C calls under a thread pool.

Parity note (SURVEY.md §7.6): exact minimap2 output equality is not a goal —
decision-level parity (same locus/strand, CIGAR-accurate coverage) is. Like
the reference's Mapper (which keeps every minimap2 record per read,
boss/mapper.py:52-65), reads can yield MULTIPLE alignments: the top voted
diagonal clusters are DP-extended; split (chimeric) reads produce several
primary records over disjoint query spans, repeat copies produce secondary
records. map_sequences drops secondaries by default — matching the
reference's primary-only parse (boss/paf.py:652-672) — while the live
mapper plugin keeps them so multi_on/multi_off decisions stay reachable
(boss/dynamic_readfish.py:229-247). mapq encodes uniqueness of a record's
diagonal cluster against competing clusters over the same query span.
"""
from __future__ import annotations

import logging

import numpy as np

from ..io.paf import PafRecords
from ..models.layout import GenomeLayout
from . import native
from .index import (K, MinimizerIndex, W, build_index, build_index_layout,
                    load_or_build_index)
from .seed import NCAND, SEED_FIELDS, DeviceIndex, seed_and_vote

logger = logging.getLogger("boss_tpu")

_ENC = np.full(256, 4, dtype=np.int8)
for _i, _b in enumerate(b"ACGT"):
    _ENC[_b] = _i
    _ENC[_b + 32] = _i
_RC = np.array([3, 2, 1, 0, 4], dtype=np.int8)

LENGTH_BUCKETS = (512, 1024, 2048, 4096, 8192, 16384, 32768)

#: fixed read-row count per length bucket (the big tier). Seeding shapes are
#: (rows, L) and every distinct shape costs a full remote XLA compile
#: (~60-80 s on the tunneled axon toolchain) — pow2-of-group-size rows made
#: the shape universe depend on each corpus's read-length mix, so every new
#: workload recompiled. Three tiers per bucket (64-row small tier for tiny
#: calls, big//8 mid tier for few-hundred-read batches — AEONS decisions and
#: live chunk batches — this big tier otherwise, groups chunked at the big
#: tier) bound the universe at ~19 distinct shapes (the 32768 bucket's
#: tiers collapse into the small tier), all persistent-cache-stable across
#: runs. The big tier is sized for ~2M read positions per call so one call's
#: seeding stays a few hundred ms while batches of thousands of reads need
#: only a handful of pipelined dispatches; the mid tier keeps a 500-read
#: truncated batch from paying 8x row padding.
BUCKET_ROWS = {512: 4096, 1024: 2048, 2048: 1024, 4096: 512,
               8192: 256, 16384: 128, 32768: 64}
SMALL_ROWS = 64


def tier_rows(n: int, L: int) -> int:
    """Smallest row tier that fits n reads of bucket L."""
    big = BUCKET_ROWS[L]
    mid = max(SMALL_ROWS, big // 8)
    if n <= SMALL_ROWS:
        return SMALL_ROWS
    if n <= mid:
        return mid
    return big

#: overlapping-span competitor candidates are DP-extended (and may be emitted
#: as secondary records) only at >= this vote ratio vs the best candidate
#: (minimap2's pri_ratio analogue); disjoint-span (split-read) candidates
#: bypass the ratio — each segment is its own primary.
SECONDARY_RATIO = 0.5
#: max alignment records attempted per read
MAX_ALIGNS = NCAND
#: minimum query-span overlap fraction for two candidates to count as
#: alternatives of each other (vs segments of a split read)
OVERLAP_FRAC = 0.5


def encode(seq: str) -> np.ndarray:
    return _ENC[np.frombuffer(seq.encode(), dtype=np.uint8)]


def make_aligner(layout: "GenomeLayout", backend: str = "auto",
                 host_max_sites: int = 512_000_000, **kw):
    """Production aligner factory: host or device seeding by measured fit.

    backend: 'auto' | 'host' | 'device' (env BOSS_ALIGNER_BACKEND overrides).
    Both backends emit byte-identical records (tests/test_host_seed.py) —
    the choice is pure performance. Measured on this TPU (docs/DESIGN.md):
    vectorised host seeding wins the mu=400 decision pass at BOTH 8 Mb and
    134 Mb genomes on an idle host (the device's bitonic vote sorts are
    element-throughput-bound), while the device path holds its throughput
    when host cores are loaded — the regime of a live deployment running a
    basecaller — and keeps the index off the host entirely. 'auto' picks
    host up to host_max_sites and device beyond (index memory/bandwidth on
    the host grows past the device's at that point).
    """
    import os

    backend = os.environ.get("BOSS_ALIGNER_BACKEND", backend)
    if backend == "device":
        return TpuAligner(layout, **kw)
    if backend == "host" or int(layout.lengths.sum()) <= host_max_sites:
        from .cpu_baseline import CpuAligner

        # threads at the core count, capped at 16: measured throughput is
        # flat from cores-1 to cores+2 on a 4-core host while a fixed 8
        # loses ~15% to oversubscription; the GIL-bound record-assembly
        # section means very wide pools (64-128 cores) can regress, so cap
        # until measured on a many-core host (ADVICE r4)
        kw.setdefault("threads", max(2, min(os.cpu_count() or 4, 16)))
        return CpuAligner(layout, **kw)
    return TpuAligner(layout, **kw)


def _overlap_frac(a: tuple[int, int], b: tuple[int, int]) -> float:
    """Overlap of two query intervals as a fraction of the shorter one."""
    inter = min(a[1], b[1]) - max(a[0], b[0])
    if inter <= 0:
        return 0.0
    return inter / max(1, min(a[1] - a[0], b[1] - b[0]))


class TpuAligner:
    def __init__(
        self,
        layout: GenomeLayout,
        k: int = K,
        w: int = W,
        max_occ: int = 64,
        min_votes: int = 4,
        max_divergence: float = 0.35,
        mu: int = 400,
        threads: int = 8,
        source: str | None = None,
    ):
        """source: path of the fasta the layout came from — enables the
        on-disk index cache (the reference's .mmi analogue)."""
        self.layout = layout
        self.mu = mu
        self.min_votes = min_votes
        self.max_divergence = max_divergence
        self.threads = threads
        self.target = np.where(layout.site_valid(), layout.seq_int, 4).astype(np.int8)
        logger.info("building minimizer index")
        # in-memory layouts (source=None, e.g. AEONS decision contigs) build
        # from per-contig memoised scans: only changed contigs re-scan
        self.index: MinimizerIndex = (
            build_index_layout(layout, k=k, w=w, max_occ=max_occ)
            if source is None
            else load_or_build_index(
                layout.seq_int, layout.site_valid(), source, k=k, w=w, max_occ=max_occ
            )
        )
        self.dev_index = DeviceIndex(self.index)
        logger.info(f"index: {self.index.n_minimizers} minimizers, "
                    f"{self.index.keys.shape[0]} distinct k-mers")
        # host tables for coordinate translation
        self._block_starts = layout.offsets.astype(np.int64)
        self._block_ends = (layout.offsets + layout.lengths).astype(np.int64)

    def load_index(self, fasta: str) -> None:
        """Rebuild the index from a new fasta (AEONS contig hot-swap —
        the readfish side calls this when contigs/aeons.fa changes,
        dynamic_readfish.py:113-139)."""
        from ..models.layout import build_layout
        from ..models.runs_sim import load_reference_contigs

        layout = build_layout(load_reference_contigs(fasta), min_len=500)
        self.__init__(
            layout,
            k=self.index.k,
            w=self.index.w,
            min_votes=self.min_votes,
            max_divergence=self.max_divergence,
            mu=self.mu,
            threads=self.threads,
        )

    # ----------------------------------------------------------- seeding ----

    def _seed_bucket_dispatch(self, enc_reads: list[np.ndarray]):
        """Dispatch the seeding kernel for one bucket WITHOUT pulling the
        result: jit dispatch is async, so several buckets' kernels queue on
        the device while the host runs banded DP on earlier buckets
        (map_sequences pipelines pull->jobs->DP per bucket)."""
        from .seed import _seed_topn_jit, anchor_budget, pack_reads

        lens = np.array([e.shape[0] for e in enc_reads], np.int32)
        L = 0
        for b in LENGTH_BUCKETS:
            if lens.max(initial=0) <= b:
                L = b
                break
        L = L or LENGTH_BUCKETS[-1]
        # fixed row tiers per bucket (see tier_rows): the caller chunks
        # groups at BUCKET_ROWS[L], so len(enc_reads) always fits
        rows = tier_rows(len(enc_reads), L)
        assert len(enc_reads) <= rows, (len(enc_reads), rows, L)
        mat = np.full((rows, L), 4, np.int8)
        for r, e in enumerate(enc_reads):
            mat[r, : min(e.shape[0], L)] = e[:L]
        di = self.dev_index
        return _seed_topn_jit(
            pack_reads(mat), di.keys, di.pos_packed,
            di.k, di.w, anchor_budget(L, di.w), L, NCAND,
        )

    @staticmethod
    def _pull_seeds(out_dev, n: int):
        """Block on one bucket's kernel and unpack its
        [len(SEED_FIELDS) * NCAND, rows] result to field -> [n, NCAND]."""
        packed = np.asarray(out_dev)
        nf = len(SEED_FIELDS)
        return {
            f: np.stack([packed[c * nf + i][:n] for c in range(NCAND)], axis=1)
            for i, f in enumerate(SEED_FIELDS)
        }

    def _seed_bucket(self, enc_reads: list[np.ndarray]):
        return self._pull_seeds(self._seed_bucket_dispatch(enc_reads), len(enc_reads))

    # ----------------------------------------------------------- mapping ----

    def map_sequences(self, sequences: dict[str, str], trunc: bool = False,
                      min_len: int | None = None,
                      all_records: bool = False) -> PafRecords:
        """Align a batch; returns records with target-forward CIGARs.

        trunc: align only the first mu bases (AEONS sim truncation,
        mapper.py:60-62). min_len: drop alignments spanning less target than
        this (defaults to mu/2 like mapper.py:64). all_records: keep
        secondary alignments (primary flag 0) — by default they are dropped,
        matching the reference's primary-only PAF parse (boss/paf.py:652-672);
        split-read segments are primary and always kept.
        """
        min_len = int(self.mu / 2) if min_len is None else min_len
        rids = list(sequences)
        if not rids:
            return _empty_records()
        enc = [encode(sequences[r][: self.mu] if trunc else sequences[r]) for r in rids]
        # bucket by length to bound padded shapes. Dispatch EVERY bucket's
        # seeding kernel up front (async jit dispatch — they queue on the
        # device), then pull/extend per bucket: the host's banded DP on
        # bucket i overlaps the device seeding of buckets i+1.. .
        order = np.argsort([e.shape[0] for e in enc], kind="stable")
        pend = []
        i = 0
        while i < len(order):
            j = i
            Lmax = None
            group = []
            while j < len(order):
                ln = enc[order[j]].shape[0]
                b = next((x for x in LENGTH_BUCKETS if ln <= x), LENGTH_BUCKETS[-1])
                if Lmax is None:
                    Lmax = b
                if b != Lmax or len(group) >= BUCKET_ROWS[Lmax]:
                    break
                group.append(order[j])
                j += 1
            pend.append((group, self._seed_bucket_dispatch([enc[g] for g in group])))
            i = j

        rows = {k: [] for k in (
            "qname qlen qstart qend rev tname tlen tstart tend nmatch blocklen mapq "
            "align_score s1 primary".split()
        )}
        cigs = []
        for group, out_dev in pend:
            seeds = self._pull_seeds(out_dev, len(group))
            results = {
                g: {k: v[slot] for k, v in seeds.items()}
                for slot, g in enumerate(group)
            }
            self._extend_bucket(rids, enc, results, min_len, rows, cigs,
                                all_records)

        return PafRecords(
            qname=np.array(rows["qname"], dtype=object),
            qlen=np.array(rows["qlen"], dtype=np.int64),
            qstart=np.array(rows["qstart"], dtype=np.int64),
            qend=np.array(rows["qend"], dtype=np.int64),
            rev=np.array(rows["rev"], dtype=np.int8),
            tname=np.array(rows["tname"], dtype=object),
            tlen=np.array(rows["tlen"], dtype=np.int64),
            tstart=np.array(rows["tstart"], dtype=np.int64),
            tend=np.array(rows["tend"], dtype=np.int64),
            nmatch=np.array(rows["nmatch"], dtype=np.int64),
            blocklen=np.array(rows["blocklen"], dtype=np.int64),
            mapq=np.array(rows["mapq"], dtype=np.int64),
            align_score=np.array(rows["align_score"], dtype=np.int64),
            s1=np.array(rows["s1"], dtype=np.int64),
            primary=np.array(rows["primary"], dtype=np.int8),
            cigars=cigs,
        )

    def _candidate_plan(self, seeds: dict, mlen: np.ndarray, min_len: int):
        """Vectorised candidate selection + query windows + mapq for a whole
        bucket: all [n, NCAND] numpy (the former per-read scalar loops cost
        ~40% of a 4000-read truncated batch in Python int() extraction).

        Semantics (unchanged from the scalar form):
        - candidate 0 qualifies if voted enough; later candidates qualify as
          split-read segments (disjoint query span — each its own primary) or
          as repeat alternatives at >= SECONDARY_RATIO of the best vote count
          (minimap2's pri_ratio analogue). Peel order is descending votes, so
          a candidate only competes with LOWER-indexed ones.
        - query windows: a lone candidate (or overlapping alternatives)
          extends the FULL read — seed spans undershoot the true alignment by
          hundreds of bases at ONT error rates. Only >=2 DISJOINT qualifying
          candidates partition the query, at the midpoints between adjacent
          seed spans (a full-read band cannot absorb a multi-kb soft clip).
        - mapq: uniqueness vs the best OTHER voted cluster over >=
          OVERLAP_FRAC of the same query span; split segments do not lower
          each other's mapq (minimap2's per-chain mapq).

        Returns dict of [n, NCAND] arrays: use, qs, qe, half, ts_pred, ws,
        we, mapq (mapq for ALL voted candidates, use/windows for selected).
        """
        k = self.index.k
        votes = seeds["votes"].astype(np.int64)        # [n, C]
        n, C = votes.shape
        span_lo = seeds["qmin"].astype(np.int64)
        span_hi = np.minimum(mlen[:, None], seeds["qmax"].astype(np.int64) + k)
        voted = votes >= self.min_votes
        # peel emits descending votes; a sentinel row after the first
        # below-threshold candidate never qualifies (matches the loop break)
        voted &= np.cumprod(voted, axis=1).astype(bool)

        # pairwise overlap fraction of seed spans [n, C, C]
        inter = (np.minimum(span_hi[:, :, None], span_hi[:, None, :])
                 - np.maximum(span_lo[:, :, None], span_lo[:, None, :]))
        shorter = np.maximum(
            1, np.minimum((span_hi - span_lo)[:, :, None],
                          (span_hi - span_lo)[:, None, :])
        )
        ovl = np.maximum(inter, 0) / shorter >= OVERLAP_FRAC  # [n, C, C]

        # qualification, in candidate order: c competes against SELECTED
        # lower candidates. Selection of c depends only on earlier columns,
        # so resolve the C columns sequentially (C=4 — four numpy passes).
        use = np.zeros((n, C), bool)
        use[:, 0] = voted[:, 0]
        ratio_ok = votes >= SECONDARY_RATIO * votes[:, :1]
        for c in range(1, C):
            prev_ov = (ovl[:, c, :c] & use[:, :c]).any(axis=1)
            use[:, c] = voted[:, c] & (~prev_ov | ratio_ok[:, c])
        # MAX_ALIGNS cap (= NCAND; guard stays for smaller caps)
        if MAX_ALIGNS < C:
            use &= np.cumsum(use, axis=1) <= MAX_ALIGNS

        # query windows: midpoint cuts toward DISJOINT qualifying siblings
        ctr = span_lo + span_hi
        disj = use[:, :, None] & use[:, None, :] & ~ovl
        np.einsum("ncc->nc", disj)[:] = False  # no self-pairing
        left_sib = disj & (ctr[:, None, :] < ctr[:, :, None])   # sibling c2 left of c
        right_sib = disj & ~(ctr[:, None, :] < ctr[:, :, None])
        right_sib &= disj  # keep only real siblings
        # qs = max over left siblings of min(span_lo_c, (span_hi_2+span_lo_c)//2)
        cut_l = np.minimum(span_lo[:, :, None],
                           (span_hi[:, None, :] + span_lo[:, :, None]) // 2)
        qs = np.max(np.where(left_sib, cut_l, 0), axis=2)
        cut_r = np.maximum(span_hi[:, :, None],
                           (span_hi[:, :, None] + span_lo[:, None, :]) // 2)
        qe = np.min(np.where(right_sib, cut_r, mlen[:, None, None]), axis=2)
        slen = qe - qs
        # overhang eligibility counts the pre-slen-filter selection (the
        # scalar form sized bands against every sibling in the list, even
        # one later dropped for a short window)
        multi = use.sum(axis=1) > 1
        use = use & (slen >= 50)

        # band: observed indel drift + margin (+ window overhang past the
        # seeds for split segments, so a junction flank can soft-clip)
        overhang = np.where(
            multi[:, None] & ((qs > 0) | (qe < mlen[:, None])),
            np.maximum(np.maximum(span_lo - qs, qe - span_hi), 0), 0,
        )
        dspan = seeds["dspan"].astype(np.int64)
        half = np.clip(dspan // 2 + 48 + (slen * 0.005).astype(np.int64)
                       + overhang, 64, 1024).astype(np.int64)

        # diagonal -> predicted target start; clamp to the contig block
        strand = seeds["strand"].astype(np.int64)
        bkey = seeds["bkey"].astype(np.int64)
        ts_pred = np.where(strand == 0, bkey + qs, bkey - qe + k)
        cid = np.searchsorted(self._block_starts, np.maximum(ts_pred, 0),
                              side="right") - 1
        cid = np.clip(cid, 0, len(self.layout.names) - 1)
        ws = np.maximum(self._block_starts[cid], ts_pred - half - 16)
        we = np.minimum(self._block_ends[cid], ts_pred + slen + half + 16)
        use &= (we - ws) >= min_len

        # mapq for every voted candidate: best competing vote over the span
        comp = ovl & (votes > 0)[:, None, :]
        np.einsum("ncc->nc", comp)[:] = False
        second = np.max(np.where(comp, votes[:, None, :], 0), axis=2)
        uniq = 1.0 - np.minimum(1.0, second / np.maximum(1, votes))
        mapq = np.where(votes >= 2 * self.min_votes,
                        np.minimum(60, 60 * uniq), 30 * uniq).astype(np.int64)
        return dict(use=use, qs=qs, qe=qe, half=half, ts_pred=ts_pred,
                    ws=ws, we=we, mapq=mapq)

    def _extend_bucket(self, rids, enc, results, min_len, rows, cigs,
                       all_records: bool = False) -> None:
        """Banded-DP extension + record assembly for one bucket's seeds
        (host work — runs while later buckets' seeding kernels execute on
        the device)."""
        group = list(results)
        if not group:
            return
        seeds = {
            f: np.stack([results[g][f] for g in group])
            for f in SEED_FIELDS
        }  # [n, NCAND]
        mlen = np.array([enc[g].shape[0] for g in group], np.int64)
        plan = self._candidate_plan(seeds, mlen, min_len)
        use = plan["use"] & (mlen >= 50)[:, None]
        jobs = []
        for r, c in zip(*np.nonzero(use)):
            g = group[r]
            qs, qe = int(plan["qs"][r, c]), int(plan["qe"][r, c])
            seg = enc[g][qs:qe]
            if seeds["strand"][r, c]:
                seg = _RC[np.minimum(seg, 4)][::-1].copy()
            ws, we = int(plan["ws"][r, c]), int(plan["we"][r, c])
            ts_pred = int(plan["ts_pred"][r, c])
            jobs.append((g, int(c), seg, ws, we, max(0, ts_pred - ws),
                         int(plan["half"][r, c]), qs, qe))
        mapq_of = {(group[r], c): int(plan["mapq"][r, c])
                   for r, c in zip(*np.nonzero(seeds["votes"] > 0))}
        if not jobs:
            return

        q_cat = np.concatenate([j[2] for j in jobs]).astype(np.int8)
        q_off = np.concatenate([[0], np.cumsum([j[2].shape[0] for j in jobs])]).astype(np.int64)
        win_s = np.array([j[3] for j in jobs], np.int64)
        win_e = np.array([j[4] for j in jobs], np.int64)
        pad = np.array([j[5] for j in jobs], np.int32)
        half = np.array([j[6] for j in jobs], np.int32)
        cost, tstart, tend, cigars = native.align_batch(
            q_cat, q_off, self.target, win_s, win_e, pad, half, self.threads
        )

        per_read: dict[int, list[dict]] = {}
        for jix, (g, c, seg, _ws, _we, _pad, _half, qs, qe) in enumerate(jobs):
            if cost[jix] < 0 or cigars[jix].size == 0:
                continue
            slen = seg.shape[0]
            if cost[jix] / slen > self.max_divergence:
                continue
            cig = cigars[jix]  # packed uint32, forward order
            lens_a = (cig >> 4).astype(np.int64)
            ops_a = cig & 0xF
            # strip leading/trailing insertions (query-only) into soft clips;
            # traceback merges runs, so each end has at most one I run
            s_al = 0
            lo, hi = 0, cig.size
            if ops_a[0] == 1:
                s_al = int(lens_a[0])
                lo = 1
            e_clip = 0
            if hi > lo and ops_a[hi - 1] == 1:
                e_clip = int(lens_a[hi - 1])
                hi -= 1
            if hi <= lo:
                continue
            cig, lens_a, ops_a = cig[lo:hi], lens_a[lo:hi], ops_a[lo:hi]
            ts, te = int(tstart[jix]), int(tend[jix])
            if te - ts < min_len:
                continue
            cid = int(np.searchsorted(self._block_starts, ts, side="right") - 1)
            if cid < 0 or ts >= self._block_ends[cid] or te > self._block_ends[cid]:
                continue  # crosses padding => bogus candidate
            is_m = ops_a == 0
            is_i = ops_a == 1
            n_m = int(lens_a[is_m].sum())
            n_i = int(lens_a[is_i].sum())
            n_d = int(lens_a[~(is_m | is_i)].sum())
            mism = int(cost[jix]) - (n_i + n_d + s_al + e_clip)
            nmatch = max(0, n_m - max(0, mism))
            rd = results[g]
            m = enc[g].shape[0]
            strand_c = int(rd["strand"][c])
            # segment-local clips -> global read coordinates (rev segments
            # were RC'd, so their head clip sits at the segment's END)
            if strand_c:
                qstart, qend = qs + e_clip, qe - s_al
            else:
                qstart, qend = qs + s_al, qe - e_clip
            off = int(self._block_starts[cid])
            per_read.setdefault(g, []).append({
                "qname": rids[g], "qlen": m, "qstart": qstart, "qend": qend,
                "rev": strand_c, "tname": self.layout.names[cid],
                "tlen": int(self.layout.lengths[cid]),
                "tstart": ts - off, "tend": te - off, "nmatch": nmatch,
                "blocklen": n_m + n_i + n_d,
                "mapq": mapq_of.get((g, c), 0),
                "align_score": 2 * nmatch - int(cost[jix]),
                "s1": int(rd["votes"][c]), "cig": cig,
            })

        for g, recs in per_read.items():
            # primary flags: best record by (mapq, AS) is primary; further
            # records are primary (split-read/supplementary) iff their query
            # span is disjoint from every primary so far, else secondary
            order = sorted(range(len(recs)),
                           key=lambda i: (recs[i]["mapq"], recs[i]["align_score"]),
                           reverse=True)
            prim_spans: list[tuple[int, int]] = []
            for i in order:
                rec = recs[i]
                span = (rec["qstart"], rec["qend"])
                if not prim_spans or all(
                    _overlap_frac(span, s) < OVERLAP_FRAC for s in prim_spans
                ):
                    rec["primary"] = 1
                    prim_spans.append(span)
                else:
                    rec["primary"] = 0
            for rec in recs:
                if not all_records and not rec["primary"]:
                    continue
                for f in ("qname", "qlen", "qstart", "qend", "rev", "tname",
                          "tlen", "tstart", "tend", "nmatch", "blocklen",
                          "mapq", "align_score", "s1", "primary"):
                    rows[f].append(rec[f])
                cigs.append(rec["cig"])  # packed uint32; consumers accept it


def _empty_records() -> PafRecords:
    z = np.zeros(0, np.int64)
    return PafRecords(
        qname=np.array([], dtype=object), qlen=z, qstart=z, qend=z,
        rev=np.zeros(0, np.int8), tname=np.array([], dtype=object),
        tlen=z, tstart=z, tend=z, nmatch=z, blocklen=z, mapq=z,
        align_score=z, s1=z, primary=np.zeros(0, np.int8), cigars=[],
    )
