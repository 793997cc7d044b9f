"""Build the device ReadBatch (COO triplets) from chosen alignments.

This is the host->device boundary: per batch, every read's best alignment is
expanded (io/paf.py) into per-target-site (symbol, qual) runs, concatenated,
globalised onto the padded genome axis and padded to a power-of-two length so
jit sees a small number of distinct shapes.

Read-start rows reproduce the reference's np.histogram semantics
(readstartdist.py:43-82): forward reads bin tstart, reverse reads bin tend,
window 2000, values beyond the last window edge are dropped, a value exactly
on the edge lands in the last window.
"""
from __future__ import annotations

import numpy as np

from ..models.layout import FHAT_WINDOW, GenomeLayout
from .paf import PafRecords, alignment_coverage

MIN_PAD = 1 << 12


def _pad_len(n: int) -> int:
    p = MIN_PAD
    while p < n:
        p *= 2
    return p


def build_coverage_coo(
    layout: GenomeLayout,
    rec: PafRecords,
    rows: list[int],
    seqs: dict[str, str],
    quals: dict[str, str],
    barcodes: dict[str, int] | None = None,
    qt: int = 0,
):
    """COO arrays (pos, sym, bc, w) for the given record rows.

    Reads mapping to contigs outside the layout are skipped (rejected or
    filtered contigs accumulate no state).
    """
    tid_of = {n: i for i, n in enumerate(layout.names)}
    pos_parts, sym_parts, bc_parts, w_parts = [], [], [], []
    for i in rows:
        tid = tid_of.get(rec.tname[i])
        if tid is None:
            continue
        rid = rec.qname[i]
        ts, te, sym, q = alignment_coverage(rec, i, seqs[rid], quals.get(rid, ""))
        pos_parts.append(layout.offsets[tid] + np.arange(ts, te, dtype=np.int64))
        sym_parts.append(sym)
        bc = 0 if barcodes is None else barcodes.get(rid, 0)
        bc_parts.append(np.full(te - ts, bc, dtype=np.int32))
        w_parts.append((q >= qt).astype(np.float32))
    if pos_parts:
        pos = np.concatenate(pos_parts).astype(np.int32)
        sym = np.concatenate(sym_parts).astype(np.int32)
        bc = np.concatenate(bc_parts)
        w = np.concatenate(w_parts)
    else:
        pos = np.zeros(0, np.int32)
        sym = np.zeros(0, np.int32)
        bc = np.zeros(0, np.int32)
        w = np.zeros(0, np.float32)
    m = _pad_len(pos.shape[0])
    out = (
        np.zeros(m, np.int32),
        np.zeros(m, np.int32),
        np.zeros(m, np.int32),
        np.zeros(m, np.float32),
    )
    out[0][: pos.shape[0]] = pos
    out[1][: sym.shape[0]] = sym
    out[2][: bc.shape[0]] = bc
    out[3][: w.shape[0]] = w
    return out


def build_read_start_rows(layout: GenomeLayout, rec: PafRecords, rows: list[int],
                          floor: int = 512):
    """(rs_row, rs_strand, rs_w) arrays for accepted records.

    floor: minimum padded length (drivers pass the largest seen so shrinking
    acceptance counts reuse one compiled step shape)."""
    tid_of = {n: i for i, n in enumerate(layout.names)}
    out_row, out_strand = [], []
    for i in rows:
        tid = tid_of.get(rec.tname[i])
        if tid is None:
            continue
        wf = int(layout.lengths[tid]) // FHAT_WINDOW
        if wf == 0:
            continue
        start = int(rec.tend[i]) if rec.rev[i] else int(rec.tstart[i])
        if start > FHAT_WINDOW * wf:
            continue  # beyond histogram range -> dropped
        w_idx = min(start // FHAT_WINDOW, wf - 1)
        out_row.append(int(layout.fhat_offsets[tid]) + w_idx)
        out_strand.append(int(rec.rev[i]))
    n = len(out_row)
    m = max(512, floor)
    while m < n:
        m *= 2
    rs_row = np.zeros(m, np.int32)
    rs_strand = np.zeros(m, np.int32)
    rs_w = np.zeros(m, np.float32)
    rs_row[:n] = out_row
    rs_strand[:n] = out_strand
    rs_w[:n] = 1.0
    return rs_row, rs_strand, rs_w
