"""Realistic-scale conformance drive: engine (quirk mode) vs the
bug-compatible reference oracle on a zymo-like corpus.

The reference's de-facto conformance suite is a Zymo mock community —
zymo.fa, 9 contigs, largest 4,045,619 bp — plus 10k ONT reads
(/root/reference/tests/constants.py:8-23; the data submodule is empty in
this snapshot, so the corpus is regenerated here with a frozen seed:
reference-realistic contig count/length spread and an ONT-like error
profile). Each batch's observations feed BOTH

  * the device engine in reference-quirk mode (RunsConfig(reference_quirks)
    — quirk Q1, the ubar0 variable swap), and
  * ``oracle_quirks.ReferenceQuirkOracle`` — the complete bug-compatible
    NumPy pipeline (Q1 + the Q3/Q3b merged-row layout drifts, which are
    host-layout properties deliberately NOT reproduced on device;
    docs/PARITY.md).

so the per-batch mask agreement isolates exactly the documented Q3/Q3b
deviations. Consumed by tests/test_conformance_zymo.py (default suite,
asserts the agreement floor) and bench.py (reports it as a BENCH line).
"""
from __future__ import annotations

import numpy as np

from .models.layout import build_layout
from .models.runs import ReadBatch, RunsConfig, RunsEngine
from .ops.model import make_model
from .oracle_quirks import ReferenceQuirkOracle

#: 9 contigs, largest ~4.05 Mb — the zymo.fa shape
#: (tests/base/test_runs_core.py:37-40: NZ_CP041015.1 is 4,045,619 bp)
ZYMO_LIKE_LENGTHS = {
    "z01": 4_045_000, "z02": 2_800_000, "z03": 2_200_000,
    "z04": 1_500_000, "z05": 1_000_000, "z06": 500_000,
    "z07": 300_000, "z08": 150_000, "z09": 105_000,
}

CCL = np.array([30000, 20000, 14000, 10000, 7000, 5000, 3500, 2200, 1200, 400])
TIME_COST = 5300.0
FHAT_WINDOW = 2000


def ont_observation_batch(rng, layout, n_reads: int, mean_len: float = 3500.0,
                          sub: float = 0.03, dele: float = 0.02):
    """One batch of ONT-profile per-base observations + read starts.

    Substitutions draw a uniform base (like the test corpora); deletions
    observe the deletion symbol (4) at the target site; insertions consume
    no target sites so they need no representation at the observation level.

    Returns (sym, rstart_global, rlen, starts_fwd, starts_rev) where
    starts_* are per-contig local read-start positions (the fwd tstart /
    rev tend convention, readstartdist.py:43-82).
    """
    lens = layout.lengths.astype(np.int64)
    p = lens / lens.sum()
    cid = rng.choice(len(lens), n_reads, p=p)
    rlen = np.clip(rng.normal(mean_len, mean_len * 0.6, n_reads),
                   400, 6 * mean_len).astype(np.int64)
    rlen = np.minimum(rlen, lens[cid] - 1)
    start_local = (rng.random(n_reads) * (lens[cid] - rlen)).astype(np.int64)
    rev = rng.integers(0, 2, n_reads)
    rstart = layout.offsets[cid] + start_local
    pos = np.concatenate([np.arange(s, s + l) for s, l in zip(rstart, rlen)])
    sym = layout.seq_int[pos].astype(np.int8)
    m = sym.shape[0]
    r = rng.random(m)
    subm = r < sub
    delm = (r >= sub) & (r < sub + dele)
    sym[subm] = rng.integers(0, 4, int(subm.sum()))
    sym[delm] = 4
    # read starts: fwd -> tstart, rev -> tend (the read's last covered site
    # + 1, i.e. start + len — PAF tend is exclusive)
    starts_fwd: dict[str, list] = {}
    starts_rev: dict[str, list] = {}
    for i, name in enumerate(layout.names):
        sel = cid == i
        fwd = sel & (rev == 0)
        rv = sel & (rev == 1)
        starts_fwd[name] = start_local[fwd]
        starts_rev[name] = (start_local + rlen)[rv]
    return sym, rstart, rlen, cid, rev, start_local, starts_fwd, starts_rev


def drive_zymo_conformance(
    n_batches: int = 3,
    reads_per_batch: int = 12_000,
    mean_len: float = 3500.0,
    seed: int = 7,
    lengths: dict[str, int] | None = None,
    exact_check: bool = True,
) -> dict:
    """Run the engine (quirk mode) and the quirk oracle over the same
    batches; return per-batch and final mask agreement.

    The defaults put ~3.3x mean coverage per batch on a 12.6 Mb community so
    bucket switches flip and the threshold scan runs on every batch.

    Two parity levels per batch:
      * ``exact_vs_drift_free`` (exact_check=True): the engine's masks must
        be BIT-IDENTICAL to the sequential f64 oracle of the same quirk-Q1
        pipeline (oracle.full_update(reference_quirks=True) with the
        engine's own scores) — the strongest claim, now at realistic scale.
      * ``agreement`` vs the COMPLETE bug-compatible oracle
        (ReferenceQuirkOracle, Q1+Q3+Q3b): quantifies what the reference's
        own merged-row layout drifts (docs/PARITY.md deviations, deliberately
        not reproduced on device) cost in decision agreement.
    """
    from . import oracle as oracle_mod
    from .io.coo_native import pad_split, split_runs

    lengths = lengths or ZYMO_LIKE_LENGTHS
    rng = np.random.default_rng(seed)
    contigs = {n: rng.integers(0, 4, L).astype(np.uint8) for n, L in lengths.items()}
    layout = build_layout(contigs)
    eng = RunsEngine(layout, make_model(ploidy=1),
                     RunsConfig(reference_quirks=True, debug_aux=exact_check))
    qo = ReferenceQuirkOracle(contigs, make_model(ploidy=1))
    state = eng.init_state()
    state_np = None
    if exact_check:
        state_np = {k: np.asarray(v) for k, v in state._asdict().items()}
        state_np["read_starts"] = state_np["read_starts"].astype(np.float64)
    params = eng.make_params(CCL, TIME_COST)
    floors = (0, 0)
    rs_floor = 512
    agreements = []
    exact_batches: list[bool] = []
    any_on = False
    for _b in range(n_batches):
        (sym, rstart, rlen, cid, rev, start_local,
         starts_fwd, starts_rev) = ont_observation_batch(
            rng, layout, reads_per_batch, mean_len
        )
        # --- engine side -------------------------------------------------
        qual = np.full(sym.shape[0], 40, np.int8)
        split = split_runs(layout, sym, qual, rstart.astype(np.int64),
                           rlen.astype(np.int32),
                           np.zeros(reads_per_batch, np.int32))
        padded = pad_split(split, floors)
        floors = (padded["mr_g"].shape[0], padded["ex_g"].shape[0])
        # read-start rows mirroring io/coo.build_read_start_rows (incl. the
        # histogram right-edge inclusion and beyond-range drop)
        out_row, out_strand = [], []
        for i in range(reads_per_batch):
            wf = int(layout.lengths[cid[i]]) // FHAT_WINDOW
            if wf == 0:
                continue
            start = int(start_local[i] + rlen[i]) if rev[i] else int(start_local[i])
            if start > FHAT_WINDOW * wf:
                continue
            out_row.append(int(layout.fhat_offsets[cid[i]]) + min(start // FHAT_WINDOW, wf - 1))
            out_strand.append(int(rev[i]))
        n_rs = len(out_row)
        rs_floor = max(rs_floor, 1 << int(np.ceil(np.log2(max(n_rs, 1)))))
        rs_row = np.zeros(rs_floor, np.int32)
        rs_strand = np.zeros(rs_floor, np.int32)
        rs_w = np.zeros(rs_floor, np.float32)
        rs_row[:n_rs] = out_row
        rs_strand[:n_rs] = out_strand
        rs_w[:n_rs] = 1.0
        batch = ReadBatch(rs_row=rs_row, rs_strand=rs_strand, rs_w=rs_w, **padded)
        state, aux = eng.step(state, batch, params)
        ah = eng.pull_aux(aux)
        any_on = any_on or ah.any_on
        if exact_check:
            batch_dict = dict(padded, rs_row=rs_row, rs_strand=rs_strand, rs_w=rs_w)
            state_np, _aux_o = oracle_mod.full_update(
                eng, state_np, batch_dict, CCL, TIME_COST,
                scores_override=np.asarray(aux.scores),
                reference_quirks=True,
            )
            exact_ok = bool(
                np.array_equal(np.asarray(state.strat), state_np["strat"])
                and np.array_equal(np.asarray(state.coverage), state_np["coverage"])
            )
            exact_batches.append(exact_ok)
        # --- oracle side -------------------------------------------------
        for i, name in enumerate(layout.names):
            sel_reads = np.flatnonzero(cid == i)
            if sel_reads.size == 0:
                continue
            ppos = np.concatenate([
                np.arange(start_local[j], start_local[j] + rlen[j]) for j in sel_reads
            ])
            base_off = np.concatenate([[0], np.cumsum(rlen)[:-1]])
            psym = np.concatenate([
                sym[base_off[j]: base_off[j] + rlen[j]] for j in sel_reads
            ])
            qo.increment(name, ppos, psym.astype(np.int64))
        qo.count_read_starts(starts_fwd, starts_rev)
        masks_o = qo.step(CCL, TIME_COST)
        masks_e = eng.strat_dict(state)
        agree = np.concatenate([
            (masks_e[n] == masks_o[n][: masks_e[n].shape[0]]).ravel()
            for n in masks_e
        ])
        agreements.append(float(agree.mean()))
    return {
        "agreement": agreements[-1],
        "per_batch": agreements,
        "min_agreement": float(min(agreements)),
        "exact_vs_drift_free": bool(exact_batches and all(exact_batches)),
        "exact_batches": exact_batches,
        "any_on": bool(any_on),
        "n_sites": int(layout.lengths.sum()),
        "n_contigs": len(layout.names),
        "reads_per_batch": reads_per_batch,
    }
