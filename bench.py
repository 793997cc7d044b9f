"""Benchmark: p50 strategy-update latency per batch on real TPU hardware.

Runs the full jitted BOSS-RUNS update step (coverage scatter -> dense
posterior/score recompute over every genome site -> S_mu/CCL benefit windows
-> exponent-binned global threshold -> gated strategy) on a zymo-scale genome
(~8 Mb, 3 contigs — the reference conformance corpus scale, SURVEY.md §4) with
a 4000-read batch (the reference's default simulation batchsize,
boss/config.py:56), and compares against the float64 NumPy oracle of the same
pipeline on CPU (the stand-in for CPU BOSS-RUNS — its mappy/bottleneck C deps
are absent here; see bossruns_tpu/oracle.py).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = CPU-baseline latency / TPU latency (higher is better; target
>= 10x per BASELINE.md).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

N_READS = 4000
MEAN_LEN = 3500
GENOME = {"chr1": 4_050_000, "chr2": 2_000_000, "chr3": 2_000_000}
CCL = np.array([30000, 20000, 14000, 10000, 7000, 5000, 3500, 2200, 1200, 400])
TIME_COST = 5300.0


def build_inputs(rng):
    from bossruns_tpu.models.layout import build_layout

    contigs = {n: rng.integers(0, 4, L).astype(np.uint8) for n, L in GENOME.items()}
    layout = build_layout(contigs)

    lens = np.array(list(GENOME.values()))
    p = lens / lens.sum()
    cid = rng.choice(len(lens), N_READS, p=p)
    rlen = np.clip(rng.normal(MEAN_LEN, 2000, N_READS), 400, 20000).astype(np.int64)
    starts = (rng.random(N_READS) * (lens[cid] - rlen)).astype(np.int64)
    goff = np.array([layout.offsets[i] for i in range(len(lens))])
    rstart = (goff[cid] + starts).astype(np.int32)
    pos = np.concatenate(
        [s0 + np.arange(l) for s0, l in zip(rstart, rlen)]
    ).astype(np.int64)
    sym = layout.seq_int[pos].astype(np.int8)
    flip = rng.random(pos.shape[0]) < 0.05
    sym[flip] = rng.integers(0, 5, int(flip.sum()))
    from bossruns_tpu.io.coo_native import split_runs

    qual = np.full(sym.shape[0], 40, np.int8)
    mr_flat, mr_len, ex_flat = split_runs(
        layout, sym, qual, rstart, rlen.astype(np.int32),
        np.zeros(N_READS, np.int32),
    )
    rm = 1 << int(np.ceil(np.log2(mr_flat.shape[0])))
    me = 1 << int(np.ceil(np.log2(max(ex_flat.shape[0], 1))))
    mr_flat_p = np.zeros(rm, np.int32); mr_flat_p[: mr_flat.shape[0]] = mr_flat
    mr_len_p = np.zeros(rm, np.int32); mr_len_p[: mr_len.shape[0]] = mr_len
    ex_flat_p = np.zeros(me, np.int32); ex_flat_p[: ex_flat.shape[0]] = ex_flat
    ex_w_p = np.zeros(me, np.int8); ex_w_p[: ex_flat.shape[0]] = 1
    batch_np = dict(
        mr_flat=mr_flat_p, mr_len=mr_len_p, ex_flat=ex_flat_p, ex_w=ex_w_p,
        rs_row=(rng.integers(0, layout.n_fhat, N_READS)).astype(np.int32),
        rs_strand=rng.integers(0, 2, N_READS).astype(np.int32),
        rs_w=np.ones(N_READS, np.float32),
    )
    print(f"# match runs {mr_flat.shape[0]}, explicit {ex_flat.shape[0]}, "
          f"bases {pos.shape[0]}", flush=True)
    return layout, batch_np


def main():
    import jax

    # persistent compile cache: first-ever run pays ~4 min of XLA compile,
    # later runs (and driver rounds) hit the cache
    jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # production decision precision: f64 benefit/threshold (TPU emulates f64
    # as a float-float pair; the arrays are genome/100-sized so this is cheap)
    jax.config.update("jax_enable_x64", True)

    from bossruns_tpu import oracle
    from bossruns_tpu.models.runs import ReadBatch, RunsEngine

    rng = np.random.default_rng(11)
    layout, batch_np = build_inputs(rng)
    eng = RunsEngine(layout)
    state = eng.init_state()
    batch = ReadBatch(**{k: jax.device_put(v) for k, v in batch_np.items()})
    params = eng.make_params(CCL, TIME_COST)

    # -- TPU timing ---------------------------------------------------------
    state, aux = eng.step(state, batch, params)  # compile + step 0
    eng.pull_aux(aux)
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        state, aux = eng.step(state, batch, params)
        # production sync: one packed D2H pull of the step scalars (a D2H
        # round trip costs ~33 ms on a tunneled chip regardless of size)
        eng.pull_aux(aux)
        times.append(time.perf_counter() - t0)
    tpu_p50 = float(np.median(times)) * 1000.0

    # -- CPU f64 baseline (one step, same pipeline) -------------------------
    st_np = {
        "coverage": np.zeros((1, 5, layout.G_pad), np.int32),
        "zeroed": np.zeros((1, layout.G_pad), bool),
        "bucket_on": np.zeros((1, layout.NBk_pad), bool),
        "read_starts": np.zeros((layout.Wf_pad, 2)),
        "strat": np.ones((1, layout.Gd_pad, 2), bool),
    }
    cpu_ms = float("inf")
    for _ in range(2):  # min of 2: robust to transient host load
        t0 = time.perf_counter()
        oracle.full_update(eng, st_np, batch_np, CCL, TIME_COST, fast_scores=True)
        cpu_ms = min(cpu_ms, (time.perf_counter() - t0) * 1000.0)

    total_bases = int(batch_np["mr_len"].sum()) + int(batch_np["ex_w"].sum())
    print(
        json.dumps(
            {
                "metric": "strategy_update_p50_latency",
                "value": round(tpu_p50, 3),
                "unit": "ms",
                "vs_baseline": round(cpu_ms / tpu_p50, 2),
                "detail": {
                    "genome_sites": int(sum(GENOME.values())),
                    "reads_per_batch": N_READS,
                    "bases_per_batch": total_bases,
                    "reads_per_s": round(N_READS / (tpu_p50 / 1000.0), 1),
                    "cpu_baseline_ms": round(cpu_ms, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
