"""Multi-host worker: one engine process of an N-process sharded run.

Launched as a subprocess by tests/test_multiprocess.py with
BOSS_COORDINATOR/BOSS_NUM_PROCESSES/BOSS_PROCESS_ID set and 4 virtual CPU
devices per process; also imported by the test for `build_case` so the
single-process reference run uses byte-identical inputs.

Every process executes the same program over the same inputs (the SPMD
contract, parallel/distributed.py); the genome axis shards over the global
8-device mesh, so each process holds only half the genome state. Process 0
writes the resulting strategies + aux for the test to compare.
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_case(seed: int = 123):
    """Deterministic two-contig case: layout inputs + two read batches."""
    rng = np.random.default_rng(seed)
    contigs = {
        "cA": rng.integers(0, 4, 150_000).astype(np.uint8),
        "cB": rng.integers(0, 4, 120_000).astype(np.uint8),
    }
    batches = []
    for _ in range(2):
        n_reads, rlen = 768, 900
        rstart = rng.integers(0, 140_000 - rlen, n_reads).astype(np.int64)
        sym_pos = np.concatenate([np.arange(s, s + rlen) for s in rstart])
        flip = rng.random(sym_pos.shape[0]) < 0.04
        batches.append(
            dict(
                rstart=rstart,
                rlen=np.full(n_reads, rlen, np.int32),
                flip=flip,
                flip_sym=rng.integers(0, 5, int(flip.sum())).astype(np.int8),
                rs_row=rng.integers(0, 64, n_reads).astype(np.int32),
                rs_strand=rng.integers(0, 2, n_reads).astype(np.int32),
            )
        )
    return contigs, batches


def make_batch(layout, spec):
    from bossruns_tpu.io.coo_native import pad_split, split_runs
    from bossruns_tpu.models.runs import ReadBatch

    pos = np.concatenate(
        [np.arange(s, s + l) for s, l in zip(spec["rstart"], spec["rlen"])]
    )
    sym = layout.seq_int[pos].astype(np.int8)
    sym[spec["flip"]] = spec["flip_sym"]
    qual = np.full(sym.shape[0], 40, np.int8)
    n = spec["rstart"].shape[0]
    split = split_runs(
        layout, sym, qual, spec["rstart"], spec["rlen"], np.zeros(n, np.int32)
    )
    return ReadBatch(
        **dict(
            pad_split(split),
            rs_row=np.minimum(spec["rs_row"], layout.n_fhat - 1),
            rs_strand=spec["rs_strand"],
            rs_w=np.ones(n, np.float32),
        )
    )


def run_case(mesh_devices=None):
    """Build the 8-way genome-sharded engine, run both batches, and return
    (strat_dict, aux_list). Works single- or multi-process."""
    import jax

    from bossruns_tpu.models.layout import build_layout
    from bossruns_tpu.parallel.mesh import ShardedRunsEngine, make_mesh

    contigs, batches = build_case()
    mesh = make_mesh(mesh_devices)
    gsize = mesh.shape[mesh.axis_names[-1]]
    layout = build_layout(contigs, align_chunks=gsize)
    eng = ShardedRunsEngine(layout, mesh)
    state = eng.init_state()
    params = eng.make_params(
        np.array([30000, 20000, 14000, 10000, 7000, 5000, 3500, 2200, 1200, 400]),
        5300.0,
    )
    auxes = []
    for spec in batches:
        batch = eng.put_batch(make_batch(layout, spec))
        state, aux = eng.step(state, batch, params)
        auxes.append(eng.pull_aux(aux))
    jax.block_until_ready(state.strat)
    return eng.strat_dict(state), auxes


def run_sim(corpus: Path, out_base: Path, mesh_shards=(1, 8)):
    """Driver-level case: the full BossRunsSim loop (sample -> decide ->
    pack -> sharded step -> masks npz) over a shared corpus. In multi-process
    runs every process executes the identical loop; only the primary writes
    out_*/ artifacts (masks, metrics, checkpoints, read dumps)."""
    from bossruns_tpu.models.runs_sim import BossRunsSim

    sim = BossRunsSim(
        ref=str(corpus / "ref.fa"),
        fq=str(corpus / "reads.fq"),
        paf_full=str(corpus / "full.paf"),
        paf_trunc=str(corpus / "trunc.paf"),
        name="mp",
        batchsize=300,
        maxb=3,
        out_base=out_base,
        min_contig_len=50_000,
        mesh_shards=mesh_shards,
    )
    sim.run()
    return sim


def main():
    import jax

    from bossruns_tpu.parallel import distributed as dist

    assert dist.init_from_env(), "worker requires BOSS_COORDINATOR"
    jax.config.update("jax_enable_x64", True)

    if sys.argv[1] == "--sim":
        run_sim(Path(sys.argv[2]), Path(sys.argv[3]))
    else:
        out = Path(sys.argv[1])
        strat, auxes = run_case()
        if dist.is_primary():
            np.savez(out / "strat.npz", **strat)
            (out / "aux.json").write_text(
                json.dumps([[a.any_on, a.updated, a.threshold, a.mean_coverage] for a in auxes])
            )
    # all processes exit cleanly; the collectives above already synchronised
    # them past the last step
    print(f"worker {jax.process_index()} done", flush=True)


if __name__ == "__main__":
    main()
