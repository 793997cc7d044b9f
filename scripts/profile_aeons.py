"""Profile the AEONS batch sub-stages on the real chip.

Breaks ingest_ava / pool_ava down into: host index build, device index
upload, device seeding, and the host record loop — to decide where the
868 ms p50 (BENCH r3 interim) actually goes.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import tempfile

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bossruns_tpu.aeons.simulation import BossAeonsSim
    from bossruns_tpu.config import BossConfig
    from bossruns_tpu.utils.datagen import write_corpus

    td = Path(tempfile.mkdtemp(prefix="boss_prof_"))
    paths = write_corpus(
        td / "acorpus", rng=np.random.default_rng(21),
        contig_lengths={"gA": 300_000}, n_reads=10_000, mean_len=5000.0,
    )
    args = BossConfig()
    args.general.name = "aeons_prof"
    args.simulation.fq = paths["fq"]
    args.simulation.batchsize = 500
    args.simulation.maxb = 16
    args.simulation.binit = 2
    args.optional.min_seq_len = 2500
    args.optional.min_contig_len = 10_000
    sim = BossAeonsSim(args, out_base=td / "aeons")
    sim.process_batch()  # warm

    # monkeypatch timers around PoolIndex / find_overlaps internals
    import bossruns_tpu.aeons.ava as ava
    import bossruns_tpu.aeons.core as core

    t_acc = {}

    def timed(name, fn):
        def wrap(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            t_acc[name] = t_acc.get(name, 0.0) + time.perf_counter() - t0
            t_acc[name + "_n"] = t_acc.get(name + "_n", 0) + 1
            return out
        return wrap

    orig_pi = ava.PoolIndex
    orig_fo = ava.find_overlaps

    class TimedPI(orig_pi):
        def __init__(self, *a, **kw):
            t0 = time.perf_counter()
            super().__init__(*a, **kw)
            t_acc["PoolIndex"] = t_acc.get("PoolIndex", 0.0) + time.perf_counter() - t0
            t_acc["PoolIndex_n"] = t_acc.get("PoolIndex_n", 0) + 1

    ava.PoolIndex = TimedPI
    core.PoolIndex = TimedPI
    ava.find_overlaps = timed("find_overlaps", orig_fo)
    core.find_overlaps = ava.find_overlaps

    # also split PoolIndex into host-index vs device-upload
    from bossruns_tpu.aligner import seed as seedmod
    orig_di = seedmod.DeviceIndex
    import bossruns_tpu.aeons.ava as _a

    class TimedDI(orig_di):
        def __init__(self, *a, **kw):
            t0 = time.perf_counter()
            super().__init__(*a, **kw)
            import jax
            jax.block_until_ready(self.pos_packed)
            t_acc["DeviceIndex"] = t_acc.get("DeviceIndex", 0.0) + time.perf_counter() - t0
            t_acc["DeviceIndex_n"] = t_acc.get("DeviceIndex_n", 0) + 1

    _a.DeviceIndex = TimedDI

    orig_sc = seedmod.seed_candidates

    def timed_sc(*a, **kw):
        t0 = time.perf_counter()
        out = orig_sc(*a, **kw)
        t_acc["seed_candidates"] = t_acc.get("seed_candidates", 0.0) + time.perf_counter() - t0
        t_acc["seed_candidates_n"] = t_acc.get("seed_candidates_n", 0) + 1
        return out

    ava.seed_candidates = timed_sc

    for i in range(6):
        t_acc.clear()
        t0 = time.perf_counter()
        sim.process_batch()
        total = time.perf_counter() - t0
        print(f"--- batch {i}: total {total*1000:.0f} ms, "
              f"stages {sim.stage_times}")
        for k in sorted(t_acc):
            if k.endswith("_n"):
                continue
            print(f"    {k:>18}: {t_acc[k]*1000:7.1f} ms  x{t_acc[k + '_n']}")
        # pool composition
        n_seq = len(sim.pool.sequences)
        tot_b = sum(len(s.seq) for s in sim.pool.sequences.values())
        print(f"    pool: {n_seq} seqs, {tot_b} bases")


if __name__ == "__main__":
    main()
