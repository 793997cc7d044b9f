"""On-chip decision parity: run real update steps on the TPU and compare the
strategy masks bit-for-bit against the sequential f64 numpy oracle.

The CPU test suite asserts engine == oracle exactly (tests/test_engine_parity)
— but TPU float64 is EMULATED (float-float pairs), so on-chip exactness is a
separate empirical claim. This script drives several batches at bench scale
and reports per-batch disagreement counts (expected: 0).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

CCL = np.array([30000, 20000, 14000, 10000, 7000, 5000, 3500, 2200, 1200, 400])


def main(n_batches: int = 5, score_dtype: str = "float32"):
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_enable_x64", True)

    import bench
    from bossruns_tpu import oracle
    from bossruns_tpu.models.runs import ReadBatch, RunsConfig, RunsEngine

    rng = np.random.default_rng(11)
    layout, batch_np = bench.build_inputs(rng)
    eng = RunsEngine(layout, config=RunsConfig(dtype=score_dtype))
    state = eng.init_state()
    batch = ReadBatch(**{k: jax.device_put(v) for k, v in batch_np.items()})
    params = eng.make_params(CCL, bench.TIME_COST)

    st_np = {
        "coverage": np.zeros((1, 5, layout.G_pad), np.int32),
        "zeroed": np.zeros((1, layout.G_pad), bool),
        "bucket_on": np.zeros((1, layout.NBk_pad), bool),
        "read_starts": np.zeros((layout.Wf_pad, 2)),
        "strat": np.ones((1, layout.Gd_pad, 2), bool),
    }
    import time
    total_dis = 0
    times = []
    for b in range(n_batches):
        t0 = time.perf_counter()
        state, aux = eng.step(state, batch, params)
        eng.pull_aux(aux)
        times.append(time.perf_counter() - t0)
        st_np, aux_np = oracle.full_update(
            eng, st_np, batch_np, CCL, bench.TIME_COST, fast_scores=True
        )
        strat_tpu = np.asarray(state.strat)
        dis = int((strat_tpu != st_np["strat"]).sum())
        total_dis += dis
        print(f"batch {b}: strat disagreements {dis} / {st_np['strat'].size}, "
              f"thr tpu {float(np.asarray(aux.threshold)):.17g} "
              f"oracle {aux_np['threshold']:.17g}", flush=True)
    print(f"TOTAL disagreements over {n_batches} batches: {total_dis} "
          f"(score_dtype={score_dtype}, warm step p50 "
          f"{1000*float(np.median(times[1:] or times)):.1f} ms)")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 5,
        sys.argv[2] if len(sys.argv) > 2 else "float32",
    )
