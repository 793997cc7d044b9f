"""Measure the Pallas score kernel against the XLA path on hardware.

VERDICT r1 item 7: decide the Pallas kernels. Times the full update step at
bench scale (8 Mb genome, 4000-read batch) with use_pallas_scores on/off,
then attempts a hardware build of the barrel-shift benefit kernel
(ops/pallas_benefit) — Mosaic has so far rejected its remote compile.
Prints one JSON line per measurement.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_enable_x64", True)

    import bench
    from bossruns_tpu.models.runs import ReadBatch, RunsConfig, RunsEngine

    rng = np.random.default_rng(11)
    layout, batch_np = bench.build_inputs(rng)
    batch = ReadBatch(**{k: jax.device_put(v) for k, v in batch_np.items()})

    for use_pallas in (False, True):
        eng = RunsEngine(layout, config=RunsConfig(use_pallas_scores=use_pallas))
        params = eng.make_params(bench.CCL, bench.TIME_COST)
        try:
            state = eng.init_state()
            state, aux = eng.step(state, batch, params)
            eng.pull_aux(aux)
            times = []
            for _ in range(7):
                t0 = time.perf_counter()
                state, aux = eng.step(state, batch, params)
                eng.pull_aux(aux)
                times.append(time.perf_counter() - t0)
            print(json.dumps({
                "metric": f"step_p50_pallas_scores_{use_pallas}",
                "value": round(float(np.median(times)) * 1000.0, 2),
                "unit": "ms", "vs_baseline": None,
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "metric": f"step_p50_pallas_scores_{use_pallas}",
                "value": None, "unit": "ms", "vs_baseline": None,
                "detail": {"error": repr(e)[:300]},
            }), flush=True)
        del eng

    # benefit kernel: known-unbuildable via the remote Mosaic compiler;
    # verify that is still true before deleting/keeping it
    try:
        import jax.numpy as jnp

        from bossruns_tpu.ops import pallas_benefit as pb

        gd = 8192
        cs = jnp.asarray(rng.random((2, gd + 1)), jnp.float32)
        windows = jnp.asarray([3, 5, 7, 11, 20, 30, 50, 70, 100, 140], jnp.int32)
        seg_start = jnp.zeros(gd, jnp.int32)
        seg_end = jnp.full(gd, gd, jnp.int32)
        smu, ben = pb.expected_benefit_pallas(
            cs, windows, jnp.int32(4), seg_start, seg_end,
        )
        np.asarray(smu); np.asarray(ben)
        print(json.dumps({"metric": "pallas_benefit_hw_compile", "value": 1,
                          "unit": "ok", "vs_baseline": None}), flush=True)
    except Exception as e:
        print(json.dumps({"metric": "pallas_benefit_hw_compile", "value": 0,
                          "unit": "ok", "vs_baseline": None,
                          "detail": {"error": repr(e)[:300]}}), flush=True)


if __name__ == "__main__":
    main()
