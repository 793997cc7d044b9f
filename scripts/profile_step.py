"""Micro-profile the RUNS step's stages on the real chip, f32 vs f64.

Times each decision-path stage standalone at the headline config's shapes
(8 Mb genome -> Gd = 80.5k ds rows) to locate where the f64 emulation cost
of the exactness contract actually goes. Each timing includes one tunnel
round trip (~33 ms) — compare deltas between dtypes, not absolutes.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from bossruns_tpu.ops import genome_ops as gops

G = 8_050_000
Gd = G // 100
NB = 1
CCL_DS = np.array([300, 200, 140, 100, 70, 50, 35, 22, 12, 4], np.int32)


def bench(fn, *args, n=7):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000.0


def main():
    rng = np.random.default_rng(0)
    scores_f32 = jnp.asarray(rng.random((NB, G), np.float32) * 0.1)
    seg_start = jnp.zeros(Gd, jnp.int32)
    seg_end = jnp.full(Gd, Gd, jnp.int32)
    ccl = jnp.asarray(CCL_DS)
    fhat = jnp.asarray(rng.random((NB, Gd, 2), np.float32) * 1e-5)
    tc = jnp.asarray(53.0)

    for bdt in (jnp.float32, jnp.float64):
        name = bdt.__name__

        # stage A: downsample per-site scores -> [NB, Gd] in bdt
        ds = jax.jit(lambda s: jnp.sum(s.reshape(NB, Gd, 100), axis=2, dtype=bdt))
        t_ds = bench(ds, scores_f32)

        scores_ds = jax.block_until_ready(ds(scores_f32))

        # stage B: expected benefit (cumsum + 22 clamped window gathers)
        eb = jax.jit(lambda sd: gops.expected_benefit(sd, ccl, seg_start, seg_end))
        t_eb = bench(eb, scores_ds)

        smu, benefit = jax.block_until_ready(eb(scores_ds))

        # stage C: threshold scan (frexp binning + scatters + cumsum scan)
        fs = jax.jit(
            lambda b, s, f: gops.find_strategy(b, s, f.astype(b.dtype), tc.astype(b.dtype))
        )
        t_fs = bench(fs, benefit, smu, fhat)

        # stage D: the two f64 scatter-driven blocks from the step:
        # per-contig dropout sums + window sums for buckets
        cid = jnp.asarray(rng.integers(0, 3, Gd), jnp.int32)
        covsum_ds = jnp.abs(scores_ds) * 100

        def dropout(cds):
            per_contig = jnp.zeros(4, bdt).at[cid].add(jnp.sum(cds, axis=0))
            return per_contig

        t_drop = bench(jax.jit(dropout), covsum_ds)

        win = jnp.asarray(rng.integers(0, 400, Gd), jnp.int32)

        def winsum(cds):
            return jnp.zeros(NB * 408, bdt).at[(win[None, :]).ravel()].add(
                cds.ravel(), mode="drop"
            )

        t_win = bench(jax.jit(winsum), covsum_ds)

        print(
            f"{name:8s} downsample {t_ds:7.2f}  benefit {t_eb:7.2f}  "
            f"threshold {t_fs:7.2f}  dropout {t_drop:7.2f}  winsum {t_win:7.2f}  ms"
        )


if __name__ == "__main__":
    main()
