"""Honest per-stage device times: run each stage N times inside ONE jitted
fori_loop so the tunnel dispatch floor (~25-40 ms/call) amortizes away.
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
N_ITER = 20
CCL_DS = np.array([300, 200, 140, 100, 70, 50, 35, 22, 12, 4], np.int32)


def loop_time(body, init, n=N_ITER, trials=5):
    f = jax.jit(lambda x: jax.lax.fori_loop(0, n, body, x))
    out = jax.block_until_ready(f(init))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(init))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000.0 / n


def main():
    rng = np.random.default_rng(0)
    scores_f32 = jnp.asarray(rng.random((NB, G), np.float32) * 0.1)
    seg_start = jnp.zeros(Gd, jnp.int32)
    seg_end = jnp.full(Gd, Gd, jnp.int32)
    ccl = jnp.asarray(CCL_DS)
    fhat32 = jnp.asarray(rng.random((NB, Gd, 2), np.float32) * 1e-5)
    cid = jnp.asarray(rng.integers(0, 3, Gd), jnp.int32)
    win = jnp.asarray(rng.integers(0, 400, Gd), jnp.int32)
    tc32 = jnp.asarray(53.0, jnp.float32)

    for bdt in (jnp.float32, jnp.float64):
        name = bdt.__name__
        fhat = fhat32.astype(bdt)
        tc = tc32.astype(bdt)

        t_ds = loop_time(
            lambda i, acc: acc + jnp.sum(scores_f32.reshape(NB, Gd, 100), axis=2, dtype=bdt) * (i + 1),
            jnp.zeros((NB, Gd), bdt),
        )
        scores_ds = jnp.sum(scores_f32.reshape(NB, Gd, 100), axis=2, dtype=bdt)

        def eb_body(i, acc):
            smu, ben = gops.expected_benefit(scores_ds + acc * 0, ccl, seg_start, seg_end)
            return acc + ben[..., 0] * (i + 1)

        t_eb = loop_time(eb_body, jnp.zeros((NB, Gd), bdt))

        smu, benefit = jax.jit(
            lambda sd: gops.expected_benefit(sd, ccl, seg_start, seg_end)
        )(scores_ds)
        smu, benefit = jax.block_until_ready((smu, benefit))

        def fs_body(i, acc):
            res = gops.find_strategy(benefit + acc * 0, smu, fhat, tc)
            return acc + res.threshold * (i + 1)

        t_fs = loop_time(fs_body, jnp.zeros((), bdt))

        covsum_ds = jnp.abs(scores_ds) * 100

        def drop_body(i, acc):
            pc = jnp.zeros(4, bdt).at[cid].add(jnp.sum(covsum_ds + acc * 0, axis=0))
            return acc + pc[0] * (i + 1)

        t_drop = loop_time(drop_body, jnp.zeros((), bdt))

        def win_body(i, acc):
            ws = jnp.zeros(NB * 408, bdt).at[win].add(
                (covsum_ds + acc * 0).ravel(), mode="drop"
            )
            return acc + ws[0] * (i + 1)

        t_win = loop_time(win_body, jnp.zeros((), bdt))

        print(
            f"{name:8s} downsample {t_ds:7.2f}  benefit {t_eb:7.2f}  "
            f"threshold {t_fs:7.2f}  dropout {t_drop:7.2f}  winsum {t_win:7.2f}  ms/iter"
        )


if __name__ == "__main__":
    main()
