"""Compare on-chip implementations of the f64 decision-path reductions.

Each candidate runs inside one jitted fori_loop whose carry feeds back into
the next iteration's input, so XLA can neither hoist the work out of the
loop nor overlap iterations — honest per-iteration latency.

Candidates:
  histogram (bin_benefit): 161k values -> 192 exponent bins, counts + fsum
    h0: current .at[idx].add scatter in f64
    h1: compare-reduce: sum over where(idx==b) in f64
    h2: int32 scatter for counts + f64 compare-reduce for fsum
    h3: blocked partial histograms (compare-reduce per 512-row block)
  winsum: [Gd] integer-valued rows -> ~400 window bins (200 collisions each)
    w0: f64 scatter (current)
    w1: int64(2xint32) scatter of integer covsums, cast after
    w2: f64 cumsum + gather at window bounds
  dropout per-contig sums: [Gd] -> 4 contig bins
    d0: f64 scatter (current)
    d1: compare-reduce f64
    d2: int64 scatter, cast after
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

G = 8_050_000
Gd = G // 100
NB = 1
NBINS = 192
N_ITER = 20


def loop_time(make_body, trials=5):
    f = jax.jit(lambda c: jax.lax.fori_loop(0, N_ITER, make_body, c))
    out = jax.block_until_ready(f(jnp.zeros((), jnp.float64)))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(jnp.zeros((), jnp.float64)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000.0 / N_ITER


def main():
    rng = np.random.default_rng(0)
    n = NB * Gd * 2
    idx0 = jnp.asarray(rng.integers(0, NBINS, n), jnp.int32)
    f32vals = jnp.asarray(rng.random(n, np.float32) * 1e-5)
    bins = jnp.arange(NBINS, dtype=jnp.int32)

    # --- histogram candidates -------------------------------------------
    def h0(c):
        idx = (idx0 + c.astype(jnp.int32)) % NBINS
        f = f32vals.astype(jnp.float64)
        counts = jnp.zeros(NBINS, jnp.float64).at[idx].add(1.0)
        fsum = jnp.zeros(NBINS, jnp.float64).at[idx].add(f)
        return counts[0] + fsum[0]

    def h1(c):
        idx = (idx0 + c.astype(jnp.int32)) % NBINS
        oh = idx[:, None] == bins[None, :]
        counts = jnp.sum(oh, axis=0, dtype=jnp.float64)
        fsum = jnp.sum(
            jnp.where(oh, f32vals[:, None].astype(jnp.float64), 0.0),
            axis=0, dtype=jnp.float64,
        )
        return counts[0] + fsum[0]

    def h2(c):
        idx = (idx0 + c.astype(jnp.int32)) % NBINS
        counts = jnp.zeros(NBINS, jnp.int32).at[idx].add(1).astype(jnp.float64)
        oh = idx[:, None] == bins[None, :]
        fsum = jnp.sum(
            jnp.where(oh, f32vals[:, None].astype(jnp.float64), 0.0),
            axis=0, dtype=jnp.float64,
        )
        return counts[0] + fsum[0]

    def h3(c):
        idx = (idx0 + c.astype(jnp.int32)) % NBINS
        B = 512
        nb = n // B  # n is divisible enough for the bench
        idx_b = idx[: nb * B].reshape(nb, B)
        f_b = f32vals[: nb * B].reshape(nb, B).astype(jnp.float64)
        oh = idx_b[:, :, None] == bins[None, None, :]
        counts = jnp.sum(oh, axis=(0, 1), dtype=jnp.float64)
        fsum = jnp.sum(jnp.where(oh, f_b[:, :, None], 0.0), axis=(0, 1))
        return counts[0] + fsum[0]

    for name, fn in (("h0 scatter-f64", h0), ("h1 cmp-reduce", h1),
                     ("h2 int32+cmp", h2), ("h3 blocked", h3)):
        def body(i, c, fn=fn):
            return c * 0.5 + fn(c)
        print(f"hist {name:16s} {loop_time(body):7.2f} ms/iter", flush=True)

    # --- winsum candidates ----------------------------------------------
    NW = 408
    win = jnp.asarray(np.repeat(np.arange(Gd // 200 + 1), 200)[:Gd], jnp.int32)
    covsum_i = jnp.asarray(rng.integers(0, 3_000_000, Gd), jnp.int32)
    lo = jnp.asarray(np.arange(0, Gd, 200)[:NW], jnp.int32)

    def w0(c):
        x = (covsum_i + c.astype(jnp.int32)).astype(jnp.float64)
        ws = jnp.zeros(NW * 2, jnp.float64).at[win].add(x, mode="drop")
        return ws[0]

    def w1(c):
        x = covsum_i + c.astype(jnp.int32)
        ws = jnp.zeros(NW * 2, jnp.int64).at[win].add(x.astype(jnp.int64), mode="drop")
        return ws.astype(jnp.float64)[0]

    def w2(c):
        x = (covsum_i + c.astype(jnp.int32)).astype(jnp.float64)
        cs = jnp.concatenate([jnp.zeros(1, jnp.float64), jnp.cumsum(x)])
        ws = cs[jnp.minimum(lo + 200, Gd)] - cs[lo]
        return ws[0]

    def w3(c):
        x = covsum_i + c.astype(jnp.int32)
        cs = jnp.concatenate([jnp.zeros(1, jnp.int64), jnp.cumsum(x.astype(jnp.int64))])
        ws = (cs[jnp.minimum(lo + 200, Gd)] - cs[lo]).astype(jnp.float64)
        return ws[0]

    for name, fn in (("w0 scatter-f64", w0), ("w1 scatter-i64", w1),
                     ("w2 cumsum-f64", w2), ("w3 cumsum-i64", w3)):
        def body(i, c, fn=fn):
            return c * 0.5 + fn(c)
        print(f"winsum {name:16s} {loop_time(body):7.2f} ms/iter", flush=True)

    # --- dropout per-contig sums ------------------------------------------
    cid = jnp.asarray(np.sort(rng.integers(0, 3, Gd)), jnp.int32)
    cbins = jnp.arange(4, dtype=jnp.int32)

    def d0(c):
        x = (covsum_i + c.astype(jnp.int32)).astype(jnp.float64)
        pc = jnp.zeros(4, jnp.float64).at[cid].add(x)
        return pc[0]

    def d1(c):
        x = (covsum_i + c.astype(jnp.int32)).astype(jnp.float64)
        oh = cid[:, None] == cbins[None, :]
        pc = jnp.sum(jnp.where(oh, x[:, None], 0.0), axis=0)
        return pc[0]

    def d2(c):
        x = covsum_i + c.astype(jnp.int32)
        pc = jnp.zeros(4, jnp.int64).at[cid].add(x.astype(jnp.int64))
        return pc.astype(jnp.float64)[0]

    for name, fn in (("d0 scatter-f64", d0), ("d1 cmp-reduce", d1),
                     ("d2 scatter-i64", d2)):
        def body(i, c, fn=fn):
            return c * 0.5 + fn(c)
        print(f"dropout {name:16s} {loop_time(body):7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
