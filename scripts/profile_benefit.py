"""Compare expected_benefit implementations on-chip (f64 decision path).

b0: current — one batched jnp.take gather of 11 windows x Gd rows per
    direction (traced indices, clamped at segment bounds).
b1: 11 dynamic_slice shifts + boundary correction via one static gather of
    cs[seg_end]/cs[seg_start] (the windowed_sums_fwd/rev helpers).
Run inside one fori_loop with a carry dependency (no hoisting/overlap).
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
N_ITER = 10
CCL_DS = np.array([300, 200, 140, 100, 70, 50, 35, 22, 12, 4], np.int32)


def loop_time(body, trials=5):
    f = jax.jit(lambda c: jax.lax.fori_loop(0, N_ITER, body, c))
    out = jax.block_until_ready(f(jnp.zeros((NB, Gd), jnp.float64)))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(jnp.zeros((NB, Gd), jnp.float64)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000.0 / N_ITER


def eb_dynslice(scores_ds, approx_ccl_ds, seg_start, seg_end, mu_ds: int = 4):
    """Variant: dynamic-slice shifts, boundary-corrected."""
    n = scores_ds.shape[-1]
    rows = jnp.arange(n, dtype=jnp.int32)
    cs = gops._csum(scores_ds)
    cs_end = jnp.take(cs, seg_end, axis=-1)
    cs_start = jnp.take(cs, seg_start, axis=-1)
    wins = [mu_ds] + [jnp.maximum(approx_ccl_ds[i], 1) for i in range(10)]
    fwd = [gops.windowed_sums_fwd(cs, w, seg_end, rows, cs_end) for w in wins]
    rev = [gops.windowed_sums_rev(cs, w, seg_start, rows, cs_start) for w in wins]
    smu = jnp.stack([fwd[0], rev[0]], axis=-1)
    weights = [float(w) for w in np.arange(0.05, 1.0, 0.1)[::-1]]
    ebf = weights[0] * fwd[1]
    ebr = weights[0] * rev[1]
    for k in range(1, 10):
        ebf = ebf + weights[k] * fwd[1 + k]
        ebr = ebr + weights[k] * rev[1 + k]
    eb = jnp.stack([ebf, ebr], axis=-1)
    return smu, jnp.maximum(eb - smu, 0.0)


def main():
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.random((NB, Gd), np.float64))
    seg_start = jnp.zeros(Gd, jnp.int32)
    seg_end = jnp.full(Gd, Gd, jnp.int32)
    ccl = jnp.asarray(CCL_DS)

    def body0(i, c):
        smu, ben = gops.expected_benefit(base + c * 1e-9, ccl, seg_start, seg_end)
        return c * 0.5 + ben[..., 0]

    def body1(i, c):
        smu, ben = eb_dynslice(base + c * 1e-9, ccl, seg_start, seg_end)
        return c * 0.5 + ben[..., 0]

    # equality check first (CPU-exactness argument: same cs, same window
    # bounds -> identical sums)
    s0, b0 = jax.jit(lambda x: gops.expected_benefit(x, ccl, seg_start, seg_end))(base)
    s1, b1 = jax.jit(lambda x: eb_dynslice(x, ccl, seg_start, seg_end))(base)
    print("bitwise equal:", bool(jnp.all(s0 == s1)), bool(jnp.all(b0 == b1)), flush=True)

    print(f"b0 take-gather  {loop_time(body0):7.2f} ms/iter", flush=True)
    print(f"b1 dyn-slice    {loop_time(body1):7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
