"""Fused Pallas kernel: S_mu + CCL-weighted expected benefit in one launch.

The XLA version of ops/genome_ops.expected_benefit pays ~25 ms per big
dynamic gather on this TPU (dynamic-index gathers run ~40k indices/ms).
Here the whole cumulative-sum array sits in VMEM (Gd ~ 84k rows -> under
1 MB) and every dynamically-sized window shift cs[r + w] is composed from
STATIC lane rotations with a barrel shifter:

    for bit k: cur = where((w >> k) & 1, roll(cur, -(1 << k)), cur)

— Mosaic lowers static `pltpu.roll` and scalar selects fine, where dynamic
slices/rolls/gathers do not. All 11 windows x 2 directions run in a single
kernel launch; circular wrap-around values are dead because the segment
boundary logic replaces any position with r + w > seg_end (resp.
r + 1 - w < seg_start) by the segment-edge cumsum.

Window sizes arrive as scalar-prefetched traced values, so the changing
read-length distribution never recompiles. models/runs.py falls back to the
XLA path for genomes whose ds axis exceeds the VMEM budget.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_VMEM_ROWS = 1 << 20   # fall back above this many ds rows


def _barrel_roll(x, shift_scalar, sign, shift_bits):
    """roll(x, sign * shift) along the last axis from static power-of-2 rolls.

    pltpu.roll only takes non-negative shifts: left rotation by s is a right
    rotation by len - s."""
    m = x.shape[1]
    cur = x
    for k in range(shift_bits):
        bit = ((shift_scalar >> k) & 1) != 0
        amount = (1 << k) % m if sign > 0 else (m - ((1 << k) % m)) % m
        cur = jnp.where(bit, pltpu.roll(cur, amount, axis=1), cur)
    return cur


def _kernel(wins_ref, cs_pad_ref, seg_start_ref, seg_end_ref, cs_start_ref,
            cs_end_ref, smu_ref, ben_ref, *, shift_bits: int):
    """wins [12] int32 scalar-prefetched: [n, mu_ds, ccl_0..ccl_9].
    cs_pad [1, M2] f32: exclusive cumsum padded to a lane multiple with its
    last value; seg bounds + segment-edge cumsums [1, n]; out smu/ben [2, n].
    """
    n = seg_end_ref.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    seg_end = seg_end_ref[0:1, :]
    seg_start = seg_start_ref[0:1, :]
    cs_end = cs_end_ref[0:1, :]
    cs_start = cs_start_ref[0:1, :]
    cs_pad = cs_pad_ref[0:1, :]
    cs_lo = cs_pad[:, :n]
    cs_hi = pltpu.roll(cs_pad, cs_pad.shape[1] - 1, axis=1)[:, :n]

    def fwd(w):
        shifted = _barrel_roll(cs_pad, w, -1, shift_bits)[:, :n]  # cs[r+w]
        return jnp.where(rows + w <= seg_end, shifted, cs_end) - cs_lo

    def rev(w):
        shifted = _barrel_roll(cs_pad, w - 1, 1, shift_bits)[:, :n]  # cs[r+1-w]
        return cs_hi - jnp.where(rows + 1 - w >= seg_start, shifted, cs_start)

    mu_ds = wins_ref[1]
    smu_f = fwd(mu_ds)
    smu_r = rev(mu_ds)
    smu_ref[0:1, :] = smu_f
    smu_ref[1:2, :] = smu_r
    ebf = jnp.zeros((1, n), jnp.float32)
    ebr = jnp.zeros((1, n), jnp.float32)
    for i in range(10):
        wgt = 0.95 - 0.1 * i  # weights 0.95 .. 0.05 (runs/reference.py:253)
        w = wins_ref[i + 2]
        ebf = ebf + wgt * fwd(w)
        ebr = ebr + wgt * rev(w)
    ben_ref[0:1, :] = jnp.maximum(ebf - smu_f, 0.0)
    ben_ref[1:2, :] = jnp.maximum(ebr - smu_r, 0.0)


import functools


@functools.partial(jax.jit, static_argnames=("shift_bits",))
def _benefit_one(wins, cs, seg_start, seg_end, cs_start, cs_end, shift_bits: int):
    n = seg_end.shape[0]
    m2 = ((n + 1 + 127) // 128) * 128
    cs_pad = jnp.concatenate(
        [cs, jnp.broadcast_to(cs[-1:], (m2 - n - 1,))]
    ).reshape(1, m2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
    )
    smu, ben = pl.pallas_call(
        functools.partial(_kernel, shift_bits=shift_bits),
        out_shape=(
            jax.ShapeDtypeStruct((2, n), jnp.float32),
            jax.ShapeDtypeStruct((2, n), jnp.float32),
        ),
        grid_spec=grid_spec,
    )(wins, cs_pad, seg_start.reshape(1, -1), seg_end.reshape(1, -1),
      cs_start.reshape(1, -1), cs_end.reshape(1, -1))
    return smu, ben


def expected_benefit_pallas(scores_ds, approx_ccl_ds, seg_start, seg_end, mu_ds=4):
    """Drop-in for ops/genome_ops.expected_benefit: [NB, Gd] ->
    (smu [NB, Gd, 2], benefit [NB, Gd, 2])."""
    nb, gd = scores_ds.shape
    cs_all = jnp.cumsum(scores_ds, axis=-1, dtype=jnp.float32)
    zero = jnp.zeros((nb, 1), jnp.float32)
    cs_all = jnp.concatenate([zero, cs_all], axis=-1)
    wmax = gd  # windows beyond the axis behave identically (boundary-masked)
    shift_bits = int(gd).bit_length()
    wins = jnp.concatenate(
        [
            jnp.asarray([gd], jnp.int32),
            jnp.clip(jnp.asarray([mu_ds], jnp.int32), 1, wmax),
            jnp.clip(approx_ccl_ds.astype(jnp.int32), 1, wmax),
        ]
    )
    smus, bens = [], []
    for b in range(nb):
        cs_b = cs_all[b]
        cs_end = jnp.take(cs_b, seg_end)      # static-index gathers outside
        cs_start = jnp.take(cs_b, seg_start)
        smu, ben = _benefit_one(
            wins, cs_b, seg_start, seg_end, cs_start, cs_end, shift_bits
        )
        smus.append(smu.T)
        bens.append(ben.T)
    return jnp.stack(smus), jnp.stack(bens)
