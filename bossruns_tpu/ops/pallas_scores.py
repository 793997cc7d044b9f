"""Fused Pallas TPU kernel for the per-site posterior/score computation.

One VMEM-resident pass per genome block: load the [5, BLOCK] coverage counts
and [1, BLOCK] reference bases once from HBM, run the whole closed-form score
(log-likelihood matmul -> masked logsumexp -> posterior -> q = phi @ post ->
score = k.post - sum q log q) on the MXU/VPU, write [1, BLOCK] scores — where
the XLA version materialises several [G, G_t] intermediates in HBM.

Tables are padded to TPU tile shapes: symbols 5 -> 8 sublanes, genotypes
(4..15) -> 16. Padded genotype rows are masked to -inf before the logsumexp;
padded symbol rows carry zero counts / zero phi so they vanish from sums.

Falls back transparently to ops/scores.site_scores_t (same math, tested
equal to ~1e-6 f32) — see models/runs.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scores import COUNT_CLIP, ScoreTables

BLOCK = 2048
SYM_PAD = 8
GT_PAD = 16
NEG = -1e30


def _kernel(counts_ref, ref_ref, lphi_ref, lprior_ref, phi_ref, k_ref, out_ref,
            *, len_g: int, len_b: int):
    c = jnp.minimum(counts_ref[:, :].astype(jnp.float32), COUNT_CLIP)  # [8, B]
    # ll[g, n] = sum_b log_phi[b, g] * c[b, n]  (pad rows of c are zero)
    ll = jax.lax.dot_general(
        lphi_ref[:, :], c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [16, B]
    # prior selection via one-hot matmul over the 4 reference bases
    ref = ref_ref[:, :]  # [1, B] int32
    onehot = (ref == jax.lax.broadcasted_iota(jnp.int32, (4, ref.shape[1]), 0)).astype(
        jnp.float32
    )  # [4, B]
    lp = ll + jax.lax.dot_general(
        lprior_ref[:, :], onehot, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [16, B]
    gt_row = jax.lax.broadcasted_iota(jnp.int32, lp.shape, 0)
    lp = jnp.where(gt_row < len_g, lp, NEG)
    m = jnp.max(lp, axis=0, keepdims=True)
    ex = jnp.exp(lp - m)
    z = jnp.sum(ex, axis=0, keepdims=True)
    post = ex / z  # [16, B], pad rows ~0
    # q[b, n] = sum_g phi[b, g] post[g, n]; pad phi rows are zero
    q = jax.lax.dot_general(
        phi_ref[:, :], post, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [8, B]
    qlogq = jnp.where(q > 0, q * jnp.log(jnp.where(q > 0, q, 1.0)), 0.0)
    score = jax.lax.dot_general(
        k_ref[:, :], post, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) - jnp.sum(qlogq, axis=0, keepdims=True)  # [1, B]
    out_ref[:, :] = score


@functools.partial(jax.jit, static_argnames=("len_g", "len_b", "interpret"))
def _scores_pallas(counts_p, ref_b, lphi_p, lprior_p, phi_p, k_p,
                   len_g: int, len_b: int, interpret: bool = False):
    G = counts_p.shape[1]
    grid = (G // BLOCK,)
    return pl.pallas_call(
        functools.partial(_kernel, len_g=len_g, len_b=len_b),
        out_shape=jax.ShapeDtypeStruct((1, G), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((SYM_PAD, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((SYM_PAD, GT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, GT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SYM_PAD, GT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GT_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(counts_p, ref_b, lphi_p, lprior_p, phi_p, k_p)


class PallasScoreTables:
    """Tile-padded device constants for the fused kernel."""

    def __init__(self, tables: ScoreTables):
        m = tables.model
        self.len_b, self.len_g = m.len_b, m.len_g
        lphi = np.zeros((SYM_PAD, GT_PAD), np.float32)
        lphi[: m.len_b, : m.len_g] = m.log_phi
        lprior = np.full((4, GT_PAD), 0.0, np.float32)
        lprior[:, : m.len_g] = m.log_prior
        phi = np.zeros((SYM_PAD, GT_PAD), np.float32)
        phi[: m.len_b, : m.len_g] = m.phi
        k = np.zeros((1, GT_PAD), np.float32)
        k[0, : m.len_g] = np.asarray(tables.k)
        self.lphi = jnp.asarray(lphi)
        self.lprior = jnp.asarray(lprior)
        self.phi = jnp.asarray(phi)
        self.k = jnp.asarray(k)


def site_scores_pallas(counts_t, ref_base, ptables: PallasScoreTables,
                       interpret: bool = False):
    """counts_t [NB, 5, G] int, ref_base [G] -> scores [NB, G] f32.

    G must be a multiple of BLOCK (layout chunks are 102400 = 50*2048).
    """
    nb, _b, G = counts_t.shape
    assert G % BLOCK == 0, G
    pad_rows = jnp.zeros((nb, SYM_PAD - counts_t.shape[1], G), counts_t.dtype)
    counts_p = jnp.concatenate([counts_t, pad_rows], axis=1)
    ref2 = ref_base.reshape(1, G).astype(jnp.int32)
    outs = [
        _scores_pallas(
            counts_p[i], ref2, ptables.lphi, ptables.lprior, ptables.phi,
            ptables.k, ptables.len_g, ptables.len_b, interpret,
        )[0]
        for i in range(nb)
    ]
    return jnp.stack(outs)
