"""Contig scoring / expected benefit / strategy threshold for BOSS-AEONS.

Device pipeline over the current contig set (rebuilt per batch — AEONS state
lives in per-contig coverage arrays, so scoring is a pure function of
coverage). Semantics mirror /root/reference/boss/aeons/sequences.py:

  * sigmoid low-coverage score 1/(exp(cov_mean - lowcov) + 1), cov capped at
    100 (Benefit.init_scoring_vec/score_array :1522-1551) — computed directly
    instead of via the 101-entry lookup,
  * uncapped low-coverage contig ends get score 1 ("nodes of interest",
    Sequence.set_contig_ends :371-395),
  * S_mu and the CCL-weighted benefit as clamped-segment window sums with
    virtual unit-score mass beyond uncapped ends (replacing the reference's
    physical array expansion by ccl_max, Benefit._expand_scores :1589-1604),
  * unweighted exponent-bin threshold scan: cs_u = cumsum(bin*count)+ubar0,
    cs_t = cumsum(tc*count)+tbar0 with alpha=200 (ContigPool.find_threshold
    :1059-1094 — note the reference uses alpha=200 here vs 300 in RUNS).

Contig layout: all contigs concatenate on a 100-site-chunk axis padded to a
power-of-two total so jit sees few distinct shapes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.genome_ops import _csum, frexp_abs_exponent, windowed_sums_fwd, windowed_sums_rev

NODE = 100
NBINS = 192


@partial(jax.jit, static_argnames=())
def _strategy_jit(cov_chunked, seg_start, seg_end, row_valid, noi,
                  e_l, e_r, lowcov, ccl_ds, mu_ds, tc, tbar0):
    """cov_chunked [N] f32 (sum of per-base cov per 100-chunk); seg_* [N];
    noi [N] bool (end nodes of interest); e_l/e_r [N] bool (row is in a
    segment whose left/right end is uncapped).

    One fused kernel: benefit windows AND the threshold scan — smu_sum stays
    a device scalar instead of forcing a host round trip between two jits
    (a D2H sync costs ~33 ms on a tunneled chip, more than the compute).
    Returns (benefit [N,2], vec [2] = [threshold, any_nonzero])."""
    cov_mean = jnp.minimum(jnp.floor(cov_chunked / NODE), 100.0)
    scores = 1.0 / (jnp.exp(cov_mean - lowcov) + 1.0)
    scores = jnp.where(noi, 1.0, scores)
    scores = jnp.where(row_valid, scores, 0.0)

    n = scores.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)
    cs = _csum(scores)

    def fwd(w):
        base = windowed_sums_fwd(cs, w, seg_end, rows)
        # virtual unit scores beyond an uncapped right end
        over = jnp.maximum(rows + w - seg_end, 0)
        return base + jnp.where(e_r, jnp.minimum(over, w).astype(cs.dtype), 0.0)

    def rev(w):
        base = windowed_sums_rev(cs, w, seg_start, rows)
        over = jnp.maximum(seg_start - (rows + 1 - w), 0)
        return base + jnp.where(e_l, jnp.minimum(over, w).astype(cs.dtype), 0.0)

    smu = jnp.stack([fwd(mu_ds), rev(mu_ds)], axis=-1)
    weights = jnp.arange(0.1, 1.1, 0.1, dtype=cs.dtype)[::-1]
    ebf = jnp.zeros_like(scores)
    ebr = jnp.zeros_like(scores)
    for i in range(10):
        w = jnp.maximum(ccl_ds[i], 1)
        ebf = ebf + weights[i] * fwd(w)
        ebr = ebr + weights[i] * rev(w)
    benefit = jnp.maximum(jnp.stack([ebf, ebr], axis=-1) - smu, 0.0)
    benefit = jnp.where(row_valid[:, None], benefit, 0.0)

    # threshold scan (ContigPool.find_threshold :1059-1094), fused in
    smu_sum = jnp.sum(smu)
    b = benefit.ravel()
    nz = b > 0
    any_nz = jnp.any(nz)
    norm = jnp.max(b)
    norm_safe = jnp.where(norm > 0, norm, 1.0)
    idx = frexp_abs_exponent(jnp.where(nz, b / norm_safe, 1.0), NBINS)
    counts = jnp.zeros(NBINS, b.dtype).at[idx].add(nz.astype(b.dtype))
    used = counts > 0
    bin_ids = jnp.arange(NBINS, dtype=jnp.int32)
    bbin = jnp.exp2(-bin_ids.astype(b.dtype)) * norm_safe
    cs_u = jnp.cumsum(bbin * counts) + smu_sum
    cs_t = jnp.cumsum(tc * counts) + tbar0
    peak = jnp.where(used, cs_u / cs_t, -jnp.inf)
    kmax = jnp.argmax(peak)
    after = used & (bin_ids > kmax)
    nxt = jnp.min(jnp.where(after, bin_ids, NBINS))
    last_used = jnp.max(jnp.where(used, bin_ids, -1))
    thr_idx = jnp.where(nxt < NBINS, nxt, last_used).astype(jnp.int32)
    thr = bbin[jnp.maximum(thr_idx, 0)]
    return benefit, jnp.stack([thr, any_nz.astype(b.dtype)])


def _pad_pow2(n: int, floor: int = 1 << 10) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


def contig_strategies(
    contigs,  # dict[str, Sequence]
    ccl: np.ndarray,
    lam: float,
    lowcov: float = 10.0,
    mu: int = 400,
    end_lim: int = 50,
) -> tuple[dict[str, np.ndarray], float]:
    """Per-contig strategy masks [(ceil(len/100), 2) bool] + threshold."""
    names = list(contigs)
    if not names:
        return {}, 0.0
    nd = [int(-(-len(contigs[h].seq) // NODE)) for h in names]
    total = sum(nd)
    n_pad = _pad_pow2(total)
    cov_chunked = np.zeros(n_pad, np.float32)
    seg_start = np.zeros(n_pad, np.int32)
    seg_end = np.zeros(n_pad, np.int32)
    row_valid = np.zeros(n_pad, bool)
    noi = np.zeros(n_pad, bool)
    e_l = np.zeros(n_pad, bool)
    e_r = np.zeros(n_pad, bool)
    off = 0
    offsets = {}
    for h, ndc in zip(names, nd):
        s = contigs[h]
        cc = np.add.reduceat(s.cov, np.arange(0, len(s.cov), NODE)).astype(np.float32)
        cov_chunked[off : off + ndc] = cc
        seg_start[off : off + ndc] = off
        seg_end[off : off + ndc] = off + ndc
        row_valid[off : off + ndc] = True
        # contig-end nodes of interest (set_contig_ends :371-395)
        end_l = not s.cap_l and cc[0] <= end_lim * NODE
        end_r = not s.cap_r and cc[-1] <= end_lim * NODE
        if end_l:
            noi[off] = True
        if end_r:
            noi[off + ndc - 1] = True
        e_l[off : off + ndc] = end_l
        e_r[off : off + ndc] = end_r
        offsets[h] = (off, ndc)
        off += ndc
    # pad rows form their own empty segments
    pad_rows = np.arange(total, n_pad, dtype=np.int32)
    seg_start[total:] = pad_rows
    seg_end[total:] = pad_rows + 1

    import jax.numpy as jnp

    ccl_ds = np.maximum(np.asarray(ccl) // NODE, 1).astype(np.int32)
    alpha, rho = 200 // NODE, 300 // NODE
    tc = max((lam - mu - 300) // NODE, 1.0)
    tbar0 = alpha + rho + mu // NODE
    benefit, vec = _strategy_jit(
        jnp.asarray(cov_chunked), jnp.asarray(seg_start), jnp.asarray(seg_end),
        jnp.asarray(row_valid), jnp.asarray(noi), jnp.asarray(e_l), jnp.asarray(e_r),
        jnp.float32(lowcov), jnp.asarray(ccl_ds), jnp.int32(mu // NODE),
        jnp.float32(tc), jnp.float32(tbar0),
    )
    # exactly two D2H pulls: the benefit array and the packed scalars
    ben_np = np.asarray(benefit)
    thr_v, any_nz = np.asarray(vec)
    thr_f = float(thr_v) if any_nz else 0.0
    strats = {}
    for h in names:
        off, ndc = offsets[h]
        strats[h] = ben_np[off : off + ndc] >= thr_f if thr_f > 0 else np.ones((ndc, 2), bool)
    return strats, thr_f
