"""Repeat filter: drop reads whose ends look like repeats (AEONS, optional).

Mirrors /root/reference/boss/aeons/repeats.py: from an initial read pool,
100-bp windows of every sequence are mapped back onto the pool; window
coverage above the 99.9th percentile (>= 3) marks repeat blocks (>= 100 bp),
which form a repeat library. Each subsequent batch maps the library onto the
new reads; reads with repeat coverage near either end (> 5 summed coverage in
a 500-bp end window) are dropped before entering the overlap graph.

Mapping runs on the device ava machinery instead of mappy subcalls.
"""
from __future__ import annotations

import logging

import numpy as np

from .ava import PoolIndex, find_overlaps

logger = logging.getLogger("boss_tpu")

WINDOW = 100
END_WINDOW = 500


def _find_blocks_ge(arr: np.ndarray, x: float, min_len: int) -> list[tuple[int, int]]:
    """Runs of arr >= x longer than min_len (utils.py:162-188)."""
    pos = np.flatnonzero(arr >= x)
    if pos.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(pos) > 1)
    starts = np.concatenate([[pos[0]], pos[breaks + 1]])
    ends = np.concatenate([pos[breaks] + 1, [pos[-1] + 1]])
    return [(int(s), int(e)) for s, e in zip(starts, ends) if e - s > min_len]


class RepeatFilter:
    def __init__(self, seqs: dict[str, str], min_votes: int = 3):
        self.min_votes = min_votes
        pidx = PoolIndex(seqs)
        chopped = {}
        for header, seq in seqs.items():
            for i in range(0, len(seq), WINDOW):
                chopped[f"{header}-{i:010}"] = seq[i : i + WINDOW]
        rows = find_overlaps(chopped, pidx, min_votes=2, exclude_self=False)
        covs: dict[str, np.ndarray] = {}
        for i in range(len(rows["qname"])):
            t = rows["tname"][i]
            if rows["qname"][i].rsplit("-", 1)[0] == t:
                continue  # self window
            if t not in covs:
                covs[t] = np.zeros(rows["tlen"][i])
            covs[t][rows["tstart"][i] : rows["tend"][i]] += 1
        # coverage quantile -> repeat limit (repeats.py:98-122)
        all_vals = np.concatenate([c for c in covs.values()]) if covs else np.zeros(1)
        lim = max(float(np.quantile(all_vals, 0.999)), 3.0)
        self.lim = lim
        self.repeats: dict[str, str] = {}
        for header, cov in covs.items():
            for s, e in _find_blocks_ge(cov, lim, min_len=100):
                self.repeats[f"{header}-rep-{s}"] = seqs[header][s:e]
        logger.info(f"repeat filter: {len(self.repeats)} repeat blocks, limit {lim}")

    def filter_batch(self, seq_dict: dict[str, str]) -> dict[str, str]:
        """Drop reads with repeat hits near either end (repeats.py:160-202)."""
        if not self.repeats or not seq_dict:
            return seq_dict
        ridx = PoolIndex(seq_dict)
        rows = find_overlaps(self.repeats, ridx, min_votes=self.min_votes, exclude_self=False)
        danger = set()
        for i in range(len(rows["qname"])):
            t = rows["tname"][i]
            tl = rows["tlen"][i]
            if rows["tstart"][i] < END_WINDOW or rows["tend"][i] > tl - END_WINDOW:
                danger.add(t)
        logger.info(f"repeat filter: dropping {len(danger)} reads")
        return {h: s for h, s in seq_dict.items() if h not in danger}
