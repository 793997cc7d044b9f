"""Gated batch flow == classic batch flow, bit for bit.

The gated flow uploads BOTH candidate coverage sets during prefetch and
selects rows on device with per-read decision bits (models/runs.py
step_gated); the classic flow packs only the selected rows after deciding.
Same corpus, same seed -> the two sims must agree exactly on coverage,
strategies, pseudotime and decisions at every batch.
"""
import numpy as np
import pytest

from bossruns_tpu.models.runs_sim import BossRunsSim


@pytest.mark.parametrize("quirks", [False, True])
def test_gated_matches_classic(corpus, tmp_path, quirks):
    def make(gated, name):
        return BossRunsSim(
            ref=corpus["ref"], fq=corpus["fq"], paf_full=corpus["paf_full"],
            paf_trunc=corpus["paf_trunc"], name=name, batchsize=200,
            maxb=5, out_base=tmp_path / name, gated=gated,
            reference_quirks=quirks,
        )

    a = make(False, f"classic{int(quirks)}")
    b = make(True, f"gated{int(quirks)}")
    assert not a._gated and b._gated
    for step in range(5):
        a.process_batch()
        b.process_batch()
        np.testing.assert_array_equal(
            np.asarray(a.state.coverage), np.asarray(b.state.coverage),
            err_msg=f"coverage step {step}",
        )
        np.testing.assert_array_equal(
            np.asarray(a.state.strat), np.asarray(b.state.strat),
            err_msg=f"strat step {step}",
        )
        np.testing.assert_array_equal(
            np.asarray(a.state.read_starts), np.asarray(b.state.read_starts),
            err_msg=f"read_starts step {step}",
        )
        assert a.read_cache.time_boss == b.read_cache.time_boss, step
        assert a.read_cache.time_control == b.read_cache.time_control, step
        assert a._last_decisions == b._last_decisions, step
    for name in a.strat_host:
        np.testing.assert_array_equal(a.strat_host[name], b.strat_host[name])


def test_gated_accept_unmapped(corpus, tmp_path):
    a = BossRunsSim(ref=corpus["ref"], fq=corpus["fq"],
                    paf_full=corpus["paf_full"], paf_trunc=corpus["paf_trunc"],
                    name="cau", batchsize=200, maxb=4, out_base=tmp_path / "cau",
                    gated=False, accept_unmapped=True)
    b = BossRunsSim(ref=corpus["ref"], fq=corpus["fq"],
                    paf_full=corpus["paf_full"], paf_trunc=corpus["paf_trunc"],
                    name="gau", batchsize=200, maxb=4, out_base=tmp_path / "gau",
                    gated=True, accept_unmapped=True)
    for _ in range(4):
        a.process_batch()
        b.process_batch()
    np.testing.assert_array_equal(
        np.asarray(a.state.coverage), np.asarray(b.state.coverage)
    )
    np.testing.assert_array_equal(
        np.asarray(a.state.strat), np.asarray(b.state.strat)
    )
