"""Checkpoint/resume + metrics: capabilities the reference lacks."""
import json
from pathlib import Path

import numpy as np

from bossruns_tpu.models.runs_sim import BossRunsSim


def test_checkpoint_and_resume(corpus, tmp_path):
    sim = BossRunsSim(
        ref=corpus["ref"], fq=corpus["fq"], paf_full=corpus["paf_full"],
        paf_trunc=corpus["paf_trunc"], name="ck", batchsize=100, maxb=8,
        out_base=tmp_path,
    )
    sim.checkpoint_every = 2
    for _ in range(4):
        sim.process_batch()
    ckpt = Path(tmp_path) / "out_ck" / "checkpoint" / "state.npz"
    assert ckpt.exists()
    cov_before = np.asarray(sim.state.coverage).sum()
    tb = sim.read_cache.time_boss

    # metrics were written each batch
    lines = (Path(tmp_path) / "out_ck" / "metrics" / "batches.jsonl").read_text().splitlines()
    assert len(lines) == 4
    rec = json.loads(lines[-1])
    assert rec["batch"] == 4 and "mean_coverage" in rec

    # simulate a crash: a fresh driver restores batch counter, device state,
    # pseudotime and the read-length histogram
    sim2 = BossRunsSim(
        ref=corpus["ref"], fq=corpus["fq"], paf_full=corpus["paf_full"],
        paf_trunc=corpus["paf_trunc"], name="ck", batchsize=100, maxb=8,
        out_base=tmp_path, resume=True,
    )
    assert sim2.batch == 4
    assert np.asarray(sim2.state.coverage).sum() == cov_before
    assert sim2.read_cache.time_boss == tb
    assert sim2.rl_dist.lam == sim.rl_dist.lam
    sim2.process_batch()  # continues cleanly
    assert sim2.batch == 5


def test_resume_from_legacy_int32_coverage(corpus, tmp_path):
    """Checkpoints written before the uint16-coverage change stored int32;
    resume must normalise the dtype (models/runs.py normalize_state) so the
    step compiles once with the current state signature."""
    sim = BossRunsSim(
        ref=corpus["ref"], fq=corpus["fq"], paf_full=corpus["paf_full"],
        paf_trunc=corpus["paf_trunc"], name="legacy", batchsize=100, maxb=8,
        out_base=tmp_path,
    )
    sim.checkpoint_every = 1
    sim.process_batch()
    ckpt = Path(tmp_path) / "out_legacy" / "checkpoint" / "state.npz"
    with np.load(ckpt) as z:
        arrays = {k: z[k] for k in z}
    arrays["coverage"] = arrays["coverage"].astype(np.int32)  # legacy dtype
    np.savez_compressed(ckpt, **arrays)

    sim2 = BossRunsSim(
        ref=corpus["ref"], fq=corpus["fq"], paf_full=corpus["paf_full"],
        paf_trunc=corpus["paf_trunc"], name="legacy", batchsize=100, maxb=8,
        out_base=tmp_path, resume=True,
    )
    assert sim2.state.coverage.dtype == np.uint16
    assert (
        np.asarray(sim2.state.coverage).sum()
        == np.asarray(sim.state.coverage).sum()
    )
    sim2.process_batch()
    assert sim2.batch == 2
