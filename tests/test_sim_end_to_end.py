"""End-to-end BOSS-RUNS simulation on the synthetic corpus."""
from pathlib import Path

import numpy as np

from bossruns_tpu.models.runs_sim import BossRunsSim
from bossruns_tpu.utils.misc import read_strategy_npz


def test_sim_runs_and_writes_strategies(corpus, tmp_path):
    sim = BossRunsSim(
        ref=corpus["ref"],
        fq=corpus["fq"],
        paf_full=corpus["paf_full"],
        paf_trunc=corpus["paf_trunc"],
        name="t1",
        batchsize=150,
        maxb=6,
        out_base=tmp_path,
    )
    npz = Path(tmp_path) / "out_t1" / "masks" / "boss.npz"
    assert npz.exists()
    init = read_strategy_npz(npz)
    assert set(init) == {"contigA", "contigB"}
    assert init["contigA"].shape == (2200, 2, 1)
    assert init["contigA"].all()  # initial strategy accepts everywhere

    sim.run(6)

    # pseudotime: control sequences everything, boss saves time via rejections
    assert sim.read_cache.time_control > 0
    assert sim.read_cache.time_boss > 0
    final = read_strategy_npz(npz)
    assert final["contigA"].shape == (2200, 2, 1)
    assert final["contigB"].shape == (1300, 2, 1)

    # read dumps exist
    assert (Path(tmp_path) / "00_reads" / "control_0.fa").exists()

    # coverage actually accumulated on device
    cov = np.asarray(sim.state.coverage)
    assert cov.sum() > 0
    # read length distribution learned from accepted reads
    assert sim.rl_dist.lam != 6000.0


def test_sim_sampling_from_gz_source(corpus, tmp_path):
    """A `.gz` fastq source samples identically to the plain file
    (reference capability: /root/reference/boss/sampler.py:75-116)."""
    import gzip
    import shutil

    from bossruns_tpu.io.sampler import FastqStream, Sampler

    gz = tmp_path / "reads.fq.gz"
    with open(corpus["fq"], "rb") as src, gzip.open(gz, "wb") as dst:
        shutil.copyfileobj(src, dst)

    plain = FastqStream(corpus["fq"], batchsize=50, maxbatch=3, seed=4, shuffle=True)
    zipped = FastqStream(str(gz), batchsize=50, maxbatch=3, seed=4, shuffle=True)
    for _ in range(3):
        plain.read_batch()
        zipped.read_batch()
        assert zipped.read_sequences == plain.read_sequences
        assert zipped.read_qualities == plain.read_qualities
        assert zipped.read_barcodes == plain.read_barcodes

    # full facade path (what BossRunsSim constructs) accepts the gz source
    s = Sampler(str(gz), corpus["paf_full"], corpus["paf_trunc"],
                batchsize=50, maxbatch=1)
    seqs, _, _, paf_f, paf_t = s.sample()
    assert len(seqs) == 50 and paf_f and paf_t


def test_sim_rejections_reduce_boss_time(corpus, tmp_path):
    sim = BossRunsSim(
        ref=corpus["ref"],
        fq=corpus["fq"],
        paf_full=corpus["paf_full"],
        paf_trunc=corpus["paf_trunc"],
        name="t2",
        batchsize=150,
        maxb=7,
        out_base=tmp_path,
        config=None,
    )
    # drive coverage up until strategy activates and rejections begin
    rejected_any = False
    for _ in range(7):
        sim.process_batch()
        if sim.read_cache.time_boss < sim.read_cache.time_control:
            rejected_any = True
    assert bool(np.asarray(sim.state.bucket_on).any())  # strategy switched on
    assert rejected_any  # scientific property: boss pseudotime < control
    # after activation some sites must be rejected (strategy not all-ones)
    strat = np.asarray(sim.state.strat)[:, sim.layout.strat_row_valid, :]
    assert strat.mean() < 1.0
