"""BASELINE workload configs 3 & 4: diploid posteriors, barcoded multi-sample."""
import numpy as np

from bossruns_tpu.models.runs_sim import BossRunsSim
from bossruns_tpu.utils.datagen import write_corpus
from bossruns_tpu.utils.misc import read_strategy_npz


def test_diploid_sim(corpus, tmp_path):
    """Config 3: ploidy=2 genotype posteriors end-to-end."""
    sim = BossRunsSim(
        ref=corpus["ref"], fq=corpus["fq"], paf_full=corpus["paf_full"],
        paf_trunc=corpus["paf_trunc"], name="dip", batchsize=150, maxb=5,
        ploidy=2, out_base=tmp_path,
    )
    assert sim.engine.model.len_g == 15  # diploid + deletion genotypes
    for _ in range(5):
        sim.process_batch()
    assert np.asarray(sim.state.coverage).sum() > 0
    assert bool(np.asarray(sim.state.bucket_on).any())
    strat = np.asarray(sim.state.strat)[:, sim.layout.strat_row_valid, :]
    assert 0.0 < strat.mean() <= 1.0


def test_reject_refs_masked(corpus, tmp_path):
    """reject_refs contigs get a single-False mask and accumulate nothing."""
    sim = BossRunsSim(
        ref=corpus["ref"], fq=corpus["fq"], paf_full=corpus["paf_full"],
        paf_trunc=corpus["paf_trunc"], name="rej", batchsize=100, maxb=3,
        reject_refs="contigB", out_base=tmp_path,
    )
    assert sim.layout.names == ["contigA"]
    assert sim.layout.rejected_names == ["contigB"]
    sd = sim.engine.strat_dict(sim.state)
    assert sd["contigB"].shape == (1,) and not sd["contigB"].any()
    for _ in range(3):
        sim.process_batch()
    # all reads mapping to contigB were rejected (strategy lookup hits the
    # shape-1 array -> IndexError -> fail-closed)
    masks = read_strategy_npz(tmp_path / "out_rej" / "masks" / "boss.npz")
    assert set(masks) == {"contigA", "contigB"}


def test_barcoded_sim(tmp_path):
    """Config 4: per-barcode posterior/strategy arrays."""
    paths = write_corpus(
        tmp_path / "data",
        rng=np.random.default_rng(13),
        contig_lengths={"gA": 150_000},
        n_reads=900,
        mean_len=5000.0,
        barcodes=[1, 2],
    )
    sim = BossRunsSim(
        ref=paths["ref"], fq=paths["fq"], paf_full=paths["paf_full"],
        paf_trunc=paths["paf_trunc"], name="bc", batchsize=120, maxb=6,
        barcodes=["barcode01", "barcode02"], out_base=tmp_path,
    )
    assert sim.layout.n_barcodes == 2
    for _ in range(6):
        sim.process_batch()
    cov = np.asarray(sim.state.coverage)  # [2, 5, G]
    assert cov.shape[0] == 2
    # both barcodes accumulated coverage
    per_bc = cov.sum(axis=(1, 2))
    assert (per_bc > 0).all(), per_bc
    masks = read_strategy_npz(tmp_path / "out_bc" / "masks" / "boss.npz")
    assert masks["gA"].shape == (1500, 2, 2)  # barcode dim present
    # barcoded read dumps carry the barcode suffix
    reads0 = (tmp_path / "00_reads" / "boss_0.fa").read_text()
    assert reads0 == ""  # batch 0 file is the empty marker
