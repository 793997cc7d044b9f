"""Scientific behaviour: BOSS enriches the under-sequenced genome region.

The reference demonstrates this with the chr20 playback walkthrough
(README.md:316-343): targeted regions keep full-length reads while resolved
regions get unblocked. Here: a genome with an abundant contig (4x the reads)
and a rare one — as the abundant contig's sites resolve, its reads get
rejected and the rare contig's share of sequenced bases rises above its share
in the control (accept-everything) condition.
"""
import numpy as np

from bossruns_tpu.io.paf import parse_paf
from bossruns_tpu.models.runs_sim import BossRunsSim
from bossruns_tpu.utils.datagen import write_corpus


def test_boss_enriches_rare_contig(tmp_path):
    # equal lengths, 5x molar abundance difference -> 5x per-site coverage
    paths = write_corpus(
        tmp_path / "data",
        rng=np.random.default_rng(99),
        contig_lengths={"abundant": 150_000, "rare": 150_000},
        n_reads=2600,
        mean_len=5000.0,
        abundance={"abundant": 5.0, "rare": 1.0},
    )
    origin = {}
    with open(paths["paf_full"]) as fh:
        rec = parse_paf(fh.read())
    for i in range(len(rec)):
        origin[rec.qname[i]] = rec.tname[i]

    sim = BossRunsSim(
        ref=paths["ref"], fq=paths["fq"], paf_full=paths["paf_full"],
        paf_trunc=paths["paf_trunc"], name="enrich", batchsize=160, maxb=15,
        out_base=tmp_path,
    )
    control = {"abundant": 0, "rare": 0}
    boss = {"abundant": 0, "rare": 0}
    for _ in range(15):
        sim.process_batch()
        # control sequences everything; boss sequences the decided lengths
        for rid, seq in sim.sampler.fq_stream.read_sequences.items():
            t = origin.get(rid)
            if t:
                control[t] += len(seq)
        for rid, seq in sim._last_decisions.items():
            t = origin.get(rid)
            if t:
                boss[t] += len(seq)
    share_control = control["rare"] / (control["rare"] + control["abundant"])
    share_boss = boss["rare"] / (boss["rare"] + boss["abundant"])
    # strategy must have activated and rejected something
    assert bool(np.asarray(sim.state.bucket_on).any())
    assert share_boss > share_control, (share_boss, share_control)
    # the abundant contig's strategy rejects more than the rare one's
    sd = sim.engine.strat_dict(sim.state)
    assert sd["abundant"].mean() <= sd["rare"].mean()
