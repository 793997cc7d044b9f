"""The readfish-side decision loop, end-to-end against in-repo fakes.

Mirrors how the reference unit-tests its entry point without a sequencer
(tests/playback/test_dynamic_readfish.py: `return_conf` hook + canned npz
files): a fake Read Until client / caller / mapper drive
`bossruns_tpu.live.readfish_boss.Analysis.run`, and the tests assert the
channels.toml handshake, per-read decision delivery, the override ladder
(control region, min/max chunks, first-read, duplex, dry-run), mask
hot-reload mid-run, and bounded chunk tracking.
"""
import logging
import os
import time

import numpy as np
import pytest

from bossruns_tpu.live.conf import Action, Chemistry, RFConf
from bossruns_tpu.live.decision import Decision
from bossruns_tpu.live.readfish_boss import (
    Analysis,
    BossBits,
    ChunkTracker,
    get_args,
    run as rf_run,
)
from bossruns_tpu.utils.misc import write_strategy_npz

logger = logging.getLogger("test_readfish")

RF_TOML = """
[caller_settings.fake]
config = "fake"

[mapper_settings.fake]
fn_idx_in = "fake.fa"

[[regions]]
name = "runs"
min_chunks = 0
max_chunks = 2
targets = []
single_on = "stop_receiving"
multi_on = "stop_receiving"
single_off = "unblock"
multi_off = "unblock"
no_seq = "unblock"
no_map = "proceed"
above_max_chunks = "unblock"
below_min_chunks = "proceed"

[[regions]]
name = "control"
control = true
min_chunks = 0
max_chunks = 2
targets = []
single_on = "stop_receiving"
multi_on = "stop_receiving"
single_off = "stop_receiving"
multi_off = "stop_receiving"
no_seq = "stop_receiving"
no_map = "stop_receiving"
"""


# ------------------------------------------------------------------ fakes ---

class Aln:
    def __init__(self, ctg, r_st, r_en, strand):
        self.ctg, self.r_st, self.r_en, self.strand = ctg, r_st, r_en, strand


class Result:
    def __init__(self, channel, read_id, seq="ACGT" * 100, alignments=(),
                 barcode=None, read_number=None):
        self.channel = channel
        self.read_id = read_id
        self.read_number = read_number if read_number is not None else hash(read_id) % 10_000
        self.seq = seq
        self.alignment_data = list(alignments)
        self.barcode = barcode
        self.decision = None


class FakeClient:
    """Read Until client protocol: batches of pre-mapped results."""

    def __init__(self, batches, channel_count=64, run_dir="."):
        self.batches = list(batches)
        self.channel_count = channel_count
        self.mk_run_dir = str(run_dir)
        self.unblocked: list = []
        self.stopped: list = []
        self.signal_dtype = "i2"
        self.calibration_values = None
        self.wait_for_sequencing_to_start = False

    @property
    def is_sequencing(self):
        return bool(self.batches)

    def get_read_chunks(self, batch_size, last=True):
        return self.batches.pop(0) if self.batches else []

    def unblock_read_batch(self, actions, duration=0.1):
        self.unblocked.extend(actions)

    def stop_receiving_batch(self, actions):
        self.stopped.extend(actions)


class FakeCaller:
    def basecall(self, chunks, *_):
        return chunks


class FakeMapper:
    initialised = True

    def __init__(self):
        self.index_loads: list[str] = []

    def map_reads(self, calls):
        return calls

    def load_index(self, fasta):
        self.index_loads.append(fasta)


def _write_masks(tmp_path, name="runs", accept=True):
    """One contig 'c1' of 100 bins: all-accept or all-reject."""
    out = tmp_path / f"out_{name}"
    (out / "masks").mkdir(parents=True, exist_ok=True)
    write_strategy_npz(out, {"c1": np.full((100, 2), accept, dtype=bool)})
    return out


def _analysis(tmp_path, client, chemistry=Chemistry.SIMPLEX, dry_run=False,
              started_mid_sequencing=False, debug_log=None):
    conf = RFConf.from_toml_str(RF_TOML, channel_count=client.channel_count)
    worker = Analysis(
        client, conf=conf, logger=logger, caller=FakeCaller(),
        mapper=FakeMapper(), throttle=0.0, dry_run=dry_run,
        chemistry=chemistry, out_base=tmp_path, debug_log=debug_log,
    )
    worker.readfish_started_during_sequencing = started_mid_sequencing
    return worker


# -------------------------------------------------------------- conf layer --

def test_rfconf_parses_regions_and_channels(tmp_path):
    toml = tmp_path / "rf.toml"
    toml.write_text(RF_TOML)
    conf = RFConf.from_file(toml, channel_count=64)
    assert [r.name for r in conf.regions] == ["runs", "control"]
    control, cond = conf.get_conditions(1, None)
    assert not control and cond.name == "runs"
    control, cond = conf.get_conditions(64, None)
    assert control and cond.name == "control"
    assert cond.get_action(Decision.single_on) is Action.stop_receiving


def test_channels_toml_roundtrip_with_sequencer(tmp_path):
    """The file Analysis writes is what the BOSS process parses."""
    from bossruns_tpu.live.sequencer import Sequencer

    conf = RFConf.from_toml_str(RF_TOML, channel_count=64)
    conf.write_channels_toml(tmp_path)
    assert (tmp_path / "channels.toml").exists()
    seq = Sequencer(out_path=str(tmp_path))
    seq.grab_channels(run_name="runs", retries=1, wait=0)
    assert seq.channels == set(range(1, 33))  # first half of 64 channels


def test_get_args_fallback_parser():
    parser, args = get_args(["rf.toml", "MS00000", "runs"])
    assert args.toml == "rf.toml"
    assert args.device == "MS00000"
    assert args.experiment_name == "runs"
    assert args.host == "127.0.0.1"


def test_run_return_conf_hook(tmp_path):
    """reference readfish_boss.py:668-670 — conf without touching hardware."""
    toml = tmp_path / "rf.toml"
    toml.write_text(RF_TOML)
    parser, args = get_args([str(toml), "MS00000", "runs"])
    args.return_conf = True
    conf, rlogger = rf_run(parser, args, [])
    assert [r.name for r in conf.regions] == ["runs", "control"]


def test_gen_dummy_idx(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = BossBits.gen_dummy_idx()
    assert p.exists() and p.read_text().startswith(">init")


# ---------------------------------------------------------------- the loop --

def test_loop_delivers_decisions_and_channels_toml(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _write_masks(tmp_path, accept=False)  # strategy: reject everything
    on_target = Result(1, "r1", alignments=[Aln("c1", 500, 900, 1)])
    unmapped = Result(2, "r2", alignments=[])
    noseq = Result(3, "r3", seq="")
    client = FakeClient([[on_target, unmapped, noseq]], run_dir=tmp_path)
    worker = _analysis(tmp_path, client)
    worker.run()
    # handshake file written for the BOSS process
    assert (tmp_path / "channels.toml").exists()
    # single_off (mask False) -> unblock; no_map -> proceed (nothing sent);
    # no_seq -> unblock per the toml
    assert (1, on_target.read_id) in client.unblocked
    assert (3, noseq.read_id) in client.unblocked
    assert all(ch != 2 for ch, _ in client.unblocked + client.stopped)
    assert worker.loop_statistics.total_reads == 3


def test_loop_accepts_on_mask_true(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _write_masks(tmp_path, accept=True)
    r = Result(1, "r1", alignments=[Aln("c1", 500, 900, 1)])
    client = FakeClient([[r]], run_dir=tmp_path)
    worker = _analysis(tmp_path, client)
    worker.run()
    assert (1, r.read_id) in client.stopped  # single_on -> stop_receiving
    assert client.unblocked == []


def test_mask_hot_reload_changes_decisions(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = _write_masks(tmp_path, accept=True)
    mk = lambda rid: Result(1, rid, alignments=[Aln("c1", 500, 900, 1)])
    r1, r2 = mk("r1"), mk("r2")
    client = FakeClient([[r1]], run_dir=tmp_path)
    worker = _analysis(tmp_path, client)
    worker.run()
    assert (1, r1.read_id) in client.stopped
    # BOSS rewrites the strategy (mtime must advance for the reload gate)
    time.sleep(0.01)
    write_strategy_npz(out, {"c1": np.zeros((100, 2), dtype=bool)})
    os.utime(out / "masks" / "boss.npz")
    client.batches = [[r2]]
    worker.run()
    assert (1, r2.read_id) in client.unblocked  # now rejected


def test_control_region_always_stop_receiving(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _write_masks(tmp_path, accept=False)
    # channel 64 is in the control region; mask says reject, control wins
    r = Result(64, "rc", alignments=[Aln("c1", 500, 900, 1)])
    client = FakeClient([[r]], run_dir=tmp_path)
    worker = _analysis(tmp_path, client)
    worker.run()
    assert (64, r.read_id) in client.stopped
    assert client.unblocked == []


def test_first_read_override_when_started_mid_sequencing(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _write_masks(tmp_path, accept=False)
    mk = lambda rid: Result(1, rid, alignments=[Aln("c1", 500, 900, 1)])
    r1, r2 = mk("a"), mk("b")
    client = FakeClient([[r1], [r2]], run_dir=tmp_path)
    worker = _analysis(tmp_path, client, started_mid_sequencing=True)
    worker.run()
    # first read on the channel: unknown elapsed length -> sequenced
    assert (1, r1.read_id) in client.stopped
    assert r1.decision is Decision.first_read_override
    # second read gets the real (unblock) decision
    assert (1, r2.read_id) in client.unblocked


def test_dry_run_overrides_unblocks(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _write_masks(tmp_path, accept=False)
    r = Result(1, "r1", alignments=[Aln("c1", 500, 900, 1)])
    client = FakeClient([[r]], run_dir=tmp_path)
    worker = _analysis(tmp_path, client, dry_run=True)
    worker.run()
    assert client.unblocked == []
    assert (1, r.read_id) in client.stopped


def test_above_max_chunks_unblocks_proceed(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _write_masks(tmp_path, accept=False)
    # unmapped reads proceed; after max_chunks=2 sightings the override kicks
    mk = lambda: Result(5, "same-read", alignments=[])
    client = FakeClient([[mk()], [mk()], [mk()]], run_dir=tmp_path)
    worker = _analysis(tmp_path, client)
    worker.run()
    assert len(client.unblocked) == 1  # only the 3rd sighting acts
    assert client.stopped == []


def test_duplex_simple_override(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = _write_masks(tmp_path, accept=True)
    # read A accepted (stop_receiving); strategy flips; read B on the same
    # channel would be unblocked but is kept as a possible duplex 2nd strand
    rA = Result(1, "a", alignments=[Aln("c1", 500, 900, 1)])
    rB = Result(1, "b", alignments=[Aln("c1", 500, 900, -1)])
    client = FakeClient([[rA]], run_dir=tmp_path)
    worker = _analysis(tmp_path, client, chemistry=Chemistry.DUPLEX_SIMPLE)
    worker.run()
    assert (1, rA.read_id) in client.stopped
    time.sleep(0.01)
    write_strategy_npz(out, {"c1": np.zeros((100, 2), dtype=bool)})
    os.utime(out / "masks" / "boss.npz")
    client.batches = [[rB]]
    worker.run()
    assert (1, rB.read_id) in client.stopped
    assert rB.decision is Decision.duplex_override


def test_duplex_full_requires_opposite_strand(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out = _write_masks(tmp_path, accept=True)
    rA = Result(1, "a", alignments=[Aln("c1", 500, 900, 1)])
    rB = Result(1, "b", alignments=[Aln("c1", 500, 900, -1)])  # opposite
    rC = Result(2, "c", alignments=[Aln("c1", 500, 900, 1)])
    rD = Result(2, "d", alignments=[Aln("c1", 500, 900, 1)])  # same strand
    client = FakeClient([[rA, rC]], run_dir=tmp_path)
    worker = _analysis(tmp_path, client, chemistry=Chemistry.DUPLEX)
    worker.run()
    time.sleep(0.01)
    write_strategy_npz(out, {"c1": np.zeros((100, 2), dtype=bool)})
    os.utime(out / "masks" / "boss.npz")
    client.batches = [[rB, rD]]
    worker.run()
    assert (1, rB.read_id) in client.stopped   # duplex candidate kept
    assert rB.decision is Decision.duplex_override
    assert (2, rD.read_id) in client.unblocked  # same strand: no duplex


def test_chunk_tracker_bounded_by_channels():
    t = ChunkTracker(channels=4)
    for i in range(1000):
        t.seen(channel=i % 4, read_id=f"read-{i}")
    assert len(t.slots) <= 4  # ejected reads can never leak entries
    assert t.seen(1, "x") == 1
    assert t.seen(1, "x") == 2
    assert t.seen(1, "y") == 1  # new read resets the channel slot


def test_stats_tsv_written(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _write_masks(tmp_path, accept=True)
    r = Result(1, "r1", alignments=[Aln("c1", 500, 900, 1)])
    client = FakeClient([[r]], run_dir=tmp_path)
    worker = _analysis(tmp_path, client, debug_log=str(tmp_path / "chunks.tsv"))
    worker.run()
    lines = (tmp_path / "chunks.tsv").read_text().strip().split("\n")
    assert lines[0].startswith("client_iteration\t")
    assert len(lines) == 2
    assert "\tsingle_on\t" in lines[1]
    worker.loop_statistics.close()


# ------------------------------------------------------- launch hardening ---

def test_search_running_process_finds_by_cmdline():
    import subprocess

    from bossruns_tpu.live.sequencer import LiveRun

    p = subprocess.Popen(["sleep", "7.654321"])
    try:
        time.sleep(0.1)
        assert LiveRun.search_running_process(["sleep", "7.654321"]) == p.pid
        assert LiveRun.search_running_process(["no-such-proc-xyz"]) is None
    finally:
        p.kill()
        p.wait()


def test_launch_readfish_skips_when_already_running(monkeypatch, tmp_path):
    from bossruns_tpu.live.sequencer import LiveRun

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(LiveRun, "search_running_process", staticmethod(lambda kw: 4242))
    spawned = []
    import subprocess

    monkeypatch.setattr(subprocess, "Popen", lambda *a, **k: spawned.append(a))
    assert LiveRun.launch_readfish("rf.toml", "MS00000", "runs") is None
    assert spawned == []  # guard fired before any Popen
