"""Process B of the two-process live rehearsal: the readfish decision plane.

Launched by tests/test_two_process_live.py as its own OS process. Runs the
REAL Analysis hot loop (bossruns_tpu/live/readfish_boss.py) against a fake
Read Until client that emits probe reads spread across the contig every
iteration; BossBits polls <workdir>/out_<name>/masks/boss.npz written by the
boss process (proc_boss_live.py) and every per-read decision lands in
<workdir>/decisions.tsv. The loop runs until <workdir>/stop_readfish exists.

usage: proc_readfish_shim.py <workdir> <name> <contig> <contig_len> <throttle>
"""
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RF_TOML_TMPL = """
[caller_settings.fake]
config = "fake"

[mapper_settings.fake]
fn_idx_in = "fake.fa"

[[regions]]
name = "{name}"
min_chunks = 0
max_chunks = 999
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
max_chunks = 999
targets = []
single_on = "stop_receiving"
multi_on = "stop_receiving"
single_off = "stop_receiving"
multi_off = "stop_receiving"
no_seq = "stop_receiving"
no_map = "stop_receiving"
"""

N_PROBES = 40


class Aln:
    def __init__(self, ctg, r_st, r_en, strand):
        self.ctg, self.r_st, self.r_en, self.strand = ctg, r_st, r_en, strand


class Result:
    def __init__(self, channel, read_id, seq, alignments):
        self.channel = channel
        self.read_id = read_id
        self.read_number = abs(hash(read_id)) % 10_000
        self.seq = seq
        self.alignment_data = list(alignments)
        self.barcode = None
        self.decision = None


class ProbeClient:
    """Emits N_PROBES pre-mapped reads spread over the contig per iteration
    until the stop file appears."""

    def __init__(self, contig, contig_len, stop_file, run_dir):
        self.contig = contig
        self.contig_len = int(contig_len)
        self.stop_file = Path(stop_file)
        self.mk_run_dir = str(run_dir)
        self.channel_count = 64
        self.signal_dtype = "i2"
        self.calibration_values = None
        self.wait_for_sequencing_to_start = False
        self.iteration = 0
        self.unblocked: list = []
        self.stopped: list = []

    @property
    def is_sequencing(self):
        return not self.stop_file.exists()

    def get_read_chunks(self, batch_size, last=True):
        self.iteration += 1
        out = []
        step = self.contig_len // N_PROBES
        for i in range(N_PROBES):
            pos = min(i * step + 50, self.contig_len - 500)
            strand = 1 if i % 2 == 0 else -1
            rid = f"p_{pos}_{1 if strand == 1 else 0}_{self.iteration}"
            out.append(Result(
                channel=1 + (i % 8), read_id=rid, seq="ACGT" * 100,
                alignments=[Aln(self.contig, pos, pos + 400, strand)],
            ))
        return out

    def unblock_read_batch(self, actions, duration=0.1):
        self.unblocked.extend(actions)

    def stop_receiving_batch(self, actions):
        self.stopped.extend(actions)


class EchoCaller:
    def basecall(self, chunks, *_):
        return chunks


class EchoMapper:
    initialised = True

    def map_reads(self, calls):
        return calls


def main():
    workdir, name, contig, contig_len, throttle = sys.argv[1:6]
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    logger = logging.getLogger("rf_shim")
    from bossruns_tpu.live.conf import RFConf
    from bossruns_tpu.live.readfish_boss import Analysis

    wd = Path(workdir)
    (wd / "run").mkdir(parents=True, exist_ok=True)
    conf = RFConf.from_toml_str(RF_TOML_TMPL.format(name=name), channel_count=64)
    client = ProbeClient(contig, contig_len, wd / "stop_readfish", wd / "run")
    worker = Analysis(
        client, conf=conf, logger=logger, caller=EchoCaller(),
        mapper=EchoMapper(), throttle=float(throttle), out_base=wd,
        debug_log=str(wd / "decisions.tsv"),
    )
    worker.readfish_started_during_sequencing = False
    (wd / "rf_started").write_text("ok")
    worker.run()
    print(f"readfish shim done after {client.iteration} iterations", flush=True)


if __name__ == "__main__":
    main()
