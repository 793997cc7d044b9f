"""Process A of the two-process live rehearsal: a real BossRuns live loop.

Launched by tests/test_two_process_live.py as its own OS process (the
reference's playback tier launches real processes the same way,
/root/reference/tests/playback/test_live_playback.py:43-79). Consumes fastq
files from <fqdir> via the fake Sequencer backend and writes strategy masks
to <workdir>/out_<name>/masks/boss.npz — the file contract the readfish
process (proc_readfish_shim.py) polls.

usage: proc_boss_live.py <workdir> <name> <ref.fa> <fqdir> <n_batches>
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    workdir, name, ref, fqdir, n_batches = sys.argv[1:6]
    from bossruns_tpu.config import BossConfig
    from bossruns_tpu.live.sequencer import Sequencer
    from bossruns_tpu.models.experiment import BossRuns

    args = BossConfig()
    args.general.name = name
    args.general.ref = ref
    args.general.wait = 1

    exp = BossRuns(args, out_base=workdir)
    seq = Sequencer(out_path=fqdir)
    exp.fq_dir = fqdir
    exp.channels = seq.channels
    import time

    while exp.batch < int(n_batches):
        exp.process_batch()
        time.sleep(0.1)
    print(f"boss done after {exp.batch} batches", flush=True)


if __name__ == "__main__":
    main()
