"""Multi-chip sharding of the RUNS update step over a jax device mesh.

TPU-native scaling design (SURVEY.md §2.3/§5): the genome is the long axis.
All per-site and per-ds-row state shards as contiguous chunk blocks over the
mesh axis ``g`` (the adaptive-sampling analogue of context/sequence
parallelism); the barcode axis optionally shards over ``b`` (multi-sample
data parallelism). Read COO batches are replicated — each device's scatter
keeps only the indices that land in its genome block (XLA partitions the
scatter; out-of-shard indices drop locally).

Collectives are inserted by GSPMD from sharding constraints alone:
  * the benefit window sums read a cumulative sum across chunk boundaries
    -> collective-permute prefix exchange,
  * the threshold scan's exponent bincount, max-normaliser and ubar0 reduce
    with psum/pmax across shards,
  * fhat normalisation is a global sum.
No NCCL/MPI analogue exists in the reference to port — its two processes
share files (SURVEY.md §1); here the state never leaves the devices.

Layouts must be built with ``align_chunks = mesh g-size`` so every shard
gets whole chunks (layout.py guarantees equal blocks).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.layout import GenomeLayout, build_layout
from ..models.runs import GenomeState, ReadBatch, RunsConfig, RunsEngine, StepParams


def make_mesh(devices=None, barcode_shards: int = 1, name_g: str = "g", name_b: str = "b") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % barcode_shards == 0, (n, barcode_shards)
    arr = np.array(devices).reshape(barcode_shards, n // barcode_shards)
    return Mesh(arr, (name_b, name_g))


class ShardedRunsEngine(RunsEngine):
    """RunsEngine whose jitted step carries genome/barcode shardings.

    The step function body is identical to the single-chip engine — GSPMD
    partitions it from the in/out shardings below.
    """

    def __init__(
        self,
        layout: GenomeLayout,
        mesh: Mesh,
        model=None,
        config: RunsConfig = RunsConfig(),
    ):
        super().__init__(layout, model, config)
        self.mesh = mesh
        g = mesh.axis_names[-1]
        b = mesh.axis_names[0] if len(mesh.axis_names) > 1 else None
        gd = mesh.shape[g]
        assert layout.G_pad % (gd * 1) == 0
        assert (layout.G_pad // layout.Gd_pad) == 100

        def ns(*spec):
            return NamedSharding(mesh, P(*spec))

        state_shardings = GenomeState(
            coverage=ns(b, None, g),
            zeroed=ns(b, g),
            bucket_on=ns(b, None),
            read_starts=ns(None, None),
            strat=ns(b, g, None),
        )
        batch_shardings = ReadBatch(*([ns(None)] * len(ReadBatch._fields)))
        params_shardings = StepParams(ns(None), ns(), ns())
        self._state_shardings = state_shardings
        # shard the big device constants along the genome axis too
        self.c_seq = jax.device_put(self.c_seq, ns(g))
        self.c_site_valid = jax.device_put(self.c_site_valid, ns(g))
        self.c_seg_start = jax.device_put(self.c_seg_start, ns(g))
        self.c_seg_end = jax.device_put(self.c_seg_end, ns(g))
        self.c_strat_valid = jax.device_put(self.c_strat_valid, ns(g))
        self.c_fhat_idx = jax.device_put(self.c_fhat_idx, ns(g))
        self.c_bucket_idx = jax.device_put(self.c_bucket_idx, ns(g))
        self.c_contig_id_ds = jax.device_put(self.c_contig_id_ds, ns(g))
        self.step = jax.jit(
            self._step,
            in_shardings=(state_shardings, batch_shardings, params_shardings),
            out_shardings=(state_shardings, None),
            donate_argnums=(0,),
        )

    def init_state(self) -> GenomeState:
        state = super().init_state()
        return jax.device_put(state, self._state_shardings)

    def put_batch(self, batch: ReadBatch) -> ReadBatch:
        rep = NamedSharding(self.mesh, P())
        return jax.device_put(batch, rep)


def demo_sharded_step(n_devices: int | None = None, barcode_shards: int = 1, seed: int = 0):
    """Build a small multi-contig genome, shard it over all devices, run one
    full update step. Used by the multichip dry-run and as a living example.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    mesh = make_mesh(devices[:n], barcode_shards=barcode_shards)
    gsize = mesh.shape[mesh.axis_names[-1]]
    rng = np.random.default_rng(seed)
    nb = max(2, barcode_shards) if barcode_shards > 1 else 1
    contigs = {
        "c1": rng.integers(0, 4, 150_000).astype(np.uint8),
        "c2": rng.integers(0, 4, 120_000).astype(np.uint8),
    }
    layout = build_layout(contigs, n_barcodes=nb, align_chunks=gsize)
    eng = ShardedRunsEngine(layout, mesh)
    state = eng.init_state()

    n_runs, run_len = 512, 64
    rstart = rng.integers(0, 140_000 - run_len, n_runs).astype(np.int32)
    pos = np.concatenate([np.arange(s0, s0 + run_len) for s0 in rstart])
    from ..io.coo_native import split_runs

    mr_flat, mr_len, ex_flat = split_runs(
        layout, layout.seq_int[pos].astype(np.int8),
        np.full(pos.shape[0], 40, np.int8), rstart,
        np.full(n_runs, run_len, np.int32),
        rng.integers(0, nb, n_runs).astype(np.int32),
    )
    batch = eng.put_batch(
        ReadBatch(
            mr_flat=mr_flat, mr_len=mr_len,
            ex_flat=np.zeros(max(ex_flat.shape[0], 16), np.int32),
            ex_w=np.zeros(max(ex_flat.shape[0], 16), np.int8),
            rs_row=rng.integers(0, layout.n_fhat, 512).astype(np.int32),
            rs_strand=rng.integers(0, 2, 512).astype(np.int32),
            rs_w=np.ones(512, np.float32),
        )
    )
    params = eng.make_params(
        np.array([30000, 20000, 14000, 10000, 7000, 5000, 3500, 2200, 1200, 400]), 5300.0
    )
    state, aux = eng.step(state, batch, params)
    jax.block_until_ready(state)
    return eng, state, aux
