"""Human-genome-scale batch format: positions beyond int32 (> ~2.1 Gb).

The ReadBatch carries (barcode, uint32 position) pairs and each shard
flattens into its LOCAL int32 domain (parallel/mesh.py local_run_indices /
local_ex_indices), so a 3.1 Gb genome's positions — which do not fit int32 —
flow host -> device -> shard-local scatter without widening to int64
anywhere. A full >2^31-site engine run needs a real multi-chip slice (the
8 virtual CPU shards share one host's RAM, see docs/DESIGN.md memory plan);
these tests instead pin the two overflow-prone layers directly:

  * the shard-local uint32 index arithmetic, with a shard whose global
    offset exceeds 2^31 (wraparound doubles as the out-of-shard test)
  * split_runs (C + NumPy paths) on a real 2.3e9-site layout, emitting
    positions beyond 2^31 exactly
"""
import jax.numpy as jnp
import numpy as np


from bossruns_tpu.parallel.mesh import local_ex_indices, local_run_indices


def test_local_run_indices_beyond_int32():
    Gl = 1_000_000
    nb_l = 2
    g0 = 2_400_000_000  # shard offset beyond int32
    b0 = 0
    g0u = jnp.uint32(g0)
    #           in-shard    before shard   after shard   run crossing right edge
    mr_g = np.array([g0 + 5,  g0 - 3,       g0 + Gl + 7,  g0 + Gl - 10], np.uint32)
    mr_bc = np.array([1,      0,            0,            0], np.int32)
    mr_len = np.array([40,    40,           40,           40], np.int32)
    idx_s, idx_e = local_run_indices(
        jnp.asarray(mr_bc), jnp.asarray(mr_g), jnp.asarray(mr_len),
        b0, g0u, nb_l, Gl,
    )
    idx_s, idx_e = np.asarray(idx_s), np.asarray(idx_e)
    OOB = nb_l * Gl
    assert idx_s.tolist() == [1 * Gl + 5, OOB, OOB, 1 * Gl - 10]
    # row 1 starts left of the shard but its END (g0-3+40 = +37) lands inside:
    # the end marker posts locally, the all_gather carry covers the start.
    # row 3's end crosses the right edge (the next shard posts it).
    assert idx_e.tolist() == [1 * Gl + 45, 37, OOB, OOB]


def test_local_ex_indices_beyond_int32():
    Gl = 500_000
    nb_l = 1
    g0 = 3_000_000_000
    g0u = jnp.uint32(g0)
    ex_g = np.array([g0 + 123, g0 - 1, g0 + Gl], np.uint32)
    ex_bcsym = np.array([3, 2, 1], np.int32)  # bc0, syms 3/2/1
    idx = np.asarray(local_ex_indices(
        jnp.asarray(ex_bcsym), jnp.asarray(ex_g), 0, g0u, nb_l, Gl
    ))
    OOB = nb_l * 5 * Gl
    assert idx.tolist() == [3 * Gl + 123, OOB, OOB]


def test_split_runs_on_2_3gb_layout():
    """split_runs emits exact uint32 positions beyond 2^31 (C + NumPy paths
    agree) on a real 2.3e9-site layout."""
    from bossruns_tpu.io import coo_native
    from bossruns_tpu.models.layout import build_layout

    G_target = 2_300_000_000
    seq = np.zeros(G_target, np.uint8)  # all-'A' reference
    lay = build_layout({"huge": seq})
    del seq
    assert lay.G_pad > 2**31

    rstart = np.array([2_200_000_000, 2_299_999_000, 1_000], np.int64)
    rspan = np.array([30, 20, 10], np.int32)
    rbc = np.zeros(3, np.int32)
    m = int(rspan.sum())
    sym = np.zeros(m, np.int8)
    # one mismatch inside read 0 at offset 7, one deletion in read 1 at 3
    sym[7] = 2
    sym[30 + 3] = 4
    qual = np.full(m, 40, np.int8)

    res_c = coo_native.split_runs(lay, sym, qual, rstart, rspan, rbc)

    lib = coo_native.native_mod._lib
    try:  # force the NumPy fallback for comparison
        coo_native.native_mod._lib = False
        res_np = coo_native.split_runs(lay, sym, qual, rstart, rspan, rbc)
    finally:
        coo_native.native_mod._lib = lib

    for a, b in zip(res_c, res_np):
        np.testing.assert_array_equal(a, b)

    mr_bc, mr_g, mr_len, ex_bcsym, ex_g = res_c
    assert mr_g.dtype == np.uint32 and ex_g.dtype == np.uint32
    # read 0: match run [2.2e9, +7), mismatch at +7, match [+8, +30)
    assert mr_g[0] == np.uint32(2_200_000_000) and mr_len[0] == 7
    assert ex_g[0] == np.uint32(2_200_000_007) and ex_bcsym[0] == 2
    assert mr_g[1] == np.uint32(2_200_000_008) and mr_len[1] == 22
    # read 1: runs around the deletion observation (symbol 4)
    assert ex_g[1] == np.uint32(2_299_999_003) and ex_bcsym[1] == 4
    # read 2 sits in the int32-safe region
    assert mr_g[-1] == np.uint32(1_000) and mr_len[-1] == 10


def test_split_runs_chunks_long_runs_to_uint16():
    """Error-free stretches longer than 65535 bases are emitted as uint16-
    sized chunks (C + NumPy paths agree), so mr_len rides the host->device
    transfer as uint16 without losing coverage."""
    from bossruns_tpu.io import coo_native
    from bossruns_tpu.models.layout import build_layout

    L = 200_000
    lay = build_layout({"c": np.zeros(300_000, np.uint8)})
    rstart = np.array([100], np.int64)
    rspan = np.array([L], np.int32)
    rbc = np.zeros(1, np.int32)
    sym = np.zeros(L, np.int8)  # every base matches the all-'A' reference
    qual = np.full(L, 40, np.int8)

    res_c = coo_native.split_runs(lay, sym, qual, rstart, rspan, rbc)
    lib = coo_native.native_mod._lib
    try:
        coo_native.native_mod._lib = False
        res_np = coo_native.split_runs(lay, sym, qual, rstart, rspan, rbc)
    finally:
        coo_native.native_mod._lib = lib
    for a, b in zip(res_c, res_np):
        np.testing.assert_array_equal(a, b)

    mr_bc, mr_g, mr_len, ex_bcsym, ex_g = res_c
    assert mr_len.dtype == np.uint16 and mr_bc.dtype == np.uint8
    assert int(mr_len.sum(dtype=np.int64)) == L  # no coverage lost
    assert mr_g.tolist() == [100 + 65535 * k for k in range(len(mr_g))]
    assert (mr_len[:-1] == 65535).all() and ex_g.size == 0


def test_ex_pad_sentinel_is_dropped_not_wrapped():
    """EX_PAD padding rows must NOT scatter anywhere — a signed flatten
    would wrap them to index -1, i.e. the LAST coverage element (regression:
    the engine scatters ex_flat in uint32 for exactly this reason)."""
    from bossruns_tpu.io.coo_native import EX_PAD
    from bossruns_tpu.models.layout import build_layout
    from bossruns_tpu.models.runs import ReadBatch, RunsEngine

    lay = build_layout({"c": np.zeros(120_000, np.uint8)}, n_barcodes=2)
    eng = RunsEngine(lay)
    state = eng.init_state()
    batch = ReadBatch(
        mr_bc=np.zeros(4, np.uint8), mr_g=np.zeros(4, np.uint32),
        mr_len=np.zeros(4, np.uint16),          # all-padding match runs
        ex_bcsym=np.zeros(64, np.uint16),
        ex_g=np.full(64, EX_PAD, np.uint32),    # all-padding explicit rows
        rs_row=np.zeros(4, np.int32), rs_strand=np.zeros(4, np.int32),
        rs_w=np.zeros(4, np.float32),
    )
    params = eng.make_params(
        np.array([3000, 2000, 1400, 1000, 700, 500, 350, 220, 120, 40]), 530.0
    )
    state, _ = eng.step(state, batch, params)
    assert int(np.asarray(state.coverage).sum()) == 0


def test_wire_roundtrip(rng):
    """pack_wire -> device unpack_wire reproduces every ReadBatch field
    bit-for-bit (the single-transfer upload must be a pure recoding)."""
    import jax
    import jax.numpy as jnp

    from bossruns_tpu.models.runs import ReadBatch, RunsEngine

    n = 1000
    batch = dict(
        mr_bc=rng.integers(0, 3, n).astype(np.uint8),
        mr_g=rng.integers(0, 2**31, n).astype(np.uint32),
        mr_len=rng.integers(0, 65535, n).astype(np.uint16),
        ex_bcsym=rng.integers(0, 65535, n - 3).astype(np.uint16),
        ex_g=rng.integers(0, 2**32 - 1, n - 3).astype(np.uint32),
        rs_row=rng.integers(0, 2**30, 511).astype(np.int32),
        rs_strand=rng.integers(0, 2, 511).astype(np.int32),
        rs_w=rng.random(511).astype(np.float32),
    )
    wire, spec = RunsEngine.pack_wire(batch)
    assert wire.dtype == np.uint32
    out = jax.jit(
        lambda w: RunsEngine.unpack_wire(w, spec)
    )(jnp.asarray(wire))
    for f in batch:
        np.testing.assert_array_equal(np.asarray(getattr(out, f)), batch[f], err_msg=f)
