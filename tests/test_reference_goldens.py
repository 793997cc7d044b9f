"""Conformance tests against the REFERENCE's published golden values.

Every constant asserted here is copied from the reference test suite (not from
this repo's own oracle), so parity routes through the upstream implementation:

  * score0 / ent0 and score_arr entries:
      /root/reference/tests/base/test_runs_sequences.py:108-125
  * model/prior shapes: test_runs_sequences.py:9-23,34-60
  * default read-length prior approx_ccl: test_readlengthdist.py:21-32
    (the data-independent "no reads observed" case)
"""
import numpy as np
import pytest

from bossruns_tpu.ops.model import make_model, make_phi, make_prior
from bossruns_tpu.ops.scores import ScoreTables, prior_score, site_scores
from bossruns_tpu.utils.readlen import ReadLengthDist


def _score_entry(counts5, ref_base, ploidy=1):
    """f64 score/entropy for one coverage pattern (score_arr[c..., ref])."""
    import jax.numpy as jnp

    model = make_model(ploidy=ploidy)
    t = ScoreTables(model, jnp.float64)
    c = jnp.asarray([counts5], jnp.float64)
    r = jnp.asarray([ref_base], jnp.int32)
    s, e = site_scores(c, r, t)
    return float(s[0]), float(e[0])


def test_score0_ent0_reference_goldens():
    # ref test_runs_sequences.py:113-115: score0=0.04969294, ent0=0.09302521
    s0, e0 = prior_score(make_model(ploidy=1))
    assert s0 == pytest.approx(0.04969294, abs=1e-8)
    assert e0 == pytest.approx(0.09302521, abs=1e-8)


def test_score_array_entries_reference_goldens():
    # ref test_runs_sequences.py:118-125 (score_arr[c_A,c_C,c_G,c_T,c_del,ref])
    s, e = _score_entry([28, 0, 0, 0, 0], ref_base=3)
    assert s == pytest.approx(3.834200141940696e-44, rel=1e-6)
    assert e == pytest.approx(3.834200141940696e-44, rel=1e-6)
    s2, e2 = _score_entry([2, 0, 0, 0, 0], ref_base=3)
    assert s2 == pytest.approx(0.17253973305650225, rel=1e-9)
    assert e2 == pytest.approx(0.22957118271635163, rel=1e-9)


@pytest.mark.parametrize("ploidy, b, g", [(1, 5, 5), (2, 5, 15)])
def test_model_shapes_reference(ploidy, b, g):
    # ref test_priors: len_b = 4+1 symbols, 5/15 genotypes, priors (4, g)
    m = make_model(ploidy=ploidy)
    assert m.len_b == b
    assert m.len_g == g
    assert m.prior.shape == (4, g)
    np.testing.assert_allclose(m.phi.sum(axis=0), 1.0)
    if ploidy == 1:
        # diploid priors are unnormalized in the reference too
        # (sequences.py:241-313; posterior normalization absorbs it)
        np.testing.assert_allclose(m.prior.sum(axis=1), 1.0, rtol=1e-12)


@pytest.mark.parametrize("diploid, del_err, b, g", [(False, 0, 4, 4), (True, 0, 4, 10)])
def test_generate_phi_no_deletion(diploid, del_err, b, g):
    # ref test_generate_phi: without deletions, 4 symbols / 4 or 10 genotypes
    phi = make_phi(ploidy=2 if diploid else 1, deletion_error=del_err)
    assert phi.shape == (b, g)


@pytest.mark.parametrize("del_err, b, g", [(0, 4, 4), (0.5, 4, 5)])
def test_haploid_prior_shapes(del_err, b, g):
    assert make_prior(ploidy=1, deletion_error=del_err).shape == (b, g)


@pytest.mark.parametrize("del_err, b, g", [(0, 4, 10), (0.5, 4, 15)])
def test_diploid_prior_shapes(del_err, b, g):
    assert make_prior(ploidy=2, deletion_error=del_err).shape == (b, g)


def test_unsupported_ploidy_raises():
    with pytest.raises(ValueError):
        make_model(ploidy=3)


def test_default_prior_ccl_reference_golden():
    # ref test_update_noreads: the truncated-normal prior's piecewise CCL
    rl = ReadLengthDist()
    assert int(rl.lam) == 6000
    np.testing.assert_array_equal(
        rl.approx_ccl,
        np.array([1167, 2729, 3903, 4918, 5866, 6808, 7797, 8912, 10321, 12713]),
    )


def test_short_reads_do_not_update():
    # ref test_update_noreads: lengths <= 2*mu leave the prior untouched
    rl = ReadLengthDist()
    rl.update(np.array([1, 2, 3]))
    assert int(rl.lam) == 6000
    np.testing.assert_array_equal(
        rl.approx_ccl,
        np.array([1167, 2729, 3903, 4918, 5866, 6808, 7797, 8912, 10321, 12713]),
    )


def test_whale_read_clamps_to_histogram():
    # ref test_update_whale: a 2.2 Mb read clamps to the last histogram bin
    # (uint16[1e6] in the reference; longest_read == 999_999)
    rl = ReadLengthDist()
    rl.update(np.array([5000, 2_222_222]))
    nz = np.flatnonzero(rl.hist)
    assert int(nz[-1]) == 999_999
    assert rl.lam == pytest.approx((5000 + 999_999) / 2)
