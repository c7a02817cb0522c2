"""Differential test: the vectorized numpy host apply (_apply_rows_numpy)
must produce the exact totals of the jitted device kernel
(_apply_tier_impl + _split_out_vec) on random observation rows, for every
allele tier. Both are twins of the reference's per-read loop
(haplotype.cpp:462-585, :180-361); host/device flushes of one tier must be
interchangeable in ObsBatcher._accumulate."""

import numpy as np
import pytest

from graphtyper_tpu.ops.site_scoring import (
    ALLELE_TIERS,
    COV_MULTI_ALT,
    COV_MULTI_REF,
    OBS_FIELDS,
    _apply_rows_numpy,
    _jitted_apply_tier,
    _split_out_vec,
)


def _random_cols(rng, n, A, n_sites, n_samples):
    cols = {}
    cols["site"] = rng.integers(0, n_sites, n)
    cols["sample"] = rng.integers(0, n_samples, n)
    cols["eps"] = rng.integers(1, 60, n)
    cols["apply_score"] = rng.integers(0, 2, n)
    mask = (1 << A) - 1
    bits = rng.integers(0, 1 << 62, n, dtype=np.int64).astype(np.uint64) & np.uint64(mask)
    cols["bits_lo"] = (bits & np.uint64(0xFFFFFFFF)).astype(np.int64)
    cols["bits_hi"] = (bits >> np.uint64(32)).astype(np.int64)
    cov = rng.integers(-2, A, n)  # includes COV_MULTI_REF/ALT sentinels
    cols["cov"] = cov
    cols["clipped_scaled"] = rng.integers(0, 100, n)
    cols["clipped_flag"] = rng.integers(0, 2, n)
    cols["mapq_sq"] = rng.integers(0, 60 * 60, n)
    cols["mm_scaled"] = rng.integers(0, 50, n)
    cols["sdiff"] = rng.integers(0, 30, n)
    cols["strand"] = rng.integers(0, 4, n)
    cols["proper"] = rng.integers(0, 2, n)
    return {k: cols[k].astype(np.int64) for k in OBS_FIELDS}


@pytest.mark.parametrize("A", ALLELE_TIERS)
def test_numpy_matches_device_kernel(A):
    import jax.numpy as jnp

    rng = np.random.default_rng(A)
    n, n_sites, n_samples = 733, 9, 3
    cols = _random_cols(rng, n, A, n_sites, n_samples)

    host = _apply_rows_numpy(cols, n, A, n_sites, n_samples)

    mat = np.zeros((len(OBS_FIELDS), n), dtype=np.int32)
    for i, k in enumerate(OBS_FIELDS):
        if k in ("bits_lo", "bits_hi"):
            mat[i] = cols[k].astype(np.uint32).view(np.int32)
        else:
            mat[i] = cols[k].astype(np.int32)
    vec = _jitted_apply_tier()(jnp.asarray(mat), A=A, n_sites=n_sites, n_samples=n_samples)
    dev = _split_out_vec(np.asarray(vec), A, n_sites, n_samples)

    assert host.keys() == dev.keys()
    for k in host:
        np.testing.assert_array_equal(np.asarray(host[k]), np.asarray(dev[k]), err_msg=k)


def test_sentinel_rows_contribute_nothing():
    """Padding-style rows (eps=0, bits=0, cov=COV_PAD... here COV_MULTI mix)
    still roundtrip: a row with apply_score=0 adds no log_score, and multi
    sentinels hit only the ambiguity counters."""
    n, A, n_sites, n_samples = 4, 2, 2, 1
    cols = {k: np.zeros(n, dtype=np.int64) for k in OBS_FIELDS}
    cols["cov"][:] = (COV_MULTI_REF, COV_MULTI_ALT, 0, 1)
    cols["proper"][:] = 1
    out = _apply_rows_numpy(cols, n, A, n_sites, n_samples)
    assert out["log_delta"].sum() == -0  # apply_score all zero
    assert out["amb"][0] == 2 and out["amb_alt"][0] == 1
    assert out["alt_pp"][0] == 2  # MULTI_ALT + cov==1, both proper
    assert out["gt_cov"][0].tolist() == [1, 1]
