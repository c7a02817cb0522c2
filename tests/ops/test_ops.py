"""Device op tests: the Gram-matmul likelihood update must equal the
reference's scalar explain_to_score loop; mismatch matmul must equal direct
comparison."""

import numpy as np

from graphtyper_tpu.graph.graph import Genotype
from graphtyper_tpu.models.genotype_model import HaplotypeSite, get_haplotype_phred, to_index
from graphtyper_tpu.ops.hamming import mismatch_matrix
from graphtyper_tpu.ops.likelihood import (
    batch_explains_to_matrix,
    score_update_triangle,
)


def test_gram_matmul_equals_scalar_loop():
    rng = np.random.default_rng(42)
    cnum = 5
    n_reads = 200
    site = HaplotypeSite(Genotype(100, cnum, 0))
    site.clear_and_resize_samples(1)

    explains_list = []
    eps_list = []
    for _ in range(n_reads):
        k = rng.integers(1, cnum + 1)
        ex = set(rng.choice(cnum, size=k, replace=False).tolist())
        eps = int(rng.integers(4, 9))  # valid post-clamp epsilon range
        explains_list.append(ex)
        eps_list.append(eps)
        # scalar reference path
        site.explains = ex
        sample = site.hap_samples[0]
        sample.max_log_score += eps
        expl = np.zeros(cnum, dtype=bool)
        for e in ex:
            expl[e] = True
        i = 0
        for y in range(cnum):
            for x in range(y + 1):
                if expl[x] and expl[y]:
                    sample.log_score[i] += eps
                elif expl[x] or expl[y]:
                    sample.log_score[i] += eps - 1
                i += 1

    B = batch_explains_to_matrix(explains_list, cnum)
    eps = np.array(eps_list, dtype=np.float32)
    delta = score_update_triangle(B, eps, cnum)
    assert np.array_equal(delta, site.hap_samples[0].log_score)


def test_epsilon_exponent_values():
    f = HaplotypeSite.epsilon_exponent
    # no penalties: 12 -> clamp max(12,8)-4 = 8
    assert f(False, 0, True, True, False, 0) == 8
    # 2 mismatches: 10-4 = 6
    assert f(False, 0, True, True, False, 2) == 6
    # everything bad: clamped at 8-4 = 4
    assert f(True, 1 << 12, False, False, True, 5) == 4


def test_phred_conversion():
    from graphtyper_tpu.models.genotype_model import HapSample

    s = HapSample(log_score=np.array([16, 8, 0], dtype=np.int64), gt_coverage=np.zeros(2))
    pl = get_haplotype_phred(s)
    # (16-16)*3.0103=0, (16-8)*3.0103=24.08->24, 16*3.0103=48.16->48
    assert pl.tolist() == [0, 24, 48]
    s2 = HapSample(log_score=np.array([5, 5, 5], dtype=np.int64), gt_coverage=np.zeros(2))
    assert get_haplotype_phred(s2).tolist() == [0, 0, 0]


def test_to_index_triangle():
    assert to_index(0, 0) == 0
    assert to_index(0, 1) == 1
    assert to_index(1, 1) == 2
    assert to_index(2, 3) == 8


def test_mismatch_matrix():
    rng = np.random.default_rng(0)
    L = 64
    reads = rng.integers(0, 4, size=(10, L)).astype(np.uint8)
    haps = rng.integers(0, 4, size=(7, L)).astype(np.uint8)
    # add N and padding
    reads[0, :5] = 4
    haps[0, 10:20] = 4
    got = np.asarray(mismatch_matrix(reads, haps))
    want = np.zeros((10, 7), dtype=np.int32)
    for r in range(10):
        for h in range(7):
            want[r, h] = int(((reads[r] != haps[h]) & (reads[r] < 4) & (haps[h] < 4)).sum())
    assert np.array_equal(got, want)
