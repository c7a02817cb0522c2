"""Golden port of test/typer/test_genotype_path.cpp "Genotype paths":
kmer-to-kmer path-lattice merging with explicit labels."""

from types import SimpleNamespace

from graphtyper_tpu.typer.genotype_paths import GenotypePaths


class _StubGraph:
    """Minimal graph exposing var-node orders and variant nums for labels."""

    def __init__(self, spec):
        # spec: var_id -> (order, num)
        max_id = max(spec)
        self.var_nodes = [
            SimpleNamespace(label=SimpleNamespace(order=spec.get(i, (0, 0))[0]))
            for i in range(max_id + 1)
        ]
        self._nums = {i: n for i, (_, n) in spec.items()}

    def get_variant_num(self, var_id):
        return self._nums[var_id]


def test_genotype_paths_lattice_merge():
    g = _StubGraph({0: (39, 0), 1: (16, 0), 3: (69, 1), 4: (136, 10), 5: (121, 0), 6: (136, 0), 7: (121, 0)})
    geno = GenotypePaths(0, 8)

    geno.add_next_kmer_labels(g, [(13, 44, 0), (13, 44, 1)], 0, 31, 0)
    assert len(geno.paths) == 1
    p = geno.paths[0]
    assert p.size() == 32 and p.start == 13 and p.end == 44
    assert p.var_order == [39, 16]
    assert p.nums == [{0}, {0}]

    geno.add_next_kmer_labels(g, [(44, 75, 3)], 31, 62, 0)
    assert len(geno.paths) == 1
    p = geno.paths[0]
    assert p.size() == 63 and p.start == 13 and p.end == 75
    assert p.read_start_index == 0
    assert p.var_order == [69, 39, 16]
    assert p.nums == [{1}, {0}, {0}]

    geno.add_next_kmer_labels(
        g, [(75, 167, 4), (75, 167, 5), (75, 137, 6), (75, 137, 7)], 62, 93, 0
    )
    assert len(geno.paths) == 2
    p0, p1 = geno.paths
    assert p0.size() == 94 and p0.start == 13 and p0.end == 167
    assert p0.var_order == [136, 121, 69, 39, 16]
    assert p0.nums == [{10}, {0}, {1}, {0}, {0}]
    assert p1.size() == 94 and p1.start == 13 and p1.end == 137
    assert p1.var_order == [136, 121, 69, 39, 16]
    assert p1.nums == [{0}, {0}, {1}, {0}, {0}]
