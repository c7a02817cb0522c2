"""Multi-allele HLA panel semantics (VERDICT r3 #9): per-segment scoring
over full allele FASTA paths with a 6-allele panel — heterozygous allele
pairs, homozygous calls, intron-only tie refinement, and the explain-map
mechanics (segment_calling.cpp:10-844 semantics: insert_into_explain_map
:100-122, remove_insignificant_variants :154-184, add_start/end
:124-152/:288-316, put_reference_in_front :319-414, segment.cpp:16-49 PL)."""

import gzip

import numpy as np
import pytest

from graphtyper_tpu.graph.build import construct_graph
from graphtyper_tpu.graph.coords import GenomicRegion
from graphtyper_tpu.index.build import index_graph
from graphtyper_tpu.pipeline.caller import call_pool
from graphtyper_tpu.typer.segment_calling import (
    _add_start_end,
    _reference_first,
    _remove_insignificant,
    _ExplainMaps,
    read_haplotypes_from_fasta,
    segment_calling,
)
from graphtyper_tpu.utils.simulate import _random_seq, _write_fasta

L = 6000
CHROM = "chrH"
# five exon SNP sites (0-based) + one intron-only site
EXON_SITES = [1500, 1620, 1740, 1860, 1980]
INTRON_SITE = 2350


def _alt_of(base: str) -> str:
    return "ACGT"[("ACGT".index(base) + 1) % 4]


def _build_panel(tmp_path):
    """6 alleles over 5 exon SNPs; A5/A6 share exon genotypes and differ only
    at the intron site (the tie-refinement pair). Returns (fasta, vcf, panel,
    haps dict)."""
    rng = np.random.default_rng(911)
    seq = _random_seq(rng, L)
    fasta = str(tmp_path / "ref.fa")
    _write_fasta(fasta, CHROM, seq)

    sites = EXON_SITES + [INTRON_SITE]
    refs = [chr(seq[p]) for p in sites]
    alts = [_alt_of(r) for r in refs]
    vcf = str(tmp_path / "panel_sites.vcf")
    with open(vcf, "w") as f:
        f.write(
            "##fileformat=VCFv4.2\n##contig=<ID=chrH>\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        )
        for p, r, a in zip(sites, refs, alts):
            f.write(f"{CHROM}\t{p + 1}\t.\t{r}\t{a}\t.\t.\t.\n")

    # allele -> set of carried exon-site indices (+ "I" for the intron alt)
    carried = {
        "A1": set(),
        "A2": {0, 1},
        "A3": {2},
        "A4": {0, 3, 4},
        "A5": {1, 2},
        "A6": {1, 2, "I"},
    }
    haps = {}
    for name, cs in carried.items():
        h = seq.copy()
        for k in cs:
            if k == "I":
                h[INTRON_SITE] = ord(alts[-1])
            else:
                h[EXON_SITES[k]] = ord(alts[k])
        haps[name] = h

    # panel FASTA: intron(0) | exon(1) spanning the 5 exon SNPs | intron(2)
    # spanning the intron-only site
    panel = str(tmp_path / "gene.fa")
    with open(panel, "w") as f:
        for name, h in haps.items():
            f.write(f">{name}.0\n" + h[1100:1350].tobytes().decode() + "\n")
            f.write(f">{name}.1\n" + h[1400:2100].tobytes().decode() + "\n")
            f.write(f">{name}.2\n" + h[2200:2500].tobytes().decode() + "\n")
    return fasta, vcf, panel, haps


def _write_sample(tmp_path, name, hap_a, hap_b, seed):
    rng = np.random.default_rng(seed)
    sam = str(tmp_path / f"{name}.sam")
    records = []
    read_len, frag = 125, 320
    for i in range(900):
        hap = [hap_a, hap_b][i % 2]
        start = int(rng.integers(0, L - frag))
        r1 = hap[start : start + read_len].tobytes().decode()
        r2 = hap[start + frag - read_len : start + frag].tobytes().decode()
        q = "I" * read_len
        records.append((start, f"{name}_r{i}\t99\t{CHROM}\t{start + 1}\t60\t{read_len}M\t=\t{start + frag - read_len + 1}\t{frag}\t{r1}\t{q}"))
        records.append((start + frag - read_len, f"{name}_r{i}\t147\t{CHROM}\t{start + frag - read_len + 1}\t60\t{read_len}M\t=\t{start + 1}\t{-frag}\t{r2}\t{q}"))
    records.sort(key=lambda t: t[0])
    with open(sam, "w") as f:
        f.write(f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{CHROM}\tLN:{L}\n@RG\tID:rg\tSM:{name}\n")
        for _, l in records:
            f.write(l + "\n")
    return sam


def _segment_call(tmp_path, sams):
    graph = construct_graph(tmp_path._fasta, tmp_path._vcf, f"{CHROM}:1-{L}", use_index=True)
    index = index_graph(graph)
    res = call_pool(graph, index, sams, region=GenomicRegion.parse(f"{CHROM}:1-{L}"),
                    is_writing_hap=False)
    out = str(tmp_path / "seg.vcf.gz")
    segment_calling(graph, index, res.scorer, [tmp_path._panel], out, res.vcf.sample_names)
    txt = gzip.open(out, "rt").read()
    body = [l for l in txt.splitlines() if not l.startswith("#")]
    assert body, "no segment record"
    rec = body[0].split("\t")
    names = rec[7].split("SEGMENT_ALLELES=")[1].split(";")[0].split(",")
    calls = []
    for col in rec[9:]:
        gt = col.split(":")[0]
        a, b = sorted(int(x) for x in gt.replace("|", "/").split("/"))
        calls.append({names[a], names[b]})
    return calls, rec


class _Ctx:
    def __init__(self, tmp_path):
        self.dir = tmp_path

    def __truediv__(self, other):
        return self.dir / other


@pytest.fixture()
def panel6(tmp_path):
    ctx = _Ctx(tmp_path)
    fasta, vcf, panel, haps = _build_panel(tmp_path)
    ctx._fasta = fasta
    ctx._vcf = vcf
    ctx._panel = panel
    ctx._haps = haps
    return ctx


def test_het_pair_six_allele_panel(panel6):
    """A2/A4 heterozygote against a 6-allele panel."""
    haps = panel6._haps
    sam = _write_sample(panel6, "het24", haps["A2"], haps["A4"], 7)
    calls, _rec = _segment_call(panel6, [sam])
    assert calls[0] == {"A2", "A4"}, calls


def test_hom_allele_six_allele_panel(panel6):
    """A3/A3 homozygote."""
    haps = panel6._haps
    sam = _write_sample(panel6, "hom3", haps["A3"], haps["A3"], 11)
    calls, _rec = _segment_call(panel6, [sam])
    assert calls[0] == {"A3"}, calls


def test_intron_tie_refinement(panel6):
    """A5 and A6 share every exon genotype and differ only at the intron
    site: the exon map ties, the intron map must break it
    (segment_calling.cpp's exon-then-intron refinement)."""
    haps = panel6._haps
    sam = _write_sample(panel6, "het16", haps["A1"], haps["A6"], 13)
    calls, _rec = _segment_call(panel6, [sam])
    assert calls[0] == {"A1", "A6"}, calls


def test_multi_sample_panel(panel6):
    """Three samples with distinct truth pairs genotype independently in one
    segment-calling pass."""
    haps = panel6._haps
    sams = [
        _write_sample(panel6, "s1", haps["A2"], haps["A3"], 21),
        _write_sample(panel6, "s2", haps["A4"], haps["A4"], 22),
        _write_sample(panel6, "s3", haps["A1"], haps["A5"], 23),
    ]
    calls, rec = _segment_call(panel6, sams)
    assert calls[0] == {"A2", "A3"}, calls
    assert calls[1] == {"A4"}, calls
    assert calls[2] == {"A1", "A5"}, calls
    assert rec[6] == "."  # segment records carry "." FILTER (vcf.cpp:860)


def test_explain_map_mechanics():
    """Unit semantics of the explain-map helpers."""
    # remove_insignificant: a site explained by <20% of alleles is dropped
    emap = {5: [1, 0, 0, 0, 0, 0], 7: [1, 1, 1, 0, 0, 0]}
    _remove_insignificant(emap)
    assert 5 not in emap and 7 in emap

    # add_start_end: alleles inactive at the edges explain everything there
    emap = {1: [0, 3], 2: [1, 2], 3: [2, 0]}
    n_graph = {1: 2, 2: 2, 3: 2}
    _add_start_end(emap, n_graph)
    # allele 0 starts at site 2 -> site 1 becomes full (0b11); allele 1 ends
    # at site 2 -> site 3 becomes full
    assert emap[1][0] == 3 and emap[1][1] == 3
    assert emap[3][1] == 3 and emap[3][0] == 2

    # reference_first: the allele explaining ref (bit 0) most moves to front
    em = _ExplainMaps(exon={1: [2, 1], 2: [2, 1]}, intron={})
    ids = _reference_first(em, ["X", "Y"])
    assert ids == ["Y", "X"]
    assert em.exon[1] == [1, 2]
