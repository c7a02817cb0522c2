"""CLI, bamshrink, and long-read mode tests."""

import gzip

import numpy as np
import pytest

from graphtyper_tpu.cli import main as cli_main


def test_construct_check_cli(tmp_path, data_dir, capsys):
    g = str(tmp_path / "g.npz")
    rc = cli_main(["construct", g, str(data_dir / "index_test.fa"), "--vcf", str(data_dir / "index_test.vcf.gz"), "--region", "chr2"])
    assert rc == 0
    rc = cli_main(["check", g])
    assert rc == 0
    out = capsys.readouterr().out
    assert "check=OK" in out


def test_bamshrink_filters_and_renames(tmp_path):
    rng = np.random.default_rng(2)
    ref = "".join(rng.choice(list("ACGT"), 300))
    lines = ["@HD\tVN:1.6", "@SQ\tSN:c\tLN:300", "@RG\tID:rg\tSM:s"]
    L = 100
    # good pair
    s = 50
    lines.append(f"good\t99\tc\t{s+1}\t60\t{L}M\t=\t{s+21}\t{L+20}\t{ref[s:s+L]}\t{'I'*L}")
    lines.append(f"good\t147\tc\t{s+21}\t60\t{L}M\t=\t{s+1}\t{-(L+20)}\t{ref[s+20:s+20+L]}\t{'I'*L}")
    # low mapq read -> dropped
    lines.append(f"bad1\t99\tc\t{s+1}\t1\t{L}M\t=\t{s+21}\t{L+20}\t{ref[s:s+L]}\t{'I'*L}")
    # short read -> dropped (tlen filter)
    lines.append(f"bad2\t99\tc\t{s+1}\t60\t50M\t=\t{s+11}\t60\t{ref[s:s+50]}\t{'I'*50}")
    sam = tmp_path / "in.sam"
    sam.write_text("\n".join(lines) + "\n")
    from graphtyper_tpu.pipeline.bamshrink import bamshrink

    out = bamshrink(str(sam), "c", 0, 300, str(tmp_path / "out.sam"))
    text = open(out).read()
    body = [l for l in text.split("\n") if l and not l.startswith("@")]
    assert len(body) == 2  # only the good pair
    names = {l.split("\t")[0] for l in body}
    assert names == {"!"}  # renamed, mates share the name
    assert set(body[0].split("\t")[10]) <= {"?", ","}  # binarized quals


def test_lr_genotyping(tmp_path):
    rng = np.random.default_rng(9)
    ref = "".join(rng.choice(list("ACGT"), 400))
    fa = tmp_path / "lr.fa"
    with open(fa, "w") as f:
        f.write(">chrL\n")
        for i in range(0, 400, 70):
            f.write(ref[i : i + 70] + "\n")
    alt_base = "A" if ref[150] != "A" else "G"
    hap2 = ref[:150] + alt_base + ref[151:]
    lines = ["@HD\tVN:1.6\tSO:coordinate", "@SQ\tSN:chrL\tLN:400", "@RG\tID:rg\tSM:lr1"]
    recs = []
    for i in range(30):
        hap = ref if i % 2 == 0 else hap2
        s = int(rng.integers(0, 200))
        seq = hap[s : s + 200]
        recs.append((s, f"lr{i}\t0\tchrL\t{s+1}\t50\t200M\t*\t0\t0\t{seq}\t{'F'*200}"))
    recs.sort()
    sam = tmp_path / "lr.sam"
    sam.write_text("\n".join(lines + [r[1] for r in recs]) + "\n")
    from graphtyper_tpu.pipeline.genotype_lr import genotype_lr

    out = genotype_lr(str(fa), [str(sam)], "chrL", str(tmp_path / "out"))
    body = [l for l in gzip.open(out, "rt").read().split("\n") if l and not l.startswith("#")]
    assert len(body) == 1
    f = body[0].split("\t")
    assert f[1] == "151"
    assert f[4] == alt_base
    assert f[6] == "."  # is_lr_calling drops the FILTER column (vcf.cpp:860)
    assert f[9].split(":")[0] == "0/1"


def test_cli_multi_host_region_sharding(tmp_path):
    """--num_hosts shards regions deterministically: the union of two hosts'
    outputs covers every region exactly once."""
    import subprocess
    import sys

    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=9000, coverage=12.0, seed=19)
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    outs = []
    for host in (0, 1):
        p = subprocess.run(
            [sys.executable, "-c", (
                "import jax; jax.config.update('jax_platforms','cpu');"
                "from graphtyper_tpu import cli; import sys;"
                f"sys.argv=['g','genotype','{sim.fasta}','--sam={sim.sams[0]}',"
                f"'--region={cfg.chrom}:1-9000','--output={tmp_path}/out{host}',"
                f"'--num_hosts=2','--host_id={host}'];"
                "cli.main()"
            )],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=600,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        outs.append([l for l in p.stdout.splitlines() if l.endswith(".vcf.gz")])
    # both hosts produced disjoint non-empty shares (9kb -> one 50kb region
    # chunk, so one host gets it and the other gets none — use region_file
    # style checks loosely: union non-empty, intersection empty)
    all_out = outs[0] + outs[1]
    assert len(all_out) >= 1
    assert not (set(outs[0]) & set(outs[1]))


def test_lr_coverage_filter(tmp_path):
    """caller.cpp:1381,1512-1516: once a position's pileup depth reaches
    lr_coverage_filter, later reads starting before that position are
    skipped (min_pos tracks the last saturated position)."""
    import numpy as np

    from graphtyper_tpu.config import Options
    from graphtyper_tpu.io.bam import AlignedRead
    from graphtyper_tpu.typer.discovery_lr import lr_pileup

    def read(pos, seq):
        return AlignedRead(
            name=f"r{pos}", flag=0, ref_id=0, pos=pos, mapq=60,
            cigar=[(0, len(seq))], mate_ref_id=-1, mate_pos=-1, tlen=0,
            seq=seq, qual=np.full(len(seq), 40, dtype=np.uint8),
        )

    # five reads at pos 0 saturate positions 0..199 (min_pos -> 199); a
    # later read at pos 100 (< 199) is skipped, one at pos 199 still counts
    reads = [read(0, b"A" * 200) for _ in range(5)] + [read(100, b"A" * 200), read(199, b"A" * 200)]
    counts, _ = lr_pileup(reads, 0, 500, Options(lr_coverage_filter=5))
    assert counts[150].sum() == 5  # pos-100 read was skipped
    assert counts[250].sum() == 1  # pos-199 read landed

    # with the filter off, everything counts
    counts2, _ = lr_pileup(reads, 0, 500, Options(lr_coverage_filter=0))
    assert counts2[150].sum() == 6
    assert counts2[250].sum() == 2


def test_cli_call_subcommand(tmp_path):
    """`call` works on a pre-constructed graph (the reference advertises the
    subcommand but exits 1; main.cpp:1374 vs :1394-1430)."""
    import subprocess
    import sys

    from graphtyper_tpu.utils.simulate import SimConfig, simulate_cohort

    cfg = SimConfig(region_length=8000, coverage=16.0, seed=77, out_format="bam")
    sim = simulate_cohort(str(tmp_path / "sim"), cfg)
    env = None
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from graphtyper_tpu import cli; import sys;"
        f"sys.argv = ['g', 'construct', '{tmp_path}/g.npz', '{sim.fasta}',"
        f" '--vcf={sim.vcf}', '--region={cfg.chrom}:1-8000'];"
        "cli.main()"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-800:]
    code2 = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from graphtyper_tpu import cli; import sys;"
        f"sys.argv = ['g', 'call', '{tmp_path}/g.npz', '--sam={sim.sams[0]}',"
        f" '--output={tmp_path}/out'];"
        "cli.main()"
    )
    r2 = subprocess.run([sys.executable, "-c", code2], capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r2.returncode == 0, r2.stderr[-800:]
    out = r2.stdout.strip().splitlines()[-1]
    body = [l for l in gzip.open(out, "rt").read().splitlines() if not l.startswith("#")]
    assert body, "call produced no records"
    assert any(f.split("\t")[9].split(":")[0] in ("0/1", "1/1") for f in body)
