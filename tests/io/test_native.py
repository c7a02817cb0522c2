"""Native C++ runtime tests: BAM writer roundtrip, libdeflate BGZF parity,
packed-array BAM decode parity, and k-mer packing parity."""

import numpy as np
import pytest

from graphtyper_tpu.io import native
from graphtyper_tpu.io.bam import read_bam, read_sam
from graphtyper_tpu.io.bam_writer import write_bam
from graphtyper_tpu.io.bgzf import decompress_all
from graphtyper_tpu.utils.dna import decode as dna_decode


@pytest.fixture(scope="module")
def bam_file(tmp_path_factory, request):
    data_dir = request.config.rootpath / "tests" / "data"
    hdr, reads = read_sam(str(data_dir / "test.sam"), parse_tags=True)
    path = tmp_path_factory.mktemp("bam") / "rt.bam"
    write_bam(str(path), hdr, reads)
    return str(path), hdr, reads


def test_bam_writer_roundtrip(bam_file):
    path, hdr, reads = bam_file
    hdr2, reads2 = read_bam(path, parse_tags=True)
    assert hdr2.ref_names == hdr.ref_names
    assert len(reads2) == len(reads)
    for a, b in zip(reads, reads2):
        assert (a.name, a.flag, a.pos, a.seq, a.cigar, a.mapq, a.tlen) == (
            b.name, b.flag, b.pos, b.seq, b.cigar, b.mapq, b.tlen,
        )


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_bgzf_parity(bam_file):
    path, _, _ = bam_file
    raw = open(path, "rb").read()
    assert native.bgzf_decompress(raw) == decompress_all(path)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_bam_decode_parity(bam_file):
    path, _, reads = bam_file
    arr = native.decode_bam_arrays(decompress_all(path))
    assert arr is not None
    assert len(arr["pos"]) == len(reads)
    names = arr["names"].tobytes()
    no = arr["name_offsets"]
    co = arr["cigar_offsets"]
    for i in (0, 7, len(reads) - 1):
        r = reads[i]
        assert int(arr["pos"][i]) == r.pos
        assert int(arr["flag"][i]) == r.flag
        assert int(arr["mapq"][i]) == r.mapq
        assert names[no[i] : no[i + 1] - 1].decode() == r.name
        cig = list(zip(arr["cigar_ops"][co[i] : co[i + 1]].tolist(), arr["cigar_lens"][co[i] : co[i + 1]].tolist()))
        assert cig == r.cigar


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_kmer_parity():
    import graphtyper_tpu.utils.dna as dna_mod

    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, size=5000).astype(np.uint8)
    codes[::313] = 4
    k_native, v_native = native.pack_kmers_native(codes)
    # force the pure-python path for comparison
    ok = codes < 4
    bad = (~ok).astype(np.int32)
    cs = np.concatenate([[0], np.cumsum(bad)])
    v_py = (cs[32:] - cs[:-32]) == 0
    c = np.where(ok, codes, 0).astype(np.uint64)
    k_py = np.zeros(len(codes) - 31, dtype=np.uint64)
    for i in range(32):
        k_py = (k_py << np.uint64(2)) | c[i : i + len(k_py)]
    assert np.array_equal(k_native, k_py)
    assert np.array_equal(v_native, v_py)


def test_bgzf_decompress_mt_parity():
    """Parallel block decompression produces the identical bytes as the
    serial member walk on a multi-block file."""
    import numpy as np

    from graphtyper_tpu.io.bgzf import BgzfWriter
    from graphtyper_tpu.io.native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, "gt_bgzf_decompress_mt"):
        return
    import tempfile, os

    rng = np.random.default_rng(3)
    data = np.tile(rng.integers(0, 4, size=500_000, dtype=np.uint8), 8).tobytes()
    p = tempfile.mktemp(suffix=".gz")
    w = BgzfWriter(p)
    w.write(data)
    w.close()
    raw = np.frombuffer(open(p, "rb").read(), dtype=np.uint8)
    os.unlink(p)
    size = lib.gt_bgzf_decompress(raw.ctypes.data, len(raw), None, 0)
    assert size == len(data)
    o1 = np.empty(size, dtype=np.uint8)
    o2 = np.empty(size, dtype=np.uint8)
    assert lib.gt_bgzf_decompress(raw.ctypes.data, len(raw), o1.ctypes.data, size) == size
    assert lib.gt_bgzf_decompress_mt(raw.ctypes.data, len(raw), o2.ctypes.data, size, 3) == size
    assert o1.tobytes() == o2.tobytes() == data
