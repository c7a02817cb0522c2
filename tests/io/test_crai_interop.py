"""htslib interop: our CRAI reader parses htslib's own index for the
reference's test.cram fixture, the entries match the file's container
layout, and region queries select the right slices."""

from graphtyper_tpu.io.crai import crai_query, read_crai

HTSLIB_CRAI = "/root/reference/test/data/reference/test.cram.crai"
HTSLIB_CRAM = "/root/reference/test/data/reference/test.cram"


def test_read_htslib_crai(tmp_path):
    entries = read_crai(HTSLIB_CRAI)
    assert len(entries) == 2
    # one slice per contig (chr1, chr2), both ~1.5kb spans
    assert [e.seq_id for e in entries] == [0, 1]
    assert all(e.start == 1 and e.span > 1500 for e in entries)
    # container offsets are increasing and inside the file
    import os

    size = os.path.getsize(HTSLIB_CRAM)
    assert 0 < entries[0].container_offset < entries[1].container_offset < size

    # region query: chr2 only selects the second slice
    hits = crai_query(entries, 1, 100, 200)
    assert [h.seq_id for h in hits] == [1]
    assert crai_query(entries, 0, 1600, 1700) == []  # past chr1's span


def test_crai_against_python_decoder(tmp_path):
    """The slice the CRAI points at decodes to the records our reader
    returns for that contig (offsets are real, not just well-formed)."""
    from graphtyper_tpu.io.cram import read_cram

    _h, reads = read_cram(
        HTSLIB_CRAM, ref_path="/root/repo/tests/data/index_test.fa", parse_tags=False
    )
    entries = read_crai(HTSLIB_CRAI)
    for seq_id in (0, 1):
        n = sum(1 for r in reads if r.ref_id == seq_id)
        assert n > 0
        e = [x for x in entries if x.seq_id == seq_id][0]
        # every aligned read of the contig falls inside the CRAI span
        for r in reads:
            if r.ref_id == seq_id:
                assert e.start - 1 <= r.pos < e.start - 1 + e.span + 200
