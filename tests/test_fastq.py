"""iter_fastq edge cases: chunk boundaries, missing trailing newline,
name filtering, gzip — the bulk-chunk reader must match the simple
4-lines-per-record contract (reference analog: kseq, discover.c:7)."""
import gzip
import random

from svtrek_tpu.io.fastq import iter_fastq, reverse_complement


def _records(rng, n, minlen=1, maxlen=9000):
    out = []
    for i in range(n):
        seq = "".join(rng.choice("ACGT")
                      for _ in range(rng.randrange(minlen, maxlen)))
        out.append((f"read{i}", seq))
    return out


def _write(path, recs, final_newline=True, extra_header_tokens=False):
    with open(path, "w") as fh:
        for i, (name, seq) in enumerate(recs):
            hdr = f"@{name} extra tokens here" if extra_header_tokens \
                else f"@{name}"
            fh.write(f"{hdr}\n{seq}\n+\n{'I' * len(seq)}")
            if final_newline or i < len(recs) - 1:
                fh.write("\n")


def test_iter_fastq_roundtrip_and_chunk_boundaries(tmp_path):
    rng = random.Random(5)
    # Long sequences guarantee records straddle the 4 MiB chunk size.
    recs = _records(rng, 2000, minlen=1000, maxlen=9000)
    p = str(tmp_path / "r.fq")
    _write(p, recs, extra_header_tokens=True)
    assert list(iter_fastq(p)) == recs


def test_iter_fastq_no_trailing_newline(tmp_path):
    rng = random.Random(6)
    recs = _records(rng, 7, minlen=5, maxlen=50)
    p = str(tmp_path / "r.fq")
    _write(p, recs, final_newline=False)
    assert list(iter_fastq(p)) == recs


def test_iter_fastq_name_filter(tmp_path):
    rng = random.Random(7)
    recs = _records(rng, 300, minlen=5, maxlen=80)
    p = str(tmp_path / "r.fq")
    _write(p, recs)
    want = {"read7", "read250", "missing"}
    got = list(iter_fastq(p, names=want))
    assert got == [r for r in recs if r[0] in want]
    # list input is accepted too
    assert list(iter_fastq(p, names=["read0"])) == [recs[0]]


def test_iter_fastq_gzip(tmp_path):
    rng = random.Random(8)
    recs = _records(rng, 50, minlen=5, maxlen=200)
    p = str(tmp_path / "r.fq.gz")
    body = "".join(f"@{n}\n{s}\n+\n{'I' * len(s)}\n" for n, s in recs)
    with gzip.open(p, "wt") as fh:
        fh.write(body)
    assert list(iter_fastq(p)) == recs


def test_iter_fastq_empty_and_truncated(tmp_path):
    p = str(tmp_path / "e.fq")
    open(p, "w").close()
    assert list(iter_fastq(p)) == []
    # header+seq only (truncated mid-record): the pair still yields,
    # matching the old readline reader's EOF behavior.
    with open(p, "w") as fh:
        fh.write("@only\nACGT\n")
    assert list(iter_fastq(p)) == [("only", "ACGT")]


def test_reverse_complement():
    assert reverse_complement("ACGTN") == "NACGT"


def test_iter_fastq_crlf(tmp_path):
    """CRLF files must not leak '\r' into sequences (ADVICE r4: the
    binary chunk reader splits on b'\n' only)."""
    p = str(tmp_path / "crlf.fq")
    with open(p, "wb") as fh:
        fh.write(b"@r1 desc\r\nACGT\r\n+\r\nIIII\r\n@r2\r\nTTAA\r\n+\r\nIIII\r\n")
    assert list(iter_fastq(p)) == [("r1", "ACGT"), ("r2", "TTAA")]
    assert list(iter_fastq(p, names={"r2"})) == [("r2", "TTAA")]


def test_iter_fastq_degenerate_header(tmp_path):
    """A header that is only '@' (or '@' + whitespace/CR) must yield an
    empty name, not IndexError (review r5)."""
    p = str(tmp_path / "deg.fq")
    with open(p, "wb") as fh:
        fh.write(b"@\r\nACGT\r\n+\r\nIIII\r\n@ \nTTTT\n+\nIIII\n@\nGGGG\n+\nIIII\n")
    assert list(iter_fastq(p)) == [("", "ACGT"), ("", "TTTT"), ("", "GGGG")]
