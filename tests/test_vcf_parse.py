"""VCF parsing quirk tests (audit.c:50-173 semantics)."""
from svtrek_tpu.constants import SVType
from svtrek_tpu.io.vcf import VcfSkip, VcfTask, iter_vcf_tasks, parse_vcf_line


def _task(line):
    r = parse_vcf_line(0, line)
    assert isinstance(r, VcfTask), r
    return r


def _skip(line):
    r = parse_vcf_line(0, line)
    assert isinstance(r, VcfSkip), r
    return r


def test_basic_del():
    t = _task("1\t1000\t.\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;END=2000")
    assert (t.chrom_index, t.pos, t.end, t.sv_type) == (1, 1000, 2000, SVType.DEL)


def test_chr_prefix_and_atoi():
    t = _task("chr7\t1000\t.\tN\t<INS>\t.\tPASS\tSVTYPE=INS;END=1001")
    assert t.chrom_index == 7
    t = _task("chrX\t1000\t.\tN\t<INS>\t.\tPASS\tSVTYPE=INS;END=1001")
    assert t.chrom_index == 0  # atoi("X") == 0, reference quirk


def test_ciend_shadows_end():
    """strstr(info, "END=") matches the tail of CIEND= when it comes first
    (audit.c:145) — the simvcf INFO layout hits this; END wraps to a huge
    uint32."""
    t = _task(
        "1\t10000\t.\tN\t<DEL>\t.\tPASS\t"
        "SVTYPE=DEL;CIPOS=-30,25;CIEND=-31,25;END=12000"
    )
    assert t.end == (2**32 - 31)


def test_end_after_svtype_ok():
    t = _task("1\t10000\t.\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;END=12000")
    assert t.end == 12000


def test_missing_end_uses_ref_len():
    t = _task("1\t10000\t.\t" + "A" * 200 + "\tA\t.\tPASS\tFOO=1")
    assert t.sv_type == SVType.DEL  # inferred: REF>50, min ALT len == 1
    assert t.end == 10000 + 200


def test_infer_ins():
    t = _task("1\t500\t.\tA\t" + "T" * 80 + "\t.\tPASS\tFOO=1")
    assert t.sv_type == SVType.INS


def test_infer_none_skips():
    _skip("1\t500\t.\tAT\tTA\t.\tPASS\tFOO=1")


def test_short_del_dropped():
    _skip("1\t1000\t.\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;END=1030")
    # exactly 50: outer filter passes (not < 50); the record survives
    # parsing but windows_for_task suppresses output (audit.c:190).
    t = _task("1\t1000\t.\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;END=1050")
    assert t.end == 1050


def test_unknown_type_error():
    s = _skip("1\t1000\t.\tN\t<DUP>\t.\tPASS\tSVTYPE=DUP;END=2000")
    assert s.message == "[ERROR] Unkown type."


def test_bad_pos():
    s = _skip("1\tabc\t.\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;END=2000")
    assert "Conversion error" in s.message


def test_multi_alt_lengths():
    # max alt len > 50 with REF len 1 → INS inferred.
    t = _task("1\t500\t.\tA\tAT," + "T" * 90 + "\t.\tPASS\tFOO=1")
    assert t.sv_type == SVType.INS


def test_header_and_short_lines_filtered():
    lines = [
        "##header\n",
        "#CHROM\tPOS\n",
        "\n",
        "A\n",  # raw len 2 → NOT filtered, parsed (and skipped: no index)
        "1\t1000\t.\tN\t<INS>\t.\tPASS\tSVTYPE=INS\n",
    ]
    out = list(iter_vcf_tasks(lines))
    assert len(out) == 2
    assert isinstance(out[0], VcfSkip) and "no index" in out[0].message
    assert isinstance(out[1], VcfTask)
