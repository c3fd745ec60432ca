"""Refined-VCF writer tests."""
import io

from fixtures import PlantedSV, write_fixture
from svtrek_tpu.config import AudtConfig
from svtrek_tpu.io.vcf import parse_vcf_line
from svtrek_tpu.io.vcf_writer import refine_record_line
from svtrek_tpu.pipeline.audit import run_audit

NA = 0xFFFFFFFF


def test_refine_record_line_success():
    t = parse_vcf_line(0, "1\t1000\tsv0\tN\t<DEL>\t.\tPASS\t"
                          "SVTYPE=DEL;CIEND=-30,25;END=2000;SVELDT=SIMULATED")
    line = refine_record_line(t, 995, 2003)
    f = line.split("\t")
    assert f[1] == "995"
    # standalone END rewritten, CIEND untouched
    assert "CIEND=-30,25" in f[7]
    assert ";END=2003" in f[7]
    assert "SVELDT=SUCCESS" in f[7]


def test_refine_record_line_partial_and_incorrect():
    t = parse_vcf_line(0, "1\t1000\tsv0\tN\t<DEL>\t.\tPASS\tSVTYPE=DEL;END=2000")
    assert "SVELDT=PARTIAL" in refine_record_line(t, 995, NA)
    assert "SVELDT=INCORRECT" in refine_record_line(t, NA, NA)
    # INS has one point: refined start alone is SUCCESS.
    ti = parse_vcf_line(0, "1\t1000\tsv0\tN\t<INS>\t.\tPASS\tSVTYPE=INS")
    assert "SVELDT=SUCCESS" in refine_record_line(ti, 995, NA)


def test_pipeline_writes_refined_vcf(tmp_path):
    svs = [PlantedSV(1, 60_000, 60_300, "DEL", 300)]
    bam, vcf = write_fixture(str(tmp_path), svs, {1: 200_000}, seed=5,
                             depth=15, noise=0)
    refined_path = str(tmp_path / "refined.vcf")
    cfg = AudtConfig(bam_file=bam, vcf_file=vcf, use_native_io=False,
                     refined_vcf=refined_path)
    lines = run_audit(cfg, out=io.StringIO(), err=io.StringIO())
    assert len(lines) == 1
    text = open(refined_path).read()
    assert "SVELDT=SUCCESS" in text
    data = [l for l in text.splitlines() if not l.startswith("#")]
    assert len(data) == 1
    assert data[0].split("\t")[1] != "60000" or "END=" in data[0]
