"""Format throughput tool: runs end-to-end at a tiny size and reports
consistent counts for every format."""

import json
import subprocess
import sys


def test_bench_formats_smoke(tmp_path):
    # --only the asserted formats: the smoke validates the CLI contract
    # and payload shape, not throughput; the default run benches 13
    # formats and cost 71 s of the verify budget for 5 assertions.
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "hadoop_bam_spark.tools.bench_formats",
            "3000",
            str(tmp_path / "w"),
            "--only=bam,cram,sam,vcf.bgz,fastq",
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout.strip().splitlines()[-1])
    assert payload["n_reads"] == 3000
    for fmt in ("bam", "cram", "sam", "vcf.bgz", "fastq"):
        stats = payload["formats"][fmt]
        assert stats["rows"] == 3000
        assert stats["mb"] > 0 and stats["scan_krec_s"] > 0
