"""Golden end-to-end test (SURVEY §5.2 item 2).

Mirrors the reference's convention of committing each run's event
matrix (event_matrix_exec*.csv with header ``Cluster ID,Size,Template``)
and checking run-to-run stability: the pipeline over the deterministic
fixture corpus must reproduce the checked-in golden catalog exactly.
"""

import csv
import pathlib

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators import matrix
from mgl870_tp02_project_01_hadoopmapreducelogs_spark.sources import logs

GOLDEN = pathlib.Path(__file__).parent / "golden" / "event_matrix_golden.csv"


def _mine(spark, log_dir):
    parsed = logs.parse_lines(logs.read_log_dir(spark, log_dir))
    catalog, _ = matrix.pipeline(parsed, method="exact")
    return [
        (str(r["Cluster ID"]), str(r["Size"]), r["Template"])
        for r in matrix.summary_matrix(catalog, reference_names=True).collect()
    ]


def test_pipeline_matches_golden_catalog(spark, log_dir):
    got = _mine(spark, log_dir)
    with open(GOLDEN, newline="") as f:
        reader = csv.reader(f)
        header = next(reader)
        want = [tuple(row) for row in reader]
    assert header == ["Cluster ID", "Size", "Template"]
    assert got == want, "mined catalog diverged from the golden event matrix"
