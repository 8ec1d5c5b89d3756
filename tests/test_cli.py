"""End-to-end CLI (python -m …) — the reference's one-command flow."""

import csv
import glob

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.__main__ import run


def _write_corpus(root):
    app = root / "application_0001"
    app.mkdir(parents=True)
    msgs = [
        "Starting task {i}",
        "Progress of attempt_{i} is 0.{i}",
        "Failed to renew lease for client_{i}",
    ]
    for c in range(2):
        with open(app / f"container_0001_01_{c:06d}.log", "w") as f:
            for i in range(60):
                m = msgs[i % 3].format(i=i)
                f.write(
                    f"2024-11-20 13:{i % 60:02d}:00,000 INFO [main] a.b.C: {m}\n"
                )
    (app / "decoy.txt").write_text("not a log\n")


def _matrix_rows(out_dir):
    path = glob.glob(str(out_dir / "event_matrix_exec*.csv"))[0]
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return rows


def test_cli_mines_and_accumulates_state(spark, tmp_path):
    corpus = tmp_path / "logs"
    _write_corpus(corpus)
    out1, out2 = tmp_path / "out1", tmp_path / "out2"
    state = tmp_path / "state"

    assert run([str(corpus), "--out", str(out1), "--state", str(state)]) == 0
    rows1 = _matrix_rows(out1)
    # reference golden header (event_matrix_exec202411230733PM.csv:1)
    assert set(rows1[0]) == {"Cluster ID", "Size", "Template"}
    assert sum(int(r["Size"]) for r in rows1) == 120  # Σsize = line count
    assert len(rows1) == 3

    # second run over the same corpus: drain3_state.bin accumulate
    # semantics — persisted sizes double, template set unchanged
    assert run([str(corpus), "--out", str(out2), "--state", str(state)]) == 0
    rows2 = _matrix_rows(out2)
    assert sum(int(r["Size"]) for r in rows2) == 240
    assert {r["Template"] for r in rows2} == {r["Template"] for r in rows1}
    # chart data extracted at the viz edge
    assert (out2 / "failure_distribution.csv").exists()


def test_cli_stream_incremental_catchup(spark, tmp_path):
    """--stream: the checkpoint remembers consumed files; a second run
    processes ONLY the new file and the state store accumulates."""
    corpus = tmp_path / "logs"
    _write_corpus(corpus)
    state = tmp_path / "state"
    out1, out2 = tmp_path / "s1", tmp_path / "s2"

    assert run([str(corpus), "--out", str(out1), "--state", str(state),
                "--stream"]) == 0
    assert sum(int(r["Size"]) for r in _matrix_rows(out1)) == 120

    extra = corpus / "application_0001" / "container_0001_01_000099.log"
    with open(extra, "w") as f:
        for i in range(10):
            f.write(f"2024-11-20 14:00:{i:02d},000 WARN [main] a.b.C: Novel event {i}\n")
    assert run([str(corpus), "--out", str(out2), "--state", str(state),
                "--stream"]) == 0
    rows = _matrix_rows(out2)
    assert sum(int(r["Size"]) for r in rows) == 130
    assert any(r["Template"] == "Novel event <*>" for r in rows)
