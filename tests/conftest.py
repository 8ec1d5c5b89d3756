from __future__ import annotations

import random

import pytest

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


# --- synthetic Hadoop-MapReduce-like log corpus -----------------------------
# Shaped like the reference's sample (MRAppMaster container log: timestamped
# INFO-heavy lines, appattempt/container ids, stack-trace continuation lines
# with no timestamp prefix — FIXTURES.md §1 edge cases). Generated, not copied.

LOGGERS = [
    "org.apache.hadoop.mapreduce.v2.app.MRAppMaster",
    "org.apache.hadoop.yarn.event.AsyncDispatcher",
    "org.apache.hadoop.mapred.TaskAttemptListenerImpl",
    "org.apache.hadoop.hdfs.DFSClient",
]

TEMPLATES = [
    ("INFO", "main", 0, "Created MRAppMaster for application appattempt_{a}_{b}_{c}"),
    ("INFO", "main", 1, "Registering class {cls} for class {cls2}"),
    ("INFO", "IPC Server handler {n} on {port}", 2, "Progress of TaskAttempt attempt_{a}_{b}_m_{c}_{n} is : {pct}"),
    ("WARN", "ResponseProcessor", 3, "Slow ReadProcessor read fields took {ms}ms"),
    ("ERROR", "DataStreamer", 3, "Bad response ERROR for block BP-{n}-{port} from datanode {ip}:{port}"),
]

CLASSES = ["JobEventDispatcher", "SpeculatorEventDispatcher", "ContainerLauncher"]


def gen_log_lines(n: int = 300, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    lines = []
    base_min = 0
    for i in range(n):
        level, thread_t, logger_i, msg_t = TEMPLATES[
            rng.choices(range(len(TEMPLATES)), weights=[20, 10, 60, 6, 4])[0]
        ]
        sec = (base_min + i) % 60
        ts = f"2015-10-18 18:{(i // 60) % 60:02d}:{sec:02d},{rng.randint(0, 999):03d}"
        fmt = dict(
            a=1445062781478,
            b=rng.randint(1, 20),
            c=rng.randint(0, 9),
            n=rng.randint(0, 99),
            port=rng.randint(10000, 65000),
            pct=f"{rng.random():.4f}",
            ms=rng.randint(100, 90000),
            ip=f"10.0.{rng.randint(0, 255)}.{rng.randint(0, 255)}",
            cls=rng.choice(CLASSES),
            cls2=rng.choice(CLASSES),
        )
        thread = thread_t.format(**fmt)
        msg = msg_t.format(**fmt)
        lines.append(f"{ts} {level} [{thread}] {LOGGERS[logger_i]}: {msg}")
        if level == "ERROR" and rng.random() < 0.8:
            # stack-trace continuation lines: no timestamp prefix
            lines.append("java.io.IOException: Bad response ERROR for block")
            lines.append("\tat org.apache.hadoop.hdfs.DFSOutputStream.run(DFSOutputStream.java:702)")
    return lines


@pytest.fixture(scope="session")
def log_dir(tmp_path_factory):
    """A 2-container log directory, plus a decoy file the glob must skip."""
    root = tmp_path_factory.mktemp("logs")
    app = root / "application_1445062781478_0011"
    app.mkdir()
    lines = gen_log_lines(300)
    half = len(lines) // 2
    (app / "container_1445062781478_0011_01_000001.log").write_text(
        "\n".join(lines[:half]) + "\n"
    )
    (app / "container_1445062781478_0011_01_000002.log").write_text(
        "\n".join(lines[half:]) + "\n"
    )
    (app / "notes.txt").write_text("decoy — must not be ingested\n")
    return str(root)
