"""Fresh-JVM steady-state probe for registry entries — the A/B harness
behind SCALE_NOTES' wave measurements (rounds 11-12).

Usage:
  python scripts/probe_entries.py <sf_dir> <n_samples> <entry> [...]

Prints ONE JSON line: per-entry wall-clock samples (build + collect,
first sample is JIT warm-up — read the tail), plus the numpy and JVM
dilation probes (quiet gates: numpy < 5 ms, JVM < 190 ms; a dilated
probe means adjudicate against another window, not against the code).
Run each variant of an A/B in its OWN invocation: a fresh JVM per
side keeps cache state, codegen, and localCheckpoint blocks from
leaking between variants (repeated in-session probes of a
checkpointing query self-dilate — measured r12, semdedup-KMeans).
At 100x corpora set SPARK_GRAFT_DRIVER_MEM=48g.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_probe_ms() -> float:
    a = np.random.default_rng(0).random((256, 256))
    t0 = time.perf_counter()
    for _ in range(3):
        a = a @ a
        a /= np.abs(a).max()
    return round((time.perf_counter() - t0) * 1000, 2)


def main() -> None:
    sf_dir, n_samples = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    p0 = cpu_probe_ms()

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import (
        REGISTRY,
    )
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.session import (
        get_spark,
    )

    spark = get_spark(
        app_name="probe-entries", master="local[32]", shuffle_partitions=32
    )
    t0 = time.perf_counter()
    spark.range(50_000_000).selectExpr("sum(id % 97) AS s").collect()
    jvm1 = (time.perf_counter() - t0) * 1000
    t0 = time.perf_counter()
    spark.range(50_000_000).selectExpr("sum(id % 97) AS s").collect()
    jvm_ms = round(min(jvm1, (time.perf_counter() - t0) * 1000), 1)

    out: dict = {"sf_dir": sf_dir, "numpy_ms_pre": p0, "jvm_ms": jvm_ms}
    for name in names:
        samples = []
        for _ in range(n_samples):
            t0 = time.perf_counter()
            # noop sink, matching bench.py's methodology. Probes
            # collected through round 12 — equivalent for the
            # model-scale outputs most entries emit, but a collect()
            # pays py4j serialization of the WHOLE answer: on
            # dedup_simhash's 54.5M-pair 10x answer set that read
            # 559s where the noop-sink execution reads 32s (round 13)
            # — measuring a consumption mode no production run uses.
            REGISTRY[name].run(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = samples
    out["numpy_ms_post"] = cpu_probe_ms()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
