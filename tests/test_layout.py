"""Data-layout clustering: Morton interleave correctness, the
distributed file packer's equal-size/contiguity laws, and the
end-to-end pruning ordering the layout_zorder_pruning entry claims."""

import random

from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators.layout import (
    morton_sql,
    pack_cells_into_files,
)
from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import REGISTRY


def _morton_py(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_sql_matches_python_reference(spark):
    rng = random.Random(13)
    pts = [(rng.randint(0, 65535), rng.randint(0, 65535)) for _ in range(200)]
    pts += [(0, 0), (65535, 65535), (0, 65535), (65535, 0), (1, 2)]
    df = spark.createDataFrame(pts, "x int, y int").select(
        "x", "y", F.expr(morton_sql("x", "y")).cast("long").alias("z")
    )
    for r in df.collect():
        assert r.z == _morton_py(r.x, r.y), (r.x, r.y)


def test_morton_preserves_block_locality(spark):
    """Points inside one 16x16 block share the same z >> 8 cell —
    the property that makes cell-packed files tight in BOTH dims."""
    pts = [(x, y) for x in range(32, 48) for y in range(16, 32)]
    df = spark.createDataFrame(pts, "x int, y int").select(
        F.expr(morton_sql("x", "y")).cast("long").alias("z")
    )
    cells = {r.z >> 8 for r in df.collect()}
    assert len(cells) == 1


def test_pack_cells_matches_single_level_prefix_sum(spark):
    """The two-level distributed prefix sum must equal the plain
    running-sum definition: file = floor(cum_before / rpf) with
    cum_before computed cell-by-cell in Python."""
    rng = random.Random(7)
    rows = []
    for layout in ("a", "b"):
        for cell in rng.sample(range(5000), 400):
            rows.append((layout, cell, rng.randint(1, 300)))
    hist = spark.createDataFrame(rows, "layout string, cell long, cnt long")
    got = {
        (r.layout, r.cell): r.file
        for r in pack_cells_into_files(hist, 256, 6).collect()
    }
    for layout in ("a", "b"):
        cum = 0
        for _, cell, cnt in sorted(
            (r for r in rows if r[0] == layout), key=lambda r: r[1]
        ):
            assert got[(layout, cell)] == cum // 256, (layout, cell)
            cum += cnt
    assert len(got) == len(rows)


def test_pack_cells_files_are_contiguous_and_sized(spark):
    """Files are contiguous runs of the cell order, and every file
    except the last lands within ±(max_cell - 1) of the target size:
    cell-aligned cuts happen at the first cumulative count past each
    multiple of rpf, so a file starts at most max_cell-1 rows late and
    ends at most max_cell-1 rows late."""
    rng = random.Random(3)
    rows = [("z", c, rng.randint(1, 99)) for c in range(0, 3000, 7)]
    hist = spark.createDataFrame(rows, "layout string, cell long, cnt long")
    assign = sorted(
        (r.cell, r.file)
        for r in pack_cells_into_files(hist, 256, 6).collect()
    )
    files = [f for _, f in assign]
    assert files == sorted(files)  # monotone in cell order = contiguous
    sizes: dict[int, int] = {}
    cnt_by_cell = {c: n for _, c, n in rows}
    for cell, f in assign:
        sizes[f] = sizes.get(f, 0) + cnt_by_cell[cell]
    last = max(sizes)
    for f, s in sizes.items():
        if f != last:
            assert 256 - 99 < s < 256 + 99, (f, s)


def test_zorder_pruning_ordering_holds(spark):
    """The entry's headline claim at sf0.01: stats-based pruning under
    the packed z-layout scans fewer rows AND files than the linear
    shipdate sort, which beats the unsorted baseline; the unsorted
    layout prunes nothing; the matching row count is layout-invariant
    and never exceeds any layout's scanned rows."""
    rows = {
        r.layout: r
        for r in REGISTRY["layout_zorder_pruning"]
        .run(spark, "/root/testdata/sf0.01")
        .collect()
    }
    z, lin, uns = rows["zorder"], rows["linear"], rows["unsorted"]
    assert z.rows_matching == lin.rows_matching == uns.rows_matching > 0
    assert z.rows_scanned < lin.rows_scanned < uns.rows_scanned
    assert z.files_scanned <= lin.files_scanned
    assert uns.files_scanned == uns.n_files  # hash layout prunes nothing
    for r in rows.values():
        assert r.rows_scanned >= r.rows_matching
        assert 0 < r.files_scanned <= r.n_files
    # equal file-size budget: the packer gave all layouts the same
    # file count at this scale (cells smaller than the target size)
    assert z.n_files == lin.n_files == uns.n_files


def test_shard_manifest_laws(spark):
    """The training-shard manifest at sf0.01: shards partition the
    corpus (token + doc conservation), id ranges are contiguous and
    non-overlapping in shard order, and every shard except the last
    lands within one document of the token target (the packer's
    cell-aligned law applied to doc cells)."""
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries.textops import (
        SHARD_TOKENS,
    )

    sf = "/root/testdata/sf0.01"
    rows = sorted(
        REGISTRY["corpus_shard_manifest"].run(spark, sf).collect(),
        key=lambda r: r.shard_id,
    )
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("n"),
    )
    tot = docs.agg(F.sum("n").alias("t"), F.count(F.lit(1)).alias("d")).collect()[0]
    max_doc = docs.agg(F.max("n")).collect()[0][0]
    assert [r.shard_id for r in rows] == list(range(len(rows)))
    assert sum(r.n_tokens for r in rows) == tot.t
    assert sum(r.n_docs for r in rows) == tot.d
    assert len(rows) > 3, "sf0.01 must pack into multiple shards"
    for a, b in zip(rows, rows[1:]):
        assert a.doc_hi < b.doc_lo  # contiguous, non-overlapping
    for r in rows[:-1]:
        assert SHARD_TOKENS - max_doc < r.n_tokens < SHARD_TOKENS + max_doc
        assert r.n_docs >= 1
