"""Z-order layout (operators/zorder.py): the multi-dimensional
data-skipping contract, proven mechanically against a shuffled
control layout — selective predicates on EITHER curve column find
their rows in a small fraction of files."""

import pytest

from pyspark.sql import functions as F

from cr_data_pipeline_project_spark.operators import zorder

N_FILES = 16


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    zpath = str(base / "zordered")
    cpath = str(base / "control")
    zorder.zorder_write(ev, zpath, ["user_id", "value"], target_files=N_FILES)
    # control: same file count, hash-scattered rows (the layout an
    # un-clustered ingest produces)
    ev.repartition(N_FILES).write.mode("overwrite").parquet(cpath)
    return zpath, cpath


def _files_hit(spark, path, pred):
    df = spark.read.parquet(path).where(pred)
    return (
        df.select(F.input_file_name().alias("f")).distinct().count(),
        df.count(),
    )


def _bounds(spark, path):
    lo, hi = (
        spark.read.parquet(path)
        .agg(F.min("user_id"), F.max("user_id"))
        .collect()[0]
    )
    return lo, hi


def test_zorder_prunes_on_first_dim(spark, layouts):
    zpath, cpath = layouts
    lo, hi = _bounds(spark, zpath)
    band = (hi - lo) // 20 or 1
    pred = F.col("user_id").between(lo, lo + band)
    zfiles, zrows = _files_hit(spark, zpath, pred)
    cfiles, crows = _files_hit(spark, cpath, pred)
    assert zrows == crows and zrows > 0
    # 2-D Morton: a one-dim slab of selectivity s fragments across
    # ~sqrt(s) of the curve, not s — a 5% band still concentrates
    # into well under half the files while the control scatters it
    # over (almost) all of them.
    assert zfiles <= N_FILES // 2, (zfiles, cfiles)
    assert cfiles >= (3 * N_FILES) // 4  # control scatters the rows


def test_zorder_prunes_on_second_dim(spark, layouts):
    zpath, cpath = layouts
    pred = F.col("value") <= (
        spark.read.parquet(zpath)
        .agg(F.percentile_approx("value", 0.05))
        .collect()[0][0]
    )
    zfiles, zrows = _files_hit(spark, zpath, pred)
    cfiles, crows = _files_hit(spark, cpath, pred)
    assert zrows == crows and zrows > 0
    assert zfiles < cfiles, (zfiles, cfiles)
    assert zfiles <= (3 * N_FILES) // 4


def test_zorder_layout_is_lossless(spark, layouts):
    zpath, cpath = layouts
    z = spark.read.parquet(zpath)
    c = spark.read.parquet(cpath)
    assert z.count() == c.count()
    assert z.exceptAll(c).count() == 0
    assert z.schema == c.schema


def test_quantize_handles_nan_and_null(spark, tmp_path):
    """ANSI mode throws CAST_OVERFLOW on round(NaN).cast(bigint) —
    NaN rows must clamp to the top rank, NULL rows to rank 0, and
    the write must survive both (round-6 advisory)."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(k=1, v=0.0),
            Row(k=2, v=5.0),
            Row(k=3, v=10.0),
            Row(k=4, v=float("nan")),
            Row(k=5, v=None),
        ]
    )
    ranks = zorder.quantize_cols(df, ["v"], bits=2)
    got = {
        r["k"]: r["r"]
        for r in df.select("k", ranks[0].alias("r")).collect()
    }
    assert got[1] == 0 and got[3] == 3  # min-max span intact
    assert got[4] == 3  # NaN → top rank
    assert got[5] == 0  # NULL → rank 0
    # end-to-end: the full write path must not abort
    out = str(tmp_path / "z_nan")
    zorder.zorder_write(df, out, ["v", "k"], target_files=2)
    assert spark.read.parquet(out).count() == 5


def test_morton_key_locality(spark):
    """Interleaving, not concatenation: both dimensions contribute
    the same number of low-order bits, so the key can't degrade to
    a single-column sort."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(x=x, y=y) for x in range(4) for y in range(4)]
    )
    ranks = [F.col("x").cast("bigint"), F.col("y").cast("bigint")]
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder.morton_key(ranks, bits=2).alias("z")
        ).collect()
    }
    # classic 4x4 Morton values
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(1, 1)] == 3
    assert out[(2, 2)] == 12
    assert out[(3, 3)] == 15
