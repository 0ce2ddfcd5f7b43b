"""Tests for file scans: nested-JSON struct flattening (F1), CSV inferred
vs contract scans (S2), parquet contract reads (S3), sink modes (K1/K2)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from bankcreditunion_datapipeline_spark.schemas import (
    BRONZE_INSTITUTIONS,
    SchemaContractError,
    enforce_contract,
)
from bankcreditunion_datapipeline_spark.sinks import write_append, write_overwrite
from bankcreditunion_datapipeline_spark.sources.files import (
    read_csv,
    read_csv_inferred,
    read_json,
    read_parquet,
)


def test_json_nested_struct_flattening(spark, tmp_path):
    # FDIC-style response rows: nested `data` payload. The reference
    # flattens via to_json + json_tuple string round-trip
    # (bronzeLayer/BuildBronzeLayer.py:182-184); the engine selects the
    # struct fields directly -- no re-serialization.
    recs = [
        {"data": {"CERT": "101", "NAME": "A Bank", "STNAME": "Virginia"}, "score": 1},
        {"data": {"CERT": "102", "NAME": "B Bank", "STNAME": "Texas"}, "score": 2},
    ]
    p = tmp_path / "inst.json"
    p.write_text("\n".join(json.dumps(r) for r in recs))
    df = read_json(spark, str(p))
    flat = df.select("data.*")
    assert sorted(flat.columns) == ["CERT", "NAME", "STNAME"]
    assert sorted(r.CERT for r in flat.collect()) == ["101", "102"]


def test_csv_inferred_vs_contract(spark, tmp_path):
    p = tmp_path / "foicu.csv"
    p.write_text("CU_NUMBER,CU_NAME\n1,Navy\n2,Teachers\n")
    inferred = read_csv_inferred(spark, str(p))
    assert dict(inferred.dtypes)["CU_NUMBER"] in ("int", "bigint")
    schema = StructType(
        [StructField("CU_NUMBER", LongType()), StructField("CU_NAME", StringType())]
    )
    contracted = read_csv(spark, str(p), schema)
    assert contracted.schema == schema
    assert contracted.count() == 2


def test_parquet_contract_enforcement(spark, tmp_path):
    rows = [("1", "101", "X", "1", "N", "3/31/2020", "Virginia", "w")]
    df = spark.createDataFrame(rows, BRONZE_INSTITUTIONS)
    path = str(tmp_path / "inst.parquet")
    df.write.parquet(path)
    back = read_parquet(spark, path, BRONZE_INSTITUTIONS)
    assert enforce_contract(back, BRONZE_INSTITUTIONS).columns == [
        f.name for f in BRONZE_INSTITUTIONS.fields
    ]
    bad = BRONZE_INSTITUTIONS.add("EXTRA", StringType())
    try:
        enforce_contract(back, bad)
        raise AssertionError("should reject missing column")
    except SchemaContractError:
        pass


def test_sink_append_accumulates_overwrite_replaces(spark, tmp_path):
    p = str(tmp_path / "t")
    a = spark.createDataFrame([(1,)], "v int")
    write_append(a, p)
    write_append(a, p)
    assert spark.read.parquet(p).count() == 2  # K1: runs accumulate
    write_overwrite(a, p)
    assert spark.read.parquet(p).count() == 1  # K2: snapshot replaced


def test_sql_surface_on_views(spark, sf_dir):
    from bankcreditunion_datapipeline_spark.catalog import register_testdata_views, sql

    register_testdata_views(spark, sf_dir, ("orders", "customer"))
    out = sql(
        spark,
        """
        SELECT c_mktsegment, count(*) AS n
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment
        """,
    )
    assert out.count() == 5


def test_orc_roundtrip_pushdown_and_partition_prune(spark, tmp_path):
    from bankcreditunion_datapipeline_spark.sources.files import read_orc

    df = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(90)], "id long, part int, payload string"
    )
    p = str(tmp_path / "orc_plain")
    write_overwrite(df, p, fmt="orc")
    back = read_orc(spark, p)
    assert back.count() == 90
    assert dict(back.dtypes) == {"id": "bigint", "part": "int", "payload": "string"}
    # predicate reaches the ORC scan (vectorized reader, same as parquet)
    plan = back.filter(back.id < 10)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(id,10)" in plan

    # hive-partitioned layout prunes directories at planning time
    pp = str(tmp_path / "orc_parts")
    df.write.format("orc").mode("overwrite").partitionBy("part").save(pp)
    pruned = read_orc(spark, pp).filter("part = 1")
    assert pruned.count() == 30
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in pplan


def test_testdata_loader_normalizes_timestamp_ntz(spark, tmp_path):
    """Driver-regenerated testdata has drifted between rounds on timestamp
    flavor (NANOS, micros+UTC, micros-no-tz). The catalog loader must hand
    every query a plain TIMESTAMP column regardless, or epoch functions
    (unix_micros & co) fail at analysis time."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from bankcreditunion_datapipeline_spark.sources.files import read_testdata

    sf_dir = str(tmp_path)
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            # no-tz micros -> Spark TIMESTAMP_NTZ without normalization
            "ts": pa.array([1000000, 2000000], pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, f"{sf_dir}/events.parquet")
    df = read_testdata(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = df.select(F.unix_micros("ts").alias("us")).orderBy("us").collect()
    assert [r.us for r in got] == [1000000, 2000000]  # UTC session: value-identical


def test_testdata_contract_dtypes(spark, sf_dir):
    """Canary for driver-side testdata regeneration drift (it has already
    drifted once per round on timestamp flavor): the loader must present a
    stable logical schema to the 125-query corpus regardless of what
    physical types the regenerated parquet uses. A failure here names the
    drifted column before 100 queries fail on it obscurely."""
    from bankcreditunion_datapipeline_spark.sources.files import read_testdata

    expect = {
        "events": {"event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
                   "event_type": "string", "value": "double", "props": "string"},
        "documents": {"doc_id": "bigint", "text": "string", "lang": "string",
                      "source": "string", "n_chars": "bigint"},
        "embeddings": {"vec_id": "bigint", "embedding": "array<float>",
                       "label": "int"},
    }
    for table, cols in expect.items():
        got = dict(read_testdata(spark, sf_dir, table).dtypes)
        for col, dt in cols.items():
            assert got.get(col) == dt, f"{table}.{col}: {got.get(col)!r} != {dt!r}"
    li = dict(read_testdata(spark, sf_dir, "lineitem").dtypes)
    for c in ("l_extendedprice", "l_discount", "l_quantity", "l_tax"):
        assert li[c] == "double", f"lineitem.{c}: {li[c]!r}"
    assert li["l_shipdate"] in ("date", "timestamp"), li["l_shipdate"]


def test_json_corrupt_record_capture(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from bankcreditunion_datapipeline_spark.sources.files import read_json

    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "this is not json at all\n"
        '{"id": 3, "name": "fine"}\n'
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("_bad", StringType()),
        ]
    )
    df = read_json(spark, str(p), schema, corrupt_col="_bad").cache()
    clean = df.filter("_bad IS NULL")
    quarantined = df.filter("_bad IS NOT NULL")
    assert sorted(r.id for r in clean.collect()) == [1, 3]
    bad = quarantined.collect()
    assert len(bad) == 1 and "not json" in bad[0]._bad  # raw line preserved


def test_avro_probe_and_clear_error_or_roundtrip(spark, tmp_path):
    """spark-avro is an external module: where deployed, rows round-trip;
    where not (this container, installs disallowed), the probe is False
    and read_avro raises the documented clear error instead of a deep
    Py4J trace. Mirrors the delta feature-probe pattern."""
    import pytest

    from bankcreditunion_datapipeline_spark.sources.files import (
        avro_available,
        read_avro,
    )

    if not avro_available(spark):
        with pytest.raises(NotImplementedError, match="spark-avro"):
            read_avro(spark, str(tmp_path / "nope"))
        return
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df.write.format("avro").save(str(tmp_path / "avro"))
    back = read_avro(spark, str(tmp_path / "avro"))
    assert sorted((r.id, r.v) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_read_text_lines_and_whole_files(spark, tmp_path):
    from bankcreditunion_datapipeline_spark.sources.files import (
        read_text_lines,
        read_whole_text_files,
        with_file_provenance,
    )

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("doc one line one\ndoc one line two\n")
    (d / "b.txt").write_text("doc two only line\n")

    lines = read_text_lines(spark, str(d))
    assert sorted(r["text"] for r in lines.collect()) == [
        "doc one line one",
        "doc one line two",
        "doc two only line",
    ]

    whole = read_whole_text_files(spark, str(d))
    texts = {r["text"].strip() for r in whole.collect()}
    assert len(texts) == 2
    assert "doc one line one\ndoc one line two" in texts

    # provenance rides the scan's _metadata column -- no join, any source
    prov = with_file_provenance(read_text_lines(spark, str(d))).collect()
    assert all(r["source_file"].endswith((".txt",)) for r in prov)
    assert {r["source_file"].rsplit("/", 1)[-1] for r in prov} == {
        "a.txt",
        "b.txt",
    }


def test_csv_corrupt_record_capture(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from bankcreditunion_datapipeline_spark.sources.files import read_csv

    p = tmp_path / "rows.csv"
    p.write_text("id,amount\n1,10\n2,notanumber\n3,30\n")
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("amount", LongType()),
            StructField("_bad", StringType()),
        ]
    )
    df = read_csv(spark, str(p), schema, corrupt_col="_bad").cache()
    clean = df.filter(F.col("_bad").isNull())
    bad = df.filter(F.col("_bad").isNotNull())
    assert {r["id"] for r in clean.collect()} == {1, 3}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1 and "notanumber" in bad_rows[0]["_bad"]
