"""Flink SQL DDL shim tests (ddl.py): CREATE TABLE ... WITH, INSERT INTO,
DROP TABLE, datagen/print/blackhole connectors, watermark + computed columns.

Reference semantics: TableEnvironmentImpl.executeSql DDL routing, the
filesystem/datagen/print/blackhole table factories.
"""

from __future__ import annotations

import os

import pytest

from fries_flink_spark.catalog import TableEnvironment


@pytest.fixture()
def env(spark):
    return TableEnvironment(spark)


def test_create_filesystem_table_reads_parquet(env, tmp_path):
    p = str(tmp_path / "t.parquet")
    env.spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string").write.parquet(p)
    env.execute_sql(
        f"""
        CREATE TABLE src (id INT, s STRING)
        WITH ('connector' = 'filesystem', 'path' = '{p}', 'format' = 'parquet')
        """
    )
    assert env.sql_query("SELECT count(*) AS n FROM src").first()["n"] == 2


def test_create_csv_table_with_schema_and_computed_column(env, tmp_path):
    p = str(tmp_path / "c")
    os.makedirs(p)
    with open(p + "/part.csv", "w") as f:
        f.write("1;10\n2;20\n")
    env.execute_sql(
        f"""
        CREATE TABLE csv_src (
          id INT,
          v INT,
          doubled AS v * 2
        ) WITH ('connector' = 'filesystem', 'path' = '{p}',
                'format' = 'csv', 'csv.field-delimiter' = ';')
        """
    )
    rows = {r["id"]: r for r in env.sql_query("SELECT * FROM csv_src").collect()}
    assert rows[2]["v"] == 20 and rows[2]["doubled"] == 40


def test_insert_into_filesystem_roundtrip(env, tmp_path):
    out = str(tmp_path / "out")
    env.execute_sql(
        f"""
        CREATE TABLE sink (k BIGINT, n BIGINT)
        WITH ('connector' = 'filesystem', 'path' = '{out}', 'format' = 'parquet')
        """
    )
    env.spark.range(10).createOrReplaceTempView("ten")
    env.execute_sql(
        "INSERT INTO sink SELECT id % 2 AS k, count(*) AS n FROM ten GROUP BY id % 2"
    )
    back = env.spark.read.parquet(out).collect()
    assert sorted((r["k"], r["n"]) for r in back) == [(0, 5), (1, 5)]


def test_datagen_deterministic(env):
    env.execute_sql(
        """
        CREATE TABLE gen (uid BIGINT, name STRING, score DOUBLE, ok BOOLEAN)
        WITH ('connector' = 'datagen', 'number-of-rows' = '50')
        """
    )
    a = env.sql_query("SELECT * FROM gen ORDER BY uid, name").collect()
    b = env.sql_query("SELECT * FROM gen ORDER BY uid, name").collect()
    assert a == b and len(a) == 50
    assert all(0 <= r["uid"] < 1000 for r in a)
    assert all(r["name"].startswith("name-") for r in a)


def test_blackhole_and_drop(env):
    env.execute_sql(
        "CREATE TABLE bh (x BIGINT) WITH ('connector' = 'blackhole')"
    )
    env.spark.range(5).createOrReplaceTempView("five")
    env.execute_sql("INSERT INTO bh SELECT id AS x FROM five")  # no error = pass
    env.execute_sql(
        "CREATE TABLE dropme (x INT) WITH ('connector' = 'datagen', 'number-of-rows' = '1')"
    )
    env.execute_sql("DROP TABLE dropme")
    with pytest.raises(Exception):
        env.sql_query("SELECT * FROM dropme").collect()


def test_watermark_clause_applies_on_stream(env, tmp_path):
    p = str(tmp_path / "ev")
    env.spark.sql(
        "SELECT timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS ts,"
        " id AS v FROM range(20)"
    ).write.parquet(p)
    env.execute_sql(
        f"""
        CREATE TABLE ev (ts TIMESTAMP, v BIGINT,
                         WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)
        WITH ('connector' = 'filesystem', 'path' = '{p}', 'format' = 'parquet')
        """
    )
    sdf = env.from_path_stream("ev")
    assert sdf.isStreaming
    # watermark shows up in the logical plan
    assert "watermark" in sdf._jdf.queryExecution().analyzed().toString().lower()


def test_unknown_connector_rejected(env):
    with pytest.raises(ValueError, match="unsupported connector"):
        env.execute_sql(
            "CREATE TABLE nope (x INT) WITH ('connector' = 'quantum')"
        )


def test_statement_set_multi_insert(env, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    env.execute_sql(
        f"CREATE TABLE sink_a (x BIGINT) WITH ('connector'='filesystem', 'path'='{a}', 'format'='parquet')"
    )
    env.execute_sql(
        f"CREATE TABLE sink_b (n BIGINT) WITH ('connector'='filesystem', 'path'='{b}', 'format'='parquet')"
    )
    env.spark.range(8).createOrReplaceTempView("eight")
    env.execute_sql(
        """
        EXECUTE STATEMENT SET BEGIN
          INSERT INTO sink_a SELECT id AS x FROM eight WHERE id < 3;
          INSERT INTO sink_b SELECT count(*) AS n FROM eight
        END
        """
    )
    assert env.spark.read.parquet(a).count() == 3
    assert env.spark.read.parquet(b).first()["n"] == 8


def test_explain_statement(env):
    env.spark.range(4).createOrReplaceTempView("four")
    plan = env.execute_sql("EXPLAIN PLAN FOR SELECT id * 2 AS d FROM four")
    assert isinstance(plan, str) and "Physical Plan" in plan
    plan2 = env.execute_sql("EXPLAIN SELECT count(*) FROM four")
    assert "Physical Plan" in plan2


def test_datagen_stream_source(env):
    env.execute_sql(
        """
        CREATE TABLE genstream (uid BIGINT, ts TIMESTAMP, v DOUBLE,
                                WATERMARK FOR ts AS ts - INTERVAL '10' SECOND)
        WITH ('connector' = 'datagen', 'rows-per-second' = '500')
        """
    )
    sdf = env.from_path_stream("genstream")
    assert sdf.isStreaming
    assert set(sdf.columns) == {"uid", "ts", "v"}
    assert "watermark" in sdf._jdf.queryExecution().analyzed().toString().lower()


def test_insert_values(env, tmp_path):
    out = str(tmp_path / "vals")
    env.execute_sql(
        f"CREATE TABLE vsink (k INT, s STRING) WITH ('connector'='filesystem', 'path'='{out}', 'format'='parquet')"
    )
    env.execute_sql("INSERT INTO vsink VALUES (1, 'a'), (2, 'b')")
    back = sorted((r["k"], r["s"]) for r in env.spark.read.parquet(out).collect())
    assert back == [(1, "a"), (2, "b")]


def test_execute_script_end_to_end(env, tmp_path):
    src, out = str(tmp_path / "s"), str(tmp_path / "o")
    env.spark.createDataFrame(
        [(1, "x;y"), (2, "b")], "id int, s string"
    ).write.parquet(src)
    result = env.execute_script(
        f"""
        CREATE TABLE script_src (id INT, s STRING)
        WITH ('connector'='filesystem', 'path'='{src}', 'format'='parquet');
        CREATE TABLE script_out (id INT, s STRING)
        WITH ('connector'='filesystem', 'path'='{out}', 'format'='parquet');
        EXECUTE STATEMENT SET BEGIN
          INSERT INTO script_out SELECT id, s FROM script_src WHERE id = 1;
          INSERT INTO script_out SELECT id, s FROM script_src WHERE id = 2
        END;
        SELECT count(*) AS n FROM script_src WHERE s = 'x;y'
        """
    )
    assert result.first()["n"] == 1  # literal ';' did not split the script
    assert env.spark.read.parquet(out).count() == 2


def test_set_reset_and_show_create(env):
    env.execute_sql("SET 'spark.sql.shuffle.partitions' = '7'")
    assert env.spark.conf.get("spark.sql.shuffle.partitions") == "7"
    env.execute_sql("RESET 'spark.sql.shuffle.partitions'")
    env.execute_sql(
        """
        CREATE TABLE show_me (id BIGINT, ts TIMESTAMP,
                              WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)
        WITH ('connector' = 'datagen', 'number-of-rows' = '3')
        """
    )
    stmt = env.execute_sql("SHOW CREATE TABLE show_me").first()["result"]
    assert "CREATE TABLE show_me" in stmt
    assert "WATERMARK FOR ts" in stmt and "'connector' = 'datagen'" in stmt


def test_partitioned_by_writes_partition_dirs(env, tmp_path):
    import os

    out = str(tmp_path / "parted")
    env.execute_sql(
        f"""
        CREATE TABLE psink (v BIGINT, src STRING)
        PARTITIONED BY (src)
        WITH ('connector'='filesystem', 'path'='{out}', 'format'='parquet')
        """
    )
    env.spark.range(6).createOrReplaceTempView("six")
    env.execute_sql(
        "INSERT INTO psink SELECT id AS v,"
        " CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS src FROM six"
    )
    assert sorted(
        d for d in os.listdir(out) if d.startswith("src=")
    ) == ["src=a", "src=b"]
    # partition pruning reaches the scan on read-back
    back = env.spark.read.parquet(out).filter("src = 'a'")
    assert back.count() == 3


def test_nested_paren_types_parse(env):
    env.execute_sql(
        """
        CREATE TABLE dec_t (amount DECIMAL(10,2), name VARCHAR(255))
        WITH ('connector' = 'datagen', 'number-of-rows' = '5')
        """
    )
    out = env.sql_query("SELECT * FROM dec_t").collect()
    assert len(out) == 5


def test_ddl_stream_windowed_agg_matches_batch(env, tmp_path):
    """The DDL-declared watermark drives a real windowed streaming agg:
    results equal the batch rendition once the bounded stream drains."""
    import datetime

    from pyspark.sql import functions as F

    from fries_flink_spark.streaming.windows import run_to_completion

    p = str(tmp_path / "ev")
    rows = [
        (datetime.datetime(2024, 1, 1, 0, m % 30, (m * 13) % 60), m % 3, float(m))
        for m in range(300)
    ]
    # sentinel far in the future: advances the watermark past every real
    # window so append mode emits them all; its own (withheld) window is
    # excluded from both sides
    rows.append((datetime.datetime(2024, 1, 2), 99, 0.0))
    env.spark.createDataFrame(rows, "ts timestamp, k int, v double").write.parquet(p)
    env.execute_sql(
        f"""
        CREATE TABLE ddl_ev (ts TIMESTAMP, k INT, v DOUBLE,
                             WATERMARK FOR ts AS ts - INTERVAL '2' MINUTE)
        WITH ('connector' = 'filesystem', 'path' = '{p}', 'format' = 'parquet')
        """
    )
    sdf = env.from_path_stream("ddl_ev")
    agg = sdf.groupBy(F.window("ts", "10 minutes").alias("w"), "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("total")
    ).select(F.unix_timestamp("w.start").alias("ws"), "k", "n", "total")
    s = run_to_completion(agg, "ddl_win_stream", "append")
    got = sorted(
        tuple(r)
        for r in s.sql("SELECT * FROM ddl_win_stream WHERE k <> 99").collect()
    )
    want = sorted(
        tuple(r)
        for r in env.spark.read.parquet(p)
        .filter("k <> 99")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .select(F.unix_timestamp("w.start").alias("ws"), "k", "n", "total")
        .collect()
    )
    assert got == want


def test_show_create_output_is_reexecutable(env):
    env.execute_sql(
        """
        CREATE TABLE rt_src (id BIGINT, amount DECIMAL(10,2), ts TIMESTAMP,
                             WATERMARK FOR ts AS ts - INTERVAL '30' SECOND)
        WITH ('connector' = 'datagen', 'number-of-rows' = '4')
        """
    )
    stmt = env.execute_sql("SHOW CREATE TABLE rt_src").first()["result"]
    env.execute_sql(stmt.replace("rt_src", "rt_clone"))
    a = env._ddl.tables["rt_src"]
    b = env._ddl.tables["rt_clone"]
    assert a.columns == b.columns
    assert a.watermark == b.watermark
    assert a.options == b.options
    assert env.sql_query("SELECT count(*) AS n FROM rt_clone").first()["n"] == 4
