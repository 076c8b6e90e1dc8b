"""Spark SQL surface parity: the engine is equally drivable through
``spark.sql`` over registered views — the declarative interface the
task brief calls out (DataFrame / SQL / Catalyst). The SQL plan must
be the SAME Catalyst plan the DataFrame API produces (same optimizer,
same physical strategies), so results are identical by construction —
asserted here over the KG outputs."""

from __future__ import annotations


def test_sql_equals_dataframe_over_kg(spark, pipeline_out):
    pipeline_out.nodes().createOrReplaceTempView("kg_nodes")
    pipeline_out.edges().createOrReplaceTempView("kg_edges")

    sql = spark.sql(
        """
        SELECT e.edge_type, count(*) AS n,
               count(DISTINCT e.conv_id) AS n_convs
        FROM kg_edges e
        JOIN kg_nodes s ON e.src = s.id
        WHERE s.node_type = 'Turn'
        GROUP BY e.edge_type
        ORDER BY e.edge_type
        """
    ).collect()
    from pyspark.sql import functions as F

    n = pipeline_out.nodes().filter(F.col("node_type") == "Turn").select(
        F.col("id").alias("sid")
    )
    df = (
        pipeline_out.edges()
        .join(n, F.col("src") == F.col("sid"))
        .groupBy("edge_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("conv_id").alias("n_convs"),
        )
        .orderBy("edge_type")
        .collect()
    )
    assert [tuple(r) for r in sql] == [tuple(r) for r in df]
    assert len(sql) > 0


def test_sql_window_and_lateral_constructs(spark, pipeline_out):
    """Window + QUALIFY-style filtering through pure SQL."""
    pipeline_out.nodes().createOrReplaceTempView("kg_nodes")
    rows = spark.sql(
        """
        SELECT conv_id, turn_idx FROM (
          SELECT conv_id, turn_idx,
                 row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx DESC) AS rn
          FROM kg_nodes WHERE node_type = 'Turn'
        ) WHERE rn = 1
        ORDER BY conv_id LIMIT 5
        """
    ).collect()
    assert len(rows) == 5
    # each row is its conversation's max turn_idx
    from pyspark.sql import functions as F

    maxes = {
        r["conv_id"]: r["m"]
        for r in pipeline_out.nodes()
        .filter("node_type = 'Turn'")
        .groupBy("conv_id")
        .agg(F.max("turn_idx").alias("m"))
        .collect()
    }
    assert all(maxes[r["conv_id"]] == r["turn_idx"] for r in rows)
