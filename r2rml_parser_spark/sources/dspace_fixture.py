"""Deterministic DSpace-shaped fixture tables (eperson / epersongroup /
epersongroup2eperson).

The reference's scale experiments load up to ~500k eperson rows into a
live Postgres (ComplianceTests.java:263-283, loadPersons). This
synthesizes the same shape distributedly: `spark.range` + md5-derived
names — no RNG, no driver-side loops, any row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def eperson_tables(
    spark: SparkSession, n_persons: int = 10_000, n_groups: int = 100,
    memberships_per_person: int = 2,
) -> dict[str, DataFrame]:
    par = spark.sparkContext.defaultParallelism
    ids = spark.range(0, n_persons, 1, par)
    eperson = ids.select(
        F.col("id").cast("int").alias("eperson_id"),
        F.concat(F.lit("user"), F.col("id"), F.lit("@example.org")).alias("email"),
        F.concat(F.lit("First"), F.substring(F.md5(F.col("id").cast("string")), 1, 6)).alias(
            "firstname"
        ),
        F.concat(F.lit("Last"), F.substring(F.md5(F.col("id").cast("string")), 7, 6)).alias(
            "lastname"
        ),
        F.element_at(
            F.array(F.lit("en"), F.lit("es"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("language"),
    )
    epersongroup = spark.range(0, n_groups, 1, min(par, 8)).select(
        F.col("id").cast("int").alias("eperson_group_id"),
        F.concat(F.lit("GROUP_"), F.col("id")).alias("name"),
    )
    m = spark.range(0, n_persons * memberships_per_person, 1, par)
    epersongroup2eperson = m.select(
        F.col("id").cast("int").alias("id"),
        # deterministic skewed group assignment: md5-derived, Zipf-ish via
        # squaring to concentrate mass on low group ids (hot-key exercise)
        (
            F.pow(
                (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10).cast(
                    "double"
                ) / 65535.0),
                2.0,
            )
            * n_groups
        ).cast("int").alias("eperson_group_id"),
        (F.col("id") % n_persons).cast("int").alias("eperson_id"),
    )
    return {
        "eperson": eperson,
        "epersongroup": epersongroup,
        "epersongroup2eperson": epersongroup2eperson,
    }
