"""Events analytics invariants + --py-files packaging round-trip.

(Oracle parity for windowed_events / sessionized_events is covered by
test_oracle_parity's auto-parametrization; these tests assert the
operator-level invariants directly.)
"""

from __future__ import annotations

import os
import subprocess
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r2rml_parser_spark.operators.events import sessionize, windowed_event_stats  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_windowed_stats_partition_to_total(spark):
    ev = _events(spark)
    stats = windowed_event_stats(ev)
    total = stats.agg(F.sum("n_events")).collect()[0][0]
    assert total == ev.count()
    # window starts are on the hour
    bad = stats.where(~F.col("window_start").rlike(r":00:00$")).count()
    assert bad == 0


def test_sessionize_invariants(spark):
    ev = _events(spark)
    sess = sessionize(ev, gap_seconds=1800).cache()
    # every event lands in exactly one session
    assert sess.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    # sessions of one user don't overlap and are separated by > gap
    nxt = sess.alias("a").join(
        sess.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.session_seq") == F.col("a.session_seq") + 1),
    )
    overlapping = nxt.where(
        F.col("b.session_start") <= F.col("a.session_end")
    ).count()
    assert overlapping == 0
    # durations are non-negative and bounded by n_events * anything sane
    assert sess.where(F.col("duration_us") < 0).count() == 0
    sess.unpersist()


def test_pyfiles_zip_roundtrip(tmp_path):
    """package.py builds a zip importable via zipimport (the --py-files
    contract: executors must import the package from the archive)."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from package import build_pyfiles_zip

    out = build_pyfiles_zip(str(tmp_path / "pkg.zip"))
    assert os.path.exists(out)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import r2rml_parser_spark.plans.engine as e; "
        "import r2rml_parser_spark.operators.events as ev; "
        "print(e.__name__, ev.__name__)" % out
    )
    env = dict(os.environ, PYTHONPATH="")
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr
    assert "r2rml_parser_spark.plans.engine" in res.stdout
