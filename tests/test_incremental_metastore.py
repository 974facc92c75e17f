"""Cross-session guarantee for MinHashStore's bucketed mode (r6 verdict
#5): the zero-state-shuffle screen layout must survive a REAL metastore
round-trip, not just the session that wrote it.

Two sequential subprocesses share a derby-backed hive metastore + an
on-disk warehouse: the first commits bucketed state; the second (a fresh
JVM) reopens the store by table name, validates the persisted
hash-parameter identity (the r6 ADVICE table-properties guard), and
asserts the screen's candidate join still reads the history
bucket-aligned — ``Bucketed: true`` with no Exchange between the join
and the state table's scan."""

import os
import subprocess
import sys
import textwrap

_CORPUS = """\
CORPUS = [(i, " ".join("tok%d_%d" % (i, j) for j in range(12)))
          for i in range(14)]
# docs 20/21 are near-dups of docs 0/1 (one token changed)
CORPUS += [(20, CORPUS[0][1].replace("tok0_11", "tokX")),
           (21, CORPUS[1][1].replace("tok1_0", "tokY"))]
"""

_COMMON = """\
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[4]")
         .appName({app!r})
         .config("spark.sql.warehouse.dir", {wh!r})
         .config("spark.sql.catalogImplementation", "hive")
         .config("javax.jdo.option.ConnectionURL",
                 "jdbc:derby:;databaseName={db};create=true")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .enableHiveSupport().getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from faisssearcher_spark.operators.incremental import MinHashStore
"""


def _run(script: str, tmp: str, name: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=240, cwd=tmp,
        env={**os.environ, "SPARK_LOCAL_DIRS": os.path.join(tmp, "sl")})
    assert proc.returncode == 0, (
        f"{name} failed:\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}")
    return proc.stdout


def test_bucketed_state_survives_metastore_reopen(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = str(tmp_path)
    common = _COMMON.format(repo=repo, app="mh-writer",
                            wh=os.path.join(tmp, "wh"),
                            db=os.path.join(tmp, "ms_db"))
    store_args = ("spark, %r, bands=8, bucketed_table='t_mh_cross', "
                  "n_buckets=8" % os.path.join(tmp, "store"))

    writer = common + _CORPUS + textwrap.dedent(f"""
        docs = spark.createDataFrame(
            [r for r in CORPUS if r[0] < 14], "doc_id long, text string")
        MinHashStore({store_args}).commit(docs)
        print("WROTE", spark.table("t_mh_cross").count())
    """)
    out = _run(writer, tmp, "writer")
    assert "WROTE" in out

    reader = common + _CORPUS + textwrap.dedent(f"""
        # 1. reopening with DIFFERENT hash parameters must be refused
        #    from the table's own recorded identity (fresh path!)
        try:
            MinHashStore(spark, {os.path.join(tmp, 'other')!r},
                         bands=4, bucketed_table="t_mh_cross")
            raise SystemExit("param mismatch was not rejected")
        except ValueError as e:
            assert "t_mh_cross" in str(e), e
        # 2. same parameters reopen cleanly; screen finds the planted
        #    near-dups against the PERSISTED state
        store = MinHashStore({store_args})
        batch = spark.createDataFrame(
            [r for r in CORPUS if r[0] >= 20], "doc_id long, text string")
        hits = store.screen(batch, threshold=0.5)
        got = sorted((r["new_id"], r["known_id"]) for r in hits.collect())
        assert got == [(20, 0), (21, 1)], got
        # 3. the state side still reads bucket-aligned in THIS session:
        #    Bucketed: true, and no Exchange between the join and the
        #    state table's scan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (store.screen(batch, threshold=0.5)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Bucketed: true" in plan, plan
        scan_at = plan.index("FileScan parquet spark_catalog.default.t_mh_cross")
        join_at = plan.rindex("SortMergeJoin", 0, scan_at)
        seg = plan[join_at:scan_at].splitlines()[1:]
        state_branch = [l for l in seg if not l.lstrip().startswith(":")]
        assert not any("Exchange" in l for l in state_branch), plan
        print("REOPEN OK")
    """)
    out = _run(reader, tmp, "reader")
    assert "REOPEN OK" in out
