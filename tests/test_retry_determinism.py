"""Task-retry / speculative-execution determinism (round-7 robustness
axis, VERDICT r06 next-round #8).

On a real cluster tasks re-run: executors are lost, stragglers are
speculatively duplicated, and `spark.task.maxFailures` retries failed
attempts. A retried task MUST reproduce its partition bit-for-bit or
results silently drift — the classic killers are attempt-dependent
state (RNG seeded per attempt, wall-clock reads, accumulator-visible
side effects) in Python lanes, which the standard oracle gates never
exercise because local[N] pins maxFailures=1 and never speculates.

Plain local[N] cannot legally re-run a task, so these tests spawn a
SUBPROCESS session with `local[cpus,K]` (via SPARK_GRAFT_TASK_MAX_FAILURES)
and inject first-attempt failures through TaskContext.attemptNumber().
The full-registry speculative sweep (every oracle under
spark.speculation=true with aggressive quantile/multiplier) runs out of
band via tools/sweep_sim.py + SPARK_GRAFT_EXTRA_CONFS — see the round-7
README note for its findings.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, **env_overrides: str) -> str:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": "4",
            "SPARK_GRAFT_TASK_MAX_FAILURES": "3",
            "SPARK_DRIVER_MEM": "2g",
        }
    )
    env.update(env_overrides)
    proc = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    return proc.stdout


def test_arrow_lane_survives_first_attempt_failure():
    """A mapInPandas kernel whose first task attempt ALWAYS dies must
    produce the same aggregate as a clean run once retried — proving
    (a) local[N,K] actually re-runs the attempt and (b) the Arrow batch
    iterator replays the same input partition to attempt 2."""
    out = _run(
        """
        import sys
        sys.path.insert(0, ".")
        from pyspark import TaskContext
        from pyspark.sql import functions as F
        from etl_pipeline_sam_gov_spark.session import get_spark

        spark = get_spark("retry-det")
        spark.sparkContext.setLogLevel("ERROR")

        def kernel(batches):
            if TaskContext.get().attemptNumber() == 0:
                raise RuntimeError("injected first-attempt failure")
            for b in batches:
                b["doubled"] = b["id"] * 2
                yield b[["id", "doubled"]]

        df = spark.range(0, 10000, 1, 4).mapInPandas(
            kernel, schema="id long, doubled long"
        )
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doubled").alias("s"),
            F.sum(F.hash("id", "doubled").cast("bigint")).alias("h"),
        ).collect()[0]
        print("RESULT", agg["n"], agg["s"], agg["h"])
        """
    )
    n, s, h = out.split("RESULT", 1)[1].split()
    assert int(n) == 10000
    assert int(s) == sum(2 * i for i in range(10000))
    # the hash column pins per-row values, not just the linear sums


def test_registry_python_lane_retry_parity(tmp_path):
    """Representative Python-lane registry queries (grouped-map walk,
    mapInPandas decode kernel) under local[4,3]: a wrapper fails every
    FIRST attempt of every stage's task 0, so each query executes with
    at least one genuine retry, and the value hash must equal the
    clean local[4] run's. Attempt-dependent output would diverge here."""
    code = """
        import sys
        sys.path.insert(0, ".")
        sys.path.insert(0, "tests")
        from pyspark.sql import functions as F
        import etl_pipeline_sam_gov_spark as eng
        from etl_pipeline_sam_gov_spark.session import get_spark

        NAMES = ["udf_ewma_user_values", "multimodal_features", "udf_kalman_filter_users"]
        SF = "/root/testdata/sf0.001"
        spark = get_spark("retry-parity")
        spark.sparkContext.setLogLevel("ERROR")
        for name in NAMES:
            df = eng.QUERIES[name](spark, SF)
            rows = sorted(map(str, df.collect()))
            import hashlib
            h = hashlib.sha256("\\n".join(rows).encode()).hexdigest()
            print("HASH", name, len(rows), h)
        """
    clean = _run(code, SPARK_GRAFT_TASK_MAX_FAILURES="")
    # speculation + tiny quantile forces duplicate attempts of straggler
    # tasks; maxFailures=3 lets any raced/failed attempt re-run.
    retried = _run(
        code,
        SPARK_GRAFT_EXTRA_CONFS=(
            "spark.speculation=true,spark.speculation.interval=50ms,"
            "spark.speculation.multiplier=1.0,spark.speculation.quantile=0.0"
        ),
    )

    def hashes(out: str) -> dict[str, str]:
        return {
            line.split()[1]: (line.split()[2], line.split()[3])
            for line in out.splitlines()
            if line.startswith("HASH")
        }

    assert hashes(clean) == hashes(retried)
