"""Session factory contracts — master resolution must not leak state
between in-process sessions (a stopped context's spark.master lingers
in JVM-side SparkConf defaults; probing it once silently pinned every
later session to the FIRST session's core count and invalidated a
full bench run)."""

import os
import subprocess
import sys


def test_get_spark_core_counts_do_not_leak_between_sessions():
    code = (
        "from solrplugins_spark.session import get_spark\n"
        "for c in (1, 4):\n"
        "    s = get_spark(f't{c}', cores=c)\n"
        "    print('M', c, s.sparkContext.master, s.sparkContext.defaultParallelism)\n"
        "    s.stop()\n"
    )
    env = dict(os.environ)
    env.pop("MASTER", None)
    env.pop("SPARK_GRAFT_MASTER", None)
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("M ")]
    assert lines == ["M 1 local[1] 1", "M 4 local[4] 4"], (lines, out.stderr[-500:])


def test_get_spark_honors_external_master_env():
    code = (
        "from solrplugins_spark.session import get_spark\n"
        "s = get_spark('t', cores=8)\n"
        "print('M', s.sparkContext.master)\n"
        "s.stop()\n"
    )
    env = dict(os.environ)
    env["SPARK_GRAFT_MASTER"] = "local[2]"
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("M ")]
    assert lines == ["M local[2]"], (lines, out.stderr[-500:])


def test_explicit_cores_beat_ambient_master_env():
    """An explicit cores=N request must not be silently retargeted by
    an ambient $MASTER (set by spark-submit): benchmarks measuring a
    core count depend on getting exactly local[N]; no-cores callers
    still follow $MASTER."""
    code = (
        "from solrplugins_spark.session import get_spark\n"
        "s = get_spark('t', cores=4)\n"
        "print('M', s.sparkContext.master)\n"
        "s.stop()\n"
    )
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    env["MASTER"] = "local[2]"
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("M ")]
    assert lines == ["M local[4]"], (lines, out.stderr[-500:])
