"""Drive tools/submit_crawl.py — the spark-submit driver program.

Runs the CLI in plain-python mode as a subprocess (its own JVM, its own
session factory path) and asserts the two launch-mode contracts:

  * a fresh run crawls from round 0 and prints per-round + summary JSON;
  * re-running the same command with the same --state-dir RESUMES from
    the last committed round instead of restarting.

The spark-submit --py-files variant of the same entrypoint (PythonRunner
gateway, submitted-conf precedence) exercises cluster plumbing that a
unit test cannot assert meaningfully in local mode; it is verified
end-to-end in-session (see README "Cluster launch") via
``spark-submit --master local[2] --py-files``.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "tools", "submit_crawl.py")


def _run_cli(*args: str) -> list[dict]:
    env = dict(os.environ, ARTEMIS_DRIVER_MEM="4g")
    proc = subprocess.run(
        [sys.executable, CLI, *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        check=False,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    rows = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            rows.append(json.loads(line))
    return rows


def test_fresh_run_then_resume(tmp_path):
    web = str(tmp_path / "web")
    state = str(tmp_path / "state")
    base = [
        "--tier", "tiny",
        "--web-dir", web,
        "--state-dir", state,
        "--master", "local[2]",
        "--partitions", "2",
        "--budget", "5",
    ]

    first = _run_cli(*base, "--rounds", "2", "--fresh")
    rounds = [r for r in first if "round" in r]
    summary = first[-1]
    assert [r["round"] for r in rounds] == [0, 1]
    assert all(r["fetched"] > 0 for r in rounds)
    assert summary["rounds_run"] == 2
    assert summary["urls"] == sum(r["scheduled"] + r["fetched"] for r in rounds)
    assert summary["master"] == "local[2]"

    # same command, same state dir, no --fresh: picks up at round 2
    second = _run_cli(*base, "--rounds", "1")
    rounds2 = [r for r in second if "round" in r]
    assert [r["round"] for r in rounds2] == [2]


def test_emit_zip(tmp_path):
    zpath = str(tmp_path / "artemis_spark.zip")
    out = subprocess.run(
        [sys.executable, CLI, "--emit-zip", zpath],
        capture_output=True,
        text=True,
        timeout=120,
        check=True,
    ).stdout
    assert os.path.exists(zpath)
    assert "spark-submit" in out and "--py-files" in out
    import zipfile

    names = zipfile.ZipFile(zpath).namelist()
    assert "artemis_spark/session.py" in names
    assert "artemis_spark/plans/crawl.py" in names
