"""End-to-end lifecycle through the spark-submit job entry points
(jobs/*.py main(argv)): build -> query -> DSL query -> delete_by_query ->
compact -> query again. Mirrors the operational surface a reference
kafka-es user drives (connector config -> bulk actions -> ES queries),
re-expressed as index jobs; the compaction step is the force-merge
analogue (SURVEY §2.8 X9).

Each job main() stops the SparkSession in a finally block, so the chain
runs in ONE child process (get_spark re-creates the session per step —
exactly what back-to-back spark-submit invocations do), keeping the
pytest session's own SparkSession alive.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHAIN = r"""
import io, json, sys
sys.path.insert(0, {repo!r})
from contextlib import redirect_stdout

import jobs.build_index, jobs.query_index, jobs.update_index, jobs.compact_index

out = {{}}

def run(mod, argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        mod.main(argv)
    return buf.getvalue()

idx = {idx!r}
run(jobs.build_index, ["--gen", "3000", "--output", idx, "--term-buckets", "4",
                       "--store-fields", "lang"])

hits = json.loads(run(jobs.query_index, ["--index", idx, "web crawl text"]).strip().splitlines()[-1])
out["q1"] = hits

dsl = json.loads(run(jobs.query_index, [
    "--index", idx, "--dsl",
    '{{"query": {{"bool": {{"must": [{{"match": {{"text": "web crawl"}}}}],'
    ' "filter": [{{"range": {{"dl": {{"gte": 10}}}}}}]}}}}, "size": 5}}',
]).strip().splitlines()[-1])
out["dsl"] = dsl

upd = json.loads(run(jobs.update_index, [
    "--index", idx, "update", "web crawl", "--mode", "and",
    "--script", "ctx._source.lang = 'xx-' + ctx._source.lang",
]).strip().splitlines()[-1])
out["updated"] = upd

dele = json.loads(run(jobs.update_index, ["--index", idx, "delete", "web crawl", "--mode", "and"]).strip().splitlines()[-1])
out["deleted"] = dele

gone = json.loads(run(jobs.query_index, ["--index", idx, "--mode", "and", "web crawl"]).strip().splitlines()[-1])
out["after_delete"] = gone

comp = json.loads(run(jobs.compact_index, ["--index", idx]).strip().splitlines()[-1])
out["compacted"] = comp

again = json.loads(run(jobs.query_index, ["--index", idx, "data index"]).strip().splitlines()[-1])
out["q2"] = again

print("CHAIN " + json.dumps(out))
"""


def test_jobs_cli_lifecycle(tmp_path):
    idx = str(tmp_path / "cli_idx")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    code = CHAIN.format(repo=REPO, idx=idx)
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stderr[-4000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("CHAIN ")][-1]
    out = json.loads(line[len("CHAIN "):])

    assert len(out["q1"]["hits"]) == 10
    assert out["q1"]["hits"][0]["score"] >= out["q1"]["hits"][-1]["score"]
    assert all("url" in h for h in out["q1"]["hits"])

    assert 0 < len(out["dsl"]["hits"]) <= 5

    # painless-lite update_by_query rewrote the stored field for every
    # conjunctive match; the later delete draws the same hit set
    assert out["updated"]["updated"] == out["deleted"]["deleted"]

    # conjunctive delete tombstones some docs; the same AND query then
    # returns nothing (tombstones are query-visible pre-compaction)
    assert out["deleted"]["deleted"] > 0
    assert out["after_delete"]["hits"] == []

    c = out["compacted"]["compacted"]
    assert c["tombstones_applied"] == out["deleted"]["deleted"]
    assert c["docs"] == 3000 - c["tombstones_applied"]

    # the compacted index still serves (stats now reflect the live corpus)
    assert len(out["q2"]["hits"]) == 10
