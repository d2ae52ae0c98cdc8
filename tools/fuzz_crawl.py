#!/usr/bin/env python3
"""Cross-ENGINE fuzz of the crawl surface (r13 verdict #6): generate an
adversarial documents corpus — regex metacharacters, control chars,
10 kB tokens, non-ASCII, robots-shaped garbage — run the registered
crawl ops through graft.Verify, then hold Spark to the DuckDB oracle
with verify_strict. The r12 TRY_CAST lesson: the ORACLE side can
diverge on malformed input even when Spark is safe, and the fixture
synthesis never produces such input. The documents schema matches
/root/testdata (doc_id, text, lang, source, n_chars); `source` is the
one data column that reaches URL paths, `text` reaches the link graph
and word stats.

Usage: fuzz_crawl.py [workdir]   (default /tmp/fuzz_crawl)
Exit 0 iff verify_strict reports ALL OK on the fuzzed corpus.
"""
import os
import random
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

OPS = ",".join([
    "curate_url_canonical", "crawl_robots_rules", "crawl_url_allowed",
    "crawl_seen_bloom", "crawl_fetch_plan", "curate_domain_filter",
    "stats_domain_report", "crawl_frontier_rank",
])

METAS = list("?&#%\\^$[](){}|.*+\n\r\t\"'`<>@:;,=~!│ -") + \
    list("代码абвгд日本語") + [chr(c) for c in range(1, 32)]


def garbage(rnd, n):
    return "".join(rnd.choice(METAS) for _ in range(n))


def gen_docs(path, n=400, seed=20260815):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        kind = i % 8
        if kind == 0:
            src = ""                                   # empty path segment
        elif kind == 1:
            src = garbage(rnd, rnd.randint(1, 60))
        elif kind == 2:
            src = "p" * 10000                          # 10 kB URL segment
        elif kind == 3:
            src = "src1"                               # rule-colliding prefix
        elif kind == 4:
            src = "../../etc/passwd"                   # traversal shape
        elif kind == 5:
            src = "a&b=c?d#e"                          # delimiter soup
        elif kind == 6:
            src = "日本語パス"                          # non-ASCII
        else:
            src = "src5/1"                             # allow-override prefix
        tkind = i % 5
        if tkind == 0:
            text = garbage(rnd, rnd.randint(0, 300))
        elif tkind == 1:
            text = "User-agent: *\nDisallow: " + garbage(rnd, 20)
        elif tkind == 2:
            text = '<a href="' + garbage(rnd, 40) + '">x</a> ' * 5
        elif tkind == 3:
            text = "word " * rnd.randint(0, 50)
        else:
            text = '<a href="https://' + garbage(rnd, 10) + '/p">y</a>'
        rows.append((i, text, "xx", src, len(text)))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, path)


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz_crawl"
    sf = os.path.join(work, "sf")
    out = os.path.join(work, "out")
    subprocess.run(["rm", "-rf", work], check=True)
    os.makedirs(sf)
    gen_docs(os.path.join(sf, "documents.parquet"))
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    jars = subprocess.run(
        ["bash", "-c", "ls /opt/spark/jars/*.jar | tr '\\n' ':'"],
        capture_output=True, text=True).stdout
    cp = os.path.join(repo, "target/scala-2.13/classes") + ":" + jars
    r = subprocess.run(
        ["java", "-cp", cp, "-Xmx4g", "graft.Verify", sf, out, OPS],
        capture_output=True, text=True)
    errs = [l for l in r.stderr.splitlines() if "failed:" in l]
    for e in errs:
        print(e)
    strict = subprocess.run(
        [sys.executable, os.path.join(here, "verify_strict.py"), sf, out])
    sys.exit(1 if (errs or strict.returncode) else 0)


if __name__ == "__main__":
    main()
