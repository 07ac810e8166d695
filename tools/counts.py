"""Single source of truth for the counts SURVEY.md / README.md cite:
queries, oracles, test files, collected tests, CLI subcommands, LoC.
Run after any change that adds/removes a query or test and paste the
JSON line into the docs (round-3 verdict item 10: generated numbers,
not hand-edited drift).

    python tools/counts.py [--collect]

``--collect`` also runs pytest --collect-only for the exact test count
(slow-ish: imports every test module).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    test_files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    n_test_funcs = 0
    for tf in test_files:
        with open(tf) as f:
            n_test_funcs += len(re.findall(r"^def test_|^    def test_",
                                           f.read(), re.M))

    from webgraph_spark.cli import build_parser

    sub = next(
        a for a in build_parser()._actions
        if a.__class__.__name__ == "_SubParsersAction"
    )
    n_cmds = len(sub.choices)

    loc = {"webgraph_spark": 0, "entry_bench_tools": 0, "tests": 0}
    for path in glob.glob(os.path.join(REPO, "webgraph_spark", "**", "*.py"),
                          recursive=True):
        loc["webgraph_spark"] += sum(1 for _ in open(path))
    for path in ([os.path.join(REPO, "__spark_entry__.py"),
                  os.path.join(REPO, "bench.py")]
                 + glob.glob(os.path.join(REPO, "tools", "*.py"))):
        loc["entry_bench_tools"] += sum(1 for _ in open(path))
    for path in glob.glob(os.path.join(REPO, "tests", "*.py")):
        loc["tests"] += sum(1 for _ in open(path))

    out = {
        "queries": len(qs),
        "oracles": len(oracles),
        "queries_without_oracle": sorted(set(qs) - set(oracles)),
        "test_files": len(test_files),
        "test_functions": n_test_funcs,
        "cli_subcommands": n_cmds,
        "loc": loc,
        "loc_non_test_total": loc["webgraph_spark"] + loc["entry_bench_tools"],
    }
    if "--collect" in sys.argv:
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "--collect-only", "-q",
             os.path.join(REPO, "tests")],
            capture_output=True, text=True, cwd=REPO,
        )
        tail = [l for l in r.stdout.splitlines() if "test" in l and "::" in l]
        out["collected_tests"] = len(tail)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
