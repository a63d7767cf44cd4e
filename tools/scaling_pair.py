"""Single-pair (8<->32 by default) scaling session at an arbitrary corpus
size — the light-weight sibling of scaling_matrix.py for probing how one
efficiency pair trends with corpus size without paying for a 2-core leg
(a 4M-page 2-core build is ~5 minutes per sample). Same protocol:
pinned, fresh-JVM, warmup-discarded, best-of-2 children interleaved with
a pinned raw-CPU control per child (see scaling_bench.run).

Usage: python tools/scaling_pair.py [n_pages] [rounds] [N] [M]
       (defaults 4000000 2 8 32)
Prints one PAIR JSON line; BENCH/BASELINE.md is written by hand from it.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import raw_cpu_control, run  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sizes = (lo, hi)
    builds: dict[int, list[dict]] = {n: [] for n in sizes}
    raws: dict[int, list[float]] = {n: [] for n in sizes}
    for rnd in range(rounds):
        for n in sizes:
            raws[n].append(round(raw_cpu_control(n), 2))
            r = run(n, n_pages, repo)
            builds[n].append(r)
            print(
                f"ROUND {rnd} cores={n} build={r['build_sec']} "
                f"raw={raws[n][-1]}",
                flush=True,
            )
    best = {n: min(builds[n], key=lambda r: r["build_sec"]) for n in sizes}
    assert best[lo]["topk"] == best[hi]["topk"], "rank mismatch across sizes"
    factor = hi / lo
    out = {
        "n_pages": n_pages,
        "best": {
            str(n): {
                k: best[n][k]
                for k in (
                    "cpus", "build_sec", "docs_per_sec",
                    "q_p50", "q_p99", "stages",
                )
            }
            for n in sizes
        },
        "all_build_secs": {
            str(n): [r["build_sec"] for r in builds[n]] for n in sizes
        },
        "raw_cpu_secs": {str(n): raws[n] for n in sizes},
        "eff": round(
            (best[lo]["build_sec"] / best[hi]["build_sec"]) / factor, 3
        ),
        "ceiling": round(min(raws[lo]) / min(raws[hi]), 3),
    }
    out["eff_norm"] = round(out["eff"] / out["ceiling"], 3)
    print("PAIR " + json.dumps(out))


if __name__ == "__main__":
    main()
