"""Two-parallelism scaling benchmark -> BENCH/BASELINE.md.

The north rule's N-vs-4N-executor criterion cannot use a real cluster in
this sandbox; it is evidenced by running the SAME job on the SAME input
(deterministic, parallelism-invariant synthesis) at local[N] and
local[4N] and reporting throughput at both plus scaling efficiency
  eff = (thr_4N / thr_N) / 4.

Each level runs in its own subprocess (fresh JVM — no warm-cache bleed).

Usage: python tools/scaling_bench.py [n_convs] [N]   (defaults 11000, 8)
Child: python tools/scaling_bench.py --child <cpus> <n_convs>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def child(cpus: int, n_convs: int) -> None:
    import shutil
    import tempfile

    from connectors_spark.session import get_spark
    from connectors_spark.operators.build import build_index_transcripts
    from connectors_spark.operators.index import IndexReader, write_encoded_index
    from connectors_spark.synth import synth_queries, synth_transcripts

    spark = get_spark(
        f"scaling_{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    path = tempfile.mkdtemp(prefix=f"scale_idx_{cpus}_")
    try:
        t = synth_transcripts(spark, n_convs, seed=42)
        t0 = time.time()
        idx = build_index_transcripts(t, with_positions=False)
        write_encoded_index(idx, path, n_buckets=64, shard_cap=1 << 18)
        build_s = time.time() - t0

        reader = IndexReader(spark, path)
        reader.postings.count()
        queries = synth_queries(200, seed=42)
        t0 = time.time()
        reader.topk(queries, kernel="auto").write.format("noop").mode(
            "overwrite"
        ).save()
        query_s = time.time() - t0
        print(json.dumps({
            "cpus": cpus, "n_turns": idx.n_docs,
            "build_sec": round(build_s, 2),
            "build_turns_per_sec": round(idx.n_docs / build_s, 1),
            "query_sec": round(query_s, 2),
            "queries_per_sec": round(len(queries) / query_s, 1),
        }))
    finally:
        shutil.rmtree(path, ignore_errors=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 11_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "3"))
    # the sandbox host throttles unpredictably (observed 47-195 s for the
    # IDENTICAL 32-core run): interleave levels and take best-of-N per
    # level so host noise cancels; all runs are reported for transparency
    runs: dict[int, list[dict]] = {n: [], 4 * n: []}
    for _ in range(rounds):
        for cpus in (n, 4 * n):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(cpus), str(n_convs)],
                capture_output=True, text=True, cwd=REPO, check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            runs[cpus].append(json.loads(line))
            print(line)

    def best(cpus):
        return max(runs[cpus], key=lambda r: r["build_turns_per_sec"])

    lo, hi = best(n), best(4 * n)
    lo["queries_per_sec"] = max(r["queries_per_sec"] for r in runs[n])
    hi["queries_per_sec"] = max(r["queries_per_sec"] for r in runs[4 * n])
    eff_build = (hi["build_turns_per_sec"] / lo["build_turns_per_sec"]) / 4
    eff_query = (hi["queries_per_sec"] / lo["queries_per_sec"]) / 4
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    all_rows = "\n".join(
        f"| local[{c}] run {i+1} | {r['build_sec']} | {r['build_turns_per_sec']} "
        f"| {r['query_sec']} | {r['queries_per_sec']} |"
        for c in (n, 4 * n) for i, r in enumerate(runs[c])
    )
    md = f"""# BENCH/BASELINE — two-parallelism scaling evidence

Same job, same input (deterministic seeded transcripts, {lo['n_turns']}
turns, parallelism-invariant synthesis), fresh JVM per level, levels
interleaved best-of-{rounds} (the sandbox host throttles CPU
unpredictably — identical runs varied up to 4x — so per-level best is the
least-noise estimate; every run is listed below).

| level (best) | build sec | build turns/s | 200-query batch sec | queries/s |
|---|---|---|---|---|
| local[{n}]  (N)  | {lo['build_sec']} | {lo['build_turns_per_sec']} | {lo['query_sec']} | {lo['queries_per_sec']} |
| local[{4*n}] (4N) | {hi['build_sec']} | {hi['build_turns_per_sec']} | {hi['query_sec']} | {hi['queries_per_sec']} |

All runs:

| run | build sec | build turns/s | query sec | queries/s |
|---|---|---|---|---|
{all_rows}

- **index-build scaling efficiency (N -> 4N): {eff_build:.2f}**
- query-batch scaling efficiency (N -> 4N): {eff_query:.2f}
- target (BASELINE.json): >= 0.8 for the index build at cluster scale.
  Local-mode caveat: a single shared JVM/driver understates true
  multi-executor scaling (driver-side stages and GC are serialized);
  the per-stage plan (hash-partitioned shuffles, no driver loops, no
  collect in the build path) is the cluster-scaling design.

Reproduce: `python tools/scaling_bench.py`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(f"eff_build={eff_build:.2f} eff_query={eff_query:.2f}")


if __name__ == "__main__":
    main()
