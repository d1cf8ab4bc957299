#!/usr/bin/env python3
"""Real-process scaling point for the native CPU-cluster legs (round 4,
VERDICT r03 weak #4): time flagstat_multihost_file / _bgzf_sam at world
size 1 vs 2 REAL coordinated processes and print words/s + efficiency.

This is the cheapest honest scaling datum this single-host environment
can produce (BASELINE.md's >=90% multi-chip DP target is untestable with
one chip): both processes share the same 4 cores, so two configurations
are reported —

  constant-silicon: 1 proc x 2T  vs  2 proc x 2T   (capacity slope: do
      two coordinated processes extract ~2x of 1 proc on 2x cores?)
  constant-cores:   1 proc x 4T  vs  2 proc x 2T   (partitioning
      overhead: same 4 cores, is splitting into processes ~free?)

Usage:
  python tools/multihost_scaling.py [--file /tmp/na12878/na12878_s1_l1.lz4]
      [--sam-gz /tmp/na12878/na12878_s1.sam.gz] [--iters 3]

Each timed leg runs in fresh subprocesses (jax.distributed needs one
process per participant); the reported wall is the max across
participants of the min-over-iters around the call itself (coordinator
setup excluded), matching the reference's min-of-runs discipline
(linux/instrumented_benchmark.cpp:107-142).
"""
from __future__ import annotations

import argparse
import json
import socket
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)

_WORKER = r'''
import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
kind, path, threads, iters = (sys.argv[4], sys.argv[5], int(sys.argv[6]),
                              int(sys.argv[7]))
if nproc > 1:
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
from libflagstats_tpu.parallel import multihost

def run():
    if kind == "framed":
        return multihost.flagstat_multihost_file(path, codec="lz4",
                                                 impl="native",
                                                 n_threads=threads)
    if kind == "bam":
        return multihost.flagstat_multihost_bam(path, n_threads=threads)
    return multihost.flagstat_multihost_bgzf_sam(path, n_threads=threads)

best = float("inf")
counters = None
for _ in range(iters):
    # every participant reaches the collective inside run(); the
    # cross-process sum is the natural barrier, so the timed region
    # includes straggler wait (that IS the multihost wall)
    t0 = time.perf_counter()
    counters = run()
    best = min(best, time.perf_counter() - t0)
total = int(counters[9]) + int(counters[25])
print("LEGRESULT " + json.dumps(
    {"pid": pid, "wall_s": best, "records": total}), flush=True)
'''


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_world(nproc: int, kind: str, path: str, threads: int,
              iters: int) -> dict:
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(nproc), str(pid),
             kind, path, str(threads), str(iters)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=_REPO)
        for pid in range(nproc)
    ]
    walls, records = [], 0
    for p in procs:
        out, err = p.communicate(timeout=1800)
        if p.returncode != 0:
            sys.stderr.write(err)
            raise RuntimeError(f"worker rc={p.returncode}")
        for line in out.splitlines():
            if line.startswith("LEGRESULT "):
                r = json.loads(line[len("LEGRESULT "):])
                walls.append(r["wall_s"])
                records = r["records"]  # identical global total everywhere
    assert len(walls) == nproc
    return {"nproc": nproc, "threads": threads, "wall_s": max(walls),
            "records": records,
            "words_per_s": records / max(walls)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--file", default="/tmp/na12878/na12878_s1_l1.lz4")
    ap.add_argument("--sam-gz", default="/tmp/na12878/na12878_s1.sam.gz")
    ap.add_argument("--bam", default="/tmp/na12878/na12878_s4_real.bam")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    rows = []
    for kind, path in (("framed", args.file), ("bgzf_sam", args.sam_gz),
                       ("bam", args.bam)):
        if not Path(path).exists():
            print(f"[skip] {kind}: {path} missing "
                  "(run tools/na12878_run.py --keep first)")
            continue
        legs = {}
        for nproc, threads, label in ((1, 2, "1proc x 2T"),
                                      (1, 4, "1proc x 4T"),
                                      (2, 2, "2proc x 2T")):
            t0 = time.perf_counter()
            r = run_world(nproc, kind, path, threads, args.iters)
            legs[label] = r
            print(f"[{kind}] {label}: wall {r['wall_s']:.2f}s "
                  f"({r['words_per_s']/1e6:.0f} Mwords/s; launcher "
                  f"overhead excl., total {time.perf_counter()-t0:.1f}s)",
                  flush=True)
        if len(legs) == 3:
            silicon = (legs["2proc x 2T"]["words_per_s"]
                       / legs["1proc x 2T"]["words_per_s"])
            cores = (legs["2proc x 2T"]["words_per_s"]
                     / legs["1proc x 4T"]["words_per_s"])
            row = {"kind": kind,
                   "constant_silicon_speedup": round(silicon, 3),
                   "constant_silicon_efficiency": round(silicon / 2, 3),
                   "constant_cores_ratio": round(cores, 3),
                   **{k: round(v["wall_s"], 3)
                      for k, v in ((lbl, legs[lbl]) for lbl in legs)}}
            rows.append(row)
            print(json.dumps(row), flush=True)
    return 0 if rows else 1


if __name__ == "__main__":
    sys.exit(main())
