"""Poll the engine-independent host probe and fire node-sim batteries
only in healthy windows.

The sandbox box is multi-tenant: co-tenant load silently steals cores and
corrupts any single/concurrent throughput ratio (see BASELINE.md, round-3
"degraded window" analysis).  ``bench.py --host-probe`` measures the
box's *effective* parallel width with a fixed-work arithmetic loop (no
Ray, no engine code); the battery's efficiency number is only evidence
when that probe reads healthy.

Protocol per successful run:
  pre-probe (must be healthy) -> bench.py --scaling-nodes -> post-probe,
all three JSON objects written to one BENCH/nodes_r4_run{X}.json file.
A run whose POST probe is degraded is kept but marked ``window_dirty``
(the load may have arrived mid-battery; the in-battery pre/post single-
node baselines already bound that drift).

Usage:  python tools/battery_watcher.py [--runs 3] [--bar 24] \
            [--poll-sec 300] [--n-nodes 4] [--max-hours 5]
"""

from __future__ import annotations

import argparse
import json
import os
import string
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_DIR = os.path.join(REPO, "BENCH")


def _run_json(args: list[str], timeout: int) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(f"bench {args} failed:\n{proc.stderr[-2000:]}")
    return json.loads(lines[-1])


def probe() -> dict:
    return _run_json(["--host-probe"], timeout=600)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--bar", type=float, default=24.0)
    ap.add_argument("--poll-sec", type=int, default=300)
    ap.add_argument("--n-nodes", type=int, default=4)
    ap.add_argument("--cpus-per-node", type=int, default=8)
    ap.add_argument("--max-hours", type=float, default=5.0)
    ap.add_argument("--tag", default="nodes_r4_run")
    args = ap.parse_args()

    os.makedirs(BENCH_DIR, exist_ok=True)
    deadline = time.time() + args.max_hours * 3600
    done = 0
    letters = iter(string.ascii_uppercase)
    log = lambda *a: print(time.strftime("[%H:%M:%S]"), *a, flush=True)

    while done < args.runs and time.time() < deadline:
        try:
            pre = probe()
        except Exception as exc:  # noqa: BLE001 — keep polling through blips
            log("probe failed:", exc)
            time.sleep(args.poll_sec)
            continue
        log(f"probe 32-wide={pre['speedup_32wide']} (bar {args.bar})")
        if pre["speedup_32wide"] < args.bar:
            time.sleep(args.poll_sec)
            continue
        log("healthy window — firing battery")
        try:
            battery = _run_json(
                [
                    "--scaling-nodes",
                    "--n-nodes",
                    str(args.n_nodes),
                    "--cpus-per-node",
                    str(args.cpus_per_node),
                ],
                timeout=3600,
            )
            post = probe()
        except Exception as exc:  # noqa: BLE001
            log("battery failed:", exc)
            time.sleep(args.poll_sec)
            continue
        letter = next(letters)
        out = {
            "pre_probe": pre,
            "battery": battery,
            "post_probe": post,
            "window_dirty": post["speedup_32wide"] < args.bar,
        }
        path = os.path.join(BENCH_DIR, f"{args.tag}{letter}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        log(
            f"wrote {path}: build_eff={battery['value']} "
            f"query_eff={battery['scaling_efficiency_query']} "
            f"dirty={out['window_dirty']}"
        )
        done += 1
        time.sleep(30)
    log(f"watcher exiting: {done}/{args.runs} runs")


if __name__ == "__main__":
    main()
