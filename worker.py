"""Multi-run batch executor (parity: reference worker.py:57-270).

Reads a job file (one trainer CLI line per row), replicates each job over N
seeds (default 5, seeds 2023..), skips (command, seed) pairs already
recorded in the local results ledger, and runs `python trainer.py ...`
subprocesses. The reference gates on free GPU memory and a remote
lego-server dedup ledger; on a single-TPU host jobs run sequentially and
the ledger is a local JSONL.

    python worker.py --jobs jobs.txt --replicate 5
"""
import os
import subprocess
import sys

from legommenders_tpu.utils.function import parse_cli
from legommenders_tpu.utils.io import jsonl_append, jsonl_load

LEDGER = "checkpoints/worker_ledger.jsonl"


def completed_set():
    if not os.path.isfile(LEDGER):
        return set()
    return {(r["command"], r["seed"]) for r in jsonl_load(LEDGER)
            if r.get("status") == "done"}


def main(argv):
    cli = parse_cli(argv)
    jobs_file = cli.get("jobs")
    if not jobs_file:
        raise SystemExit("--jobs <file> is required")
    replicate = int(cli.get("replicate", 5))
    base_seed = int(cli.get("base_seed", 2023))
    done = completed_set()

    with open(jobs_file) as f:
        jobs = [l.strip() for l in f if l.strip() and not l.startswith("#")]

    for job in jobs:
        for r in range(replicate):
            seed = base_seed + r
            if (job, seed) in done:
                print(f"skip (done): {job} --seed {seed}")
                continue
            cmd = [sys.executable, "trainer.py"] + job.split() + [
                "--seed", str(seed)]
            print("run:", " ".join(cmd))
            ret = subprocess.call(cmd)
            jsonl_append({"command": job, "seed": seed,
                          "status": "done" if ret == 0 else f"exit{ret}"},
                         LEDGER)


if __name__ == "__main__":
    main(sys.argv[1:])
