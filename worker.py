"""Multi-run batch executor (parity: reference worker.py:57-270).

Reads a job file (one trainer CLI line per row), replicates each job over N
seeds (default 5, seeds 2023..), skips (command, seed) pairs that already
completed, and runs `python trainer.py ...` subprocesses.

Dedup has two ledgers, matching the reference's design:
  * a remote lego-server (reference worker.py:93-113, 136-157): when the
    `.auth` dotfile carries `lego_uri`/`lego_auth`, each job registers an
    evaluation (signature, command, configuration) and each seed an
    experiment whose server-issued session id is forwarded to the trainer
    via `--session`; completed (command, seed) pairs are skipped;
  * a local JSONL ledger (single-host fallback — the reference's GPU-memory
    gating is replaced by sequential execution on the one-TPU host; this
    divergence is deliberate).

    python worker.py --jobs jobs.txt --replicate 5
"""
import json
import os
import subprocess
import sys

from legommenders_tpu.utils.function import get_signature, parse_cli
from legommenders_tpu.utils.io import jsonl_append, jsonl_load

LEDGER = "checkpoints/worker_ledger.jsonl"


def completed_set():
    if not os.path.isfile(LEDGER):
        return set()
    return {(r["command"], r["seed"]) for r in jsonl_load(LEDGER)
            if r.get("status") == "done"}


def job_signature(job: str):
    """Same signature helper as the trainer, computed over the 4-way merged
    configs WITHOUT the seed — seeds distinguish experiments inside one
    evaluation (reference worker.py:196-205)."""
    from legommenders_tpu.config.parser import parse_four_way
    cli = parse_cli(job.split())
    cfg = parse_four_way(cli)
    raw = {axis: (getattr(cfg, axis).raw() if getattr(cfg, axis) else {})
           for axis in ("data", "model", "embed", "exp")}
    return get_signature(raw["data"], raw["model"], raw["embed"],
                         raw["exp"]), raw


def main(argv):
    cli = parse_cli(argv)
    jobs_file = cli.get("jobs")
    if not jobs_file:
        raise SystemExit("--jobs <file> is required")
    replicate = int(cli.get("replicate", 5))
    base_seed = int(cli.get("base_seed", 2023))
    done = completed_set()

    from legommenders_tpu.utils.server import ExperimentBody, Server
    server = Server.auto_auth()
    server_done = {}
    if server.active:
        try:
            server_done = server.completed_seeds_by_command()
        except ValueError as e:
            print(f"lego-server unreachable ({e}); local ledger only")
            server = Server()  # inactive

    with open(jobs_file) as f:
        jobs = [l.strip() for l in f if l.strip() and not l.startswith("#")]

    for job in jobs:
        command = f"python trainer.py {job}"
        signature = None
        if server.active:
            try:
                signature, raw = job_signature(job)
            except Exception as e:  # job configs may be host-local only
                print(f"cannot compute signature for '{job}': {e}")
            else:
                reply = server.create_or_get_evaluation(
                    signature, command, json.dumps(raw, default=str))
                if not reply.ok:
                    print(f"evaluation registration failed: {reply.msg}")
                    signature = None
        for r in range(replicate):
            seed = base_seed + r
            if (job, seed) in done:
                print(f"skip (local ledger): {job} --seed {seed}")
                continue
            if seed in server_done.get(command, []):
                print(f"skip (server): {job} --seed {seed}")
                continue
            cmd = [sys.executable, "trainer.py"] + job.split() + [
                "--seed", str(seed)]
            if signature is not None:
                reply = server.create_or_get_experiment(signature, seed)
                if reply.ok:
                    session = reply.body
                    info = server.get_experiment_info(session)
                    if (info.ok
                            and ExperimentBody(info.body).is_completed):
                        print(f"skip (server, completed): {job} "
                              f"--seed {seed}")
                        continue
                    cmd += ["--session", str(session)]
            print("run:", " ".join(cmd))
            ret = subprocess.call(cmd)
            jsonl_append({"command": job, "seed": seed,
                          "status": "done" if ret == 0 else f"exit{ret}"},
                         LEDGER)


if __name__ == "__main__":
    main(sys.argv[1:])
