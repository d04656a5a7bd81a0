"""End-to-end subprocess coverage for the root CLI drivers that previously
had no direct tests: sizer, splitter, extractor, transfer
(parity: reference sizer.py / splitter.py / extractor.py / transfer.py).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from `make test`, run by `make ci`

REPO = "/root/repo"
ENV = {**os.environ, "JAX_PLATFORM_NAME": "cpu"}


def run(args, cwd=REPO, timeout=600):
    out = subprocess.run([sys.executable] + args, capture_output=True,
                         text=True, cwd=cwd, env=ENV, timeout=timeout)
    assert out.returncode == 0, (out.stdout[-1500:], out.stderr[-3000:])
    return out


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synth"))
    run(["process.py", "--data", "synthetic", "--save_dir", d,
         "--regenerate", "1"])
    return d


def test_sizer_cli(synth_dir):
    out = run(["sizer.py", "--data", "synthetic", "--model", "naml",
               "--data_dir", synth_dir, "--hidden_size", "16",
               "--batch_size", "4"])
    assert "total:" in out.stdout
    assert "M params" in out.stdout


def test_splitter_cli(synth_dir, tmp_path):
    # tiny 2-layer BERT; cache lands in cwd/cache — run from tmp via env
    out = run(["splitter.py", "--data", "synthetic", "--model", "bert-naml",
               "--data_dir", synth_dir, "--hidden_size", "16",
               "--batch_size", "4", "--tune_from", "1",
               "--layers", "1+-1",
               "--model.config.embedding_dim", "32",
               "--model.config.item_config.num_hidden_layers", "2",
               "--model.config.item_config.num_attention_heads", "2"])
    # layer 1 and -1 (wraps to 1) both cached
    caches = []
    for root, _dirs, files in os.walk(os.path.join(REPO, "cache",
                                                   "synthetic")):
        caches += [f for f in files if f.startswith("layer_1.")]
    assert caches, out.stdout + out.stderr


def test_extractor_cli(synth_dir, tmp_path):
    export = str(tmp_path / "export")
    run(["extractor.py", "--data", "synthetic", "--model", "naml",
         "--data_dir", synth_dir, "--hidden_size", "16",
         "--batch_size", "4", "--export_dir", export])
    files = os.listdir(export)
    assert any(f.endswith(".npy") for f in files), files


def test_transfer_cli(synth_dir, tmp_path):
    from legommenders_tpu.data.token_store import TokenStore

    items = TokenStore.load(os.path.join(synth_dir, "items"))
    vocab = items.vocab_of("item_id")
    # RecBench-style export: shuffled id order + one missing item
    rng = np.random.default_rng(0)
    order = rng.permutation(len(vocab))[: len(vocab) - 1]
    src_ids = [vocab.tokens[i] for i in order]
    emb = rng.standard_normal((len(src_ids), 8)).astype(np.float32)
    emb_path = str(tmp_path / "emb.npy")
    np.save(emb_path, emb)
    ids_path = str(tmp_path / "ids.txt")
    with open(ids_path, "w") as f:
        f.write("\n".join(src_ids))

    cwd = str(tmp_path)
    os.makedirs(os.path.join(cwd, "config", "embed"), exist_ok=True)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "transfer.py"),
         "--data", "synthetic", "--data_dir", synth_dir,
         "--embed_path", emb_path, "--item_id_file", ids_path],
        capture_output=True, text=True, cwd=cwd,
        env={**ENV, "PYTHONPATH": REPO}, timeout=300)
    assert out.returncode == 0, out.stderr[-3000:]
    mat = np.load(os.path.join(cwd, "data", "embeddings",
                               "synthetic-item-embeds.npy"))
    assert mat.shape == (len(vocab), 8)
    # reordering: row for vocab token src_ids[0] equals emb[0]
    row = vocab.tokens.index(src_ids[0])
    np.testing.assert_allclose(mat[row], emb[0])
    # the one missing item got a zero row
    missing = set(vocab.tokens) - set(src_ids)
    mrow = vocab.tokens.index(next(iter(missing)))
    assert not mat[mrow].any()


def test_worker_cli_ledger_dedup(synth_dir, tmp_path):
    """worker.py replicates a job over seeds, runs trainer subprocesses,
    records a JSONL ledger, and skips completed (command, seed) pairs on
    re-run (reference worker.py:57-270; server ledger covered by
    test_server.py)."""
    cwd = str(tmp_path)
    # worker resolves trainer.py/config relative to cwd
    for name in ("trainer.py", "worker.py", "config"):
        os.symlink(os.path.join(REPO, name), os.path.join(cwd, name))
    job = (f"--data synthetic --model naml --data_dir {synth_dir} "
           "--epoch 1 --epoch_batch 2 --batch_size 8 --hidden_size 16 "
           "--simple_dev 1")
    with open(os.path.join(cwd, "jobs.txt"), "w") as f:
        f.write("# one job, two seeds\n" + job + "\n")

    env = {**ENV, "PYTHONPATH": REPO}
    out = subprocess.run(
        [sys.executable, "worker.py", "--jobs", "jobs.txt",
         "--replicate", "2"],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    ledger = os.path.join(cwd, "checkpoints", "worker_ledger.jsonl")
    assert os.path.isfile(ledger)
    rows = [__import__("json").loads(l) for l in open(ledger)]
    assert len(rows) == 2 and all(r["status"] == "done" for r in rows), rows

    out2 = subprocess.run(
        [sys.executable, "worker.py", "--jobs", "jobs.txt",
         "--replicate", "2"],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=300)
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert out2.stdout.count("skip (local ledger)") == 2, out2.stdout
