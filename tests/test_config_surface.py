"""Shipped config surface: data/recbench/embed YAMLs parse, column
replication works, and the mind-lm + bert-naml path runs E2E on a fixture.

Covers reference config/data/*.yaml, config/recbench/*.yaml,
config/embed/{base-llama1,mindrb}.yaml and the `->`/`-->` replication
syntax (loader/manager.py:176-183).
"""
import glob
import os
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from legommenders_tpu.config.parser import (
    load_axis_config, load_config, parse_four_way,
)
from legommenders_tpu.data.token_store import TokenStore
from legommenders_tpu.data.vocab import Vocab

REPO = "/root/repo"


# ---------------------------------------------------------------------- #
# parse-only coverage of the whole shipped tree                           #
# ---------------------------------------------------------------------- #
def test_recbench_tree_parses():
    files = sorted(glob.glob(os.path.join(REPO, "config/recbench/*.yaml")))
    assert len(files) == 16
    ctx = {"lm": "fakelm", "rbname": "xrb"}
    for path in files:
        cfg = load_axis_config(path, "data", ctx)
        assert cfg["name"].endswith("rb"), path
        assert cfg["inter"]["train"].startswith(
            f"data/recbench/{cfg['name']}/"), path
        inputs = cfg["item"]["inputs"]
        flat = [next(iter(e)) if isinstance(e, dict) else e for e in inputs]
        if "dual" in path:
            assert "item_id -> item_embeds" in flat
        else:
            assert any("@fakelm" in c for c in flat), path


def test_data_configs_parse():
    ctx = {"lm": "fakelm"}
    for name in ("mind", "mind-lm", "mind-lm-prompt", "oncemind",
                 "goodreads", "mindrb-dual-emb", "mindrb-with-id",
                 "synthetic"):
        cfg = load_axis_config(
            os.path.join(REPO, f"config/data/{name}.yaml"), "data", ctx)
        assert cfg["item"]["ut"].endswith("/items"), name
        assert set(cfg["column_map"]) >= {"item_col", "user_col",
                                          "history_col", "group_col"}
    # the reference groups MIND metrics by user (config/data/mind.yaml:23)
    mind = load_axis_config(
        os.path.join(REPO, "config/data/mind.yaml"), "data", ctx)
    assert mind["column_map"]["group_col"] == "user_id"


def test_embed_configs_parse():
    cfg = load_config(os.path.join(REPO, "config/embed/base-llama1.yaml"),
                      {"rbname": "mindrb"})
    e = cfg["embeddings"][0]
    assert e["col_name"] == "item_id" and e["frozen"]
    assert e["path"] == "data/recbench/mindrb/llama1-embeds.npy"
    cfg = load_config(os.path.join(REPO, "config/embed/mindrb.yaml"))
    assert cfg["embeddings"][0]["col_name"] == "item_embeds"


def test_cross_axis_config_lookup():
    """`--data recbench/mind` resolves through config/recbench/."""
    cfg = parse_four_way({"data": "recbench/mind", "model": "naml",
                          "lm": "fakelm"},
                         config_root=os.path.join(REPO, "config"))
    assert cfg.data.name == "mindrb"


# ---------------------------------------------------------------------- #
# replication                                                             #
# ---------------------------------------------------------------------- #
def test_replicate_deep_and_lazy():
    store = TokenStore()
    v = Vocab("w", tokens=[str(i) for i in range(10)])
    store.add_seq_column("title", [[1, 2, 3], [4, 5]], v, 4)
    store.replicate("title", "title@lm", lazy=False)
    store.replicate("title", "title_lazy", lazy=True)
    assert store.vocab_name("title@lm") == "w"
    np.testing.assert_array_equal(store["title@lm"], store["title"])
    assert store["title_lazy"] is store["title"]          # shared
    assert store["title@lm"] is not store["title"]        # copied
    # mutating ops replace arrays, so the deep copy stays intact
    store.truncate("title", 2)
    assert store["title"].shape[1] == 2
    assert store["title@lm"].shape[1] == 4
    assert store["title_lazy"].shape[1] == 4  # lazy kept the old object


def test_from_config_replication_syntax(tmp_path):
    from legommenders_tpu.data.dataset import LegoData
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor

    base = tmp_path / "data" / "recbench" / "mindrb"
    SyntheticProcessor(save_dir=str(base), num_items=40, num_users=20,
                       title_len=8, history_len=6,
                       inters_per_user=8).load(regenerate=True)
    cfg = load_axis_config(
        os.path.join(REPO, "config/data/mindrb-dual-emb.yaml"), "data",
        {"data_dir": str(base)})
    data = LegoData.from_config(cfg)
    assert [c for c, _ in data.item_inputs] == ["item_id", "item_embeds"]
    np.testing.assert_array_equal(data.items["item_embeds"],
                                  data.items["item_id"])
    assert data.items.vocab_name("item_embeds") == \
        data.items.vocab_name("item_id")


def test_dual_embedding_model(tmp_path):
    """mindrb-dual-emb + config/embed/mindrb: the replicated column binds a
    frozen feature-keyed pretrained table while item_id stays trainable."""
    from legommenders_tpu.data.dataset import LegoData
    from legommenders_tpu.data.pipeline import TrainBatcher
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.models.lego_config import LegoConfig
    from legommenders_tpu.runtime.steps import init_params

    base = tmp_path / "data" / "recbench" / "mindrb"
    SyntheticProcessor(save_dir=str(base), num_items=40, num_users=20,
                       title_len=8, history_len=6,
                       inters_per_user=8).load(regenerate=True)
    emb_path = tmp_path / "llama1-embeds.npy"
    np.save(emb_path, np.random.default_rng(0).normal(
        size=(40, 12)).astype(np.float32))

    data_cfg = load_axis_config(
        os.path.join(REPO, "config/data/mindrb-dual-emb.yaml"), "data",
        {"data_dir": str(base)})
    embed_cfg = load_config(os.path.join(REPO, "config/embed/mindrb.yaml"))
    embed_cfg["embeddings"][0]["path"] = str(emb_path)

    data = LegoData.from_config(data_cfg)
    cfg = LegoConfig(
        data=data, item_operator="Ada", user_operator="Ada",
        predictor="Dot", hidden_size=16, use_fast_eval=False)
    cfg.embed_config = embed_cfg
    model, contents, hub = cfg.build()

    names = {s.param_name for s in model.embed_specs}
    assert "feature__item_embeds" in names      # frozen pretrained replica
    assert "vocab__item_id" in names            # trainable id table
    frozen = {s.param_name: s.frozen for s in model.embed_specs}
    assert frozen["feature__item_embeds"] and not frozen["vocab__item_id"]

    batch = {k: jnp.asarray(v) for k, v in
             next(TrainBatcher(data, 4, neg_count=2, seed=0).epoch()).items()}
    params = init_params(model, batch, contents.columns)
    scores = model.apply(params, batch, contents.columns, training=False)
    assert scores.shape == (4, 3)
    assert np.isfinite(np.asarray(scores)).all()


# ---------------------------------------------------------------------- #
# E2E: mind-lm + bert-naml on a fixture (VERDICT r1 item 4)               #
# ---------------------------------------------------------------------- #
@pytest.mark.slow
def test_mind_lm_bert_naml_e2e(tmp_path, fake_mind_raw):
    glove = tmp_path / "glove.txt"
    words = ["title", "words", "number", "extra", "abstract", "text",
             "for", "item", "news", "sports", "finance"] + \
        [f"sub{i}" for i in range(5)]
    with open(glove, "w") as f:
        for w in words:
            f.write(w + " " + " ".join(["0.1"] * 5) + "\n")

    env = {**os.environ, "JAX_PLATFORM_NAME": "cpu"}
    data_dir = str(tmp_path / "mind")
    out = subprocess.run(
        [sys.executable, "process.py", "--data", "mind",
         "--raw_dir", fake_mind_raw, "--save_dir", data_dir,
         "--tokenizers", f"glove:{glove}", "--regenerate", "1"],
        capture_output=True, text=True, cwd=REPO, env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "category@glove" in out.stdout

    out = subprocess.run(
        [sys.executable, "trainer.py", "--data", "mind-lm",
         "--model", "bert-naml", "--lm", "glove",
         "--data_dir", data_dir, "--epoch", "1", "--batch_size", "4",
         "--epoch_batch", "2", "--hidden_size", "16", "--tune_from", "10",
         "--history_truncate", "6"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-4000:]
    assert "test:" in out.stderr + out.stdout


@pytest.fixture(scope="module")
def fake_mind_raw(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("mind_raw_cfg")
    cats = ["news", "sports", "finance"]
    nids = [f"N{i}" for i in range(30)]
    for split in ("train", "dev"):
        d = root / split
        d.mkdir()
        with open(d / "news.tsv", "w") as f:
            for i, nid in enumerate(nids):
                f.write(f"{nid}\t{cats[i % 3]}\tsub{i % 5}\t"
                        f"Title words number {i} extra\t"
                        f"Abstract text for item {i}\n")
        with open(d / "behaviors.tsv", "w") as f:
            for b in range(40):
                uid = f"U{b % 15}"
                hist = " ".join(rng.choice(nids, size=4, replace=False))
                imps = " ".join(
                    f"{n}-{int(rng.random() < 0.3)}"
                    for n in rng.choice(nids, size=5, replace=False))
                f.write(f"{b}\t{uid}\t2020-01-01\t{hist}\t{imps}\n")
    return str(root)
