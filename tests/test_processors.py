"""Processor tests with fake raw-data fixtures: MIND TSVs, xMIND news,
RecBench parquet."""
import json
import os

import numpy as np
import pytest


from legommenders_tpu.utils.registry import PROCESSORS
import legommenders_tpu.data.processors  # noqa: F401


@pytest.fixture(scope="module")
def fake_mind(tmp_path_factory, rng):
    """Tiny MIND raw layout: train/ + dev/ with news.tsv + behaviors.tsv."""
    root = tmp_path_factory.mktemp("mind_raw")
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


def test_mind_processor(fake_mind, tmp_path):
    cls = PROCESSORS["mind"]
    p = cls(raw_dir=fake_mind, save_dir=str(tmp_path / "mind"))
    stores = p.load(regenerate=True)
    assert len(stores["items"]) == 30
    assert stores["items"]["title"].shape[1] == 30
    assert set(stores["items"].col_names()) >= {
        "title", "abstract", "category", "subcategory", "item_id"}
    assert len(stores["users"]) == 15
    # train/valid partition users disjointly
    tr_u = set(stores["train"]["user_id"].tolist())
    va_u = set(stores["valid"]["user_id"].tolist())
    assert not (tr_u & va_u)
    assert len(stores["test"]) > 0
    # negatives aggregated
    assert "neg" in stores["users"]
    # cache-hit reload
    stores2 = p.load(regenerate=False)
    np.testing.assert_array_equal(stores2["items"]["title"],
                                  stores["items"]["title"])


def test_xmind_processor(fake_mind, tmp_path, rng):
    # first build the English MIND store
    mind_dir = str(tmp_path / "mind")
    PROCESSORS["mind"](raw_dir=fake_mind, save_dir=mind_dir).load(True)
    # fake xMIND raw: translated titles for a subset of nids
    xroot = tmp_path / "xmind_raw" / "xMINDsmall_train"
    xroot.mkdir(parents=True)
    with open(xroot / "news.tsv", "w") as f:
        for i in range(30):
            f.write(f"N{i}\tTitel nummer {i}\tZusammenfassung {i}\n")
    cls = PROCESSORS["xmind-cmn"]
    p = cls(raw_dir=str(tmp_path / "xmind_raw"),
            save_dir=str(tmp_path / "xmind"), mind_dir=mind_dir)
    stores = p.build()
    assert "title@cmn" in stores["items"]
    assert stores["items"]["title@cmn"].shape[0] == 30


def test_recbench_processor(tmp_path, rng):
    pd = pytest.importorskip("pandas")
    try:
        import pyarrow  # noqa: F401
    except ImportError:
        pytest.skip("pyarrow unavailable")
    raw = tmp_path / "rb"
    raw.mkdir()
    items = pd.DataFrame({
        "item_id": [f"b{i}" for i in range(20)],
        "title": [f"book title {i} words" for i in range(20)]})
    users = pd.DataFrame({
        "user_id": [f"u{i}" for i in range(10)],
        "history": [[f"b{j}" for j in rng.choice(20, 3, replace=False)]
                    for _ in range(10)]})
    inter_rows = []
    for u in range(10):
        for _ in range(6):
            inter_rows.append((f"u{u}", f"b{int(rng.integers(20))}",
                               int(rng.random() < 0.4)))
    fin = pd.DataFrame(inter_rows[:40],
                       columns=["user_id", "item_id", "click"])
    test = pd.DataFrame(inter_rows[40:],
                        columns=["user_id", "item_id", "click"])
    items.to_parquet(raw / "items.parquet")
    users.to_parquet(raw / "users.parquet")
    fin.to_parquet(raw / "finetune.parquet")
    test.to_parquet(raw / "test.parquet")
    with open(raw / "valid_user_set_0.1.txt", "w") as f:
        f.write("u0\n")

    os.makedirs(tmp_path / "config" / "data", exist_ok=True)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        cls = PROCESSORS["goodreadsrb"]
        p = cls(raw_dir=str(raw), save_dir=str(tmp_path / "out"))
        stores = p.build()
    finally:
        os.chdir(cwd)
    assert len(stores["items"]) == 20
    assert len(stores["users"]) == 10
    assert set(stores["valid"]["user_id"].tolist()) <= {0}
    assert (tmp_path / "config" / "data" / "goodreadsrb.yaml").exists()


def test_oncemind_processor(fake_mind, tmp_path):
    # impression-id dev split
    imp_file = tmp_path / "imps.json"
    with open(imp_file, "w") as f:
        json.dump(list(range(1, 10)), f)
    cls = PROCESSORS["oncemind"]
    p = cls(raw_dir=fake_mind, save_dir=str(tmp_path / "oncemind"),
            imp_list_path=str(imp_file))
    stores = p.build()
    dev_imps = set(stores["valid"]["imp_id"].tolist())
    assert dev_imps <= set(range(1, 10))
    train_imps = set(stores["train"]["imp_id"].tolist())
    assert not (train_imps & set(range(1, 10)))


@pytest.mark.slow
def test_mind_end_to_end_training(fake_mind, tmp_path):
    """process -> data config -> Manager -> a few train steps + eval."""
    import jax.numpy as jnp
    from legommenders_tpu.config.parser import load_config
    from legommenders_tpu.data.dataset import LegoData
    from legommenders_tpu.runtime.manager import Manager
    from legommenders_tpu.runtime.trainer import Trainer

    save_dir = str(tmp_path / "mind")
    PROCESSORS["mind"](raw_dir=fake_mind, save_dir=save_dir).load(True)
    cfg_path = tmp_path / "mind.yaml"
    cfg_path.write_text(f"""
name: mind
base_dir: {save_dir}
item:
  ut: ${{base_dir}}/items
  inputs:
    - title: 20
    - category
user:
  ut: ${{base_dir}}/users
  truncate: 10
inter:
  train: ${{base_dir}}/train
  dev: ${{base_dir}}/valid
  test: ${{base_dir}}/test
  filters:
    history:
      - "lambda x: x"
column_map:
  item_col: item_id
  user_col: user_id
  history_col: history
  neg_col: neg
  label_col: click
  group_col: imp_id
""")
    data = LegoData.from_config(load_config(str(cfg_path)))
    assert data.items["title"].shape[1] == 20
    m = Manager({}, {"meta": {"item": "CNN", "user": "Ada",
                              "predictor": "Dot"},
                     "config": {"use_item_content": True,
                                "hidden_size": 16}},
                exp_cfg={"policy": {"epoch": 2, "batch_size": 8,
                                    "lr": 3e-3}},
                data=data)
    tr = Trainer(m, seed=1)
    tr.train()
    res = tr.test()
    assert np.isfinite(res["GAUC"])


def test_mind_extra_tokenizer(fake_mind, tmp_path):
    """extra_tokenizers adds title@<name>/abstract@<name> columns with the
    tokenizer's own vocab."""
    from legommenders_tpu.data.vocab import Vocab

    def fake_tok(text):
        return [min(ord(c), 99) for c in (text or "")[:10]]

    vocab = Vocab("fakelm").set_size(128)
    cls = PROCESSORS["mind"]
    p = cls(raw_dir=fake_mind, save_dir=str(tmp_path / "mind"),
            extra_tokenizers={"fakelm": (fake_tok, 12, vocab)})
    stores = p.build()
    assert "title@fakelm" in stores["items"]
    assert "abstract@fakelm" in stores["items"]
    assert stores["items"]["title@fakelm"].shape == (30, 12)
    assert stores["items"].vocab_name("title@fakelm") == "fakelm"


def test_prompt_columns(fake_mind, tmp_path, rng):
    """MIND/RecBench emit natural-language prompt columns (reference
    mind_processor.py:116-122, recbench_processor.py:132-135), word-vocab
    and per-extra-tokenizer variants, usable as ConcatInputer inputs."""
    from legommenders_tpu.data.vocab import Vocab

    def fake_tok(text):
        return [min(ord(c), 99) for c in (text or "")[:10]]

    vocab = Vocab("fakelm").set_size(128)
    p = PROCESSORS["mind"](raw_dir=fake_mind, save_dir=str(tmp_path / "m"),
                           extra_tokenizers={"fakelm": (fake_tok, 12, vocab)})
    stores = p.build()
    items = stores["items"]
    for col in ("prompt", "prompt_title", "prompt_category"):
        assert col in items
        assert f"{col}@fakelm" in items
        # static prefix: every item row identical
        arr = items[col]
        assert (arr == arr[0]).all()
    assert items.vocab_name("prompt") == "word"
    assert items.vocab_name("prompt@fakelm") == "fakelm"


@pytest.mark.slow
def test_prompt_columns_train(fake_mind, tmp_path):
    """Prompt columns compose through ConcatInputer in a real model."""
    import jax.numpy as jnp
    from legommenders_tpu.data.dataset import LegoData
    from legommenders_tpu.data.pipeline import TrainBatcher
    from legommenders_tpu.models.lego_config import LegoConfig
    from legommenders_tpu.runtime.steps import init_params

    save_dir = str(tmp_path / "mind")
    stores = PROCESSORS["mind"](raw_dir=fake_mind, save_dir=save_dir).build()
    from legommenders_tpu.data.column_map import ColumnMap
    cm = ColumnMap(item_col="item_id", user_col="user_id",
                   history_col="history", neg_col="neg",
                   label_col="click", group_col="imp_id")
    data = LegoData(stores["items"], stores["users"],
                    {"train": stores["train"], "dev": stores["valid"],
                     "test": stores["test"]}, cm,
                    item_inputs=[("prompt", None), ("prompt_title", None),
                                 ("title", 10)])
    cfg = LegoConfig(data=data, item_operator="Ada", user_operator="Ada",
                     predictor="Dot", hidden_size=16, use_fast_eval=False)
    model, contents, hub = cfg.build()
    assert "prompt" in contents.columns and "prompt_title" in contents.columns
    tb = TrainBatcher(data, batch_size=4, neg_count=2, seed=0)
    batch = {k: jnp.asarray(v) for k, v in next(tb.epoch()).items()}
    params = init_params(model, batch, contents.columns)
    scores = model.apply(params, batch, contents.columns, training=False)
    assert scores.shape == (4, 3)
    assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.slow
def test_tokenizer_resolution(tmp_path, fake_mind):
    """data/tokenizers.resolve: glove file + missing-HF error paths, and
    process.py end-to-end with a glove tokenizer spec."""
    import subprocess
    import sys as _sys
    from legommenders_tpu.data.tokenizers import resolve

    glove = tmp_path / "glove.6B.50d.txt"
    words = ["title", "words", "number", "extra", "abstract", "text",
             "for", "item"]
    with open(glove, "w") as f:
        for w in words:
            f.write(w + " " + " ".join(["0.1"] * 5) + "\n")
    name, fn, vocab = resolve(f"glove:{glove}")
    assert name == "glove" and len(vocab) == len(words)
    assert fn("Title words UNKNOWNTOKEN") == [0, 1]

    with pytest.raises(SystemExit):
        resolve("bertbase")  # no .model dotfile entry in the test env

    # process.py CLI end-to-end with the glove spec
    out = subprocess.run(
        [_sys.executable, "process.py", "--data", "mind",
         "--raw_dir", fake_mind, "--save_dir", str(tmp_path / "m"),
         "--tokenizers", f"glove:{glove}", "--regenerate", "1"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORM_NAME": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "title@glove" in out.stdout


@pytest.mark.slow
def test_xmind_cli_tokenizer(fake_mind, tmp_path):
    """process.py exposes the xMIND tokenizer (reference re-tokenizes all
    languages with one HF tokenizer, xmind_processor.py:38-60): --tokenizers
    spec becomes tokenize_fn, --mind_dir points at the processed MIND store."""
    import subprocess
    import sys as _sys

    mind_dir = str(tmp_path / "mind")
    PROCESSORS["mind"](raw_dir=fake_mind, save_dir=mind_dir).load(True)
    xroot = tmp_path / "xmind_raw" / "xMINDsmall_train"
    xroot.mkdir(parents=True)
    with open(xroot / "news.tsv", "w") as f:
        for i in range(30):
            f.write(f"N{i}\tTitel nummer {i}\tZusammenfassung {i}\n")

    glove = tmp_path / "glove.xm.txt"
    with open(glove, "w") as f:
        for w in ["titel", "nummer", "zusammenfassung"]:
            f.write(w + " " + " ".join(["0.1"] * 5) + "\n")

    out = subprocess.run(
        [_sys.executable, "process.py", "--data", "xmind-fin",
         "--raw_dir", str(tmp_path / "xmind_raw"),
         "--save_dir", str(tmp_path / "xm"),
         "--mind_dir", mind_dir,
         "--tokenizers", f"glove:{glove}", "--regenerate", "1"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "JAX_PLATFORM_NAME": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "title@fin" in out.stdout
