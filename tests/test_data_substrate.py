import numpy as np
import pytest

from legommenders_tpu.data.token_store import TokenStore, UNSET
from legommenders_tpu.data.vocab import Vocab, VocabHub
from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
from legommenders_tpu.data.pipeline import TrainBatcher, EvalBatcher


def test_vocab_roundtrip(tmp_path):
    v = Vocab("word", tokens=["a", "b", "c"])
    assert v["b"] == 1 and len(v) == 3
    v.save(str(tmp_path))
    v2 = Vocab.load(str(tmp_path), "word")
    assert v2.tokens == ["a", "b", "c"]


def test_store_roundtrip(tmp_path):
    hub = VocabHub()
    st = TokenStore(vocab_hub=hub)
    st.add_seq_column("title", [[1, 2], [3]], Vocab("w", tokens=list("abcd")), 4)
    st.add_scalar_column("cat", [0, 1], Vocab("c", tokens=["x", "y"]))
    assert st["title"].shape == (2, 4)
    assert st["title"][1, 1] == UNSET
    st.save(str(tmp_path / "st"))
    st2 = TokenStore.load(str(tmp_path / "st"))
    np.testing.assert_array_equal(st2["title"], st["title"])
    assert st2.vocab_of("title").tokens == list("abcd")


def test_store_truncate_filter(tmp_path):
    st = TokenStore()
    st.add_seq_column("h", [[1, 2, 3], [], [5]], "item", 5)
    st.truncate("h", 2)
    assert st["h"].shape == (3, 2)
    idx = st.filter("h", "lambda x: x", cache_dir=str(tmp_path))
    np.testing.assert_array_equal(idx, [0, 2])
    # cached second call
    idx2 = st.filter("h", "lambda x: x", cache_dir=str(tmp_path))
    np.testing.assert_array_equal(idx2, idx)


@pytest.fixture(scope="module")
def synth():
    return SyntheticProcessor(num_items=100, num_users=50).as_lego_data()


def test_synthetic_shapes(synth):
    assert synth.num_items == 100
    assert synth.num_users == 50
    assert synth.items["title"].shape[1] == 16
    for phase in ("train", "dev", "test"):
        st = synth.inters[phase]
        assert len(st) > 0
        assert set(st.col_names()) >= {"user_id", "item_id", "click"}


def test_train_batcher_neg_sampling(synth):
    b = TrainBatcher(synth, batch_size=16, neg_count=4, seed=7)
    batches = list(b.epoch())
    assert len(batches) == len(b)
    bt = batches[0]
    assert bt.candidates.shape == (16, 5)
    assert bt.history.shape == (16, synth.history_matrix().shape[1])
    assert bt.mask.shape == bt.history.shape
    # positives at index 0 are real positive interactions
    assert np.all(bt.candidates >= 0) and np.all(bt.candidates < synth.num_items)
    # negatives should usually differ from the positive
    neq = (bt.candidates[:, 1:] != bt.candidates[:, :1]).mean()
    assert neq > 0.8


def test_eval_batcher_padding(synth):
    b = EvalBatcher(synth, "test", batch_size=64)
    total_valid = 0
    for bt in b.epoch():
        assert bt.candidates.shape == (64, 1)
        total_valid += int(bt.valid.sum())
    assert total_valid == b.num_samples
