"""Native C kernels vs numpy reference."""
import numpy as np
import pytest

from legommenders_tpu import native
from legommenders_tpu.data.token_store import UNSET


@pytest.fixture(scope="module")
def lib_available():
    if native.get_lib() is None:
        pytest.skip("C toolchain unavailable")
    return True


def test_sample_negatives_semantics(lib_available, rng):
    U, M, K, N = 50, 20, 4, 100
    negs = np.full((U, M), UNSET, np.int32)
    counts = np.zeros(U, np.int32)
    for u in range(U):
        c = int(rng.integers(0, M + 1))
        counts[u] = c
        negs[u, :c] = rng.choice(N, size=c, replace=False)
    users = rng.integers(0, U, 200).astype(np.int64)
    out = native.sample_negatives(negs, counts, users, K, N, seed=7)
    assert out.shape == (200, K)
    assert (out >= 0).all() and (out < N).all()
    for b, u in enumerate(users):
        c = counts[u]
        take = min(c, K)
        row = set(negs[u, :c].tolist())
        # first `take` entries are true negatives, drawn without replacement
        chosen = out[b, :take].tolist()
        assert all(x in row for x in chosen)
        assert len(set(chosen)) == take

    # determinism given seed
    out2 = native.sample_negatives(negs, counts, users, K, N, seed=7)
    np.testing.assert_array_equal(out, out2)
    out3 = native.sample_negatives(negs, counts, users, K, N, seed=8)
    assert not np.array_equal(out, out3)


def test_gather_history(lib_available, rng):
    U, S = 30, 10
    hist = np.full((U, S), UNSET, np.int32)
    for u in range(U):
        c = int(rng.integers(0, S + 1))
        hist[u, :c] = rng.integers(0, 500, c)
    users = rng.integers(0, U, 64).astype(np.int64)
    h, m = native.gather_history(hist, users)
    want = hist[users]
    np.testing.assert_array_equal(m, (want != UNSET).astype(np.int32))
    np.testing.assert_array_equal(h, np.where(want == UNSET, 0, want))


def test_pipeline_uses_native(lib_available):
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.data.pipeline import TrainBatcher
    data = SyntheticProcessor(num_items=60, num_users=30).as_lego_data()
    tb = TrainBatcher(data, batch_size=16, neg_count=4, seed=1)
    b = next(tb.epoch())
    assert b.candidates.shape == (16, 5)
    assert (b.candidates >= 0).all() and (b.candidates < 60).all()
