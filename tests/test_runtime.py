import numpy as np
import pytest

from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
from legommenders_tpu.runtime.manager import Manager
from legommenders_tpu.runtime.trainer import Trainer
from legommenders_tpu.runtime.tester import Tester


MODEL_CFG = {
    "name": "NAML",
    "meta": {"item": "CNN", "user": "Ada", "predictor": "Dot"},
    "config": {
        "use_item_content": True,
        "hidden_size": 32,
        "use_fast_eval": True,
        "use_neg_sampling": True,
        "neg_count": 4,
        "item_config": {"dropout": 0.1, "kernel_size": 3},
    },
}
EXP_CFG = {
    "policy": {"epoch": 10, "lr": 3e-3, "batch_size": 32},
    "store": {"metric": "GAUC", "patience": 4},
    "metrics": ["GAUC", "MRR", "NDCG@5"],
}


@pytest.fixture(scope="module")
def manager():
    data = SyntheticProcessor(num_items=100, num_users=150).as_lego_data()
    return Manager({}, MODEL_CFG, exp_cfg=EXP_CFG, data=data)


@pytest.fixture(scope="module")
def trained(manager, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt") / "model.ckpt")
    trainer = Trainer(manager, seed=2023, ckpt_path=ckpt)
    result = trainer.train()
    return trainer, result


def test_trainer_learns(trained):
    trainer, result = trained
    assert np.isfinite(result["best_dev"])
    res = trainer.test()
    assert res["GAUC"] > 0.6, f"model failed to learn: {res}"


def test_cached_vs_uncached_parity(trained):
    """The reference's riskiest invariant (SURVEY §3.3): fast-eval cache
    gathers must equal full recomputation."""
    trainer, _ = trained
    ev = trainer.evaluator
    res_cached = ev.evaluate(trainer.params, "test", use_cache=True)
    res_full = ev.evaluate(trainer.params, "test", use_cache=False)
    for k in res_cached:
        assert res_cached[k] == pytest.approx(res_full[k], abs=2e-4), (
            k, res_cached, res_full)


def test_checkpoint_roundtrip(trained, tmp_path):
    import jax
    from legommenders_tpu.runtime.checkpoint import (
        save_checkpoint, load_checkpoint)
    trainer, _ = trained
    path = str(tmp_path / "m.ckpt")
    save_checkpoint(path, trainer.params, trainer.opt_state,
                    meta={"epoch": 1})
    params2, opt2, meta = load_checkpoint(
        path, trainer.params, trainer.opt_state)
    leaves1 = jax.tree_util.tree_leaves(trainer.params)
    leaves2 = jax.tree_util.tree_leaves(params2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta["epoch"] == 1


def test_latency_bench(trained):
    trainer, _ = trained
    tester = Tester(trainer.m, trainer.params)
    ms = tester.latency(num_batches=5)
    assert ms > 0


def test_early_stop(manager):
    from legommenders_tpu.utils.monitor import Monitor, Signal
    mon = Monitor(patience=2, minimize=False)
    assert mon.push(0.5) == Signal.BEST
    assert mon.push(0.6) == Signal.BEST
    assert mon.push(0.55) == Signal.SKIP
    assert mon.push(0.54) == Signal.STOP


def test_orbax_sharded_checkpoint(trained, tmp_path):
    import jax
    import numpy as np
    from legommenders_tpu.runtime.checkpoint import save_sharded, load_sharded
    trainer, _ = trained
    path = str(tmp_path / "orbax_ckpt")
    save_sharded(path, trainer.params, meta={"step": 7})
    params2, _, meta = load_sharded(path, trainer.params)
    for a, b in zip(jax.tree_util.tree_leaves(trainer.params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta["step"] == 7


def test_trainer_device_batching(manager_factory=None):
    """policy device_batching=true trains through the device-resident
    pipeline and reaches finite metrics."""
    import numpy as np
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.runtime.manager import Manager
    from legommenders_tpu.runtime.trainer import Trainer

    data = SyntheticProcessor(num_items=50, num_users=30, title_len=8,
                              history_len=6,
                              inters_per_user=12).as_lego_data()
    m = Manager({}, {"meta": {"item": "CNN", "user": "Ada",
                              "predictor": "Dot"},
                     "config": {"hidden_size": 16}},
                exp_cfg={"policy": {"epoch": 3, "batch_size": 8,
                                    "lr": 5e-3, "device_batching": True}},
                data=data)
    tr = Trainer(m, seed=0)
    out = tr.train()
    assert np.isfinite(out["best_dev"])
    res = tr.test()
    assert np.isfinite(res["GAUC"])
