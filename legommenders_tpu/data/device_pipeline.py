"""Device-resident training pipeline: batch assembly fused into the step.

TPU-first endgame of the loader redesign (reference loader/data_set.py +
loader/resampler.py:139-259): the whole training substrate — interaction
rows, user histories, per-user negative lists — lives in HBM as dense int32
arrays. Per step the host ships ONLY a `(B,)` permutation slice (32 KB at
B=8192); gathers, negative sampling and dropout all happen inside one jitted
train step, so the input pipeline can never stall the MXU.

Negative-sampling semantics match the host TrainBatcher (and the
reference's resampler.py:159-171): up to K true negatives drawn without
replacement from the user's negative list, topped up with uniform-random
item ids; positive at column 0.

Implementation notes (measured on a v5e):
- random subset-without-replacement uses `lax.top_k` over random keys, NOT
  argsort — an (8192, M) argsort hangs/crawls the Mosaic compiler.
- `rng_impl="rbg"` (counter RNG) cuts dropout-mask generation cost vs
  threefry (~12% step time at NAML/MIND scale).
"""
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from legommenders_tpu.data.dataset import LegoData
from legommenders_tpu.data.pipeline import _user_extra_cols
from legommenders_tpu.data.token_store import UNSET
from legommenders_tpu.runtime.steps import neg_sampling_loss, ranking_loss


def _device_pad(arr_2d: np.ndarray) -> jnp.ndarray:
    """UNSET -> 0 ids (device gathers stay in-bounds); mask is derived from
    the separate UNSET-preserving copy."""
    return jnp.asarray(np.where(arr_2d == UNSET, 0, arr_2d).astype(np.int32))


_BIG_CONTENT_BYTES = 64 << 20  # 64 MB


def _split_contents(item_contents):
    """(small, big): small columns stay jit closure constants — they must
    remain CONCRETE so CatalogGradPlan.matches_source can verify them and
    keep the gather-reduce embedding backward active; big columns (the
    multi-GB LM hidden cache) become jit arguments — captured device arrays
    are baked into the lowering as constants, which at LM scale means a
    3GB+ executable and a pathological compile."""
    small, big = {}, {}
    for c, a in item_contents.items():
        a = jnp.asarray(a)
        if a.size * a.dtype.itemsize >= _BIG_CONTENT_BYTES:
            big[c] = a
        else:
            small[c] = a
    return small, big


class DeviceTrainPipeline:
    """HBM substrate + fused (assemble -> loss -> update) train step."""

    def __init__(
        self,
        data: LegoData,
        batch_size: int,
        neg_count: int = 4,
        use_neg_sampling: bool = True,
        seed: int = 2023,
        phase: str = "train",
    ):
        self.batch_size = int(batch_size)
        self.neg_count = int(neg_count)
        self.use_neg_sampling = bool(use_neg_sampling)
        self.host_rng = np.random.default_rng(seed)
        self.num_items = data.num_items
        cm = data.cm

        store = data.inters[phase]
        labels = store[cm.label_col]
        if use_neg_sampling:
            # x-entropy training keeps only positive rows
            # (reference manager.py:331-347)
            store = store.select(np.nonzero(labels == 1)[0])
        self.n = len(store[cm.user_col])

        # ---- substrate -> HBM (one-time H2D at construction) ----------
        self.user_ids = jnp.asarray(store[cm.user_col].astype(np.int32))
        self.item_ids = jnp.asarray(store[cm.item_col].astype(np.int32))
        self.labels = jnp.asarray(store[cm.label_col].astype(np.float32))

        hist = data.history_matrix()
        self.history = _device_pad(hist)
        self.hist_mask = jnp.asarray((hist != UNSET).astype(np.int32))

        negs = data.neg_matrix()
        if negs is None or negs.ndim != 2:
            negs = np.full((data.num_users, 1), UNSET, np.int32)
        if negs.shape[1] < self.neg_count:
            # lax.top_k needs K <= row width
            pad = np.full((negs.shape[0], self.neg_count - negs.shape[1]),
                          UNSET, np.int32)
            negs = np.concatenate([negs, pad], axis=1)
        self.neg_counts = jnp.asarray(
            (negs != UNSET).sum(axis=1).astype(np.int32))
        self.negs = _device_pad(negs)
        self.negs_invalid = jnp.asarray((negs == UNSET))

        self.user_extra = {
            col: (_device_pad(mat), None)
            for col, mat in _user_extra_cols(data).items()
        }

    # ------------------------------------------------------------------
    def _replicate_substrate(self, sharding):
        """Re-place every HBM substrate array with the given sharding
        (mesh replication) so closure captures compose with mesh-sharded
        step arguments."""
        for name in ("user_ids", "item_ids", "labels", "history",
                     "hist_mask", "negs", "negs_invalid", "neg_counts"):
            setattr(self, name, jax.device_put(getattr(self, name), sharding))
        self.user_extra = {
            col: (jax.device_put(mat, sharding), aux)
            for col, (mat, aux) in self.user_extra.items()}

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return self.n // self.batch_size

    def epoch_indices(self, shuffle: bool = True) -> Iterator[np.ndarray]:
        """Host side of the pipeline: one `(B,)` int32 slice per step."""
        perm = (self.host_rng.permutation(self.n) if shuffle
                else np.arange(self.n))
        bs = self.batch_size
        for start in range(0, self.n - bs + 1, bs):
            yield perm[start:start + bs].astype(np.int32)

    # ------------------------------------------------------------------
    def _sample_negatives(self, users: jnp.ndarray,
                          rng: jnp.ndarray) -> jnp.ndarray:
        """(B,) user ids -> (B, K) negative item ids, in-jit.

        Without-replacement draw from each user's valid negative prefix via
        top_k over random keys (invalid slots pushed past every valid key),
        topped up with uniform-random items where the user has < K negatives
        — same semantics as pipeline.TrainBatcher._sample_negatives.
        """
        K = self.neg_count
        rows = jnp.take(self.negs, users, axis=0)            # (B, M)
        invalid = jnp.take(self.negs_invalid, users, axis=0)  # (B, M)
        counts = jnp.take(self.neg_counts, users, axis=0)     # (B,)
        key_rng, topup_rng = jax.random.split(rng)
        keys = jax.random.uniform(key_rng, rows.shape)
        keys = jnp.where(invalid, 2.0, keys)
        # K smallest keys == random K-subset of the valid prefix
        _, order = jax.lax.top_k(-keys, K)                   # (B, K)
        chosen = jnp.take_along_axis(rows, order, axis=1)
        rand_items = jax.random.randint(
            topup_rng, (users.shape[0], K), 0, self.num_items, jnp.int32)
        need_random = jnp.arange(K)[None, :] >= counts[:, None]
        return jnp.where(need_random, rand_items, chosen).astype(jnp.int32)

    # ------------------------------------------------------------------
    def assemble(self, idx: jnp.ndarray, rng: jnp.ndarray
                 ) -> Dict[str, jnp.ndarray]:
        """(B,) substrate row indices -> batch dict, pure/jittable."""
        users = jnp.take(self.user_ids, idx, axis=0)
        pos = jnp.take(self.item_ids, idx, axis=0)
        if self.use_neg_sampling:
            negs = self._sample_negatives(users, rng)
            cands = jnp.concatenate([pos[:, None], negs], axis=1)
        else:
            cands = pos[:, None]
        batch = {
            "history": jnp.take(self.history, users, axis=0),
            "mask": jnp.take(self.hist_mask, users, axis=0),
            "candidates": cands,
            "user_id": users,
            "label": jnp.take(self.labels, idx, axis=0),
        }
        for col, (mat, _) in self.user_extra.items():
            batch[col] = jnp.take(mat, users, axis=0)
        return batch

    # ------------------------------------------------------------------
    def make_fused_train_step(self, model, item_contents, optimizer,
                              seed: int = 0,
                              rng_impl: str = "threefry2x32",
                              mesh=None):
        """Returns jitted step(params, opt_state, idx, step_idx) ->
        (params, opt_state, loss) with batch assembly fused in.

        rng_impl: "threefry2x32" (default, splittable) or "rbg" (cheaper
        counter RNG — dropout masks dominate RNG cost at large batch).

        With a mesh (exp.policy.mesh), the (B,) idx rides dp-sharded and
        big content columns are placed replicated so the fused step runs
        SPMD over the mesh; gathers of the replicated substrate by the
        dp-sharded idx keep the assembled batch dp-sharded throughout.
        """
        base = jax.random.key(seed, impl=rng_impl)
        use_neg = self.use_neg_sampling

        small, big = _split_contents(item_contents)
        idx_place = jnp.asarray
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from legommenders_tpu.parallel.mesh import DP_AXIS
            repl = NamedSharding(mesh, P())
            big = {c: jax.device_put(a, repl) for c, a in big.items()}
            # small columns are closure constants; replicate them too (the
            # CatalogGradPlan falls back to a content-hash match since the
            # replicated copy is a different object — still LIVE)
            small = {c: jax.device_put(a, repl) for c, a in small.items()}
            dp_sh = NamedSharding(mesh, P(DP_AXIS))
            idx_place = lambda v: jax.device_put(jnp.asarray(v), dp_sh)
            # the closure-captured substrate must live on the mesh too —
            # single-device committed constants can't mix with mesh args
            self._replicate_substrate(repl)

        def loss_fn(params, big_contents, idx, rng):
            sample_rng, dropout_rng = jax.random.split(rng)
            batch = self.assemble(idx, sample_rng)
            scores = model.apply(params, batch, {**small, **big_contents},
                                 training=True, rngs={"dropout": dropout_rng})
            if use_neg:
                return neg_sampling_loss(scores)
            return ranking_loss(scores, batch["label"])

        def step(params, opt_state, big_contents, idx, step_idx):
            rng = jax.random.fold_in(base, step_idx)
            loss, grads = jax.value_and_grad(loss_fn)(params, big_contents,
                                                      idx, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        jitted = jax.jit(step, donate_argnums=(0, 1))

        def run(params, opt_state, idx, step_idx):
            return jitted(params, opt_state, big, idx_place(idx), step_idx)

        return run

    # ------------------------------------------------------------------
    def _make_loss_fn(self, model, item_contents,
                      rng_impl: str = "rbg", seed: int = 0):
        base = jax.random.key(seed, impl=rng_impl)
        use_neg = self.use_neg_sampling
        small, big = _split_contents(item_contents)

        def loss_fn(params, big_contents, idx, step_idx):
            rng = jax.random.fold_in(base, step_idx)
            sample_rng, dropout_rng = jax.random.split(rng)
            batch = self.assemble(idx, sample_rng)
            scores = model.apply(params, batch, {**small, **big_contents},
                                 training=True,
                                 rngs={"dropout": dropout_rng})
            if use_neg:
                return neg_sampling_loss(scores)
            return ranking_loss(scores, batch["label"])
        return loss_fn, big

    def time_loss_only(self, model, item_contents, params, idx,
                       n_steps: int = 50, rng_impl: str = "rbg") -> float:
        """Mean seconds/step for the fused FORWARD (assemble+loss) graph —
        used by bench.py to break the step into fwd/bwd/opt."""
        import time
        loss_fn, big = self._make_loss_fn(model, item_contents, rng_impl)
        fn = jax.jit(loss_fn)
        jax.block_until_ready(fn(params, big, idx, 0))
        t0 = time.perf_counter()
        for i in range(n_steps):
            out = fn(params, big, idx, i + 1)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n_steps

    def time_grad_only(self, model, item_contents, params, idx,
                       n_steps: int = 50, rng_impl: str = "rbg") -> float:
        """Mean seconds/step for fused forward+backward (no optimizer)."""
        import time
        loss_fn, big = self._make_loss_fn(model, item_contents, rng_impl)
        fn = jax.jit(jax.value_and_grad(loss_fn))
        jax.block_until_ready(fn(params, big, idx, 0)[0])
        t0 = time.perf_counter()
        for i in range(n_steps):
            out = fn(params, big, idx, i + 1)
        jax.block_until_ready(out[0])
        return (time.perf_counter() - t0) / n_steps
