"""Fused packed-block attention as a Pallas TPU kernel.

The LM item encoders run attention over PACKED blocks (lm/layers.pack_items:
G = 128//L items share one T = G*L <= 128 token sequence with a
block-diagonal mask). The XLA path materializes the (B, H, T, T) scores,
probs and dropout mask in HBM — measured at ~12 ms of a 37 ms 2-layer
forward at bench_lm shapes (attention-probs dropout alone, tools/lm_ablate
bisect). This kernel fuses

    S = (q_h @ k_h^T) * scale + bias
    P = softmax_f32(S)
    Pd = dropout(P)                 # in-kernel pltpu PRNG
    O_h = Pd @ v_h

entirely in VMEM per (batch-row, head): the (T, T) tensors never touch HBM.
Single K-block flash attention — T <= 128 means no online-softmax tiling is
needed.

Backward is a second kernel that regenerates the identical dropout bits
(same per-program seed, same draw order) and recomputes P from q, k, bias —
only q, k, v, bias and the seed are saved.

No reference counterpart (torch SDPA on GPU; reference never packs).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_PAD = 128  # padded packed length: one MXU tile, aligned for bf16/f32


def _interpret() -> bool:
    # off-TPU (CPU tests, virtual meshes) the kernel runs in interpret mode
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def _cdiv(a, b):
    return -(-a // b)


def _keep_threshold(dropout_p: float) -> int:
    # keep iff bits >= threshold; P(bits < t) = t / 2^32 = dropout_p
    return min(int(dropout_p * 2.0 ** 32), 2 ** 32 - 1)


def _fwd_kernel(num_heads, dropout_p, seed_ref, q_ref, k_ref, v_ref,
                bias_ref, out_ref):
    if dropout_p > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        thresh = jnp.uint32(_keep_threshold(dropout_p))
        scale_keep = 1.0 / (1.0 - dropout_p)
    NB = q_ref.shape[0]
    dh = q_ref.shape[-1] // num_heads
    inv_sqrt = 1.0 / float(np.sqrt(dh))
    for b in range(NB):
        q = q_ref[b]                      # (T, D)
        k = k_ref[b]
        v = v_ref[b]
        bias = bias_ref[b].astype(jnp.float32)   # (T, T)
        T = q.shape[0]
        for h in range(num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            s = jnp.dot(q[:, sl], k[:, sl].T,
                        preferred_element_type=jnp.float32) * inv_sqrt + bias
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            if dropout_p > 0.0:
                bits = pltpu.bitcast(pltpu.prng_random_bits((T, T)),
                                     jnp.uint32)
                p = jnp.where(bits >= thresh, p * scale_keep, 0.0)
            out_ref[b, :, sl] = jnp.dot(
                p.astype(v.dtype), v[:, sl],
                preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_kernel(num_heads, dropout_p, seed_ref, q_ref, k_ref, v_ref,
                bias_ref, g_ref, dq_ref, dk_ref, dv_ref):
    if dropout_p > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        thresh = jnp.uint32(_keep_threshold(dropout_p))
        scale_keep = 1.0 / (1.0 - dropout_p)
    NB = q_ref.shape[0]
    dh = q_ref.shape[-1] // num_heads
    inv_sqrt = 1.0 / float(np.sqrt(dh))
    for b in range(NB):
        q = q_ref[b]
        k = k_ref[b]
        v = v_ref[b]
        bias = bias_ref[b].astype(jnp.float32)
        g = g_ref[b]
        T = q.shape[0]
        for h in range(num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            qh = q[:, sl]
            kh = k[:, sl]
            vh = v[:, sl]
            gh = g[:, sl].astype(jnp.float32)
            s = jnp.dot(qh, kh.T,
                        preferred_element_type=jnp.float32) * inv_sqrt + bias
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            if dropout_p > 0.0:
                # identical draw order to the forward: same seed, b/h-major
                bits = pltpu.bitcast(pltpu.prng_random_bits((T, T)),
                                     jnp.uint32)
                keep = (bits >= thresh).astype(jnp.float32) * scale_keep
                pd = p * keep
            else:
                keep = None
                pd = p
            # O_h = Pd v ; dV = Pd^T g ; dPd = g v^T
            dv_ref[b, :, sl] = jnp.dot(
                pd.T.astype(g.dtype), g[:, sl],
                preferred_element_type=jnp.float32).astype(dv_ref.dtype)
            dpd = jnp.dot(gh.astype(v.dtype), vh.T,
                          preferred_element_type=jnp.float32)
            dp = dpd * keep if keep is not None else dpd
            ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
            ds = (ds * inv_sqrt).astype(q.dtype)
            dq_ref[b, :, sl] = jnp.dot(
                ds, kh,
                preferred_element_type=jnp.float32).astype(dq_ref.dtype)
            dk_ref[b, :, sl] = jnp.dot(
                ds.T, qh,
                preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _pad_qkv(q, k, v, bias):
    """Pad T to T_PAD. Padded KEY columns are masked (-inf); padded QUERY
    rows get bias 0 at column 0 so their softmax rows stay finite (NaN rows
    would poison dk/dv through the transposed matmuls)."""
    B, T, D = q.shape
    pad = T_PAD - T
    if pad == 0:
        return q, k, v, bias, T
    widths3 = ((0, 0), (0, pad), (0, 0))
    q = jnp.pad(q, widths3)
    k = jnp.pad(k, widths3)
    v = jnp.pad(v, widths3)
    neg = jnp.finfo(jnp.float32).min / 2
    # pad KEY columns (masked), then append pad QUERY rows that may attend
    # only key 0 (finite softmax rows)
    bias = jnp.pad(bias.astype(jnp.float32),
                   ((0, 0), (0, 0), (0, pad)), constant_values=neg)
    col0 = jnp.zeros((B, pad, 1), jnp.float32)
    rest = jnp.full((B, pad, T_PAD - 1), neg, jnp.float32)
    bias = jnp.concatenate(
        [bias, jnp.concatenate([col0, rest], axis=2)], axis=1)
    return q, k, v, bias, T


def _jnp_keep_mask(num_heads, dropout_p, shape, seed):
    key = jax.random.key(seed[0].astype(jnp.uint32), impl="threefry2x32")
    return jax.random.bernoulli(key, 1.0 - dropout_p, shape)


def _jnp_impl(num_heads, dropout_p, q, k, v, bias, seed):
    """Off-TPU twin of the kernel for the dropout path (interpret mode has
    no pltpu PRNG lowering): identical math, deterministic keep mask from
    `seed` so forward and backward agree. Draws differ from the on-chip
    PRNG — irrelevant, dropout is random; fwd/bwd consistency is what
    matters."""
    B, T, D = q.shape
    keep = _jnp_keep_mask(num_heads, dropout_p,
                          (B, num_heads, T, T), seed)
    return reference_attention(num_heads, dropout_p, q, k, v, bias,
                               keep_mask=keep)


NB = 4  # batch rows per grid step: amortizes per-step overhead


def _pad_batch(arrs, B):
    pad = _cdiv(B, NB) * NB - B
    if pad == 0:
        return arrs, B
    return [jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
            for a in arrs], B


def _call_fwd(num_heads, dropout_p, q, k, v, bias, seed):
    if dropout_p > 0.0 and _interpret():
        return _jnp_impl(num_heads, dropout_p, q, k, v, bias, seed)
    B, T, D = q.shape
    q, k, v, bias, T0 = _pad_qkv(q, k, v, bias)
    (q, k, v, bias), _ = _pad_batch([q, k, v, bias], B)
    Bp, Tp = q.shape[0], q.shape[1]
    spec = pl.BlockSpec((NB, Tp, D), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads, dropout_p),
        grid=(Bp // NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec,
            pl.BlockSpec((NB, Tp, Tp), lambda i: (i, 0, 0)),
        ],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Bp, Tp, D), q.dtype),
        interpret=_interpret(),
    )(seed, q, k, v, bias)
    return out[:B, :T0, :]


def _call_bwd(num_heads, dropout_p, q, k, v, bias, seed, g):
    if dropout_p > 0.0 and _interpret():
        _, vjp = jax.vjp(
            lambda qq, kk, vv: _jnp_impl(num_heads, dropout_p, qq, kk, vv,
                                         bias, seed), q, k, v)
        return vjp(g)
    B, T, D = q.shape
    q, k, v, bias, T0 = _pad_qkv(q, k, v, bias)
    Tp = q.shape[1]
    if Tp != T0:
        g = jnp.pad(g, ((0, 0), (0, Tp - T0), (0, 0)))
    (q, k, v, bias, g), _ = _pad_batch([q, k, v, bias, g], B)
    Bp = q.shape[0]
    spec = pl.BlockSpec((NB, Tp, D), lambda i: (i, 0, 0))
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads, dropout_p),
        grid=(Bp // NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec, spec, spec,
            pl.BlockSpec((NB, Tp, Tp), lambda i: (i, 0, 0)),
            spec,
        ],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Bp, Tp, D), q.dtype) for _ in range(3)),
        interpret=_interpret(),
    )(seed, q, k, v, bias, g)
    return tuple(a[:B, :T0, :] for a in (dq, dk, dv))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def packed_attention(num_heads, dropout_p, q, k, v, bias, seed):
    """Fused multi-head attention over packed blocks.

    q, k, v: (B, T, D) with D = num_heads * head_dim, T <= 128;
    bias: (B, T, T) additive mask (block-diagonal + key-valid, and causal
    for decoder slices); seed: (1,) int32 — fresh per call when
    dropout_p > 0 (ignored otherwise). Returns (B, T, D).
    """
    return _call_fwd(num_heads, dropout_p, q, k, v, bias, seed)


def _vjp_fwd(num_heads, dropout_p, q, k, v, bias, seed):
    out = _call_fwd(num_heads, dropout_p, q, k, v, bias, seed)
    return out, (q, k, v, bias, seed)


def _vjp_bwd(num_heads, dropout_p, res, g):
    q, k, v, bias, seed = res
    dq, dk, dv = _call_bwd(num_heads, dropout_p, q, k, v, bias, seed, g)
    dbias = jnp.zeros_like(bias)  # bias is mask-derived; XLA DCEs this
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, dbias, dseed


packed_attention.defvjp(_vjp_fwd, _vjp_bwd)


def _bits_kernel(num_heads, seed_ref, out_ref):
    """Replicates the fwd/bwd kernels' dropout draw EXACTLY (same
    per-program seed, same b-major/h-major order) so tests can verify the
    on-chip fwd output and bwd grads against reference_attention with the
    recovered keep mask."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    NB_, T = out_ref.shape[0], out_ref.shape[2]
    for b in range(NB_):
        for h in range(num_heads):
            out_ref[b, h] = pltpu.bitcast(pltpu.prng_random_bits((T, T)),
                                          jnp.uint32)


def dropout_keep_mask(num_heads, dropout_p, B, T, seed):
    """Test/debug helper: the (B, H, T, T) keep mask the kernels draw for
    `seed` at these shapes. Off-TPU mirrors _jnp_impl's mask instead (the
    interpret path has no pltpu PRNG)."""
    if _interpret():
        # _jnp_impl draws at the caller's (unpadded) T
        return _jnp_keep_mask(num_heads, dropout_p,
                              (B, num_heads, T, T), seed)
    Bp = _cdiv(B, NB) * NB
    bits = pl.pallas_call(
        functools.partial(_bits_kernel, num_heads),
        grid=(Bp // NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((NB, num_heads, T_PAD, T_PAD),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, num_heads, T_PAD, T_PAD),
                                       jnp.uint32),
    )(seed)
    return (bits >= jnp.uint32(_keep_threshold(dropout_p)))[:B, :, :T, :T]


def reference_attention(num_heads, dropout_p, q, k, v, bias, keep_mask=None):
    """jnp reference of the kernel math (f32 softmax) for parity tests;
    `keep_mask` (B, H, T, T) substitutes the in-kernel dropout draw."""
    B, T, D = q.shape
    dh = D // num_heads
    qh = q.reshape(B, T, num_heads, dh)
    kh = k.reshape(B, T, num_heads, dh)
    vh = v.reshape(B, T, num_heads, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                   kh.astype(jnp.float32)) / np.sqrt(dh)
    s = s + bias.astype(jnp.float32)[:, None]
    p = jax.nn.softmax(s, axis=-1)
    if keep_mask is not None:
        p = jnp.where(keep_mask, p / (1.0 - dropout_p), 0.0)
    out = jnp.einsum("bhqk,bkhd->bqhd",
                     p.astype(v.dtype).astype(jnp.float32),
                     vh.astype(jnp.float32))
    return out.reshape(B, T, D).astype(q.dtype)
