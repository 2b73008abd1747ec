"""Fused triplet angular attention — Pallas TPU kernel + XLA reference.

This is the native-kernel obligation of the build (SURVEY.md §0, §2.2): the
reference's `BondUpdateLayer` runs its triplet enumeration in torch_sparse
CUDA extensions; here the factorized triplet attention
(`models/layers.py::BondUpdateTriplet._factorized`) is fused so that nothing
O(NL^3)-sized ever reaches HBM:

    for each (batch b, source-bond column j):
        angle(k, i) at i between j->i and k->i          (from positions)
        pre(k, i)   = act(LN(a_kj[k] + a_ji[i] + enc(angle) @ W_ang))
        score(k,i,h)= <pre(k,i), q(i,h)> / sqrt(Wt)
        alpha       = masked softmax over k
        pooled(i,h) = sum_k alpha * pre(k,i)            -> [N, heads*Wt]

Per grid cell everything lives in VMEM (~2 MB at N=80, Wt=32); HBM traffic
is the O(N^2)-sized inputs/outputs only. The XLA path below implements the
identical math on materialized [N,N,N] grids and is the correctness
reference (used on CPU and under `interpret=True` in tests).
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rbf import angular_encoding_freq_bands

LN_EPS = 1e-6
NEG_INF = -1e9
# lower clamp for |j-i x k-i|^2 before the sqrt: at degenerate triplets
# (k==i, or exactly collinear atoms) cross_sq is exactly 0 and both
# d(sqrt)/dx -> inf and d(atan2)/d(0,0) -> NaN would poison the position
# gradient through jnp.where (NaN * 0 = NaN). The clamp keeps every
# gradient finite; masked lanes are then genuinely zeroed by the masking.
CROSS_SQ_EPS = 1e-12


# single source of truth for the angular features: the XLA path, the kNN
# pool (models/layers.py) and the dense path all share rbf.angular_encoding;
# only the Pallas kernel body re-derives it in-register.
from .rbf import angular_encoding as _angle_encode


def _rsqrt_refined(x):
    """One Newton step over the hardware rsqrt: TPU fast-math rsqrt is only
    ~1e-4 relative; the refinement brings it to ~f32 roundoff for free
    (2 mul + 1 fma on the VPU)."""
    r = jax.lax.rsqrt(x)
    return r * (1.5 - 0.5 * x * r * r)


def _recip_refined(x):
    """Newton-refined reciprocal (TPU fast-math division is approximate)."""
    r = 1.0 / x
    return r * (2.0 - x * r)


def _pre_activate(pre, ln_scale, ln_bias, act, norm):
    if norm:
        mu = jnp.mean(pre, axis=-1, keepdims=True)
        var = jnp.mean((pre - mu) ** 2, axis=-1, keepdims=True)
        pre = (pre - mu) * _rsqrt_refined(var + LN_EPS) * ln_scale + ln_bias
    return act(pre)


# --------------------------- XLA reference path ---------------------------

def triplet_pool_xla(a_kj, a_ji, q, pos, mask, w_ang, ln_scale, ln_bias,
                     act: Callable, norm: bool, num_ang_funcs: int = 3):
    """Materialized [B,k,j,i,*] version (correctness reference).

    a_kj: [B,N,N,Wt] (k, j); a_ji: [B,N,N,Wt] (j, i);
    q: [B,N,N,heads,Wt] (j, i); pos: [B,N,3]; mask: [B,N] bool.
    Returns pooled [B,N,N,heads*Wt] indexed (j, i).
    """
    B, N, _, Wt = a_kj.shape
    heads = q.shape[-2]
    freq = jnp.asarray(angular_encoding_freq_bands(num_ang_funcs),
                       a_kj.dtype)

    # HIGHEST precision throughout: this path is the correctness reference
    # (CPU tests / parity checks); on TPU the default bf16 MXU passes were
    # the real source of the round-1 0.037 "kernel drift"
    hi = jax.lax.Precision.HIGHEST
    rel = pos[:, :, None, :] - pos[:, None, :, :]          # rel[x,i] = x - i
    dot = jnp.einsum("bjic,bkic->bjki", rel, rel, precision=hi)
    nsq = jnp.sum(rel * rel, axis=-1)
    cross = jnp.sqrt(jnp.clip(
        nsq[:, :, None, :] * nsq[:, None, :, :] - dot * dot,
        CROSS_SQ_EPS, None))
    angle = jnp.arctan2(cross, dot)                        # [B,j,k,i]
    a_ang = jnp.einsum("bjkia,aw->bjkiw", _angle_encode(angle, freq),
                       w_ang, precision=hi)                # [B,j,k,i,Wt]

    pre = (a_kj[:, :, :, None, :] + a_ji[:, None, :, :, :]
           + a_ang.transpose(0, 2, 1, 3, 4))               # [B,k,j,i,Wt]
    pre = _pre_activate(pre, ln_scale, ln_bias, act, norm)

    scores = jnp.einsum("bkjiw,bjihw->bkjih", pre, q,
                        precision=hi) / np.sqrt(Wt)

    m = mask
    valid = (m[:, :, None, None] & m[:, None, :, None] & m[:, None, None, :])
    idx = jnp.arange(N)
    neq = ((idx[:, None, None] != idx[None, :, None])       # k != j
           & (idx[None, :, None] != idx[None, None, :])     # j != i
           & (idx[:, None, None] != idx[None, None, :]))    # k != i
    tri = valid & neq[None]
    scores = jnp.where(tri[..., None], scores, NEG_INF)
    smax = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - jax.lax.stop_gradient(smax)) * tri[..., None]
    alpha = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)

    pooled = jnp.einsum("bkjih,bkjiw->bjihw", alpha, pre, precision=hi)
    return pooled.reshape(B, N, N, heads * Wt)


# ------------------------------ Pallas kernel -----------------------------

def _atan2_nonneg(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """atan2(y, x) for y >= 0 (angle in [0, pi]) without the atan2 primitive,
    which Pallas TPU does not lower. Minimax-polynomial atan on [0, 1] with
    octant reduction; max error ~1e-5 rad."""
    ax = jnp.abs(x)
    mx = jnp.maximum(y, ax)
    mn = jnp.minimum(y, ax)
    z = mn * _recip_refined(jnp.maximum(mx, 1e-30))
    t = z * z
    # 6-coefficient minimax for atan on [0, 1] (max err ~1e-6 rad)
    p = z * (0.99997726 + t * (-0.33262347 + t * (0.19354346 + t * (
        -0.11643287 + t * (0.05265332 + t * -0.01172120)))))
    r = jnp.where(y > ax, np.float32(np.pi / 2) - p, p)
    r = jnp.where(x < 0, np.float32(np.pi) - r, r)
    # y == 0, x == 0 -> 0 (mx clamp already yields z=0 -> r in {0, pi})
    return r


def _kernel(a_kj_ref, a_ji_ref, q_ref, pos_ref, mask_ref, w_ang_ref,
            ln_s_ref, ln_b_ref, out_ref, *, heads: int, norm: bool,
            act: Callable, num_ang_funcs: int):
    j = pl.program_id(1)
    N = pos_ref.shape[1]
    Wt = a_kj_ref.shape[-1]
    # static python floats — array constants may not be captured in kernels
    bands = [float(f) for f in angular_encoding_freq_bands(num_ang_funcs)]

    pos = pos_ref[0]                      # [N, 3]
    m = mask_ref[0, 0]                    # [N] float (1 = valid)
    akj = a_kj_ref[0, 0, :, :]            # [N(k), Wt] (input is j-major)
    aji = a_ji_ref[0, 0, :, :]            # [N(i), Wt]
    # q_ref block: [1, 1, heads, N(i), Wt] — head-separated layout (lane-dim
    # reshapes are unsupported vector layout casts in Mosaic)

    # pos[j] / mask[j] via one-hot reduction (dynamic_slice is not lowered
    # in Pallas TPU kernels)
    onehot_j = (jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) == j
                ).astype(jnp.float32)                      # [N, 1]
    pj = jnp.sum(pos * onehot_j, axis=0)  # [3]
    mj = jnp.sum(m * onehot_j[:, 0])      # scalar
    vj = pj[None, :] - pos                # [N(i), 3] = pos[j] - pos[i]
    vk = pos[:, None, :] - pos[None, :, :]  # [N(k), N(i), 3]
    # 3-wide contractions stay elementwise on the VPU (Mosaic rejects
    # batched matmuls with tiny contraction dims)
    dot = jnp.sum(vk * vj[None, :, :], axis=-1)              # [k, i]
    njsq = jnp.sum(vj * vj, axis=-1)      # [i]
    nksq = jnp.sum(vk * vk, axis=-1)      # [k, i]
    cross = jnp.sqrt(jnp.clip(njsq[None, :] * nksq - dot * dot,
                              CROSS_SQ_EPS, None))
    angle = _atan2_nonneg(cross, dot)     # [k, i], in [0, pi]

    enc = jnp.concatenate(
        [angle[..., None]]
        + [jnp.sin(angle * f)[..., None] for f in bands]
        + [jnp.cos(angle * f)[..., None] for f in bands], axis=-1)  # [k,i,A]
    # HIGHEST: default MXU precision truncates f32 inputs to bf16 passes,
    # which was the bulk of the round-1 "kernel drift" (it was actually in
    # both paths' matmuls); this contraction is tiny (13 x Wt) so exact
    # passes are free
    a_ang = jax.lax.dot_general(
        enc.reshape(N * N, -1), w_ang_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).reshape(N, N, Wt)

    pre = akj[:, None, :] + aji[None, :, :] + a_ang        # [k, i, Wt]
    pre = _pre_activate(pre, ln_s_ref[:], ln_b_ref[:], act, norm)

    iota_k = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    tri = ((m[:, None] > 0) & (m[None, :] > 0) & (mj > 0)
           & (iota_k != iota_i) & (iota_k != j) & (iota_i != j))

    # per-head attention as VPU mult-reduce (Mosaic rejects the batched
    # matmul forms); `heads` is static so this unrolls at trace time
    inv_sqrt = np.float32(1.0 / np.sqrt(Wt))
    for hd in range(heads):
        qh = q_ref[0, 0, hd]                                # [i, Wt]
        s = jnp.sum(pre * qh[None, :, :], axis=-1) * inv_sqrt  # [k, i]
        s = jnp.where(tri, s, NEG_INF)
        smax = jnp.max(s, axis=0, keepdims=True)
        e = jnp.exp(s - smax) * tri.astype(jnp.float32)
        alpha = e * _recip_refined(
            jnp.maximum(jnp.sum(e, axis=0, keepdims=True), 1e-30))
        pooled_h = jnp.sum(alpha[:, :, None] * pre, axis=0)  # [i, Wt]
        out_ref[0, 0, hd] = pooled_h.astype(out_ref.dtype)


def triplet_pool_pallas(a_kj, a_ji, q, pos, mask, w_ang, ln_scale, ln_bias,
                        act: Callable, norm: bool, num_ang_funcs: int = 3,
                        interpret: bool = False):
    """Fused kernel entry; same signature/semantics as `triplet_pool_xla`."""
    B, N, _, Wt = a_kj.shape
    heads = q.shape[-2]
    # [B, j, heads, i, Wt]: head-separated so the kernel indexes heads
    # statically (lane-dim reshapes/concats are unsupported in Mosaic)
    q_sep = q.transpose(0, 1, 3, 2, 4)
    # [B, 1, N] so the block's last two dims equal the array dims
    maskf = mask.astype(jnp.float32)[:, None, :]
    # j-major layout so every block's last two dims are full array dims
    # (TPU lowering constraint: last two block dims divisible by (8, 128)
    # or equal to the array dims)
    a_kj_jmajor = a_kj.transpose(0, 2, 1, 3)                  # [B, j, k, Wt]

    kernel = functools.partial(_kernel, heads=heads, norm=norm, act=act,
                               num_ang_funcs=num_ang_funcs)
    grid = (B, N)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, N, Wt), lambda b, j: (b, j, 0, 0)),   # a_kj
            pl.BlockSpec((1, 1, N, Wt), lambda b, j: (b, j, 0, 0)),   # a_ji
            pl.BlockSpec((1, 1, heads, N, Wt),
                         lambda b, j: (b, j, 0, 0, 0)),               # q
            pl.BlockSpec((1, N, 3), lambda b, j: (b, 0, 0)),          # pos
            pl.BlockSpec((1, 1, N), lambda b, j: (b, 0, 0)),          # mask
            pl.BlockSpec((w_ang.shape[0], Wt), lambda b, j: (0, 0)),  # w_ang
            pl.BlockSpec((Wt,), lambda b, j: (0,)),                   # ln_s
            pl.BlockSpec((Wt,), lambda b, j: (0,)),                   # ln_b
        ],
        out_specs=pl.BlockSpec((1, 1, heads, N, Wt),
                               lambda b, j: (b, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, heads, N, Wt), a_kj.dtype),
        interpret=interpret,
    )(a_kj_jmajor, a_ji, q_sep, pos, maskf, w_ang, ln_scale, ln_bias)
    # [B, j, heads, i, Wt] -> [B, j, i, heads*Wt]
    return out.transpose(0, 1, 3, 2, 4).reshape(B, N, N, heads * Wt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _triplet_pool_pallas_ad(act, norm, num_ang_funcs, a_kj, a_ji, q, pos,
                            mask, w_ang, ln_scale, ln_bias):
    """Differentiable wrapper: Pallas kernel forward, XLA-path VJP backward.

    The backward pass rebuilds the O(N^3) XLA graph from the O(N^2)
    residual inputs (a rematerialization — same backward memory/compute as
    the pure-XLA path, while the forward stays fused in VMEM). This is what
    lets `use_pallas_triplet` be the production default for training too."""
    return triplet_pool_pallas(a_kj, a_ji, q, pos, mask, w_ang, ln_scale,
                               ln_bias, act, norm, num_ang_funcs)


def _pallas_ad_fwd(act, norm, num_ang_funcs, a_kj, a_ji, q, pos, mask,
                   w_ang, ln_scale, ln_bias):
    out = triplet_pool_pallas(a_kj, a_ji, q, pos, mask, w_ang, ln_scale,
                              ln_bias, act, norm, num_ang_funcs)
    return out, (a_kj, a_ji, q, pos, mask, w_ang, ln_scale, ln_bias)


def _pallas_ad_bwd(act, norm, num_ang_funcs, res, g):
    a_kj, a_ji, q, pos, mask, w_ang, ln_scale, ln_bias = res
    _, vjp = jax.vjp(
        lambda akj, aji, qq, pp, wa, ls, lb: triplet_pool_xla(
            akj, aji, qq, pp, mask, wa, ls, lb, act=act, norm=norm,
            num_ang_funcs=num_ang_funcs),
        a_kj, a_ji, q, pos, w_ang, ln_scale, ln_bias)
    d = vjp(g)
    zero_mask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return (*d[:4], zero_mask, *d[4:])


_triplet_pool_pallas_ad.defvjp(_pallas_ad_fwd, _pallas_ad_bwd)


def triplet_pool(a_kj, a_ji, q, pos, mask, w_ang, ln_scale, ln_bias,
                 act: Callable, norm: bool, num_ang_funcs: int = 3,
                 use_pallas: bool = False):
    """Dispatch: fused Pallas kernel on TPU (with the XLA-path VJP), the
    XLA reference elsewhere. Both agree with float64 math to ~2e-6 max-abs
    (scripts/drift_triplet.py)."""
    if not use_pallas or jax.default_backend() != "tpu":
        return triplet_pool_xla(a_kj, a_ji, q, pos, mask, w_ang, ln_scale,
                                ln_bias, act, norm, num_ang_funcs)
    return _triplet_pool_pallas_ad(act, norm, num_ang_funcs, a_kj, a_ji, q,
                                   pos, mask, w_ang, ln_scale, ln_bias)
