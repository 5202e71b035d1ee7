"""Fused ViT transformer block as single Pallas TPU kernels.

One grid program processes a tile of BT images through the ENTIRE block —

    y1 = LN1(x);  qkv = y1 @ Wqkv + b
    att = softmax(q k^T / sqrt(dh)) v          (per image, per head)
    x2  = x + att @ Wo + bo
    y2 = LN2(x2); out = x2 + gelu(y2 @ W1 + b1) @ W2 + b2

— with activations resident in VMEM throughout. The XLA formulation runs
~10 separate fusions per block with HBM round-trips and 4 layout copies
around the attention einsums; here nothing but x and out touches HBM.

Backward is a second kernel that RECOMPUTES the forward in VMEM (flash-style)
and emits dx plus per-tile partial weight gradients (summed over the grid
outside the kernel) — so no per-layer activation stacking in HBM either
(the saved-activation stacks were the OOM driver at microbatch 256).

Numerics: bf16 matmul inputs, fp32 accumulation (preferred_element_type),
fp32 LN/softmax statistics — matching the XLA path; parity is asserted in
tests/test_fused_block.py (fwd and grads, interpret mode on CPU).

Layout notes:
  * sequence padded to SP (multiple of 16 for bf16 sublanes) by the wrapper;
    padded key columns are masked to -inf in the softmax, padded query rows
    compute garbage that never leaves the pad region (residuals keep them
    zero because the input pad is zero and LN/matmul of zero rows stays
    bounded); the wrapper slices them off.
  * weights live whole in VMEM per program (~0.9 MB bf16 for ViT-Tiny).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

WEIGHT_NAMES = (
    "ln1_scale", "ln1_bias", "wqkv", "bqkv", "wo", "bo",
    "ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2",
)


# The gelu path evaluates ~1.6e9 transcendentals per production step (erf in
# the fwd + recompute, erf+gaussian in the grad) on the VPU. FAST_GELU swaps
# them for exp-free rational approximations (least-squares fits,
# tools/fit_gelu_rational.py): the fwd/recompute gelu goes through a direct
# odd rational for the gaussian cdf (abs err 8.7e-6 incl. the clamp tail),
# the grad through an odd rational for gelu'-0.5 (|err| 4.6e-5) — both
# orders below bf16's 2^-8 relative resolution; the kernels cast gelu
# outputs to bf16, so the approximation is invisible downstream.
def _fast_gelu() -> bool:
    # read at trace time so tests/benches can toggle per-process
    return os.environ.get("VIT2SPN_FAST_GELU", "1") == "1"


def _erf_exact(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7) — Mosaic has
    no erf/erfc lowering; exp is the only transcendental needed."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
            + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_fast(m1):
    """Direct gelu via an odd rational for the gaussian cdf:
    Phi(x) - 0.5 ~ x*P3(x^2)/Q3(x^2) on |x| <= 4.6 (fit
    tools/fit_gelu_rational.py, gelu abs err 8.7e-6 over [0, 8] incl. the
    clamp tail — orders below bf16), so gelu(x) = x*(0.5 + xc*P/Q). Two VPU
    ops cheaper than 0.5*x*(1+erf_fast(x/sqrt(2))): the argument pre-scale
    and the (1 + .) shift fold into the fitted coefficients. The leading x
    stays UNclamped (gelu -> x for large x; only Phi's argument saturates)."""
    xc = jnp.clip(m1, -4.6, 4.6)
    s = xc * xc
    p = 3.303320889057693e-05
    p = 0.003819241585880179 + s * p
    p = 0.027416247095983802 + s * p
    p = 0.3989386549977406 + s * p
    q = 0.0011597711855913715
    q = 0.023787000484733943 + s * q
    q = 0.23538129451100157 + s * q
    q = 1.0 + s * q
    return m1 * (0.5 + xc * (p / q))


def _gelu(m1):
    """Exact-erf gelu or the direct cdf-rational (VIT2SPN_FAST_GELU)."""
    if _fast_gelu():
        return _gelu_fast(m1)
    return 0.5 * m1 * (1.0 + _erf_exact(m1 * 0.7071067811865476))


def _ln_fwd(x2d, scale, bias, eps):
    """fp32 layernorm; returns (y_bf16compat, xhat, rstd) for reuse in bwd."""
    x32 = x2d.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rstd
    y = xhat * scale + bias
    return y, xhat, rstd


def _attention(qkv, bt: int, sp: int, d: int, heads: int, seq_len: int,
               dtype):
    """qkv: (BT*SP, 3D) value -> attention output (BT*SP, D)."""
    dh = d // heads
    scale = 1.0 / (dh ** 0.5)
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    mask = col < seq_len
    outs = []
    for i in range(bt):
        rows = qkv[i * sp:(i + 1) * sp, :]
        head_outs = []
        for h in range(heads):
            q = rows[:, h * dh:(h + 1) * dh]
            k = rows[:, d + h * dh:d + (h + 1) * dh]
            v = rows[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(mask, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            head_outs.append(
                jnp.dot(p.astype(dtype), v, preferred_element_type=jnp.float32)
            )
        outs.append(jnp.concatenate(head_outs, axis=1))
    return jnp.concatenate(outs, axis=0).astype(dtype)


def _block_fwd_math(x2d, w, bt, sp, d, heads, seq_len, eps, dtype):
    """Shared forward math on VMEM-resident values (used by fwd and bwd
    kernels). Returns out plus residuals needed by the backward."""
    y1, xhat1, rstd1 = _ln_fwd(x2d, w["ln1_scale"], w["ln1_bias"], eps)
    y1 = y1.astype(dtype)
    qkv = jnp.dot(y1, w["wqkv"], preferred_element_type=jnp.float32)
    qkv = (qkv + w["bqkv"].astype(jnp.float32)).astype(dtype)
    att = _attention(qkv, bt, sp, d, heads, seq_len, dtype)
    o = jnp.dot(att, w["wo"], preferred_element_type=jnp.float32)
    x2 = (x2d.astype(jnp.float32) + o + w["bo"].astype(jnp.float32))
    y2, xhat2, rstd2 = _ln_fwd(x2, w["ln2_scale"], w["ln2_bias"], eps)
    y2 = y2.astype(dtype)
    m1 = jnp.dot(y2, w["w1"], preferred_element_type=jnp.float32)
    m1 = m1 + w["b1"].astype(jnp.float32)
    # gelu without erf/erfc (Mosaic implements neither; jax.nn.gelu lowers
    # through erfc): exact A&S rational, or the direct cdf rational (fast)
    g = _gelu(m1).astype(dtype)
    m2 = jnp.dot(g, w["w2"], preferred_element_type=jnp.float32)
    out = x2 + m2 + w["b2"].astype(jnp.float32)
    return dict(
        out=out, y1=y1, qkv=qkv, att=att, x2=x2, y2=y2,
        m1=m1.astype(dtype), g=g,
        xhat1=xhat1, rstd1=rstd1, xhat2=xhat2, rstd2=rstd2,
    )


def _fwd_kernel(x_ref, *w_refs, out_ref, x2_ref, bt, sp, d, heads,
                seq_len, eps):
    dtype = x_ref.dtype
    x2d = x_ref[...].reshape(bt * sp, d)
    w = {name: ref[...] for name, ref in zip(WEIGHT_NAMES, w_refs)}
    res = _block_fwd_math(x2d, w, bt, sp, d, heads, seq_len, eps, dtype)
    out_ref[...] = res["out"].astype(dtype).reshape(bt, sp, d)
    # mid-residual saved for the split backward (MLP-bwd recomputes LN2/MLP
    # from x2; attention-bwd recomputes LN1/QKV/attention from x)
    x2_ref[...] = res["x2"].astype(dtype).reshape(bt, sp, d)


def _ln_bwd(dy, xhat, rstd, scale):
    """dy: fp32 (N, D) grad wrt LN output; returns (dx, dscale, dbias)."""
    dscale = jnp.sum(dy * xhat, axis=0)
    dbias = jnp.sum(dy, axis=0)
    dxhat = dy * scale
    dx = rstd * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    return dx, dscale, dbias


def _gelu_grad_exact(m1):
    """d/dx gelu_exact(x) = Phi(x) + x phi(x)."""
    inv_sqrt2 = 0.7071067811865476
    phi = jnp.exp(-0.5 * m1 * m1) * 0.3989422804014327
    cdf = 0.5 * (1.0 + _erf_exact(m1 * inv_sqrt2))
    return cdf + m1 * phi


def _gelu_grad_fast(m1):
    """gelu'(x) = 0.5 + x*P4(x^2)/Q3(x^2) on |x| <= 4.6 (|err| 4.6e-5; the
    odd part of gelu' around 0.5), clamped beyond. No transcendentals."""
    xc = jnp.clip(m1, -4.6, 4.6)
    s = xc * xc
    p = 1.8219220945499694e-06
    p = -1.2033074181130153e-05 + s * p
    p = 0.013759530274157408 + s * p
    p = -0.03544238930343691 + s * p
    p = 0.7981352003862573 + s * p
    q = 0.003771008302941207
    q = 0.036972201734621915 + s * q
    q = 0.2904124253896315 + s * q
    q = 1.0 + s * q
    return 0.5 + xc * p / q


def _gelu_grad(m1):
    return _gelu_grad_fast(m1) if _fast_gelu() else _gelu_grad_exact(m1)


def _attention_bwd(qkv, datt, bt, sp, d, heads, seq_len, dtype):
    """Recompute-softmax attention backward; returns dqkv (BT*SP, 3D)."""
    dh = d // heads
    scale = 1.0 / (dh ** 0.5)
    col = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    kmask = col < seq_len
    qmask = row < seq_len
    img_grads = []
    for i in range(bt):
        rows = qkv[i * sp:(i + 1) * sp, :]
        dout_i = datt[i * sp:(i + 1) * sp, :]
        parts_q, parts_k, parts_v = [], [], []
        for h in range(heads):
            q = rows[:, h * dh:(h + 1) * dh]
            k = rows[:, d + h * dh:d + (h + 1) * dh]
            v = rows[:, 2 * d + h * dh:2 * d + (h + 1) * dh]
            do = dout_i[:, h * dh:(h + 1) * dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(kmask, s, NEG_INF)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            # zero padded query rows so dK/dV get no pad contribution
            p = jnp.where(qmask, p, 0.0)
            pdt = p.astype(dtype)
            dv = jax.lax.dot_general(  # P^T dO
                pdt, do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(  # dO V^T
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsdt = ds.astype(dtype)
            dq = jnp.dot(dsdt, k, preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(  # dS^T Q
                dsdt, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            parts_q.append(dq)
            parts_k.append(dk)
            parts_v.append(dv)
        img_grads.append(
            jnp.concatenate(
                [jnp.concatenate(parts_q, axis=1),
                 jnp.concatenate(parts_k, axis=1),
                 jnp.concatenate(parts_v, axis=1)], axis=1
            )
        )
    return jnp.concatenate(img_grads, axis=0).astype(dtype)


def _accumulate_dw(names, dw_refs, partials):
    """Accumulate weight-grad partials across the (sequential) TPU grid:
    every program maps to the SAME output block, which therefore stays
    resident in VMEM — no (n_tiles, ...) partials in HBM, no separate
    reduction pass (that pass cost ~70 ms/step at tile 4)."""
    is_first = pl.program_id(0) == 0
    for n, r in zip(names, dw_refs):
        val = partials[n].astype(jnp.float32).reshape(r.shape)

        @pl.when(is_first)
        def _init(r=r, val=val):
            r[...] = val

        @pl.when(jnp.logical_not(is_first))
        def _acc(r=r, val=val):
            r[...] += val


def _mlp_bwd_math(x2, dout, w, dtype, eps):
    """LN2/MLP recompute-backward; x2/dout in compute dtype (fp32 copies of
    the full (N, D) tiles are what pushed the monolithic kernel 240 KB over
    the 16 MB VMEM budget at tile 4 — fp32 stays transient in reductions).
    Returns (dx2 fp32, {mlp/ln2 grad partials})."""
    y2f, xhat2, rstd2 = _ln_fwd(x2, w["ln2_scale"], w["ln2_bias"], eps)
    y2 = y2f.astype(dtype)
    # m1 stored in compute dtype: the fp32 (rows, mlp_dim) buffer is what
    # breaks the 16 MB VMEM budget at tile 8 (recompute-side approximation;
    # the forward kernel keeps exact fp32 m1)
    m1 = jnp.dot(y2, w["w1"], preferred_element_type=jnp.float32)
    m1 = (m1 + w["b1"].astype(jnp.float32)).astype(dtype)
    m1f = m1.astype(jnp.float32)
    g = _gelu(m1f).astype(dtype)
    gg = _gelu_grad(m1f).astype(dtype)
    del m1f

    doutdt = dout.astype(dtype)
    dw2 = jax.lax.dot_general(  # g^T dout
        g, doutdt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db2 = jnp.sum(dout.astype(jnp.float32), axis=0)
    dg = jax.lax.dot_general(  # dout @ W2^T
        doutdt, w["w2"], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    dm1 = dg * gg
    dw1 = jax.lax.dot_general(  # y2^T dm1
        y2, dm1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1 = jnp.sum(dm1.astype(jnp.float32), axis=0)
    dy2 = jax.lax.dot_general(  # dm1 @ W1^T
        dm1, w["w1"], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx2_ln, dln2_s, dln2_b = _ln_bwd(dy2, xhat2, rstd2, w["ln2_scale"])
    dx2 = dout.astype(jnp.float32) + dx2_ln  # residual: out = x2 + mlp(...)
    return dx2, dict(ln2_scale=dln2_s, ln2_bias=dln2_b,
                     w1=dw1, b1=db1, w2=dw2, b2=db2)


def _mlp_bwd_kernel(x2_ref, dout_ref, *refs, bt, sp, d, eps):
    """Recompute LN2/MLP from x2; emit dx2 and MLP/LN2 weight grads."""
    names = ("ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2")
    w_refs = refs[: len(names)]
    dx2_ref = refs[len(names)]
    dw_refs = refs[len(names) + 1:]
    dtype = x2_ref.dtype
    w = {n: r[...] for n, r in zip(names, w_refs)}
    x2 = x2_ref[...].reshape(bt * sp, d)
    dout = dout_ref[...].reshape(bt * sp, d)
    dx2, partials = _mlp_bwd_math(x2, dout, w, dtype, eps)
    dx2_ref[...] = dx2.astype(dtype).reshape(bt, sp, d)
    _accumulate_dw(names, dw_refs, partials)


def _attn_bwd_kernel(x_ref, dx2_ref, *refs, bt, sp, d, heads, seq_len, eps):
    """Recompute LN1/QKV/attention from x; emit dx and attention weight
    grads (consumes dx2 from the MLP-bwd kernel)."""
    names = ("ln1_scale", "ln1_bias", "wqkv", "bqkv", "wo", "bo")
    w_refs = refs[: len(names)]
    dx_ref = refs[len(names)]
    dw_refs = refs[len(names) + 1:]
    dtype = x_ref.dtype
    w = {n: r[...] for n, r in zip(names, w_refs)}
    x2d = x_ref[...].reshape(bt * sp, d)
    # dx2 stays in compute dtype; fp32 only in reductions/accumulators
    dx2 = dx2_ref[...].reshape(bt * sp, d)
    dx, partials = _attn_bwd_math(x2d, dx2, w, bt, sp, d, heads, seq_len,
                                  eps, dtype)
    dx_ref[...] = dx.astype(dtype).reshape(bt, sp, d)
    _accumulate_dw(names, dw_refs, partials)


def _merged_bwd_kernel(x_ref, x2_ref, dout_ref, *refs, bt, sp, d, heads,
                       seq_len, eps):
    """Whole-block backward in ONE body: MLP-bwd then attn-bwd with dx2
    staying in VMEM (no HBM round trip between them, half the launches).
    Needs ~16.2 MB scoped VMEM at tile 4 — run with an explicit
    vmem_limit_bytes above Mosaic's 16 MB default."""
    w_refs = refs[: len(WEIGHT_NAMES)]
    dx_ref = refs[len(WEIGHT_NAMES)]
    dw_refs = refs[len(WEIGHT_NAMES) + 1:]
    dtype = x_ref.dtype
    w = {n: r[...] for n, r in zip(WEIGHT_NAMES, w_refs)}
    x2 = x2_ref[...].reshape(bt * sp, d)
    dout = dout_ref[...].reshape(bt * sp, d)
    dx2, mlp_partials = _mlp_bwd_math(x2, dout, w, dtype, eps)
    x2d = x_ref[...].reshape(bt * sp, d)
    # match the split path's numerics: dx2 crosses in compute dtype there
    dx, attn_partials = _attn_bwd_math(x2d, dx2.astype(dtype), w, bt, sp, d,
                                       heads, seq_len, eps, dtype)
    dx_ref[...] = dx.astype(dtype).reshape(bt, sp, d)
    _accumulate_dw(WEIGHT_NAMES, dw_refs, {**mlp_partials, **attn_partials})


def _attn_bwd_math(x2d, dx2, w, bt, sp, d, heads, seq_len, eps, dtype):
    """LN1/QKV/attention recompute-backward. x2d: (N, D) layer input and
    dx2: (N, D) incoming grad, both compute dtype.
    Returns (dx fp32, {attn/ln1 grad partials})."""
    y1f, xhat1, rstd1 = _ln_fwd(x2d, w["ln1_scale"], w["ln1_bias"], eps)
    qkv = jnp.dot(y1f.astype(dtype), w["wqkv"],
                  preferred_element_type=jnp.float32)
    qkv = (qkv + w["bqkv"].astype(jnp.float32)).astype(dtype)
    att = _attention(qkv, bt, sp, d, heads, seq_len, dtype)

    dwo = jax.lax.dot_general(  # att^T dx2
        att, dx2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbo = jnp.sum(dx2.astype(jnp.float32), axis=0)
    datt = jax.lax.dot_general(  # dx2 @ Wo^T
        dx2, w["wo"], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    dqkv = _attention_bwd(qkv, datt, bt, sp, d, heads, seq_len, dtype)
    # recompute y1 here (one cheap LN pass) instead of holding it live
    # across the attention backward
    y1 = (xhat1 * w["ln1_scale"] + w["ln1_bias"]).astype(dtype)
    dwqkv = jax.lax.dot_general(  # y1^T dqkv
        y1, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv = jnp.sum(dqkv.astype(jnp.float32), axis=0)
    dy1 = jax.lax.dot_general(  # dqkv @ Wqkv^T
        dqkv, w["wqkv"], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ln, dln1_s, dln1_b = _ln_bwd(dy1, xhat1, rstd1, w["ln1_scale"])
    dx = dx2.astype(jnp.float32) + dx_ln  # residual: x2 = x + attn(...)
    return dx, dict(ln1_scale=dln1_s, ln1_bias=dln1_b, wqkv=dwqkv,
                    bqkv=dbqkv, wo=dwo, bo=dbo)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _zero_idx(i, nd):
    return (0,) * nd


def _tile_idx(i, nd):
    return (i,) + (0,) * nd


def _weight_specs():
    return [pl.BlockSpec(memory_space=pltpu.ANY) for _ in WEIGHT_NAMES]


def _pad_seq(x, sp):
    b, s, d = x.shape
    return jnp.pad(x, ((0, 0), (0, sp - s), (0, 0))) if sp != s else x


def _prep_weights(weights):
    """TPU pallas wants >=2-D operands: lift 1-D params to (1, n)."""
    return tuple(w[None, :] if w.ndim == 1 else w for w in weights)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5)
)
def fused_block(x, weights: Tuple, heads: int, eps: float,
                block_images: int = 8, interpret: bool = False):
    """x: (B, S, D) bf16/f32; weights: tuple in WEIGHT_NAMES order
    (matmul weights in x.dtype, LN params fp32). Returns (B, S, D)."""
    out, _ = _fused_fwd_impl(x, weights, heads, eps, block_images, interpret)
    return out


def _tile_for(b, block_images):
    bt = min(block_images, b)
    while b % bt:
        bt -= 1
    return bt


def _mem_scale(sp, d, mlp_dim, heads):
    """Per-image VMEM-cost multiple relative to the tuned ViT-Tiny geometry
    (d=192, mlp=768, heads=3 at sp=208). The kernels' scoped-VMEM temps scale
    with sp*(d+mlp) (activation rows) plus heads*sp^2 (per-head attention
    matrices); the tile/budget defaults below were swept at the Tiny point,
    so larger geometries (ViT-Small: exactly 2x; ViT-Base: exactly 4x)
    divide the image tile and pad the budget accordingly. Env overrides
    still win."""
    cost = sp * (d + mlp_dim) + heads * sp * sp
    tiny = 208 * (192 + 768) + 3 * 208 * 208
    return max(1, round(cost / tiny))


def _fused_fwd_impl(x, weights, heads, eps, block_images, interpret):
    b, s, d = x.shape
    sp = _round_up(s, 16)
    scale = _mem_scale(sp, d, weights[8].shape[-1], heads)
    bt = _tile_for(b, max(1, block_images // scale))
    xp = _pad_seq(x, sp)
    weights = _prep_weights(weights)
    kern = functools.partial(
        _fwd_kernel, bt=bt, sp=sp, d=d, heads=heads, seq_len=s, eps=eps
    )

    def wrapped(x_ref, *refs):
        kern(x_ref, *refs[:-2], out_ref=refs[-2], x2_ref=refs[-1])

    tile_spec = pl.BlockSpec((bt, sp, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    kwargs = {}
    if scale > 1:
        # whole-layer weights are VMEM-resident here (tile-independent,
        # ~14 MiB bf16 at ViT-Base) — Mosaic's 16 MB default only fits the
        # Tiny geometry; temps at the Tiny tile-8 equivalent are ~17 MB
        w_mb = sum(w.size * w.dtype.itemsize for w in weights) / (1 << 20)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=round(17 * (bt * scale) / 8 + w_mb + 8) << 20
        )
    out, x2 = pl.pallas_call(
        wrapped,
        grid=(b // bt,),
        in_specs=[
            tile_spec,
            *[pl.BlockSpec(w.shape, functools.partial(_zero_idx, nd=w.ndim),
                           memory_space=pltpu.VMEM) for w in weights],
        ],
        out_specs=[tile_spec, tile_spec],
        out_shape=[jax.ShapeDtypeStruct((b, sp, d), x.dtype)] * 2,
        interpret=interpret,
        **kwargs,
    )(xp, *weights)
    return out[:, :s, :], x2


def _fused_fwd(x, weights, heads, eps, block_images, interpret):
    out, x2 = _fused_fwd_impl(x, weights, heads, eps, block_images, interpret)
    return out, (x, x2, weights)


def _layer_bwd(xp, x2p, gp, wdict, heads, s, sp, eps, block_images, interpret,
               merged=False):
    """Backward of ONE block on seq-PADDED tensors.

    Returns (dxp (B, SP, D), {name: fp32 grad}). Shared by the per-layer
    scan path (fused_block's vjp) and the whole-backbone vjp's reverse loop.
    """
    b, _, d = xp.shape

    def run(kernel, names, inputs, extra_kw, bt, vmem_limit=None):
        n_tiles = b // bt
        tile_spec = pl.BlockSpec((bt, sp, d), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        ws = [wdict[n] for n in names]
        kern = functools.partial(kernel, bt=bt, sp=sp, d=d, eps=eps, **extra_kw)
        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
        kwargs = {}
        if vmem_limit is not None:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_limit
            )
        outs = pl.pallas_call(
            kern,
            grid=(n_tiles,),
            in_specs=[
                *([tile_spec] * len(inputs)),
                *[pl.BlockSpec(w.shape, functools.partial(_zero_idx, nd=w.ndim),
                               memory_space=pltpu.VMEM) for w in ws],
            ],
            out_specs=[
                tile_spec,
                *[pl.BlockSpec(w.shape, functools.partial(_zero_idx, nd=w.ndim),
                               memory_space=pltpu.VMEM) for w in ws],
            ],
            out_shape=[jax.ShapeDtypeStruct((b, sp, d), xp.dtype), *dw_shapes],
            interpret=interpret,
            **kwargs,
        )(*inputs, *ws)
        dgrads = {n: outs[1 + i] for i, n in enumerate(names)}
        return outs[0], dgrads

    # experiment overrides (tools/bwd_sweep.py); defaults are the measured
    # production optimum at the ViT-Tiny geometry — larger geometries divide
    # the tile and pad the VMEM budget by _mem_scale (weights + fp32 dw
    # accumulators grow with d^2 independent of the image tile)
    mlp_dim = wdict["w1"].shape[-1]
    scale = _mem_scale(sp, d, mlp_dim, heads)
    bt_req = int(os.environ.get("VIT2SPN_BWD_TILE", "0")) or max(
        block_images // 2 // scale, 1
    )
    bt = _tile_for(b, bt_req)

    def _w_mb(names):
        """VMEM for a kernel's weight operands (input dtype) + fp32 dw
        outputs — the d^2-scaled, tile-independent part of the footprint."""
        return sum(
            wdict[n].size * (wdict[n].dtype.itemsize + 4) for n in names
        ) / (1 << 20)

    vmem_env_mb = int(os.environ.get("VIT2SPN_BWD_VMEM_MB", "0"))
    vmem_mb = vmem_env_mb
    if not vmem_mb and scale > 1:
        # budgets are tuned at the Tiny geometry; at larger geometries build
        # them explicitly: tile-proportional temps (measured ~16 MB at the
        # Tiny attn-bwd optimum, effective tile 4) + the weight/dw buffers
        vmem_mb = round(
            16 * (bt * scale) / 4
            + _w_mb(("wqkv", "bqkv", "wo", "bo", "ln1_scale", "ln1_bias"))
            + 8
        )
    vmem = vmem_mb * 1024 * 1024 if vmem_mb else None
    if merged:
        # one launch per layer, dx2 resident in VMEM; ~16.2 MB scoped VMEM
        # at tile 4 so it needs the explicit budget above Mosaic's default.
        # Measured on v5e: 2932.5 img/s/chip == the split form (a wash);
        # kept selectable via VIT2SPN_MERGED_BWD=1.
        merged_mb = 18 if scale == 1 else round(
            18 * (bt * scale) / 4 + _w_mb(WEIGHT_NAMES) + 8
        )
        return run(
            _merged_bwd_kernel, WEIGHT_NAMES, (xp, x2p, gp),
            {"heads": heads, "seq_len": s}, bt=bt,
            vmem_limit=max(vmem or 0, merged_mb * 1024 * 1024),
        )

    # per-kernel tiles: tile 4 is the measured optimum for the attn-bwd
    # kernel on v5e (its per-image unrolled attention loop dominates the
    # scoped-VMEM footprint; see _attention_bwd docstring history in git for
    # the tile-8/fori_loop dead ends). The MLP-bwd kernel has no per-image
    # loop — only large GEMMs — so its tile is independently overridable.
    # measured optimum (v5e, whole-step): attn-bwd tile 4, MLP-bwd tile 8
    # (2989 img/s/chip vs 2962 with both at 4; MLP at 16 regresses to 2820 —
    # less grid pipelining, same pattern as fwd tile 32)
    mlp_bt_req = int(
        os.environ.get("VIT2SPN_MLP_BWD_TILE", "0")
    ) or min(2 * bt, max(8 // scale, 1))
    mlp_bt = _tile_for(b, mlp_bt_req)
    # measured scoped-VMEM need at tile 8: 21.9 MB (exact gelu), 24.8 MB (fast)
    mlp_vmem_mb = int(os.environ.get("VIT2SPN_MLP_BWD_VMEM_MB", "0"))
    mlp_names = ("ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2")
    if not mlp_vmem_mb and not vmem_env_mb:
        if scale > 1:
            # explicit budget at non-Tiny geometries: tile-proportional temps
            # (~25 MB at the Tiny optimum, effective tile 8, fast gelu) +
            # weight/dw buffers (ViT-Base measured 55.9 MB needed at tile 2)
            mlp_vmem_mb = round(
                25 * (mlp_bt * scale) / 8 + _w_mb(mlp_names) + 8
            )
        elif mlp_bt > 4:
            # Tiny: tile >4 overflows Mosaic's 16 MB default; floor the
            # budget even when mlp_bt happens to equal bt (e.g.
            # VIT2SPN_BWD_TILE=8 with no VMEM var). An explicitly-set shared
            # VIT2SPN_BWD_VMEM_MB wins over the floor — sweeps must measure
            # the budget the operator asked for.
            mlp_vmem_mb = {8: 26}.get(mlp_bt, 48)
    mlp_vmem = mlp_vmem_mb * 1024 * 1024 if mlp_vmem_mb else vmem
    dx2, mlp_grads = run(_mlp_bwd_kernel, mlp_names, (x2p, gp), {}, bt=mlp_bt,
                         vmem_limit=mlp_vmem)

    attn_names = ("ln1_scale", "ln1_bias", "wqkv", "bqkv", "wo", "bo")
    # Mosaic's scoped-VMEM reservation for the unrolled per-image attention
    # loop caps this kernel at half tile under the default 16 MB budget
    dxp, attn_grads = run(
        _attn_bwd_kernel, attn_names, (xp, dx2),
        {"heads": heads, "seq_len": s}, bt=bt, vmem_limit=vmem,
    )
    return dxp, {**mlp_grads, **attn_grads}


def _fused_bwd(heads, eps, block_images, interpret, res, g):
    x, x2p, weights = res  # x2p is already seq-padded
    b, s, d = x.shape
    sp = _round_up(s, 16)
    xp = _pad_seq(x, sp)
    gp = _pad_seq(g.astype(x.dtype), sp)
    wdict = dict(zip(WEIGHT_NAMES, _prep_weights(weights)))
    dxp, all_grads = _layer_bwd(xp, x2p, gp, wdict, heads, s, sp, eps,
                                block_images, interpret)
    dweights = tuple(
        all_grads[n].astype(w.dtype).reshape(w.shape)
        for n, w in zip(WEIGHT_NAMES, weights)
    )
    return dxp[:, :s, :], dweights


fused_block.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Whole-backbone forward: ALL layers in ONE pallas grid
# ---------------------------------------------------------------------------

def _layer_block_idx(t, l, nd):
    return (l,) + (0,) * nd


def _backbone_fwd_kernel(x_ref, *refs, bt, sp, d, heads, seq_len, eps,
                         emit_res):
    """Grid (tile, layer), layer fastest: the activation tile is PERSISTENT
    in VMEM (carried in out_ref across the layer dimension) while each
    layer's weights stream in as (1, ...) blocks of the stacked arrays —
    one kernel launch per (net, microbatch) instead of one per layer.

    With emit_res, each layer also writes its input (xs) and mid-residual
    (x2s) tiles for the split recompute-backward."""
    w_refs = refs[: len(WEIGHT_NAMES)]
    out_ref = refs[len(WEIGHT_NAMES)]
    if emit_res:
        xs_ref, x2s_ref = refs[len(WEIGHT_NAMES) + 1: len(WEIGHT_NAMES) + 3]
    l = pl.program_id(1)
    dtype = x_ref.dtype

    @pl.when(l == 0)
    def _init():
        out_ref[...] = x_ref[...]

    x2d = out_ref[...].reshape(bt * sp, d)
    w = {}
    for name, r in zip(WEIGHT_NAMES, w_refs):
        v = r[...]
        # (1, a, b) layer block -> (a, b); (1, n) stays broadcastable
        w[name] = v.reshape(v.shape[1:]) if v.ndim == 3 else v
    if emit_res:
        xs_ref[...] = x2d.reshape(1, bt, sp, d)
    res = _block_fwd_math(x2d, w, bt, sp, d, heads, seq_len, eps, dtype)
    if emit_res:
        x2s_ref[...] = res["x2"].astype(dtype).reshape(1, bt, sp, d)
    out_ref[...] = res["out"].astype(dtype).reshape(bt, sp, d)


def _backbone_fwd_impl(x, weights, heads, eps, block_images, interpret,
                       emit_res):
    """weights: tuple of STACKED arrays in WEIGHT_NAMES order, each with a
    leading layer axis ((L, d, 3d) matmuls, (L, n) vectors)."""
    b, s, d = x.shape
    layers = weights[0].shape[0]
    sp = _round_up(s, 16)
    scale = _mem_scale(sp, d, weights[8].shape[-1], heads)
    block_images = int(
        os.environ.get("VIT2SPN_FWD_TILE", "0")
    ) or max(block_images // scale, 1)  # env override (tools/bwd_sweep.py)
    bt = _tile_for(b, block_images)
    xp = _pad_seq(x, sp)
    # stacked per-layer vectors (L, n) -> (L, 1, n): Mosaic requires the last
    # two BLOCK dims be (8,128)-aligned or equal to the array dims, so the
    # layer axis must not be one of them
    weights = tuple(w[:, None, :] if w.ndim == 2 else w for w in weights)
    kern = functools.partial(
        _backbone_fwd_kernel, bt=bt, sp=sp, d=d, heads=heads, seq_len=s,
        eps=eps, emit_res=emit_res,
    )
    tile_spec = pl.BlockSpec((bt, sp, d), lambda t, l: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    w_specs = [
        pl.BlockSpec((1,) + w.shape[1:],
                     functools.partial(_layer_block_idx, nd=w.ndim - 1),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    out_specs = [tile_spec]
    out_shape = [jax.ShapeDtypeStruct((b, sp, d), x.dtype)]
    kwargs = {}
    if emit_res:
        res_spec = pl.BlockSpec((1, bt, sp, d), lambda t, l: (l, t, 0, 0),
                                memory_space=pltpu.VMEM)
        out_specs += [res_spec, res_spec]
        out_shape += [jax.ShapeDtypeStruct((layers, b, sp, d), x.dtype)] * 2
    # Scoped-VMEM budget. At tile 8 the residual-emitting variant sits right
    # at Mosaic's default 16 MB (~16.0-16.6 MB depending on how the scheduler
    # lands for a given surrounding module) -> 18 MB; the default tile 16
    # needs ~33 MB (res) -> 40 MB for both variants. Round-1's "fwd tile >8
    # is slower" was an artifact of the 16 MB ceiling: tile 16 @ 40 MB
    # measures 2963 vs 2932 img/s/chip at tile 8 (tile 32 @ 96 MB and the
    # 110 MB raise at unchanged tiles both regress - double-buffering
    # trade-off, CLAUDE.md).
    # budgets swept at the Tiny geometry; at larger geometries build them
    # explicitly from the EFFECTIVE (Tiny-equivalent) tile's temps (~38 MB
    # at effective tile 16) plus the double-buffered per-layer streamed
    # weight blocks, which grow with d^2 independent of the tile
    base_mb = (18 if emit_res else 0) if bt * scale <= 8 else 40
    if scale > 1:
        layer_w_mb = sum(
            w.size * w.dtype.itemsize for w in weights
        ) / layers / (1 << 20)
        base_mb = round(
            38 * (bt * scale) / 16 + 2 * layer_w_mb + 8
        )
    fwd_vmem_mb = int(os.environ.get("VIT2SPN_FWD_VMEM_MB", "0")) or base_mb
    if fwd_vmem_mb:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=fwd_vmem_mb * 1024 * 1024
        )
    outs = pl.pallas_call(
        kern,
        grid=(b // bt, layers),  # layer dim iterates fastest
        in_specs=[tile_spec, *w_specs],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **kwargs,
    )(xp, *weights)
    return tuple(outs)  # pallas_call returns a list for list out_shape


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_backbone(x, weights: Tuple, heads: int, eps: float,
                   block_images: int = 16, interpret: bool = False,
                   bwd_block_images: int = 8):
    """Run the full transformer stack over x: (B, S, D).

    weights: tuple of stacked per-layer arrays in WEIGHT_NAMES order (LN
    params fp32, matmul weights in x.dtype). The primal emits NO residuals
    (the inference/EMA-target path pays no extra HBM writes); under grad the
    vjp-forward re-runs with xs/x2s residual stacks enabled."""
    (out,) = _backbone_fwd_impl(x, weights, heads, eps, block_images,
                                interpret, emit_res=False)
    return out[:, : x.shape[1], :]


def _backbone_vjp_fwd(x, weights, heads, eps, block_images, interpret,
                      bwd_block_images):
    out, xs, x2s = _backbone_fwd_impl(x, weights, heads, eps, block_images,
                                      interpret, emit_res=True)
    return out[:, : x.shape[1], :], (xs, x2s, weights, x.shape[1])


def _backbone_vjp_bwd(heads, eps, block_images, interpret, bwd_block_images,
                      res, g):
    """Reverse python loop over layers calling the split per-layer bwd
    kernels — the measured optimum. Dead ends (measured on v5e, whole-step):
    (a) a single whole-backbone bwd grid carrying the running grad through an
    input/output-aliased buffer is UNSOUND — input prefetch is not ordered
    against aliased output writes (wrong results on interpret; would race on
    TPU); (b) a monolithic per-layer kernel (MLP-bwd + attn-bwd in one body,
    dx2 never leaving VMEM) OOMs at tile 4 (16.23M/16M) and reaches only
    2783 img/s/chip at tile 2 vs 2854 for the split tile-4 form."""
    xs, x2s, weights, s = res  # xs/x2s: (L, B, SP, D), seq-padded
    layers, b, sp, d = xs.shape
    gp = _pad_seq(g.astype(xs.dtype), sp)
    merged = os.environ.get("VIT2SPN_MERGED_BWD", "0") == "1"
    dws = {n: [] for n in WEIGHT_NAMES}
    for l in reversed(range(layers)):
        wl = _prep_weights(tuple(w[l] for w in weights))
        gp, dw_l = _layer_bwd(xs[l], x2s[l], gp,
                              dict(zip(WEIGHT_NAMES, wl)),
                              heads, s, sp, eps, bwd_block_images, interpret,
                              merged=merged)
        for n in WEIGHT_NAMES:
            dws[n].append(dw_l[n])
    dweights = tuple(
        jnp.stack(dws[n][::-1]).astype(w.dtype).reshape(w.shape)
        for n, w in zip(WEIGHT_NAMES, weights)
    )
    return gp[:, :s, :], dweights


fused_backbone.defvjp(_backbone_vjp_fwd, _backbone_vjp_bwd)
