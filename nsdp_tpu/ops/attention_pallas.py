"""Generic fused local vector-attention Pallas kernel.

One kernel covers every kNN-attention pattern in the encoder (reference
``model/encoder/blocks.py``): local self-attention (queries == kv set),
``pos_only`` attention (no feature projections; logits and values are the
position encodings), and the set-abstraction cross-attention (FPS centres
attending to the full cloud).  Per query tile, entirely in VMEM:

  1. exact-f32 squared distances to every kv point,
  2. k-pass min-extraction kNN (ties -> lowest index),
  3. one-hot MXU gathers of kv positions / keys / values per slot,
  4. the fc_delta position MLP and fc_gamma attention MLP,
  5. per-channel softmax over the k slots (single pass; per-slot (T, d)
     tensors fit VMEM), weighted sum.

The (Nq, k, d) neighbourhood tensors that make the XLA path bandwidth-bound
never exist.  Residual adds and BatchNorm stay outside (one elementwise
pass).

Gather packing: the per-slot one-hot matmuls are the kernels' dominant MXU
cost (a gather of an (M, c) table costs a full (T, M) x (M, 128) pass no
matter how small c is).  Key positions and key features are therefore packed
into ONE table ``xk = [kv_xyz (8 lanes) | K (D lanes)]`` so each slot pays a
single gather for both (the K block is separated afterwards with a cheap
lane roll); the backward pass likewise packs the position/key scatter into
one matmul.  Per slot this is 2 instead of 3 gathers forward, and 4 instead
of 6 gather/scatter matmuls backward — exact same arithmetic per column,
just fewer MXU passes.

Project-in-kernel K/V (round 5): at sites where K and V are bias-free
projections of the SAME kv feature tensor (every encoder featured site,
reference ``model/encoder/blocks.py`` ``w_ks``/``w_vs``), the kernel can
instead gather the RAW feature table ``[kv_xyz (8) | feats (F)]`` once per
slot and compute ``k_n = f_n @ wk`` / ``v_n = f_n @ wv`` in VMEM with small
(T, F) x (F, D) dots — ONE (T, M)-scale gather per slot forward and ONE
packed ``[d_xyz | d_feats]`` scatter backward (dwk/dwv accumulate
in-kernel), plus HALF the saved-residual width (``[dx | f_n]`` re-derives
everything else).  At F == D == 120 that halves the dominant MXU cost of
the featured begin block.  Profitable when the raw-feature table packs no
wider than the K table did and M amortises the in-kernel projections —
``kv_proj_profitable``; small-M sites keep the projected-table path.

Gather operand width — bf16 TABLE dtype measured and REJECTED (round 3):
an explicit bf16 cast of the packed table is 1.76x faster per gather in
isolation (0.93 -> 0.53 ms at T=128/M=5120/W=256), but end-to-end it
REGRESSED every headline number on a same-day A/B — stage-1 step
78.4 -> 83.3 ms, inference 8.35M -> 7.77M qps, drag 2.92 -> 3.29 ms —
the extra converts and Mosaic relayouts around the mixed-dtype table
cost more than the operand bandwidth saved (the gather matmul's cost is
the (T, M) MXU pass, not operand width).  The table stays f32.

Coordinate precision: the gather dot runs at ``Precision.DEFAULT``
(a ``highest`` gather is 7.8x slower), whose single MXU pass truncates
operands to bf16-class — catastrophic for the kNN position delta
``dx = query - neighbour`` if the coords were stored plainly (nearby
points cancel; measured ~2% of output std).  The coords therefore ride
as a Dekker hi/lo split IN F32 LANES (``_pack_xk``): ``hi`` is
bf16-exact so the truncating pass gathers it exactly, ``lo`` carries
the next 8 bits, and the kernel reconstructs
``dx = (xyzq - hi) + (-lo)`` with one 8-lane roll+add+mask per slot —
accurate to ~2^-16 relative on the MXU, bit-exact in interpreter mode
where the self-attention delta of a query gathering itself cancels to
EXACTLY zero (the reconstruction order matters for that property; see
the kernel comment.  On the MXU the gathered ``lo`` is itself
bf16-truncated, so the hardware self-residue is ~2^-25 of the
coordinate rather than exactly 0 — 65000x smaller than the ~2^-9
residue of plainly-stored coords).  No mixed-dtype table, so none of
the convert/relayout cost of the rejected bf16-table variant.  Full
experiment table in docs/PERFORMANCE.md.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32

# Every kernel dot pins its precision explicitly: the global
# ``jax_default_matmul_precision`` config LEAKS into Pallas dots that leave
# precision unset, and parity runs set it to 'highest' -- measured on the
# chip, that ran every one-hot gather ~7.8x slower (0.93 -> 7.28 ms/call at
# the probe shape) than the DEFAULT-precision pass all benchmarks used.
# Kernel numerics and speed are therefore config-independent:
# ``--matmul_precision`` governs the XLA (flax) path only.
_DOT_PREC = jax.lax.Precision.DEFAULT



def _resolve_interpret(interpret):
    """None -> interpret on CPU (tests), compiled on TPU/axon."""
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret

def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _roll_left(x, n: int):
    """Rotate lanes left by n (columns n.. move to 0..)."""
    w = x.shape[-1]
    return pltpu.roll(x, w - n, 1)


def _pad_lanes(x, w: int):
    return jnp.pad(x, ((0, 0), (0, w - x.shape[-1])))


def _mlp2(x, w0, b0, w1, b1):
    """Two-layer MLP; matmuls run in the weights' dtype (f32 or bf16) with
    f32 accumulation, biases and activations stay f32."""
    h = jnp.maximum(
        jnp.dot(x.astype(w0.dtype), w0, precision=_DOT_PREC, preferred_element_type=_F32) + b0, 0.0
    )
    return jnp.dot(h.astype(w1.dtype), w1, precision=_DOT_PREC, preferred_element_type=_F32) + b1


def _res_lanes(k: int, d: int, pos_only: bool, proj_f: int = 0) -> int:
    """Lane width of the saved-residuals block (see _attn_kernel)."""
    if pos_only:
        return _round_up(8 * k, 128)  # k packed dx blocks
    if proj_f:
        # project-in-kernel mode: k_n/v_n/pos/u/val are all re-derivable
        # from [dx | f_n] with small (T, D) matmuls — HALF the residual
        # width (and HBM traffic) of the projected-table mode at F == D.
        return k * _round_up(8 + proj_f, 128)  # per-slot [dx | f_n]
    return k * _round_up(8 + 2 * d, 128)  # per-slot [dx | u | val]


def _attn_kernel(
    xyzq_ref, kvt_ref, xk_ref, q_ref, v_ref, glob_ref,
    dw0_ref, db0_ref, dw1_ref, db1_ref,
    gw0_ref, gb0_ref, gw1_ref, gb1_ref,
    out_ref,
    idx_ref=None,
    res_ref=None,
    *, k: int, m_valid: int, pos_only: bool, has_global: bool,
    exact_self: bool = True, proj_f: int = 0,
):
    xyzq = xyzq_ref[0]  # (T, 8)
    kvt = kvt_ref[0]  # (8, Mpad) transposed kv coords
    xk = xk_ref[0]  # (Mpad, 8) coords, or (Mpad, W) packed [coords8 | K D]
    T = xyzq.shape[0]
    M = kvt.shape[-1]

    dw0, db0 = dw0_ref[0], db0_ref[0]
    dw1, db1 = dw1_ref[0], db1_ref[0]
    gw0, gb0 = gw0_ref[0], gb0_ref[0]
    gw1, gb1 = gw1_ref[0], gb1_ref[0]
    D = dw1.shape[-1]

    if not pos_only:
        q = q_ref[0]  # (T, D)
        if proj_f:
            # project-in-kernel mode: the packed table carries RAW kv
            # features [coords8 | feats F]; K/V are computed per slot from
            # the gathered rows with small (T, Wf) x (Wf, D) dots.  The
            # glob slot carries the stacked projection weights, each
            # zero-padded to Wf rows so the UNSLICED rolled gather row can
            # feed the dot (junk lanes — wrapped coords, table padding —
            # hit zero rows).  Halves the (T, M)-scale gathers per slot.
            wf = xk.shape[-1]
            wstack = glob_ref[0]  # (2*Wf, D): wk rows 0:Wf, wv rows Wf:2Wf
            wk_p = wstack[:wf]
            wv_p = wstack[wf:2 * wf]
        else:
            V_a = v_ref[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)
    # Row 3 of the transposed kv layout carries the optional kv_mask
    # distance penalty (zero when unmasked) — masked points lose every
    # neighbourhood selection but cost no extra kernel input.
    d2 = jnp.broadcast_to(kvt[3, :].reshape(1, M), (T, M))
    for c in range(3):
        diff = xyzq[:, c : c + 1] - kvt[c, :].reshape(1, M)
        d2 = d2 + diff * diff
    d2 = jnp.where(lane < m_valid, d2, jnp.inf)

    big = jnp.int32(M)
    idx_cols = []
    logits_all = []
    values_all = []
    res_blocks = []

    for _ in range(k):
        m = jnp.min(d2, axis=-1, keepdims=True)
        idx = jnp.min(jnp.where(d2 == m, lane, big), axis=-1, keepdims=True)
        d2 = jnp.where(lane == idx, jnp.inf, d2)
        onehot = (lane == idx).astype(_F32)
        idx_cols.append(idx)

        # one gather for coords AND keys (packed table); the coord block
        # holds the hi/lo split (_pack_xk), reconstructed here as
        # dx = (xyzq - hi) + (-lo) — NOT xyzq - (hi + lo): for a
        # self-attention query gathering itself, (xyzq - hi) == lo
        # bitwise, so wherever the gather returns lo exactly (interpreter
        # mode, where every parity/training test runs) dx cancels to
        # EXACTLY zero like the XLA path's xyz - xyz.  That exactness
        # matters: at zero-init biases the self-slot's relu preactivation
        # sits exactly on the boundary, and ±1-ulp noise there flips
        # subgradients — measured as O(1) systematic fc_delta
        # bias-gradient error on the first train step of the arbitrary
        # composition.  (On the MXU the gathered lo is itself
        # bf16-truncated, so the hardware self-residue is ~2^-25 of the
        # coordinate — not exactly 0, but 65000x smaller than the ~2^-9
        # residue plainly-stored coords had.)
        gath = jnp.dot(onehot, xk, precision=_DOT_PREC, preferred_element_type=_F32)  # (T, 8|W)
        dxh = xyzq - gath[:, :8]  # [xyzq - hi | -lo | 0 0]
        if exact_self:
            lane8 = jax.lax.broadcasted_iota(jnp.int32, (T, 8), 1)
            keep3 = (lane8 < 3).astype(_F32)
            dx = (dxh + _roll_left(dxh, 3)) * keep3
        else:
            # cross attention (queries never in the kv set): skip the
            # per-slot roll reconstruction — dw0 rides with rows 0-2
            # duplicated into 3-5 (_split_w0(dup=True)) so the MLP's
            # first dot reassembles dx·w in its f32 accumulator for free
            dx = dxh
        pos = _mlp2(dx, dw0, db0, dw1, db1)  # (T, D)
        if pos_only:
            logits = _mlp2(pos, gw0, gb0, gw1, gb1)
            value = pos
            if res_ref is not None:
                res_blocks.append(dx)
        elif proj_f:
            f_roll = _roll_left(gath, 8)  # (T, Wf): feats | zeros | coords
            k_n = jnp.dot(f_roll.astype(wk_p.dtype), wk_p,
                          precision=_DOT_PREC, preferred_element_type=_F32)
            v_n = jnp.dot(f_roll.astype(wv_p.dtype), wv_p,
                          precision=_DOT_PREC, preferred_element_type=_F32)
            u = q - k_n + pos
            logits = _mlp2(u, gw0, gb0, gw1, gb1)
            value = v_n + pos
            if res_ref is not None:
                # [dx | f_n] — everything else re-derivable (see _res_lanes)
                blk = _round_up(8 + proj_f, 128)
                res_blocks.append(_pad_lanes(
                    jnp.concatenate([dx, f_roll[:, :proj_f]], axis=-1),
                    blk,
                ))
        else:
            k_n = _roll_left(gath, 8)[:, :D]
            v_n = jnp.dot(
                onehot.astype(V_a.dtype), V_a, precision=_DOT_PREC, preferred_element_type=_F32
            )
            u = q - k_n + pos
            logits = _mlp2(u, gw0, gb0, gw1, gb1)
            value = v_n + pos
            if res_ref is not None:
                blk = _round_up(8 + 2 * D, 128)
                res_blocks.append(_pad_lanes(
                    jnp.concatenate([dx, u, value], axis=-1), blk
                ))
        logits_all.append(logits)
        values_all.append(value)

    if has_global:
        # extra softmax slot: k/v projected from the global latent, zero
        # position encoding (decoder CrossTransformerBlock semantics).
        glob = glob_ref[0]  # (8, D): row 0 = k_glob, row 1 = v_glob
        k_g = jnp.broadcast_to(glob[0:1, :], (T, D))
        v_g = jnp.broadcast_to(glob[1:2, :], (T, D))
        logits_all.append(_mlp2(q - k_g, gw0, gb0, gw1, gb1))
        values_all.append(v_g)

    # single-pass softmax over the (few) slots: the per-slot (T, D) tensors
    # fit VMEM, so one max + one exp per slot beats streaming renormalisation
    m_max = logits_all[0]
    for l in logits_all[1:]:
        m_max = jnp.maximum(m_max, l)
    s_run = jnp.zeros((T, D), _F32)
    acc = jnp.zeros((T, D), _F32)
    for l, v in zip(logits_all, values_all):
        e = jnp.exp(l - m_max)
        s_run = s_run + e
        acc = acc + e * v

    out_ref[0] = acc / s_run
    if idx_ref is not None:
        idx_mat = jnp.concatenate(idx_cols, axis=-1)  # (T, k)
        kpad = idx_ref.shape[-1]
        idx_ref[0] = jnp.pad(idx_mat, ((0, 0), (0, kpad - k)))
    if res_ref is not None:
        res = jnp.concatenate(res_blocks, axis=-1)
        res_ref[0] = _pad_lanes(res, res_ref.shape[-1])


def _attn_bwd_kernel(
    q_ref, glob_ref,
    dw0_ref, db0_ref, dw1_ref, db1_ref,
    gw0_ref, gb0_ref, gw1_ref, gb1_ref,
    g_ref, idx_in_ref, res_ref,
    dxyzq_ref, dxk_ref, dq_ref, dv_out_ref, dglob_ref,
    ddw0_ref, ddb0_ref, ddw1_ref, ddb1_ref,
    dgw0_ref, dgb0_ref, dgw1_ref, dgb1_ref,
    *, k: int, pos_only: bool, has_global: bool, proj_f: int = 0,
):
    """Backward of the fused attention.

    Consumes the kNN indices AND the per-slot residuals ``[dx | u | val]``
    saved by the forward pass, so pass 1 re-derives every intermediate with
    small (T, D) matmuls only — no kv tables enter the kernel and no
    (T, M)-scale gathers run at all.  The only (T, M) work left is one
    packed scatter matmul per slot (``dxk = [d_kv_xyz (8) | dK (D)]``) plus
    the dV scatter.  Per-tile query gradients write directly; kv-side and
    weight gradients accumulate across grid steps (their output windows
    revisit, Mosaic keeps them resident).

    ``proj_f`` (project-in-kernel mode): residuals are ``[dx | f_n]``, the
    glob slot carries the stacked ``wk/wv`` projection weights, and the two
    per-slot (T, M) scatters collapse into ONE packed
    ``[d_kv_xyz (8) | d_feats (F)]`` scatter; ``dwk``/``dwv`` accumulate
    in-kernel (they take the dv/dglob output slots)."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    first_tile = t == 0
    first_all = (b == 0) & (t == 0)

    g = g_ref[0]  # (T, D)
    idx_in = idx_in_ref[0]  # (T, kpad) int32
    res = res_ref[0]  # (T, R) packed residuals
    T = g.shape[0]
    M = dxk_ref.shape[1]
    W = dxk_ref.shape[-1]

    dw0, db0 = dw0_ref[0], db0_ref[0]
    dw1, db1 = dw1_ref[0], db1_ref[0]
    gw0, gb0 = gw0_ref[0], gb0_ref[0]
    gw1, gb1 = gw1_ref[0], gb1_ref[0]
    D = dw1.shape[-1]

    if not pos_only:
        qf = q_ref[0]
    if proj_f:
        wf = _round_up(8 + proj_f, 128)
        wstack = glob_ref[0]  # (2*Wf, D)
        wk_p = wstack[:wf]
        wv_p = wstack[wf:2 * wf]

    lane = jax.lax.broadcasted_iota(jnp.int32, (T, M), 1)

    # ---- pass 1: unpack residuals, re-derive small intermediates ----------
    idxs, dxs, hds, us, hgs, vals, logits_all = [], [], [], [], [], [], []
    frs = []  # proj mode: per-slot rolled [f_n | 0 | dx] residual rows
    blk = _round_up(8 + proj_f, 128) if proj_f else _round_up(8 + 2 * D, 128)
    for j in range(k):
        idx = idx_in[:, j : j + 1]
        if pos_only:
            dx = _roll_left(res, 8 * j)[:, :8] if j else res[:, :8]
            hd = jnp.maximum(
                jnp.dot(dx, dw0, precision=_DOT_PREC, preferred_element_type=_F32) + db0, 0.0
            )
            pos = jnp.dot(hd, dw1, precision=_DOT_PREC, preferred_element_type=_F32) + db1
            u = pos
            val = pos
        elif proj_f:
            blk_j = res[:, j * blk : (j + 1) * blk]
            dx = blk_j[:, :8]
            # rolled row [f_n | zeros | dx]: feeds the wk/wv dots directly
            # (their rows beyond F are zero) and the dwk/dwv accumulators
            f_roll = _roll_left(blk_j, 8)
            hd = jnp.maximum(
                jnp.dot(dx, dw0, precision=_DOT_PREC, preferred_element_type=_F32) + db0, 0.0
            )
            pos = jnp.dot(hd, dw1, precision=_DOT_PREC, preferred_element_type=_F32) + db1
            k_n = jnp.dot(f_roll, wk_p, precision=_DOT_PREC, preferred_element_type=_F32)
            v_n = jnp.dot(f_roll, wv_p, precision=_DOT_PREC, preferred_element_type=_F32)
            u = qf - k_n + pos
            val = v_n + pos
            frs.append(f_roll)
        else:
            blk_j = res[:, j * blk : (j + 1) * blk]
            dx = blk_j[:, :8]
            u = _roll_left(blk_j, 8)[:, :D]
            val = _roll_left(blk_j, 8 + D)[:, :D]
            hd = jnp.maximum(
                jnp.dot(dx, dw0, precision=_DOT_PREC, preferred_element_type=_F32) + db0, 0.0
            )
        hg = jnp.maximum(jnp.dot(u, gw0, precision=_DOT_PREC, preferred_element_type=_F32) + gb0, 0.0)
        logits = jnp.dot(hg, gw1, precision=_DOT_PREC, preferred_element_type=_F32) + gb1
        idxs.append(idx)
        dxs.append(dx)
        hds.append(hd)
        us.append(u)
        hgs.append(hg)
        vals.append(val)
        logits_all.append(logits)

    if has_global:
        glob = glob_ref[0]
        k_g = jnp.broadcast_to(glob[0:1, :], (T, D))
        v_g = jnp.broadcast_to(glob[1:2, :], (T, D))
        u_g = qf - k_g
        hg_g = jnp.maximum(
            jnp.dot(u_g, gw0, precision=_DOT_PREC, preferred_element_type=_F32) + gb0, 0.0
        )
        logits_all.append(
            jnp.dot(hg_g, gw1, precision=_DOT_PREC, preferred_element_type=_F32) + gb1
        )
        vals.append(v_g)

    # softmax over slots (per channel)
    m_max = logits_all[0]
    for l in logits_all[1:]:
        m_max = jnp.maximum(m_max, l)
    exps = [jnp.exp(l - m_max) for l in logits_all]
    s = exps[0]
    for e in exps[1:]:
        s = s + e
    attn = [e / s for e in exps]

    # ---- pass 2: gradients -------------------------------------------------
    # init accumulated outputs on first visit (in proj mode the dv/dglob
    # slots hold the GLOBAL dwk/dwv accumulators — zero once, not per-b)
    if proj_f:
        @pl.when(first_tile)
        def _():
            dxk_ref[0] = jnp.zeros_like(dxk_ref[0])

        @pl.when(first_all)
        def _():
            dv_out_ref[0] = jnp.zeros_like(dv_out_ref[0])
            dglob_ref[0] = jnp.zeros_like(dglob_ref[0])
    else:
        @pl.when(first_tile)
        def _():
            dxk_ref[0] = jnp.zeros_like(dxk_ref[0])
            dv_out_ref[0] = jnp.zeros_like(dv_out_ref[0])
            dglob_ref[0] = jnp.zeros_like(dglob_ref[0])

    @pl.when(first_all)
    def _():
        ddw0_ref[0] = jnp.zeros_like(ddw0_ref[0])
        ddb0_ref[0] = jnp.zeros_like(ddb0_ref[0])
        ddw1_ref[0] = jnp.zeros_like(ddw1_ref[0])
        ddb1_ref[0] = jnp.zeros_like(ddb1_ref[0])
        dgw0_ref[0] = jnp.zeros_like(dgw0_ref[0])
        dgb0_ref[0] = jnp.zeros_like(dgb0_ref[0])
        dgw1_ref[0] = jnp.zeros_like(dgw1_ref[0])
        dgb1_ref[0] = jnp.zeros_like(dgb1_ref[0])

    # softmax jacobian: dlogits_j = a_j * (dattn_j - sum_i a_i*dattn_i)
    # with dattn_j = g * val_j, and dval_j = g * a_j.
    n_slots = len(vals)
    inner = attn[0] * (g * vals[0])
    for j in range(1, n_slots):
        inner = inner + attn[j] * (g * vals[j])

    dxyzq_acc = jnp.zeros((T, 8), _F32)
    dq_acc = jnp.zeros((T, D), _F32)
    ddw0_a = jnp.zeros_like(ddw0_ref[0])
    ddb0_a = jnp.zeros_like(ddb0_ref[0])
    ddw1_a = jnp.zeros_like(ddw1_ref[0])
    ddb1_a = jnp.zeros_like(ddb1_ref[0])
    dgw0_a = jnp.zeros_like(dgw0_ref[0])
    dgb0_a = jnp.zeros_like(dgb0_ref[0])
    dgw1_a = jnp.zeros_like(dgw1_ref[0])
    dgb1_a = jnp.zeros_like(dgb1_ref[0])
    dxk_acc = jnp.zeros_like(dxk_ref[0])
    if proj_f:
        dwk_a = jnp.zeros_like(dv_out_ref[0])  # (Wf, D); rows >= F sliced off
        dwv_a = jnp.zeros_like(dglob_ref[0])
    elif not pos_only:
        dv_acc = jnp.zeros_like(dv_out_ref[0])

    def mlp_bwd(dy, x, h, w0, w1):
        # returns dx and weight grads of y = relu(x@w0+b0)@w1 + b1
        dw1_ = jax.lax.dot_general(
            h, dy, (((0,), (0,)), ((), ())), precision=_DOT_PREC, preferred_element_type=_F32
        )
        db1_ = jnp.sum(dy, axis=0, keepdims=True)
        dh = jax.lax.dot_general(
            dy, w1, (((1,), (1,)), ((), ())), precision=_DOT_PREC, preferred_element_type=_F32
        )
        dz = dh * (h > 0.0)
        dw0_ = jax.lax.dot_general(
            x, dz, (((0,), (0,)), ((), ())), precision=_DOT_PREC, preferred_element_type=_F32
        )
        db0_ = jnp.sum(dz, axis=0, keepdims=True)
        dx = jax.lax.dot_general(
            dz, w0, (((1,), (1,)), ((), ())), precision=_DOT_PREC, preferred_element_type=_F32
        )
        return dx, dw0_, db0_, dw1_, db1_

    for j in range(k):
        a_j = attn[j]
        dattn_j = g * vals[j]
        dlogits = a_j * (dattn_j - inner)
        dval = g * a_j

        du, gw0_d, gb0_d, gw1_d, gb1_d = mlp_bwd(
            dlogits, us[j], hgs[j], gw0, gw1
        )
        dgw0_a += gw0_d
        dgb0_a += gb0_d
        dgw1_a += gw1_d
        dgb1_a += gb1_d

        dpos = du + dval
        if not pos_only:
            dq_acc = dq_acc + du

        ddx, dw0_d, db0_d, dw1_d, db1_d = mlp_bwd(
            dpos, dxs[j], hds[j], dw0, dw1
        )
        ddw0_a += dw0_d
        ddb0_a += db0_d
        ddw1_a += dw1_d
        ddb1_a += db1_d

        dxyzq_acc = dxyzq_acc + ddx
        onehot = (lane == idxs[j]).astype(_F32)
        if proj_f:
            # dk_n = -du (u = q - k_n + pos), dv_n = dval; weight grads
            # accumulate in-kernel, the feature grad rides the ONE packed
            # scatter [-ddx into d_kv_xyz | df into d_feats]
            dk_n = -du
            dv_n = dval
            dwk_a += jax.lax.dot_general(
                frs[j], dk_n, (((0,), (0,)), ((), ())),
                precision=_DOT_PREC, preferred_element_type=_F32,
            )
            dwv_a += jax.lax.dot_general(
                frs[j], dv_n, (((0,), (0,)), ((), ())),
                precision=_DOT_PREC, preferred_element_type=_F32,
            )
            df_roll = jax.lax.dot_general(
                dk_n, wk_p, (((1,), (1,)), ((), ())),
                precision=_DOT_PREC, preferred_element_type=_F32,
            ) + jax.lax.dot_general(
                dv_n, wv_p, (((1,), (1,)), ((), ())),
                precision=_DOT_PREC, preferred_element_type=_F32,
            )  # (T, Wf), lanes >= F zero (zero weight rows)
            scat = _roll_left(df_roll, W - 8) - _pad_lanes(ddx, W)
            dxk_acc = dxk_acc + jax.lax.dot_general(
                onehot, scat, (((0,), (0,)), ((), ())),
                precision=_DOT_PREC, preferred_element_type=_F32,
            )
            continue
        # one packed scatter: [-ddx into d_kv_xyz | -du into dK]
        if pos_only:
            scat = ddx
        else:
            scat = _pad_lanes(ddx, W) + _roll_left(
                _pad_lanes(du, W), W - 8
            )
        dxk_acc = dxk_acc + jax.lax.dot_general(
            onehot, scat, (((0,), (0,)), ((), ())),
            precision=_DOT_PREC, preferred_element_type=_F32,
        ) * (-1.0)
        if not pos_only:
            dv_acc = dv_acc + jax.lax.dot_general(
                onehot, dval, (((0,), (0,)), ((), ())),
                precision=_DOT_PREC, preferred_element_type=_F32,
            )

    if has_global:
        a_g = attn[k]
        dattn_g = g * v_g
        dlogits_g = a_g * (dattn_g - inner)
        du_g, gw0_d, gb0_d, gw1_d, gb1_d = mlp_bwd(
            dlogits_g, u_g, hg_g, gw0, gw1
        )
        dgw0_a += gw0_d
        dgb0_a += gb0_d
        dgw1_a += gw1_d
        dgb1_a += gb1_d
        dq_acc = dq_acc + du_g
        dk_g = -jnp.sum(du_g, axis=0, keepdims=True)  # (1, D)
        dv_g = jnp.sum(g * a_g, axis=0, keepdims=True)
        dglob_acc = jnp.concatenate(
            [dk_g, dv_g, jnp.zeros((6, dk_g.shape[-1]), _F32)], axis=0
        )
        dglob_ref[0] += dglob_acc

    dxyzq_ref[0] = dxyzq_acc
    if proj_f:
        dq_ref[0] = dq_acc
        dv_out_ref[0] += dwk_a
        dglob_ref[0] += dwv_a
    elif not pos_only:
        dq_ref[0] = dq_acc
        dv_out_ref[0] += dv_acc
    else:
        dq_ref[0] = jnp.zeros_like(dq_ref[0])
    dxk_ref[0] += dxk_acc
    ddw0_ref[0] += ddw0_a
    ddb0_ref[0] += ddb0_a
    ddw1_ref[0] += ddw1_a
    ddb1_ref[0] += ddb1_a
    dgw0_ref[0] += dgw0_a
    dgb0_ref[0] += dgb0_a
    dgw1_ref[0] += dgw1_a
    dgb1_ref[0] += dgb1_a


def _pack_xk(kv_xyz, K_a, m_pad):
    """Build the packed gather table ``[coords hi(3)|lo(3)|pad(2) | K]``.

    The table is plain f32 (a bf16 TABLE dtype was measured and rejected —
    module docstring), but the one-hot gather matmul runs at
    ``Precision.DEFAULT``, whose single MXU pass truncates each operand to
    bf16-class.  A plainly-stored coordinate would come back with ~8
    mantissa bits and the position delta ``dx = query − neighbour`` — a
    difference of NEARBY points, that is what kNN selects — would lose
    most of its significance to cancellation.  The coords therefore ride
    as a Dekker-style two-way split in f32 lanes: ``hi`` is the coordinate
    rounded to bf16 (exactly representable, so the truncating MXU pass
    gathers it EXACTLY) and ``lo = coord − hi`` carries the next 8
    mantissa bits (its own bf16 truncation is ~2^-16 relative to the
    coordinate).  In interpreter mode nothing truncates and ``hi + lo``
    reconstructs the f32 coordinate bit-exactly (the split is exact).

    The kernel reconstructs ``dx = (xyzq − hi) + (−lo)`` from the gathered
    split (one 8-lane roll + add + mask per slot — see the comment in
    ``_attn_kernel`` for why that order, and not ``xyzq − (hi + lo)``,
    preserves the exact zero of the self-attention delta).  Feature (K)
    values keep plain truncation: ``q − k_n`` differs O(1), no
    cancellation structure.
    """
    B, M, _ = kv_xyz.shape
    xyz = kv_xyz.astype(_F32)
    hi = xyz.astype(jnp.bfloat16).astype(_F32)
    lo = xyz - hi
    xyz8 = jnp.pad(
        jnp.concatenate([hi, lo], axis=-1), ((0, 0), (0, m_pad - M), (0, 2))
    )
    if K_a is None:
        return xyz8, 8
    D = K_a.shape[-1]
    W = _round_up(8 + D, 128)
    K_p = jnp.pad(
        K_a.astype(_F32), ((0, 0), (0, m_pad - M), (0, W - 8 - D))
    )
    return jnp.concatenate([xyz8, K_p], axis=-1), W


def _split_w0(delta_w0, cast=None, dup=False):
    """Position-MLP input weights (3, D) → (1, 8, D), zero-padded.

    With ``dup=True`` rows 0-2 AND 3-5 both carry the weights: the kernel
    then feeds the raw split delta ``dxh = [xyzq−hi | −lo | 0 0]`` straight
    to the MLP and the first layer computes
    ``(xyzq−hi)·w + (−lo)·w = dx·w`` inside the dot's f32 accumulator —
    zero extra per-slot ops.  The summation order is NOT the XLA path's
    ``(xyzq−coord)·w`` bitwise, and in particular a self-attention query
    gathering itself loses the EXACT zero of its delta (the two cancelling
    products meet other partial sums first), which flips relu subgradients
    at zero-init biases — so ``dup`` is only for CROSS attention, where
    queries never coincide with keys (``exact_self=False``).  Self
    attention keeps ``dup=False`` + the explicit roll reconstruction in
    ``_attn_kernel``."""
    assert delta_w0.shape[0] == 3, delta_w0.shape
    w = delta_w0.astype(_F32) if cast is None else cast(delta_w0)
    if dup:
        return jnp.pad(jnp.concatenate([w, w], axis=0), ((0, 2), (0, 0)))[None]
    return jnp.pad(w, ((0, 5), (0, 0)))[None]


@partial(jax.jit, static_argnames=("k", "tile", "interpret", "return_idx",
                                   "compute_dtype", "save_residuals",
                                   "exact_self"))
def fused_vector_attention(
    xyz_q,
    kv_xyz,
    q_feats: Optional[jax.Array],
    K_a: Optional[jax.Array],
    V_a: Optional[jax.Array],
    delta_w0, delta_b0, delta_w1, delta_b1,
    gamma_w0, gamma_b0, gamma_w1, gamma_b1,
    k: int,
    tile: int = 256,
    interpret: bool = None,
    k_glob: Optional[jax.Array] = None,
    v_glob: Optional[jax.Array] = None,
    return_idx: bool = False,
    compute_dtype=None,
    kv_mask: Optional[jax.Array] = None,
    save_residuals: bool = False,
    exact_self: bool = True,
    kv_feats: Optional[jax.Array] = None,
    wk: Optional[jax.Array] = None,
    wv: Optional[jax.Array] = None,
):
    """Fused kNN vector attention (pre-residual, pre-norm).

    Args:
      xyz_q: (B, Nq, 3) query positions.
      kv_xyz: (B, M, 3) key/value positions (the kNN target set).
      q_feats: (B, Nq, D) projected query features, or None for pos_only.
      K_a / V_a: (B, M, D) projected key/value features (None for pos_only).
      delta_* / gamma_*: fc_delta / fc_gamma weights.
      k: neighbours per query (includes self when xyz_q == kv_xyz).
      k_glob / v_glob: optional (B, D) global-token key/value (an extra
        softmax slot with zero position encoding — the decoder
        CrossTransformerBlock pattern; requires q_feats).
      kv_mask: optional (B, M), nonzero = selectable.  Masked kv points are
        never chosen as neighbours (static-shape partial point clouds); the
        caller guarantees at least k selectable points per batch element.
      save_residuals: additionally return the packed per-slot residuals
        ``[dx | u | val]`` the Pallas backward consumes (requires
        return_idx; used by the custom-VJP training path).
      kv_feats / wk / wv: project-in-kernel mode (replaces K_a/V_a).
        ``kv_feats`` is the RAW (B, M, F) kv feature tensor and ``wk``/
        ``wv`` the (F, D) bias-free key/value projection kernels; the
        kernel gathers ONE packed ``[coords | feats]`` table per slot and
        projects K/V in-VMEM with small (T, F) x (F, D) dots — halving the
        dominant (T, M)-scale gather matmuls whenever
        ``round_up(8+F,128) < round_up(8+D,128) + round_up(D,128)``.
        Requires ``q_feats``; mutually exclusive with K_a/V_a and the
        global token; ``exact_self`` must stay True (the proj sites are
        the encoder's self-attention / set-abstraction blocks).
      exact_self: preserve the EXACT zero of a self-attention query's
        delta to itself (the roll reconstruction — see ``_attn_kernel``).
        Required whenever a query can coincide with a kv point (encoder
        self-attention, set abstraction around FPS centres).  Pass False
        for pure CROSS attention (the decoder: queries are field points,
        keys are anchors) — the split delta then feeds the position MLP
        directly through duplicated weight rows, saving the per-slot roll
        (~15% end-to-end inference on the decoder-dominated paths; the
        delta error stays ~2^-16 relative, same as the roll path on MXU).

    Returns:
      (B, Nq, D) float32 (plus idx and residuals when requested).
    """
    if save_residuals and not return_idx:
        raise ValueError("save_residuals requires return_idx")
    interpret = _resolve_interpret(interpret)
    B, Nq, _ = xyz_q.shape
    M = kv_xyz.shape[1]
    D = delta_w1.shape[-1]
    k = min(k, M)
    pos_only = q_feats is None
    has_global = k_glob is not None
    proj = kv_feats is not None
    if has_global and pos_only:
        raise ValueError("global token requires query features")
    if proj:
        if (wk is None) or (wv is None):
            raise ValueError("kv_feats requires wk and wv")
        if pos_only or K_a is not None or V_a is not None or has_global:
            raise ValueError(
                "project-in-kernel mode replaces K_a/V_a and excludes the "
                "global token"
            )
        if not exact_self:
            raise ValueError("project-in-kernel mode requires exact_self")
    proj_f = kv_feats.shape[-1] if proj else 0
    if pos_only and not exact_self:
        # pos_only is only used by self-attention sites; refuse a footgun
        raise ValueError("exact_self=False requires query features "
                         "(cross attention)")
    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else _F32
    # distances and coordinate deltas stay f32 (selection must be exact);
    # value-feature matmuls may run bf16 with f32 accumulation.
    cast = lambda x: x.astype(cd)

    tile = min(tile, _round_up(Nq, 128))
    q_pad = _round_up(Nq, tile)
    m_pad = _round_up(M, 128)
    n_tiles = q_pad // tile

    xyzq = jnp.pad(xyz_q.astype(_F32), ((0, 0), (0, q_pad - Nq), (0, 5)))
    kvt = jnp.pad(
        jnp.swapaxes(kv_xyz.astype(_F32), 1, 2),
        ((0, 0), (0, 5), (0, m_pad - M)),
    )
    if kv_mask is not None:
        from nsdp_tpu.ops.knn import mask_penalty

        kvt = kvt.at[:, 3, :].set(mask_penalty(kv_mask, m_pad))
    if proj:
        xk, w_lanes = _pack_xk(kv_xyz, kv_feats, m_pad)
    else:
        xk, w_lanes = _pack_xk(kv_xyz, None if pos_only else K_a, m_pad)
    if pos_only:
        qf = jnp.zeros((B, q_pad, 1), _F32)
        V_p = jnp.zeros((B, m_pad, 1), _F32)
        feat_d = 1
    elif proj:
        qf = jnp.pad(q_feats.astype(_F32), ((0, 0), (0, q_pad - Nq), (0, 0)))
        V_p = jnp.zeros((B, m_pad, 1), _F32)  # unused in proj mode
        feat_d = D
    else:
        qf = jnp.pad(q_feats.astype(_F32), ((0, 0), (0, q_pad - Nq), (0, 0)))
        V_p = jnp.pad(cast(V_a), ((0, 0), (0, m_pad - M), (0, 0)))
        feat_d = D

    dw0 = _split_w0(delta_w0, cast, dup=not exact_self)
    dw1 = cast(delta_w1)[None]
    gw0 = cast(gamma_w0)[None]
    gw1 = cast(gamma_w1)[None]
    db0 = delta_b0.astype(_F32)[None, None]
    db1 = delta_b1.astype(_F32)[None, None]
    gb0 = gamma_b0.astype(_F32)[None, None]
    gb1 = gamma_b1.astype(_F32)[None, None]

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    per_b = lambda shape: pl.BlockSpec(
        shape, lambda b, t: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )

    if proj:
        # glob slot carries the stacked K/V projection weights, each
        # zero-padded to the packed-table lane width (see _attn_kernel)
        wk_p = jnp.pad(cast(wk), ((0, w_lanes - proj_f), (0, 0)))
        wv_p = jnp.pad(cast(wv), ((0, w_lanes - proj_f), (0, 0)))
        glob = jnp.concatenate([wk_p, wv_p], axis=0)[None]  # (1, 2*Wf, D)
        glob_spec = pl.BlockSpec(
            (1, 2 * w_lanes, D), lambda b, t: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    elif has_global:
        glob = jnp.stack([k_glob, v_glob], axis=1).astype(_F32)
        glob = jnp.pad(glob, ((0, 0), (0, 6), (0, 0)))  # (B, 8, D)
        glob_spec = None
    else:
        glob = jnp.zeros((B, 8, feat_d), _F32)
        glob_spec = None

    out_shape = [jax.ShapeDtypeStruct((B, q_pad, D), _F32)]
    out_spec = [pl.BlockSpec(
        (1, tile, D), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )]
    if return_idx:
        kpad = _round_up(k, 128)
        out_shape.append(jax.ShapeDtypeStruct((B, q_pad, kpad), jnp.int32))
        out_spec.append(pl.BlockSpec(
            (1, tile, kpad), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ))
    if save_residuals:
        r_lanes = _res_lanes(k, D, pos_only, proj_f)
        out_shape.append(jax.ShapeDtypeStruct((B, q_pad, r_lanes), _F32))
        out_spec.append(pl.BlockSpec(
            (1, tile, r_lanes), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        ))

    out = pl.pallas_call(
        partial(
            _attn_kernel, k=k, m_valid=M, pos_only=pos_only,
            has_global=has_global, exact_self=exact_self, proj_f=proj_f,
        ),
        out_shape=tuple(out_shape) if len(out_shape) > 1 else out_shape[0],
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, 8), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            per_b((1, 8, m_pad)),
            per_b((1, m_pad, w_lanes)),
            pl.BlockSpec((1, tile, feat_d), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            per_b((1, m_pad, V_p.shape[-1])),
            glob_spec if glob_spec is not None else per_b((1, 8, feat_d)),
            const((1, 8, D)),
            const((1, 1, D)),
            const((1, D, D)),
            const((1, 1, D)),
            const((1, D, D)),
            const((1, 1, D)),
            const((1, D, D)),
            const((1, 1, D)),
        ],
        out_specs=tuple(out_spec) if len(out_spec) > 1 else out_spec[0],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xyzq, kvt, xk, qf, V_p, glob,
      dw0, db0, dw1, db1, gw0, gb0, gw1, gb1)
    if save_residuals:
        return out[0][:, :Nq], out[1], out[2]
    if return_idx:
        return out[0][:, :Nq], out[1]
    return out[:, :Nq]


@partial(jax.jit, static_argnames=("k", "tile", "interpret", "exact_self"))
def _fused_attention_bwd(
    xyz_q, kv_xyz, q_feats, K_a, V_a,
    delta_w0, delta_b0, delta_w1, delta_b1,
    gamma_w0, gamma_b0, gamma_w1, gamma_b1,
    g, idx, res,
    k: int,
    tile: int = 128,
    interpret: bool = None,
    k_glob=None,
    v_glob=None,
    exact_self: bool = True,
    kv_feats=None,
    wk=None,
    wv=None,
):
    """Pallas backward pass; returns grads for every differentiable input.

    ``idx`` and ``res`` are the kNN indices and packed per-slot residuals
    saved by the forward; the kv tables themselves are not needed (the
    xyz_q / kv_xyz / K_a / V_a arguments only provide shapes).
    ``exact_self`` must match the forward call: with False the saved
    residual is the raw split delta and ``dw0`` rides duplicated, so the
    fc_delta weight gradient folds rows 3-5 back onto 0-2.

    In project-in-kernel mode (``kv_feats``/``wk``/``wv`` given — must
    match the forward call) the returned tuple is
    ``(dxyzq, dkv_xyz, dq, dkv_feats, dwk, dwv, ddw0.., dgb1)``."""
    interpret = _resolve_interpret(interpret)
    B, Nq, _ = xyz_q.shape
    M = kv_xyz.shape[1]
    D = delta_w1.shape[-1]
    k = min(k, M)
    pos_only = q_feats is None
    has_global = k_glob is not None
    proj = kv_feats is not None
    proj_f = kv_feats.shape[-1] if proj else 0

    tile = min(tile, _round_up(Nq, 128))
    q_pad = _round_up(Nq, tile)
    m_pad = _round_up(M, 128)
    n_tiles = q_pad // tile
    if proj:
        w_lanes = _round_up(8 + proj_f, 128)
    else:
        w_lanes = 8 if pos_only else _round_up(8 + D, 128)
    r_lanes = res.shape[-1]

    g_p = jnp.pad(g.astype(_F32), ((0, 0), (0, q_pad - Nq), (0, 0)))
    kpad = idx.shape[-1]
    if idx.shape[1] != q_pad:  # forward may have used a different tile size
        idx = jnp.pad(idx, ((0, 0), (0, q_pad - idx.shape[1]), (0, 0)))
    if res.shape[1] != q_pad:
        res = jnp.pad(res, ((0, 0), (0, q_pad - res.shape[1]), (0, 0)))
    if pos_only:
        qf = jnp.zeros((B, q_pad, 1), _F32)
        feat_d = 1
    else:
        qf = jnp.pad(q_feats.astype(_F32), ((0, 0), (0, q_pad - Nq), (0, 0)))
        feat_d = D

    dw0 = _split_w0(delta_w0, dup=not exact_self)
    dw1 = delta_w1.astype(_F32)[None]
    gw0 = gamma_w0.astype(_F32)[None]
    gw1 = gamma_w1.astype(_F32)[None]
    db0 = delta_b0.astype(_F32)[None, None]
    db1 = delta_b1.astype(_F32)[None, None]
    gb0 = gamma_b0.astype(_F32)[None, None]
    gb1 = gamma_b1.astype(_F32)[None, None]

    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    per_b = lambda shape: pl.BlockSpec(
        shape, lambda b, t: (b,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    per_tile = lambda width: pl.BlockSpec(
        (1, tile, width), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )

    if proj:
        wk_p = jnp.pad(wk.astype(_F32), ((0, w_lanes - proj_f), (0, 0)))
        wv_p = jnp.pad(wv.astype(_F32), ((0, w_lanes - proj_f), (0, 0)))
        glob = jnp.concatenate([wk_p, wv_p], axis=0)[None]  # (1, 2*Wf, D)
        glob_in_spec = const((1, 2 * w_lanes, D))
        # the dv/dglob output slots carry the GLOBAL dwk/dwv accumulators
        # (rows >= F are junk from the wrapped-coord lanes, sliced below)
        dv_shape = jax.ShapeDtypeStruct((1, w_lanes, D), _F32)
        dv_spec = const((1, w_lanes, D))
        dglob_shape = jax.ShapeDtypeStruct((1, w_lanes, D), _F32)
        dglob_spec = const((1, w_lanes, D))
    else:
        if has_global:
            glob = jnp.stack([k_glob, v_glob], axis=1).astype(_F32)
            glob = jnp.pad(glob, ((0, 0), (0, 6), (0, 0)))
        else:
            glob = jnp.zeros((B, 8, feat_d), _F32)
        glob_in_spec = per_b((1, 8, feat_d))
        dv_shape = jax.ShapeDtypeStruct((B, m_pad, feat_d), _F32)
        dv_spec = per_b((1, m_pad, feat_d))
        dglob_shape = jax.ShapeDtypeStruct((B, 8, feat_d), _F32)
        dglob_spec = per_b((1, 8, feat_d))

    out_shapes = (
        jax.ShapeDtypeStruct((B, q_pad, 8), _F32),        # dxyzq
        jax.ShapeDtypeStruct((B, m_pad, w_lanes), _F32),  # dxk packed
        jax.ShapeDtypeStruct((B, q_pad, feat_d), _F32),   # dq
        dv_shape,                                         # dV | dwk (proj)
        dglob_shape,                                      # dglob | dwv (proj)
        jax.ShapeDtypeStruct((1, 8, D), _F32),            # ddw0
        jax.ShapeDtypeStruct((1, 1, D), _F32),            # ddb0
        jax.ShapeDtypeStruct((1, D, D), _F32),            # ddw1
        jax.ShapeDtypeStruct((1, 1, D), _F32),            # ddb1
        jax.ShapeDtypeStruct((1, D, D), _F32),            # dgw0
        jax.ShapeDtypeStruct((1, 1, D), _F32),            # dgb0
        jax.ShapeDtypeStruct((1, D, D), _F32),            # dgw1
        jax.ShapeDtypeStruct((1, 1, D), _F32),            # dgb1
    )
    out_specs = (
        per_tile(8),
        per_b((1, m_pad, w_lanes)),
        per_tile(feat_d),
        dv_spec,
        dglob_spec,
        const((1, 8, D)),
        const((1, 1, D)),
        const((1, D, D)),
        const((1, 1, D)),
        const((1, D, D)),
        const((1, 1, D)),
        const((1, D, D)),
        const((1, 1, D)),
    )

    outs = pl.pallas_call(
        partial(_attn_bwd_kernel, k=k, pos_only=pos_only,
                has_global=has_global, proj_f=proj_f),
        out_shape=out_shapes,
        grid=(B, n_tiles),
        in_specs=[
            per_tile(feat_d),
            glob_in_spec,
            const((1, 8, D)),
            const((1, 1, D)),
            const((1, D, D)),
            const((1, 1, D)),
            const((1, D, D)),
            const((1, 1, D)),
            const((1, D, D)),
            const((1, 1, D)),
            per_tile(D),
            per_tile(kpad),
            per_tile(r_lanes),
        ],
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(qf, glob,
      dw0, db0, dw1, db1, gw0, gb0, gw1, gb1, g_p, idx, res)

    (dxyzq, dxk, dq, dV, dglob,
     ddw0, ddb0, ddw1, ddb1, dgw0, dgb0, dgw1, dgb1) = outs

    # dup mode: the MLP-input gradient lands identically in lanes 0-2 and
    # 3-5 (both blocks of the duplicated dw0 are the same rows), so lanes
    # 0-2 of dxyzq/dxk still carry the full coordinate gradients; only the
    # WEIGHT gradient splits across the two row blocks and must fold back
    # (rows 0-2 accumulated (xyzq−hi)ᵀdz, rows 3-5 accumulated (−lo)ᵀdz —
    # their sum is the true dxᵀdz).
    ddw0_f = ddw0[0, :3] if exact_self else ddw0[0, :3] + ddw0[0, 3:6]
    if proj:
        return (
            dxyzq[:, :Nq, :3],
            dxk[:, :M, :3],
            dq[:, :Nq],
            dxk[:, :M, 8 : 8 + proj_f],  # d kv_feats
            dV[0, :proj_f],              # dwk (junk rows >= F sliced off)
            dglob[0, :proj_f],           # dwv
            ddw0_f, ddb0[0, 0], ddw1[0], ddb1[0, 0],
            dgw0[0], dgb0[0, 0], dgw1[0], dgb1[0, 0],
        )
    grads = (
        # the hi table entries are the pass-through of the kv coordinate
        # (lo has zero derivative under the cast-is-identity convention),
        # so lanes 0-2 of the packed-table gradient are the full d_kv_xyz
        dxyzq[:, :Nq, :3],
        dxk[:, :M, :3],
        None if pos_only else dq[:, :Nq],
        None if pos_only else dxk[:, :M, 8 : 8 + D],
        None if pos_only else dV[:, :M],
        ddw0_f, ddb0[0, 0], ddw1[0], ddb1[0, 0],
        dgw0[0], dgb0[0, 0], dgw1[0], dgb1[0, 0],
        dglob[:, 0] if has_global else None,
        dglob[:, 1] if has_global else None,
    )
    return grads


@partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18, 19))
def knn_vector_attention(
    xyz_q, kv_xyz, q_feats, K_a, V_a, k_glob, v_glob, kv_mask,
    delta_w0, delta_b0, delta_w1, delta_b1,
    gamma_w0, gamma_b0, gamma_w1, gamma_b1,
    k: int, tile: int = 128, interpret: bool = None,
    exact_self: bool = True,
):
    """Differentiable fused kNN vector attention (custom VJP, both passes in
    Pallas).  Same semantics as :func:`fused_vector_attention` (optionally
    with the global-token extra slot when ``k_glob``/``v_glob`` are given,
    and/or a ``kv_mask`` excluding kv points from selection); gradients match
    the gather-based XLA formulation (kNN indices are constants, as in the
    reference's ``no_grad`` neighbourhood search — the mask only shapes that
    constant selection, so the backward pass is unchanged)."""
    return fused_vector_attention(
        xyz_q, kv_xyz, q_feats, K_a, V_a,
        delta_w0, delta_b0, delta_w1, delta_b1,
        gamma_w0, gamma_b0, gamma_w1, gamma_b1,
        k=k, tile=tile, interpret=interpret,
        k_glob=k_glob, v_glob=v_glob, kv_mask=kv_mask,
        exact_self=exact_self,
    )


def _kva_fwd(
    xyz_q, kv_xyz, q_feats, K_a, V_a, k_glob, v_glob, kv_mask,
    delta_w0, delta_b0, delta_w1, delta_b1,
    gamma_w0, gamma_b0, gamma_w1, gamma_b1,
    k, tile, interpret, exact_self,
):
    out, idx, res = fused_vector_attention(
        xyz_q, kv_xyz, q_feats, K_a, V_a,
        delta_w0, delta_b0, delta_w1, delta_b1,
        gamma_w0, gamma_b0, gamma_w1, gamma_b1,
        k=k, tile=tile, interpret=interpret,
        k_glob=k_glob, v_glob=v_glob, kv_mask=kv_mask, return_idx=True,
        save_residuals=True, exact_self=exact_self,
    )
    residuals = (
        xyz_q, kv_xyz, q_feats, K_a, V_a, k_glob, v_glob, kv_mask,
        delta_w0, delta_b0, delta_w1, delta_b1,
        gamma_w0, gamma_b0, gamma_w1, gamma_b1, idx, res,
    )
    return out, residuals


def _kva_bwd(k, tile, interpret, exact_self, residuals, g):
    (xyz_q, kv_xyz, q_feats, K_a, V_a, k_glob, v_glob, kv_mask,
     delta_w0, delta_b0, delta_w1, delta_b1,
     gamma_w0, gamma_b0, gamma_w1, gamma_b1, idx, res) = residuals
    grads = _fused_attention_bwd(
        xyz_q, kv_xyz, q_feats, K_a, V_a,
        delta_w0, delta_b0, delta_w1, delta_b1,
        gamma_w0, gamma_b0, gamma_w1, gamma_b1,
        g, idx, res, k=k, tile=tile, interpret=interpret,
        k_glob=k_glob, v_glob=v_glob, exact_self=exact_self,
    )
    (dxyzq, dkvxyz, dq, dK, dV,
     ddw0, ddb0, ddw1, ddb1, dgw0, dgb0, dgw1, dgb1,
     dk_glob, dv_glob) = grads
    if kv_mask is None:
        dkv_mask = None
    elif jnp.issubdtype(kv_mask.dtype, jnp.floating):
        dkv_mask = jnp.zeros_like(kv_mask)
    else:
        # bool/int masks take a float0 cotangent under custom_vjp
        dkv_mask = jnp.zeros(kv_mask.shape, dtype=jax.dtypes.float0)
    return (
        dxyzq, dkvxyz, dq, dK, dV, dk_glob, dv_glob, dkv_mask,
        ddw0, ddb0, ddw1, ddb1, dgw0, dgb0, dgw1, dgb1,
    )


knn_vector_attention.defvjp(_kva_fwd, _kva_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17))
def knn_vector_attention_proj(
    xyz_q, kv_xyz, q_feats, kv_feats, wk, wv, kv_mask,
    delta_w0, delta_b0, delta_w1, delta_b1,
    gamma_w0, gamma_b0, gamma_w1, gamma_b1,
    k: int, tile: int = 128, interpret: bool = None,
):
    """Differentiable fused kNN vector attention, project-in-kernel mode.

    Same attention semantics as :func:`knn_vector_attention` with
    ``K_a = kv_feats @ wk`` and ``V_a = kv_feats @ wv`` (the reference's
    bias-free ``w_ks``/``w_vs`` projections, ``model/encoder/blocks.py``),
    but the kernel gathers the RAW feature table once per slot and projects
    K/V in VMEM — one (T, M)-scale gather matmul per slot forward and one
    packed scatter backward instead of two of each, plus HALF the saved
    residual traffic.  The win requires the raw feature width F to pack
    next to the coords no wider than the K table did (F == D sites); use
    :func:`kv_proj_profitable` for the call-site decision.  Always
    ``exact_self`` (the proj sites are self-attention / set-abstraction),
    no global token."""
    return fused_vector_attention(
        xyz_q, kv_xyz, q_feats, None, None,
        delta_w0, delta_b0, delta_w1, delta_b1,
        gamma_w0, gamma_b0, gamma_w1, gamma_b1,
        k=k, tile=tile, interpret=interpret, kv_mask=kv_mask,
        kv_feats=kv_feats, wk=wk, wv=wv,
    )


def _kva_proj_fwd(
    xyz_q, kv_xyz, q_feats, kv_feats, wk, wv, kv_mask,
    delta_w0, delta_b0, delta_w1, delta_b1,
    gamma_w0, gamma_b0, gamma_w1, gamma_b1,
    k, tile, interpret,
):
    out, idx, res = fused_vector_attention(
        xyz_q, kv_xyz, q_feats, None, None,
        delta_w0, delta_b0, delta_w1, delta_b1,
        gamma_w0, gamma_b0, gamma_w1, gamma_b1,
        k=k, tile=tile, interpret=interpret, kv_mask=kv_mask,
        kv_feats=kv_feats, wk=wk, wv=wv,
        return_idx=True, save_residuals=True,
    )
    residuals = (
        xyz_q, kv_xyz, q_feats, kv_feats, wk, wv, kv_mask,
        delta_w0, delta_b0, delta_w1, delta_b1,
        gamma_w0, gamma_b0, gamma_w1, gamma_b1, idx, res,
    )
    return out, residuals


def _kva_proj_bwd(k, tile, interpret, residuals, g):
    (xyz_q, kv_xyz, q_feats, kv_feats, wk, wv, kv_mask,
     delta_w0, delta_b0, delta_w1, delta_b1,
     gamma_w0, gamma_b0, gamma_w1, gamma_b1, idx, res) = residuals
    (dxyzq, dkvxyz, dq, dkv_feats, dwk, dwv,
     ddw0, ddb0, ddw1, ddb1, dgw0, dgb0, dgw1, dgb1) = _fused_attention_bwd(
        xyz_q, kv_xyz, q_feats, None, None,
        delta_w0, delta_b0, delta_w1, delta_b1,
        gamma_w0, gamma_b0, gamma_w1, gamma_b1,
        g, idx, res, k=k, tile=tile, interpret=interpret,
        kv_feats=kv_feats, wk=wk, wv=wv,
    )
    if kv_mask is None:
        dkv_mask = None
    elif jnp.issubdtype(kv_mask.dtype, jnp.floating):
        dkv_mask = jnp.zeros_like(kv_mask)
    else:
        dkv_mask = jnp.zeros(kv_mask.shape, dtype=jax.dtypes.float0)
    # custom_vjp cotangents must match the primal dtypes: unlike the
    # projected-table path (whose K_a/V_a inputs are flax-promoted to f32),
    # kv_feats/q_feats arrive in the model's compute dtype (bf16 under
    # ``compute_dtype: bfloat16``) while the kernel emits f32 grads.
    cast_to = lambda g, p: g.astype(p.dtype)
    return (
        cast_to(dxyzq, xyz_q), cast_to(dkvxyz, kv_xyz),
        cast_to(dq, q_feats), cast_to(dkv_feats, kv_feats),
        cast_to(dwk, wk), cast_to(dwv, wv), dkv_mask,
        cast_to(ddw0, delta_w0), cast_to(ddb0, delta_b0),
        cast_to(ddw1, delta_w1), cast_to(ddb1, delta_b1),
        cast_to(dgw0, gamma_w0), cast_to(dgb0, gamma_b0),
        cast_to(dgw1, gamma_w1), cast_to(dgb1, gamma_b1),
    )


knn_vector_attention_proj.defvjp(_kva_proj_fwd, _kva_proj_bwd)


def kv_proj_profitable(m: int, f: int, d: int) -> bool:
    """Should a featured attention site use project-in-kernel K/V?

    Gather-side MXU flops saved per slot: ``m_pad * saved_lanes`` rows
    (one (T, M) x (M, lanes) pass per 128 lanes); flops added: the two
    in-kernel (T, F) x (F, D) projections.  Require a 2x margin so the
    marginal sites (small kv sets, where the projection cost is not
    amortised over M) keep the projected-table path."""
    m_pad = _round_up(m, 128)
    saved = (_round_up(8 + d, 128) + _round_up(d, 128)
             - _round_up(8 + f, 128))
    return m_pad * saved >= 4 * f * d
