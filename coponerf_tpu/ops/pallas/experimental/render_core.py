"""Pallas TPU megakernel: the full post-sampling render core.

Fuses, per ray block, everything between the epipolar feature samples and
the light-field decoder input (reference CoPoNeRF.py:384-485 with the
linear-map deferral of models/coponerf.py):

  pre_p = relu([s_p || tanh(pt_p/5)] @ W1 + b1)        (per-sample, 832)
  pre_s = relu([s_s || tanh(pt_s/5)] @ W1 + b1)
  kpre  = pre_p @ fk_a + viewswap(pre_s @ fk_b) + bias
  kv    = key_map_2(relu(kpre));  ce = query_embed chain(lc)
  w1    = softmax_{v,s}(sum(kv * ce) / 11.31)          (joint over V*S)
  ua/ub = sum_{v,s} w1 * pre_{p,s}   ->  z1 = ua@flv_a + ub@flv_b + bias
  ze    = encode_latent(z1); round 2 (repeat_embed chain) -> w2 -> z2
  z_sum = z2 + V * z1

The 832-wide pre-activations live only in VMEM: at 16k-ray chunks the
XLA path writes + re-reads ~21 GB of them per chunk (~100 ms/image at HBM
bandwidth), which this kernel eliminates along with the per-op overhead of
the 128-wide attention chains.

Token order: SAMPLE-MAJOR (token = s*N + n) per row, rows = B*V.
Forward-only (the smaj eval fast path); training keeps the XLA path.

MEASURED RESULT (v5e, 256^2 eval protocol): 83.4k rays/s at nb=8 (80.6k at
nb=16) vs 92.9k for the split-kernel path (W1 kernel + XLA attention +
weighted-sum kernel).  The fused block's long serial dependency chain
(W1_p -> W1_s -> keys -> softmax -> wsum -> round 2) pipelines worse across
the chunk than independent kernels, outweighing the ~100 ms/image of
pre-activation HBM traffic it eliminates.  Kept OPT-IN
(COPONERF_RENDER_CORE=1) as the starting point for a pipelined rewrite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SCALE = 1.0 / 11.31
_SPLITS = (256, 256, 256, 64)  # UFC levels + conv_map channels


def _kernel(
    s0p, s1p, s2p, scp, ptp,
    s0s, s1s, s2s, scs, pts,
    lc,
    w1, w1b, fka, fkb, fkbias, wk2, bk2, wq, bq, wq2, bq2,
    wra, wrb, brr, wr2, br2, wenc, benc, flva, flvb, flvbias,
    zsum_ref, atwt_ref,
    *, B, V, S, nb,
):
    VS = V * S
    tok = VS * nb
    H = 128

    def w1_pre(parts, pt):
        """relu(concat(parts, tanh(pt/5)) @ W1 + b1) per batch row set."""
        acc = None
        off = 0
        for ref, C in zip(parts, _SPLITS):
            x = ref[:].reshape(B * tok, C)
            part = jax.lax.dot_general(
                x, w1[pl.ds(off, C), :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
            off += C
        t = jnp.tanh(pt[:].reshape(B * tok, 3).astype(jnp.float32) / 5.0)  # pt bf16 in
        for j in range(3):
            acc = acc + t[:, j:j + 1] * w1[off + j, :].astype(jnp.float32)[None, :]
        acc = acc + w1b[0].astype(jnp.float32)
        # bf16 residency: two f32 pre tiles + inputs + weights overflow the
        # ~16 MB VMEM budget at nb=8
        return jnp.maximum(acc, 0.0).astype(jnp.bfloat16)  # (B*tok, 832)

    pre_p = w1_pre((s0p, s1p, s2p, scp), ptp)
    pre_s = w1_pre((s0s, s1s, s2s, scs), pts)

    def mm(x, w):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def flip_v(x, m, c):
        """reverse the V axis of (B, V, m, c) without lax.rev (unsupported
        in Mosaic): static slice + concat."""
        x4 = x.reshape(B, V, m, c)
        return jnp.concatenate([x4[:, V - 1 - v:V - v] for v in range(V)], axis=1)

    ka = mm(pre_p, fka)                                    # (B*tok, 128)
    kb = mm(pre_s, fkb)
    kb_sw = flip_v(kb, S * nb, H).reshape(B * tok, H)
    kpre = ka + kb_sw + fkbias[0].astype(jnp.float32)
    kv = mm(jnp.maximum(kpre, 0.0), wk2) + bk2[0].astype(jnp.float32)

    lcf = lc[:].reshape(B * tok, lc.shape[-1])
    ce = mm(jnp.maximum(mm(lcf, wq) + bq[0].astype(jnp.float32), 0.0), wq2)
    ce = ce + bq2[0].astype(jnp.float32)

    # attention math runs per batch row in 2-D (VS, nb) tiles: 3-D shapes
    # with an 8-wide minor dim trip Mosaic relayouts ("non-singleton logical
    # dimension is replicated"), and B is 1-2 at eval
    def joint_softmax_b(db):
        """(VS, nb) logits -> (nb, VS) softmax over VS.  Runs in the
        (nb, VS) orientation: lane-axis reductions and sublane-vector
        broadcasts are the layouts Mosaic handles natively (8-lane vectors
        broadcast over sublanes trip "replicated dimension" relayouts)."""
        t = jnp.swapaxes(db, 0, 1)                          # (nb, VS)
        m = jnp.max(t, axis=-1, keepdims=True)
        e = jnp.exp(t - m)
        return e / jnp.sum(e, axis=-1, keepdims=True)

    def flip_v2(a):
        """(VS, nb): reverse the leading V grouping (no lax.rev in Mosaic)."""
        a3 = a.reshape(V, S, nb)
        return jnp.concatenate([a3[V - 1 - v:V - v] for v in range(V)], axis=0).reshape(VS, nb)

    def z_of(ats):
        """ats: list of B (nb, VS) weight tiles -> (B*nb, 416)."""
        zs = []
        for b in range(B):
            at = jnp.swapaxes(ats[b], 0, 1)                 # (VS, nb)
            at_sw = flip_v2(at)
            pp = pre_p.reshape(B, VS, nb, -1)[b].astype(jnp.float32)
            ps = pre_s.reshape(B, VS, nb, -1)[b].astype(jnp.float32)
            ua = jnp.sum(pp * at[:, :, None], axis=0)              # (nb, 832)
            ub = jnp.sum(ps * at_sw[:, :, None], axis=0)
            zs.append(mm(ua, flva) + mm(ub, flvb) + flvbias[0].astype(jnp.float32))
        return jnp.concatenate(zs, axis=0)                          # (B*nb, 416)

    def logits_all(q):
        """q: (B*tok, H) -> B x (VS, nb) logits.  The reduce runs on the
        3-D (VS, nb, H) view: flattening to 1-D and reshaping to (VS, nb)
        is a lane->sublane regroup Mosaic cannot relayout."""
        prod = q * ce
        return [
            jnp.sum(prod.reshape(B, VS, nb, H)[b], axis=-1) * _INV_SCALE
            for b in range(B)
        ]

    at1 = [joint_softmax_b(d) for d in logits_all(kv)]     # B x (VS, nb)
    z1 = z_of(at1)                                         # (B*nb, 416)

    ze = mm(z1, wenc) + benc[0].astype(jnp.float32)        # (B*nb, 128)
    ze_tok = jnp.concatenate(
        [jnp.broadcast_to(ze[b * nb:(b + 1) * nb][None], (VS, nb, H)).reshape(tok, H) for b in range(B)],
        axis=0,
    )
    h2 = mm(ze_tok, wra) + mm(lcf, wrb) + brr[0].astype(jnp.float32)
    qre = mm(jnp.maximum(h2, 0.0), wr2) + br2[0].astype(jnp.float32)
    at2 = [joint_softmax_b(d) for d in logits_all(qre)]
    z_sum = z_of(at2) + V * z1                             # (B*nb, 416)

    zsum_ref[:] = z_sum.reshape(B, nb, -1).astype(zsum_ref.dtype)
    for b in range(B):
        atwt_ref[b] = at1[b].astype(atwt_ref.dtype)         # (nb, VS)


def render_core(
    samples_p, pt_p, samples_s, pt_s, lc,
    w1, w1b, fka, fkb, fk_bias, wk2, bk2, wq, bq, wq2, bq2,
    wra, wrb, brr, wr2, br2, wenc, benc, flva, flvb, flv_bias,
    S: int, V: int, n_rays: int, nb: int = 8,
):
    """samples_p/s: lists of 4 level tensors (R, S*N, C_l) bf16 sample-major;
    pt_p/s: (R, S*N, 3); lc: (R, S*N, 16).  R = B*V.
    Returns (z_sum (B, N, 416) f32, at_wt (B, N, V*S) f32)."""
    R = samples_p[0].shape[0]
    B = R // V
    N = n_rays
    H = 128
    kd = jnp.bfloat16

    def tok4(t):
        return t.reshape(R, S, N, t.shape[-1])

    sp = [tok4(t) for t in samples_p]
    ss = [tok4(t) for t in samples_s]
    # narrow f32 inputs (3- and 16-wide) pad to 128 lanes in VMEM: bf16
    # halves that residency
    ptp4, pts4 = tok4(pt_p.astype(kd)), tok4(pt_s.astype(kd))
    lc4 = tok4(lc.astype(kd))
    interpret = jax.default_backend() not in ("tpu", "axon")

    def tok_spec(c):
        return pl.BlockSpec((R, S, nb, c), lambda n: (0, 0, n, 0), memory_space=pltpu.VMEM)

    def w_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda n: (0, 0), memory_space=pltpu.VMEM)

    in_specs = (
        [tok_spec(c) for c in _SPLITS] + [tok_spec(3)]
        + [tok_spec(c) for c in _SPLITS] + [tok_spec(3)]
        + [tok_spec(lc.shape[-1])]
        + [
            w_spec(835, 832), w_spec(1, 832),                  # w1, w1b
            w_spec(832, H), w_spec(832, H), w_spec(1, H),      # fka, fkb, fkbias
            w_spec(H, H), w_spec(1, H),                        # wk2, bk2
            w_spec(lc.shape[-1], H), w_spec(1, H), w_spec(H, H), w_spec(1, H),  # wq, bq, wq2, bq2
            w_spec(H, H), w_spec(lc.shape[-1], H), w_spec(1, H), w_spec(H, H), w_spec(1, H),  # repeat chain
            w_spec(416, H), w_spec(1, H),                      # wenc, benc
            w_spec(832, 416), w_spec(832, 416), w_spec(1, 416),  # flva, flvb, flv_bias
        ]
    )
    z_sum, at_wt = pl.pallas_call(
        functools.partial(_kernel, B=B, V=V, S=S, nb=nb),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, 416), jnp.float32),
            jax.ShapeDtypeStruct((B, N, V * S), jnp.float32),
        ),
        grid=(N // nb,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((B, nb, 416), lambda n: (0, n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, nb, V * S), lambda n: (0, n, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # block working set ~20 MB (double-buffered sample inputs +
            # resident weights + bf16 pre tiles) exceeds the 16 MB scoped
            # default; v5e has headroom above it
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        *sp, ptp4, *ss, pts4, lc4,
        w1.astype(kd), w1b.reshape(1, -1),
        fka.astype(kd), fkb.astype(kd), fk_bias.reshape(1, -1),
        wk2.astype(kd), bk2.reshape(1, -1),
        wq.astype(kd), bq.reshape(1, -1), wq2.astype(kd), bq2.reshape(1, -1),
        wra.astype(kd), wrb.astype(kd), brr.reshape(1, -1),
        wr2.astype(kd), br2.reshape(1, -1),
        wenc.astype(kd), benc.reshape(1, -1),
        flva.astype(kd), flvb.astype(kd), flv_bias.reshape(1, -1),
    )
    return z_sum, at_wt
