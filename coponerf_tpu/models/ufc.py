"""UFC feature & cost aggregation — the correspondence engine.

Parity target: models/aggregation.py:84-562.  Three coarse-to-fine stages
(16^2, 32^2, 64^2 feature grids) x [2, 2, 1] UFCLayers.  The correlation
volume is kept at 16^4 with 8 heads throughout (the strided Encoder4D
embeddings reduce finer correlations to 16^4); features and correlation are
refined jointly by linear attention, 4D-conv MLPs, and a dual-softmax cross
update, with residual upsampling across stages.  The final flows come from a
soft-argmax over the average of the three correlations upsampled to 64^4.

TPU layout: correlation volumes are FLATTENED to (B, L, Hq*Wq, Hs*Ws)
end-to-end — the reference's 6D layout leaves a 16/64-wide axis in the lane
dimension, which the (8,128) tiling pads 8x/2x in HBM.  Token layout is
row-major (B, H*W, C); feature maps are NHWC.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from coponerf_tpu.models.conv4d import Encoder4D
from coponerf_tpu.models.layers import Dense
from coponerf_tpu.ops.correlation import (
    l2_normalize_channels,
    soft_argmax_flat,
    unnormalise_and_convert_mapping_to_flow,
)
from coponerf_tpu.ops.resize import resize_bilinear


def _trunc_normal(std):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def linear_attention(q, k, v, eps: float = 1e-6):
    """'Transformers are RNNs' elu-kernel linear attention
    (models/aggregation.py:84-117).  q/k: (N, L, H, D); v: (N, S, H, V)."""
    Q = nn.elu(q) + 1.0
    K = nn.elu(k) + 1.0
    v_length = v.shape[1]
    values = v / v_length
    KV = jnp.einsum("nshd,nshv->nhdv", K, values)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    out = jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length
    return out


def correlation_tokens_flat(src_tokens: jnp.ndarray, trg_tokens: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Cosine correlation between token sequences (B, N, C) -> (B, 1, N, N).
    Normalization runs in f32 (stability under the bf16 volume pipeline; a
    no-op on the f32 path); the einsum runs in the input dtype."""
    dt = src_tokens.dtype
    src = l2_normalize_channels(src_tokens.astype(jnp.float32), eps).astype(dt)
    trg = l2_normalize_channels(trg_tokens.astype(jnp.float32), eps).astype(dt)
    return jnp.einsum("bnc,bmc->bnm", src, trg)[:, None]


def corr_to_feat_tokens(corr: jnp.ndarray, qhw: Tuple[int, int], shw: Tuple[int, int], feat_hw: Tuple[int, int]) -> jnp.ndarray:
    """(B, H, Q, S) -> tokens (B, feat_h*feat_w, H*S): flatten heads x target
    into channels over the source grid and resize."""
    b, h, Q, S = corr.shape
    x = jnp.swapaxes(corr, 2, 3).reshape(b, h * S, qhw[0], qhw[1])
    x = resize_bilinear(x, feat_hw, align_corners=True, axes=(-2, -1))
    x = x.reshape(b, h * S, feat_hw[0] * feat_hw[1])
    return jnp.swapaxes(x, 1, 2)


def feat_tokens_to_corr(tokens: jnp.ndarray, heads: int, src_hw: Tuple[int, int]) -> jnp.ndarray:
    """tokens (B, N, H, S) over an N=(h*w) source grid -> flattened
    correlation (B, H, src_h*src_w, S), resizing the source grid to src_hw."""
    b, n, h, S = tokens.shape
    grid = int(round(n ** 0.5))
    x = jnp.transpose(tokens, (0, 2, 3, 1)).reshape(b, h * S, grid, grid)
    x = resize_bilinear(x, src_hw, align_corners=True, axes=(-2, -1))
    x = x.reshape(b, h, S, src_hw[0] * src_hw[1])
    return jnp.swapaxes(x, 2, 3)


def interpolate4d_flat(corr: jnp.ndarray, qhw, shw, out_q, out_s, align_corners: bool = True) -> jnp.ndarray:
    """Resize a flattened volume (B, C, Q, S) on all four spatial axes, as the
    reference does in two 2D passes (models/aggregation.py:49-56)."""
    b, c, Q, S = corr.shape
    x = corr.reshape(b, c, Q, shw[0], shw[1])
    x = resize_bilinear(x, out_s, align_corners, axes=(-2, -1))
    x = x.reshape(b, c, Q, out_s[0] * out_s[1])
    x = x.reshape(b, c, qhw[0], qhw[1], out_s[0] * out_s[1])
    x = resize_bilinear(x, out_q, align_corners, axes=(2, 3))
    return x.reshape(b, c, out_q[0] * out_q[1], out_s[0] * out_s[1])


class TokenMLP(nn.Module):
    """Linear -> depthwise 3x3 conv (on the token grid) -> GELU -> Linear
    (models/aggregation.py:184-189 with DWConv:18-28)."""

    d_model: int
    hidden: int
    feat_hw: Tuple[int, int]
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        h, w = self.feat_hw
        x = Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = x.reshape(b, h, w, self.hidden)
        from coponerf_tpu.models.layers import torch_bias_init, torch_kernel_init

        x = nn.Conv(
            self.hidden,
            (3, 3),
            padding=1,
            feature_group_count=self.hidden,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(9),
            dtype=self.dtype,
            name="dwconv",
        )(x)
        x = x.reshape(b, n, self.hidden)
        x = nn.gelu(x, approximate=False)
        x = Dense(self.d_model, dtype=self.dtype, name="fc2")(x)
        return x


def _encoder4d_args(levels, k, s, p, groups):
    kk = (k, k, k, k)
    return dict(
        corr_levels=levels,
        kernel_size=tuple((kk,) * (len(levels) - 1)),
        stride=tuple(((s, s, s, s),) * (len(levels) - 1)),
        padding=tuple(((p, p, p, p),) * (len(levels) - 1)),
        group=groups,
    )


class UFCLayer(nn.Module):
    feat_dim: int = 256
    corr_size: int = 16
    d_model: int = 256
    nhead: int = 8
    expand_ratio: float = 4.0
    feat_size: Tuple[int, int] = (16, 16)
    feat_to_corr_kernel: int = 3
    feat_to_corr_stride: int = 1
    feat_to_corr_pad: int = 1
    dtype: Any = None  # compute dtype (params stay f32; norms keep f32 stats)
    conv4d_impl: str = "2d"  # Conv4d branch formulation (see models/conv4d.py)

    def setup(self):
        h = self.nhead
        dt = self.dtype
        c4i = self.conv4d_impl
        self.dim = self.d_model // h
        self.q_proj = Dense(self.d_model, dtype=dt, name="q_proj")
        self.k_proj = Dense(self.d_model, dtype=dt, name="k_proj")
        self.v_proj = Dense(self.d_model, dtype=dt, name="v_proj")
        self.v_proj_corr = Encoder4D(**_encoder4d_args((h, h), 3, 1, 1, (1,)), dtype=dt, impl=c4i, name="v_proj_corr")
        self.mlp = TokenMLP(self.d_model, int(self.d_model * self.expand_ratio), self.feat_size, dtype=dt, name="mlp")
        self.mlp_corr = Encoder4D(**_encoder4d_args((h, h * 4, h), 3, 1, 1, (1, 1)), dtype=dt, impl=c4i, name="mlp_corr")
        self.mlp_cross = TokenMLP(self.d_model, int(self.d_model * self.expand_ratio), self.feat_size, dtype=dt, name="mlp_cross")
        self.mlp_refine_corr = Encoder4D(**_encoder4d_args((h, h * 4, h), 3, 1, 1, (1, 1)), dtype=dt, impl=c4i, name="mlp_refine_corr")
        self.mlp_refine_corr2 = Encoder4D(**_encoder4d_args((h, h * 4, h), 3, 1, 1, (1, 1)), dtype=dt, impl=c4i, name="mlp_refine_corr2")
        f2c = _encoder4d_args((1, h), self.feat_to_corr_kernel, self.feat_to_corr_stride, self.feat_to_corr_pad, (1,))
        self.feat_to_corr1 = Encoder4D(**f2c, dtype=dt, impl=c4i, name="feat_to_corr1")
        self.feat_to_corr2 = Encoder4D(**f2c, dtype=dt, impl=c4i, name="feat_to_corr2")
        self.norm1 = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm1")
        self.norm2 = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm2")
        self.v_cross = Dense(self.d_model, dtype=dt, name="v_cross")
        self.norm_cross1 = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm_cross1")
        self.norm_cross2 = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="norm_cross2")
        self.pos_embed = self.param(
            "pos_embed", _trunc_normal(0.02), (1, self.feat_size[0] ** 2, 1, self.dim)
        )

    @property
    def _grid(self):
        return (self.corr_size, self.corr_size)

    def forward_attention(self, corr, feat):
        """Joint self-attention over [corr || feat] tokens that refines both
        the features and the correlation (models/aggregation.py:269-310).
        corr: (B, H, Q, S) flattened at the stage-0 grid."""
        B, H, Q, S = corr.shape
        g = self._grid
        feat_r = feat
        feat = self.norm1(feat)

        corr_tok = corr_to_feat_tokens(corr, g, g, self.feat_size)  # (B, N, H*S)
        cf = jnp.concatenate([corr_tok, feat], axis=-1)

        q0 = self.q_proj(cf).reshape(B, -1, self.nhead, self.dim)
        pe = self.pos_embed.astype(q0.dtype)
        query = q0 + pe
        key = self.k_proj(cf).reshape(B, -1, self.nhead, self.dim) + pe
        value_feat = self.v_proj(feat).reshape(B, -1, self.nhead, self.dim)

        vc, _, _ = self.v_proj_corr(corr, g, g)
        value_corr = corr_to_feat_tokens(vc, g, g, self.feat_size).reshape(
            B, self.feat_size[0] * self.feat_size[1], self.nhead, S
        )

        msg_feat = linear_attention(query, key, value_feat).reshape(B, -1, self.nhead * self.dim)
        msg_corr = linear_attention(query, key, value_corr)
        msg_corr = feat_tokens_to_corr(msg_corr, self.nhead, g)

        msg_feat = feat_r + msg_feat
        msg_corr = corr + msg_corr
        msg_feat = msg_feat + self.mlp(self.norm2(msg_feat))
        mc, _, _ = self.mlp_corr(msg_corr, g, g)
        msg_corr = msg_corr + mc
        return msg_corr, msg_feat

    def forward_cross(self, corr, feat2):
        """Dual-softmax cross-attention feature update
        (models/aggregation.py:312-340).  corr: (B, H, Q, S) flattened;
        feat2: (2B, N, C) = [src; trg] stacked along batch.  The shared-weight
        pool/norm/value/MLP stages run ONCE on the stack (the reference calls
        them per view); only the attention einsums split the halves.  Math is
        identical — batching a shared-weight module is a pure batch-axis
        concat."""
        B = corr.shape[0]
        hs = ws = self.corr_size
        fh, fw = self.feat_size
        p1, p2 = fh // hs, fw // ws
        B2 = feat2.shape[0]

        pooled = feat2.reshape(B2, hs, p1, ws, p2, self.d_model).mean(axis=(2, 4))
        pooled = pooled.reshape(B2, hs * ws, self.d_model)

        v = self.v_cross(self.norm_cross1(pooled)).reshape(B2, -1, self.nhead, self.dim)
        src_v, trg_v = v[:B], v[B:]

        # dual softmax in f32 (a no-op on the exact path); attention weights
        # re-cast to the value dtype for the contraction
        corr32 = corr.astype(jnp.float32)
        src_attn = jnp.einsum(
            "bhst,bthc->bshc", nn.softmax(corr32, axis=-1).astype(trg_v.dtype), trg_v
        ).reshape(B, -1, self.d_model)
        trg_attn = jnp.einsum(
            "bhst,bshc->bthc", nn.softmax(corr32, axis=-2).astype(src_v.dtype), src_v
        ).reshape(B, -1, self.d_model)

        attn2 = jnp.concatenate([src_attn, trg_attn], axis=0)
        attn2 = attn2.reshape(B2, hs, ws, self.d_model)
        attn2 = jnp.repeat(jnp.repeat(attn2, p1, axis=1), p2, axis=2).reshape(B2, -1, self.d_model)

        feat2 = feat2 + attn2
        feat2 = feat2 + self.mlp_cross(self.norm_cross2(feat2))
        return feat2

    def __call__(self, corr, feat2, refine_last_corr: bool = True):
        """corr: (B, H, Q, S); feat2: (2B, N, C) = [src; trg] stacked along
        batch.  The reference calls forward_attention twice with shared
        weights (aggregation.py:343-344); batching the two calls (and keeping
        the feature pair stacked through the whole layer) halves the op count
        of the shared-weight sections with identical numerics."""
        B = corr.shape[0]
        g = self._grid
        corr2 = jnp.concatenate([corr, jnp.swapaxes(corr, 2, 3)], axis=0)
        corr_out, feat2 = self.forward_attention(corr2, feat2)
        corr_r = corr_out[:B] + jnp.swapaxes(corr_out[B:], 2, 3)
        c_new, _, _ = self.feat_to_corr1(
            correlation_tokens_flat(feat2[:B], feat2[B:]), self.feat_size, self.feat_size
        )
        corr_r = corr_r + c_new
        mr, _, _ = self.mlp_refine_corr(corr_r, g, g)
        corr_r = corr_r + mr

        feat2 = self.forward_cross(corr_r, feat2)

        if refine_last_corr:
            c_new2, _, _ = self.feat_to_corr2(
                correlation_tokens_flat(feat2[:B], feat2[B:]), self.feat_size, self.feat_size
            )
            corr_r = corr_r + c_new2
            mr2, _, _ = self.mlp_refine_corr2(corr_r, g, g)
            corr_r = corr_r + mr2
        return corr_r, feat2


class _UFCScanBody(nn.Module):
    """lax.scan carry adapter around UFCLayer: carry = (corr, feat2)."""

    layer_kwargs: Any

    @nn.compact
    def __call__(self, carry, _):
        corr, ft2 = carry
        corr, ft2 = UFCLayer(**self.layer_kwargs, name="layer")(corr, ft2)
        return (corr, ft2), None


class UFC(nn.Module):
    """Three-stage coarse-to-fine aggregation (models/aggregation.py:358-562).

    Stage grid sizes derive from the input pyramid (16/32/64 for a 256^2
    image); works unchanged at other resolutions."""

    nhead: int = 8
    feat_dim: Sequence[int] = (256, 256, 256)
    layer_nums: Sequence[int] = (2, 2, 1)
    f2c_kernel: Sequence[int] = (3, 3, 5)
    f2c_stride: Sequence[int] = (1, 2, 4)
    f2c_pad: Sequence[int] = (1, 1, 2)
    remat: bool = True  # rematerialize layers under autodiff (activation memory)
    # "full": recompute everything in backward; "dots": keep matmul/einsum
    # outputs resident (jax.checkpoint_policies.dots_saveable), recompute
    # only conv/elementwise work
    remat_policy: str = "full"
    # compute dtype for the whole volume/token pipeline (params stay f32;
    # norm statistics, dual-softmax and the final flow correlations +
    # soft-argmax stay f32).  None = f32 everywhere (the parity path).
    dtype: Any = None
    conv4d_impl: str = "2d"  # Conv4d branch formulation (see models/conv4d.py)
    # Roll each stage's identical layers into ONE lax.scan over stacked
    # params: the layer body is traced/compiled once per stage instead of
    # once per layer, shrinking the encode HLO (~30k-op tail) and compile
    # time.  Runtime math is identical (same ops re-execute per iteration).
    # Param layout differs: layers_{s}_{i}/X becomes layers_{s}/layer/X with
    # a leading stacked axis — stack_ufc_params()/unstack_ufc_params()
    # convert, and tests pin loop-vs-scan output equality.
    scan_layers: bool = False
    # Extract both flow directions with the fused dual-axis Pallas
    # soft-argmax (2 streaming passes over the ~400 MB correlation instead of
    # ~14 + a full transpose; f32-round-off-equal, pinned in
    # tests/test_pallas_kernels.py).  Off = the jnp soft_argmax_flat pair.
    fused_argmax: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], nview: int = 2):
        """feats: 3 NHWC maps (B*nview, H, W, C), coarse to fine (x2 each).

        Returns (feat_list [3 NHWC maps (B*nview, H, W, 256)],
                 (flow, flow_flip, mapping_fwd, mapping_bwd),
                 c (B, 1, fineHW, fineHW) flattened correlation)."""
        B2 = feats[0].shape[0]
        B = B2 // nview
        stage_hw = [f.shape[1] for f in feats]
        if self.remat:
            import jax

            policy = (
                jax.checkpoint_policies.dots_saveable
                if self.remat_policy == "dots"
                else None
            )
            layer_cls = nn.remat(UFCLayer, policy=policy)
            scan_body_cls = nn.remat(_UFCScanBody, policy=policy)
        else:
            layer_cls = UFCLayer
            scan_body_cls = _UFCScanBody

        def stage_kwargs(s):
            return dict(
                feat_dim=self.feat_dim[s],
                corr_size=stage_hw[0],
                d_model=self.feat_dim[s],
                nhead=self.nhead,
                feat_size=(stage_hw[s], stage_hw[s]),
                feat_to_corr_kernel=self.f2c_kernel[s],
                feat_to_corr_stride=self.f2c_stride[s],
                feat_to_corr_pad=self.f2c_pad[s],
                dtype=self.dtype,
                conv4d_impl=self.conv4d_impl,
            )

        if self.scan_layers:
            # one scan per stage over stacked layer params (compile-time /
            # HLO-size lever; runtime ops are unchanged)
            def make_stage(s):
                n = self.layer_nums[s]
                scanned = nn.scan(
                    scan_body_cls,
                    variable_axes={"params": 0},
                    split_rngs={"params": True},
                    length=n,
                )(stage_kwargs(s), name=f"layers_{s}")

                def run(corr, ft2, scanned=scanned):
                    (corr, ft2), _ = scanned((corr, ft2), None)
                    return corr, ft2

                return run
        else:
            def make_stage(s):
                mods = [
                    layer_cls(**stage_kwargs(s), name=f"layers_{s}_{i}")
                    for i in range(self.layer_nums[s])
                ]

                def run(corr, ft2, mods=mods):
                    for m in mods:
                        corr, ft2 = m(corr, ft2)
                    return corr, ft2

                return run

        stage_runs = [make_stage(s) for s in range(3)]
        embedding = [
            Encoder4D(
                **_encoder4d_args((1, self.nhead), self.f2c_kernel[s], self.f2c_stride[s], self.f2c_pad[s], (1,)),
                dtype=self.dtype,
                impl=self.conv4d_impl,
                name=f"embedding_{s}",
            )
            for s in range(3)
        ]
        proj_feat = [Dense(self.feat_dim[s], dtype=self.dtype, name=f"proj_feat_{s}") for s in range(3)]

        # token stacks (2B, N, C) = [all src; all trg]: shared-weight modules
        # (projections, layer MLPs, norms) run ONCE on the stack end-to-end
        tok2 = []
        for i, f in enumerate(feats):
            h, w, c = f.shape[1:]
            fv = f.reshape(B, nview, h, w, c)
            pair = jnp.concatenate([fv[:, 0], fv[:, 1]], axis=0).reshape(B2, h * w, c)
            tok2.append(nn.relu(proj_feat[i](pair)))

        def interp_tokens(tokens, out_hw):
            b, n, c = tokens.shape
            g = int(round(n ** 0.5))
            x = tokens.reshape(b, g, g, c)
            x = resize_bilinear(x, out_hw, align_corners=True, axes=(1, 2))
            return x.reshape(b, out_hw[0] * out_hw[1], c)

        feat_list = []
        correlations = []
        corr_res = None
        ft2_prev = None
        for s in range(3):
            hw = stage_hw[s]
            ft2 = tok2[s]
            # the per-stage correlation uses the RAW projected level features
            # (aggregation.py:532,542); the residual feature upsampling is
            # added separately (aggregation.py:535-536,545-546)
            corr = correlation_tokens_flat(ft2[:B], ft2[B:])
            corr, _, _ = embedding[s](corr, (hw, hw), (hw, hw))
            if corr_res is not None:
                corr = corr_res + corr
            if s > 0:
                ft2 = interp_tokens(ft2_prev, (hw, hw)) + ft2
            corr, ft2 = stage_runs[s](corr, ft2)
            corr_res = corr
            ft2_prev = ft2
            src, trg = ft2[:B], ft2[B:]
            stacked = jnp.stack([src, trg], axis=1).reshape(B2, hw, hw, self.feat_dim[s])
            feat_list.append(stacked)
            # flow correlations in f32: they feed soft-argmax, whose expected
            # coordinate is precision-sensitive (sub-pixel flow targets)
            correlations.append(
                (correlation_tokens_flat(src.astype(jnp.float32), trg.astype(jnp.float32)), hw)
            )

        fine = stage_hw[-1]
        # (a kron-structured flat resize that avoids the 5D intermediates was
        # measured-NEGATIVE here: encode fwd 142 -> 238 ms, compile 17 min —
        # the separable two-pass is the right resize; the tensor that
        # actually needed the flat layout was soft_argmax's 5D marginal,
        # handled by soft_argmax_flat below)
        ups = [
            interpolate4d_flat(x, (hw, hw), (hw, hw), (fine, fine), (fine, fine))
            for x, hw in correlations
        ]
        c = sum(ups) / len(ups)

        # flat soft-argmax: the 5D marginal formulation materializes
        # (B, hs, ws, h, w) buffers whose 64-wide lane dim pads 2x on ~400 MB
        # tensors — the largest train-step allocations (trace-verified).
        # mapping defined on the SOURCE grid, pointing into the target
        # (softmax over target tokens), and vice versa
        if self.fused_argmax:
            from coponerf_tpu.ops.pallas.soft_argmax import soft_argmax_both

            mapping_fwd, mapping_bwd = soft_argmax_both(c[:, 0])
        else:
            mapping_fwd = soft_argmax_flat(c[:, 0], axis=2)
            mapping_bwd = soft_argmax_flat(c[:, 0], axis=1)
        flow = unnormalise_and_convert_mapping_to_flow(mapping_fwd)
        flow_flip = unnormalise_and_convert_mapping_to_flow(mapping_bwd)

        return feat_list, (flow, flow_flip, mapping_fwd, mapping_bwd), c


# ------------------------------------------------------------------------- #
# Param-layout converters between the loop layout (layers_{s}_{i}/X) and the
# scan layout (layers_{s}/layer/X with a leading stacked axis).  Checkpoints
# are interchangeable through these; equality of the two layouts' outputs is
# pinned in tests/test_model.py::test_ufc_scan_matches_loop.
# ------------------------------------------------------------------------- #

def stack_ufc_params(ufc_params: dict, layer_nums: Sequence[int] = (2, 2, 1)) -> dict:
    """Loop-layout UFC param subtree -> scan layout (non-layer keys pass through)."""
    import jax

    out = {k: v for k, v in ufc_params.items() if not k.startswith("layers_")}
    for s, n in enumerate(layer_nums):
        per_layer = [ufc_params[f"layers_{s}_{i}"] for i in range(n)]
        out[f"layers_{s}"] = {
            "layer": jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per_layer)
        }
    return out


def unstack_ufc_params(ufc_params: dict, layer_nums: Sequence[int] = (2, 2, 1)) -> dict:
    """Scan-layout UFC param subtree -> loop layout (inverse of stack_ufc_params)."""
    import jax

    out = {k: v for k, v in ufc_params.items() if not k.startswith("layers_")}
    for s, n in enumerate(layer_nums):
        stacked = ufc_params[f"layers_{s}"]["layer"]
        for i in range(n):
            out[f"layers_{s}_{i}"] = jax.tree.map(lambda x, i=i: x[i], stacked)
    return out
