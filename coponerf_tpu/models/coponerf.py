"""CoPoNeRF top module: joint correspondence + relative pose + light-field
novel view synthesis from an unposed stereo pair.

Parity target: models/CoPoNeRF.py:19-576.  The reference's implicit two-phase
structure (get_z at :159-206, forward at :208-576) is made explicit here:

    state = model.apply(vars, batch, method="encode")      # once per pair
    out   = model.apply(vars, batch, state, method="render")  # per ray chunk

which is also the natural jit/chunking boundary the reference exploits at
eval (test.py:173-196) and validation (wrapper.py:176-219).

Deliberately NOT replicated (dead code in the reference): corr_embed
(CoPoNeRF.py:73, never called), latent_avg_* heads (:89-93, never called),
the no_sample volumetric path (:28 hardcoded False), the crashing noess
branch (backbone.py:362-373), and the unused flow_interp_val secondary
sampling (:316-317, computed then dropped).

All feature maps are NHWC; sample tensors are (B*V, rays, samples, C).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from coponerf_tpu import flow as flow_ops
from coponerf_tpu import geometry as G
from coponerf_tpu.config import ModelConfig
from coponerf_tpu.models.cross_block import CrossBlock
from coponerf_tpu.models.layers import (
    Dense,
    MLPSeq,
    RawConv,
    RawDense,
    SplitDense,
    torch_bias_init,
    torch_kernel_init,
)
from coponerf_tpu.models.lightfield import ResnetFC
from coponerf_tpu.models.resnet import ResNet34Encoder
from coponerf_tpu.models.ufc import UFC

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


@flax.struct.dataclass
class SceneState:
    """Cached per-pair encoding: reused across ray chunks (the reference's
    (z, rel_pose, flow) triple, test.py:173).  Also carries the
    chunk-invariant upsampled-flow products that the reference recomputes in
    every forward (CoPoNeRF.py:230-236, utils.py:52-69) — hoisting them here
    changes no results, only removes per-chunk work."""

    z: Tuple[jnp.ndarray, ...]          # 4 NHWC latents (B*V, h, w, c)
    rel_pose: jnp.ndarray               # (B, 4, 4) estimated ctx1 -> ctx2
    flows: Tuple[jnp.ndarray, ...]      # (flow, flow_flip, mapping_fwd, mapping_bwd)
    mask_bwd: jnp.ndarray               # (B, up, up) cyclic-consistency mask (bwd)
    kps_flow_bwd: jnp.ndarray           # (B, 2, up, up) upsampled bwd flow for flow2kps
    # fast-path caches of the full-res (256^2) table, built once per pair
    # under cfg.fast_sampling (None otherwise): the bf16 cast for primary
    # border sampling and the view-row-swapped + 2-texel-zero-ring-padded
    # bf16 table for secondary zeros sampling.  Chunk-invariant: hoisting
    # them out of render() removes a per-chunk cast/pad HBM copy each.
    z0_bf16: Optional[jnp.ndarray] = None
    z0_pad_sw: Optional[jnp.ndarray] = None


class CoPoNeRF(nn.Module):
    cfg: ModelConfig = ModelConfig()

    def setup(self):
        c = self.cfg
        self.encoder = ResNet34Encoder(name="encoder")
        ufc_dt = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
        self.feature_cost_aggregation = UFC(
            nhead=c.corr_heads,
            remat=c.remat_ufc,
            remat_policy=c.remat_policy,
            conv4d_impl=c.conv4d_impl,
            layer_nums=tuple(c.ufc_layer_nums),
            dtype=ufc_dt,
            scan_layers=c.ufc_scan,
            fused_argmax=bool(c.fused_argmax),
            name="feature_cost_aggregation",
        )
        self.cross_attention = CrossBlock(name="cross_attention")
        self.pose_regressor = MLPSeq((512, 256, 256), act_last=True, name="pose_regressor")
        self.rotation_regressor = MLPSeq((64, 32, 6), act_first=True, name="rotation_regressor")
        self.translation_regressor = MLPSeq((64, 32, 3), act_first=True, name="translation_regressor")
        # RawConv = nn.Conv with identical param path/shapes/inits but a
        # readable kernel/bias, so the train path can fuse conv+sampling
        # into one custom VJP (ops/convmap_sample.py)
        self.conv_map = RawConv(
            64, (7, 7), in_features=3, padding=3, dtype=ufc_dt, name="conv_map",
        )

        latent = c.latent_dim            # 832
        half = latent // 2               # 416
        hid = c.hidden_dim               # 128
        cd = jnp.bfloat16 if c.compute_dtype == "bfloat16" else None
        # render-path Denses consume pre-split inputs (SplitDense = kernel
        # row-slices + partial sums): the multi-GB concats of per-level sample
        # tensors the reference materializes (CoPoNeRF.py:312,384-408) never
        # hit HBM.  Param trees are identical to plain Dense.
        # W1 as ONE concat-input matmul: a K-split accumulator chain re-reads
        # the (tokens, 832) partial four times (~2x the flop-bound time,
        # trace-verified); the single concat streams K once.  RawDense so the
        # render path can zero-pad the kernel rows to a lane-aligned 896
        self.query_encode_latent = RawDense(latent, in_features=latent + 3, name="query_encode_latent")
        # RawDense = Dense with identical param tree/inits but a readable
        # kernel: the render path FOLDS these three linear maps (W2 = encode
        # stage 2, latent_value, key_map) so nothing wider than 128 channels
        # is computed per epipolar sample after W1 — see render() for the
        # algebra.  Math is unchanged (linearity), only the evaluation order.
        self.query_encode_latent_2 = RawDense(half, in_features=latent, name="query_encode_latent_2")
        self.latent_value = RawDense(half, in_features=latent, name="latent_value")
        self.key_map = RawDense(hid, in_features=latent, name="key_map")
        # attention-chain Denses as RawDense (param trees identical, direct
        # kernel/bias access for kernel-fusion experiments — see
        # ops/pallas/experimental/attn_embed.py for the measured-negative
        # fused chain)
        self.key_map_2 = RawDense(hid, in_features=hid, dtype=cd, name="key_map_2")
        self.query_embed = RawDense(hid, in_features=16, name="query_embed")
        # stage-2 embed matmuls in the compute dtype: at f32 these were the
        # widest per-sample f32 writes left in the fast render (537 MB/chunk
        # each, trace r5); cd=None in the parity config so the exact path's
        # float op order is untouched.  Logit accumulation stays f32 at the
        # dot1/dots2 reductions below.
        self.query_embed_2 = RawDense(hid, in_features=hid, dtype=cd, name="query_embed_2")
        self.query_repeat_embed = RawDense(hid, in_features=hid + 16, name="query_repeat_embed")
        self.query_repeat_embed_2 = RawDense(hid, in_features=hid, dtype=cd, name="query_repeat_embed_2")
        self.encode_latent = RawDense(hid, in_features=half, name="encode_latent")
        self.phi = ResnetFC(
            d_in=c.n_view * 9, d_out=3, n_blocks=3, d_latent=half * c.n_view,
            d_hidden=c.num_hidden_units_phi, name="phi",
        )

    # ------------------------------------------------------------------ #
    # Phase 1: encode — features, correspondence, relative pose
    # ------------------------------------------------------------------ #

    def encode(self, batch: Dict[str, Any], train: bool = False) -> SceneState:
        ctx = batch["context"]
        rgb = ctx["rgb"]                               # (B, V, H, W, 3) in [-1, 1]
        B, V, H, W, _ = rgb.shape
        rgb = rgb.reshape(B * V, H, W, 3)
        rgb = (rgb + 1.0) / 2.0
        rgb = (rgb - IMAGENET_MEAN) / IMAGENET_STD

        cd = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        with jax.named_scope("encoder"):
            z_feats = self.encoder(rgb.astype(cd), train=train)
            if self.cfg.compute_dtype != "bfloat16":
                # exact path: UFC runs f32.  Under bf16 the UFC consumes the
                # encoder latents directly (its own compute dtype is bf16).
                z_feats = [z.astype(jnp.float32) for z in z_feats]
            z_conv = self.conv_map(rgb)

        with jax.named_scope("ufc"):
            feat_list, flows, c = self.feature_cost_aggregation(z_feats, V)

        intr = ctx["intrinsics"]
        intr_norm = intr.at[:, :, :2, :].set(intr[:, :, :2, :] / H)
        fx = intr_norm[:, 0, 0, 0][:, None]
        fy = intr_norm[:, 0, 1, 1][:, None]
        cx = intr_norm[:, 0, 0, 2][:, None]
        cy = intr_norm[:, 0, 1, 2][:, None]

        # pose head stays f32 (tokens may be bf16 under the fast config; pose
        # regression is the precision-sensitive output of the encode phase)
        tokens = feat_list[-1].reshape(B * V, -1, feat_list[-1].shape[-1]).astype(jnp.float32)
        with jax.named_scope("pose_head"):
            pose_feat = self.cross_attention(tokens, c, (fx, fy, cx, cy)).reshape(B, -1)

        pose_latent = self.pose_regressor(pose_feat)[:, :128]
        rot = self.rotation_regressor(pose_latent)
        tran = self.translation_regressor(pose_latent)
        R = G.r6d2mat(rot)[:, :3, :3]
        top = jnp.concatenate([R, tran[..., None]], axis=-1)
        bottom = jnp.broadcast_to(jnp.array([[0.0, 0.0, 0.0, 1.0]]), (B, 1, 4))
        rel_pose = jnp.concatenate([top, bottom], axis=1)

        z = tuple(feat_list) + (z_conv,)

        # chunk-invariant flow products (reference recomputes these per chunk):
        # cyclic-consistency mask with the reference's scale quirk
        # (CoPoNeRF.py:230-231: scale = up / image_W == 1 at 256), and the
        # geometrically-scaled upsampled bwd flow for flow2kps (utils.py:55)
        up = self.cfg.mask_upsample
        _, _, _, mask_bwd = flow_ops.cyclic_consistency_masks(
            flows[0], flows[1], out_size=up, scale=up / W
        )
        from coponerf_tpu.ops.resize import resize_nchw

        kps_flow_bwd = resize_nchw(flows[1], (up, up), align_corners=False) * (
            up / flows[1].shape[-2]
        )
        z0_bf16 = z0_pad_sw = None
        if self.cfg.fast_sampling:
            for zl in z:
                if zl.shape[1] * zl.shape[2] > 4096:  # the full-res table
                    z0_bf16 = zl.astype(jnp.bfloat16)
                    bv = zl.shape[0]
                    zsw = z0_bf16.reshape(bv // 2, 2, *zl.shape[1:])[:, ::-1]
                    z0_pad_sw = jnp.pad(
                        zsw.reshape(zl.shape), ((0, 0), (2, 2), (2, 2), (0, 0))
                    )
        return SceneState(
            z=z, rel_pose=rel_pose, flows=tuple(flows),
            mask_bwd=mask_bwd.astype(jnp.float32), kps_flow_bwd=kps_flow_bwd,
            z0_bf16=z0_bf16, z0_pad_sw=z0_pad_sw,
        )

    # ------------------------------------------------------------------ #
    # Phase 2: render — epipolar attention + light-field decoding
    # ------------------------------------------------------------------ #

    def render(
        self,
        batch: Dict[str, Any],
        state: SceneState,
        val: bool = False,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        ctx = batch["context"]
        query = batch["query"]
        B, V = ctx["rgb"].shape[:2]
        H, W = ctx["rgb"].shape[2:4]
        n_qry, n_rays = query["uv"].shape[1:3]
        S = cfg.npoints
        rel_pose = state.rel_pose
        flows = state.flows
        out: Dict[str, jnp.ndarray] = {"flow": flows}

        mask_bwd = state.mask_bwd  # precomputed in encode (chunk-invariant)

        ctx_c2w = ctx["cam2world"]
        inv_ctx = G.pose_inverse_4x4(ctx_c2w)
        context_cam2world = jnp.broadcast_to(jnp.eye(4), (B, V, 4, 4))
        if val:
            q1 = inv_ctx[:, 0:1] @ query["cam2world"]                     # GT pose wrt ctx1
            q2 = G.pose_inverse_4x4(rel_pose)[:, None] @ q1               # est-pose hypothesis
            query_cam2world = jnp.concatenate([q1, q2], axis=1)
        else:
            query_cam2world = inv_ctx @ query["cam2world"]                # (B, V, 4, 4)
        n_hyp = query_cam2world.shape[1]

        uv = jnp.broadcast_to(query["uv"], (B, n_hyp, n_rays, 2)).reshape(B * n_hyp, n_rays, 2)
        q_intr = jnp.broadcast_to(query["intrinsics"], (B, n_hyp, 4, 4)).reshape(B * n_hyp, 4, 4)
        qc2w_flat = query_cam2world.reshape(B * n_hyp, 4, 4)
        lf_coords = G.plucker_embedding(qc2w_flat, uv, q_intr)            # (B*V, N, 6)

        # epipolar segments in each context image
        ctx_intr = ctx["intrinsics"]
        intr_norm = ctx_intr.at[:, :, :2, :].set(ctx_intr[:, :, :2, :] / H)
        cam_origin = G.get_ray_origin(qc2w_flat)[:, None, :]
        cam_origin = jnp.broadcast_to(cam_origin, (B * n_hyp, n_rays, 3))
        ray_dir = lf_coords[..., :3]
        eye = jnp.broadcast_to(jnp.eye(4), (B * n_hyp, 4, 4))
        proj = G.project_rays(cam_origin, ray_dir, eye, intr_norm.reshape(B * V, 4, 4))

        valid_mask = proj["overlaps_image"].astype(jnp.float32)           # (B*V, N)
        start = jnp.nan_to_num((proj["xy_min"] - 0.5) * 2.0, nan=0.0, posinf=0.0, neginf=0.0)
        end = jnp.nan_to_num((proj["xy_max"] - 0.5) * 2.0, nan=0.0, posinf=0.0, neginf=0.0)

        # Latent sampling is always table-grad-only under autodiff: the
        # epipolar coordinates derive from GT poses (no parameters upstream),
        # and XLA's scatter-based gather transpose is a serial per-index loop
        # on TPU (~700ms/level) vs the MXU transpose kernel (~1-6ms).
        from coponerf_tpu.ops.pallas.bilinear_sample import (
            grid_sample_onehot,
            grid_sample_tablegrad,
        )

        # Token order: the eval fast path runs SAMPLE-MAJOR (token t = s*N + n
        # — fixed epipolar sample index, consecutive rays) so each sampler
        # point block covers image-adjacent points and the banded one-hot
        # kernels skip the table chunks outside a few-row band (measured
        # bands: <=3.5% of the table at 64^2, <=1.2% at 256^2).  Training
        # and the exact path stay ray-major.  Order only permutes tokens;
        # per-ray results are identical (reduction order aside).
        smaj = cfg.fast_sampling and not train

        # Two-stage coarse-to-fine epipolar sampling (the NeRF hierarchical
        # sampling idea applied to epipolar attention): stage A runs the FULL
        # exact pipeline at cfg.coarse_samples uniform positions; the round-1
        # logits locate the attention peak per (ray, view); stage B re-runs
        # the pipeline at cfg.fine_samples positions inside the bracketing
        # coarse interval.  Attention (both rounds) is a joint softmax over
        # the union, so the math per sample is EXACT — the approximation is
        # only in WHERE the segment is sampled (quality-gated in PARITY.md).
        # Throughput path only: selection is non-differentiable.
        two_stage = smaj and cfg.coarse_samples > 0 and cfg.fine_samples > 0
        S1 = cfg.coarse_samples if two_stage else S

        def tokf(t, S_):
            """(B*V, N, S_, C) -> (B*V, T, C) in the active token order."""
            if smaj:
                t = t.transpose(0, 2, 1, 3)
            return t.reshape(t.shape[0], n_rays * S_, -1)

        # encode-cached fast-path variants of the full-res table (the cast /
        # pad is chunk-invariant; see SceneState)
        use_z0_cache = smaj and state.z0_bf16 is not None

        if cfg.fast_sampling:
            def sample(z, p, mode):
                # banded one-hot for the <=64^2 levels under sample-major
                # order (3x on the 64^2 level); 256^2 stays a bf16 2x2-patch
                # gather — at that size even skipped band grid steps or
                # per-block band DMAs cost more than the gather (both
                # measured).  Everything emits bf16 (the consumers are the
                # bf16 encode Denses).  Under training the patch gather
                # keeps HBM headroom and exact table gradients.
                hw = z.shape[1] * z.shape[2]
                if smaj and hw <= 4096:
                    # block_p per level from the r5 exact-shape sweep
                    # (scripts/probe_r5_kernels.py): bigger point blocks
                    # amortize the per-grid-step overhead and table reload —
                    # 16^2: 1.72 -> 1.38 ms and 32^2: 2.63 -> 1.95 ms at
                    # bp=4096.  Caps: inside the full render graph (extra
                    # double-buffering vs the standalone probe) bp=8192 at
                    # 16^2 and bp=4096 at 64^2's bhw=1024 blow the ~16 MB
                    # scoped-vmem stack, so 64^2 keeps bp=2048.
                    return grid_sample_onehot(
                        z, p, padding_mode=mode, out_dtype=jnp.bfloat16,
                        banded=True, block_hw=max(256, hw // 4),
                        block_p=4096 if hw <= 1024 else 2048,
                    )
                if train and hw <= 4096 and cfg.train_onehot_small:
                    # training (ray-major tokens): the small levels use the
                    # NON-banded one-hot MXU sampler.  The XLA patch gather
                    # it replaces is cheap on the gather engine (~1.6 ms)
                    # but drags a per-site index/weight DMA army behind it
                    # (s32/f32[B*V, N*S, 1] coordinate-plane prefetch copies,
                    # ~4 ms elapsed EACH, trace r5) — the kernel consumes two
                    # flat (B*V, P) f32 vectors instead.  Backward is the
                    # same one-hot transpose matmul either way.
                    return grid_sample_onehot(
                        z, p, padding_mode=mode, out_dtype=jnp.bfloat16,
                        banded=False,
                    )
                # 256^2 stays the bf16 patch gather: it runs at the gather
                # engine's ~11 ns/index rate, and BOTH banded one-hot
                # formulations lose to it (grid-clamp: 421 ms; windowed
                # bulk-DMA blocks: ~2x the gather; measured) — see
                # ops/pallas/bilinear_sample.py for the kernels
                if use_z0_cache:
                    from coponerf_tpu.ops.grid_sample import grid_sample as _gs_plain

                    if mode == "border":
                        return _gs_plain(state.z0_bf16, p, "border")
                    return _gs_plain(state.z0_pad_sw, p, "zeros", prepadded=True)
                return grid_sample_tablegrad(z.astype(jnp.bfloat16), p, mode)
        else:
            def sample(z, p, mode):
                return grid_sample_tablegrad(z, p, mode)

        # primary features: all 4 latents sampled along the segments (border
        # pad).  Coordinates stay FLAT (B*V, T, 2) so sampler outputs keep
        # the row-major (rows, tokens, C) layout end-to-end — reshaping to
        # (..., N, S, C) before the matmuls costs ~130 ms/image in pure
        # relayout copies (trace-verified)
        # (measured-negative alternatives — a fused 3-level resident-table
        # sampler and a windowed 256^2 band sampler — live in
        # ops/pallas/experimental/ with their numbers; see PERF.md)
        # Training: the 256^2 conv_map level is sampled through the fused
        # conv+sample custom VJP — the sampling gradient routes straight to
        # the 7x7 conv kernel (weighted input patches at the sample anchors)
        # instead of materializing the (B*V, 65536, 64) table cotangent
        # (2 x ~35 ms one-hot transpose kernels/step, the largest train-step
        # items; see ops/convmap_sample.py).  Forward numerics identical.
        fuse_conv = train and cfg.convmap_direct_grad
        if fuse_conv:
            from coponerf_tpu.ops.convmap_sample import convmap_sample_pair

            rgb_n = ctx["rgb"].reshape(B * V, H, W, 3)
            rgb_n = ((rgb_n + 1.0) / 2.0 - IMAGENET_MEAN) / IMAGENET_STD

        def sample_all(p, mode):
            zs = state.z[:-1] if fuse_conv else state.z
            return [sample(z, p, mode) for z in zs]

        ctx_flat_c2w = context_cam2world.reshape(B * V, 4, 4)
        ctx_flat_intr = ctx_intr.reshape(B * V, 4, 4)

        # relative transforms into each context view (val: slot-2 uses the
        # estimated pose, CoPoNeRF.py:325-332)
        if val:
            ident = jnp.broadcast_to(jnp.eye(4), (B, 1, 4, 4))
            crel_v1 = jnp.concatenate([ident, rel_pose[:, None]], axis=1)
            crel_v2 = jnp.concatenate([G.pose_inverse_4x4(rel_pose)[:, None], ident], axis=1)
        else:
            crel_v1 = inv_ctx[:, 0:1] @ ctx_c2w
            crel_v2 = inv_ctx[:, 1:2] @ ctx_c2w

        intr_v1 = ctx_intr[:, 0]
        intr_v2 = ctx_intr[:, 1]

        # Per-view-row SE(3)/intrinsics tables so the per-sample geometry
        # stays in the flat (B*V) row layout end-to-end: row v transformed
        # into its OWN view (diag) or into the OTHER view (cross, natural
        # row order).  The old formulation sliced pt_view{1,2}[:, v] and
        # restacked four per-view tensors per stage — ~24 async DMA slices
        # per chunk at f32 (trace-verified); these tables remove all of them.
        crel_diag = jnp.concatenate([crel_v1[:, 0:1], crel_v2[:, 1:2]], axis=1)
        crel_other = jnp.concatenate([crel_v2[:, 0:1], crel_v1[:, 1:2]], axis=1)
        intr_other = jnp.stack([intr_v2, intr_v1], axis=1).reshape(B * V, 4, 4)
        # view-row-swapped latent tables: sampling them at natural-order
        # cross coordinates yields the secondary features directly in the
        # order they are consumed (the explicit [:, ::-1] flips downstream
        # become the identity).  ~20 MB of HBM copies per chunk (~25 us).
        z_sw = [
            z.reshape(B, V, *z.shape[1:])[:, ::-1].reshape(z.shape) for z in state.z
        ]

        def norm_px(p):
            x = (p[..., 0] / (W - 1)) * 2 - 1
            y = (p[..., 1] / (H - 1)) * 2 - 1
            return jnp.stack([x, y], axis=-1)

        scrub = lambda x: jnp.nan_to_num(x, nan=0.0, posinf=0.0, neginf=0.0)

        cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        # The reference's 4 encode calls (CoPoNeRF.py:384-408) stop at the
        # W1+relu pre-activations here.  Everything downstream of W1 is
        # LINEAR until the next nonlinearity, so the wide per-sample matmuls
        # are algebraically deferred (identical math, 64x fewer tokens):
        #   e_i = r_i @ W2 + b2                        (W2 = query_encode_latent_2)
        #   key_pre_v = [e_2v || e_2v+1] @ K + bk      (K = key_map)
        #             = r_2v @ (W2 Ka) + r_2v+1 @ (W2 Kb) + folded bias
        #   z_sum = sum_{v,s} w[v,s] * ([e_2v || e_2v+1] @ L + bl)
        #         = (sum ws*r_2v) @ (W2 La) + (sum ws*r_2v+1) @ (W2 Lb) + folded bias
        # (softmax weights sum to 1 over v,s, so the biases ride along exactly;
        # L = latent_value).  Per-sample work after W1 is one 832->128 matmul.
        #
        # W1 itself runs as ONE matmul per sample set over BOTH view rows
        # (per-view slicing before the matmul materializes 832-wide slices,
        # ~90 ms/image trace-verified), with the input concat LANE-ALIGNED:
        # the narrow conv(64)/tanh(3) pieces pack with zeros into one 128-wide
        # chunk and W1's kernel rows are zero-padded to match (exact math).
        w1_k = self.query_encode_latent.kernel                             # (835, 832)
        w1_b = self.query_encode_latent.bias
        from coponerf_tpu.ops.pallas.split_matmul import split_dense_relu

        half = cfg.latent_dim // 2
        w2_k = self.query_encode_latent_2.kernel                           # (832, 416)
        w2_b = self.query_encode_latent_2.bias                             # (416,)
        km_k, km_b = self.key_map.kernel, self.key_map.bias                # (832, 128)
        lv_k, lv_b = self.latent_value.kernel, self.latent_value.bias      # (832, 416)
        fk_a = w2_k @ km_k[:half]                                          # (832, 128)
        fk_b = w2_k @ km_k[half:]
        fk_bias = w2_b @ (km_k[:half] + km_k[half:]) + km_b
        flv_a = w2_k @ lv_k[:half]                                         # (832, 416)
        flv_b = w2_k @ lv_k[half:]
        flv_bias = w2_b @ (lv_k[:half] + lv_k[half:]) + lv_b

        def pre_act(samples, pts, fk, swap_k=False):
            t = jnp.tanh(pts / 5.0).astype(cd)
            parts = tuple(s.astype(cd) for s in samples) + (t,)
            return split_dense_relu(
                parts, w1_k, w1_b, fk, out_dtype=cd, relu=True, swap_k_pairs=swap_k
            )                                                              # (B*V, NS, 832|128)

        query_ray_orig = G.get_ray_origin(qc2w_flat)[:, None, None, :]

        # Fast-path query-embed split (exact linear algebra, fast configs
        # only so the parity path's float summation order is untouched).
        # local_coords channels (reference CoPoNeRF.py:411-446) are
        # [cam_rays 0:3 | cam_origin_zeros 3:6 | ray_dir 6:9 |
        #  depth_encode 9:13 | query_ray_orig 13:16]: only 7 of 16 vary per
        # SAMPLE; 6 vary per RAY (and 3 are zeros).  Splitting the embed
        # kernels by row block moves the per-ray channels to N-token matmuls
        # (S_x fewer tokens) and deletes the (rows, T, 16) concat per stage
        # — and, in the repeat round, the (rows, T, ze+16)-wide concat whose
        # f32 promotion made the round-2 embed the widest per-sample matmul
        # in the renderer.
        fast_embed = cfg.fast_sampling
        if fast_embed:
            _ps_rows = jnp.array([0, 1, 2, 9, 10, 11, 12])
            qe_k, qe_b = self.query_embed.kernel, self.query_embed.bias
            # per-sample kernel blocks in the compute dtype (the per-ray
            # pieces stay f32 — they live at N tokens, cheap); cd=f32 in
            # exact configs so the parity path is untouched
            qe_ps, qe_rd, qe_qo = qe_k[_ps_rows].astype(cd), qe_k[6:9], qe_k[13:16]
            qro_row = query_ray_orig[:, :, 0, :]                           # (B*V, 1, 3)
            pre1_ray = (ray_dir @ qe_rd + qro_row @ qe_qo + qe_b).astype(cd)  # (B*V, N, 128)
            if cfg.repeat_attention:
                qre_k, qre_b = (
                    self.query_repeat_embed.kernel,
                    self.query_repeat_embed.bias,
                )
                ze_dim = qre_k.shape[0] - 16
                qre_z = qre_k[:ze_dim]
                qre_ps = qre_k[ze_dim + _ps_rows].astype(cd)
                qre_rd, qre_qo = qre_k[ze_dim + 6: ze_dim + 9], qre_k[ze_dim + 13:]
                pre2_ray = ray_dir @ qre_rd + qro_row @ qre_qo + qre_b     # (B*V, N, 128)

        def add_perray(tok, per_ray, S_):
            """tok (B*V, T, C) + per-ray (B*V, N, C) broadcast in token order."""
            R = tok.shape[0]
            if smaj:
                t4 = tok.reshape(R, S_, n_rays, -1)
                pr4 = per_ray[:, None]
            else:
                t4 = tok.reshape(R, n_rays, S_, -1)
                pr4 = per_ray[:, :, None]
            return (t4 + pr4).reshape(tok.shape)

        def run_stage(tvals, S_):
            """Everything per-sample for one sampling stage.  tvals: (S_,) or
            (B*V, N, S_) fractional positions along the epipolar segment.

            Sample-set row layout (matches the samplers' view rows):
              pre_p rows: [primary view 1,                primary view 2]
              pre_s rows: [secondary: v1 pts @ view 2,    secondary: v2 pts @ view 1]
            i.e. chain v's slots both live in ROW v (natural cross order) —
            slot-a keys come from pre_p, slot-b keys from pre_s, same row.
            The folded key product rides out of the W1 kernel while the
            activation is in VMEM."""
            pixel_val = start[:, :, None, :] + (end - start)[:, :, None, :] * tvals[..., None]
            pv_flat = tokf(pixel_val, S_)
            # primary features: all 4 latents sampled along the segments
            # (border pad).  Coordinates stay FLAT (B*V, T, 2) so sampler
            # outputs keep the row-major (rows, tokens, C) layout end-to-end
            samples_p = sample_all(pv_flat, "border")

            # 3D point on the query ray nearest to each epipolar sample
            pt, _, _, _ = G.get_3d_point_epipolar(
                lf_coords, pixel_val, ctx_flat_c2w, H, W, ctx_flat_intr
            )
            # own-view (primary) and cross-view (secondary) coordinates in
            # flat row layout: row v of pt_cross is row v's point in the
            # OTHER view's frame.  Natural cross order means samples_s /
            # pt_secondary come out with view rows already flipped relative
            # to the old [pt_v1_c2, pt_v2_c1] stacking — exactly the order
            # the consumers (kpre sum, weighted_latent slot-b) need, so the
            # explicit [:, ::-1] flips there are gone (reference analogue
            # of the flip: CoPoNeRF.py:336-373 cross-view reprojection).
            pt_own = G.encode_relative_point(pt, crel_diag)
            pt_cross = G.encode_relative_point(pt, crel_other)
            px_cross = norm_px(
                G.project(pt_cross[..., 0], pt_cross[..., 1], pt_cross[..., 2], intr_other)[..., :2]
            )
            # secondary (cross-view reprojected) features, zeros padding,
            # sampled from the view-row-swapped tables
            px_flat = tokf(px_cross, S_)
            zsw_levels = z_sw[:-1] if fuse_conv else z_sw
            samples_s = [sample(z, px_flat, "zeros") for z in zsw_levels]
            if fuse_conv:
                sp_conv, ss_conv = convmap_sample_pair(
                    rgb_n, self.conv_map.kernel, self.conv_map.bias,
                    pv_flat, px_flat,
                    cfg.compute_dtype == "bfloat16", cfg.fast_sampling,
                )
                samples_p = samples_p + [sp_conv]
                samples_s = samples_s + [ss_conv]

            pt_primary = tokf(jax.lax.stop_gradient(scrub(pt_own)), S_)
            pt_secondary = tokf(scrub(pt_cross), S_)

            pre_p, ka = pre_act(samples_p, pt_primary, fk_a)
            pre_s, kb = pre_act(samples_s, pt_secondary, fk_b)
            # token-grid shape in the active order
            tg_ = (B, V, S_, n_rays) if smaj else (B, V, n_rays, S_)
            # no view flip on kb: samples_s/pt_secondary are already in the
            # natural cross row order (see above)
            kpre = (
                ka.reshape(*tg_, -1)
                + kb.reshape(*tg_, -1)
                + fk_bias.astype(cd)
            )
            kv_bv = self.key_map_2(nn.relu(kpre))                          # (*tg_, 128)

            cam_rays = G.get_ray_directions_cam(pixel_val, ctx_flat_intr, H, W)
            ray_dir_s = jnp.broadcast_to(ray_dir[:, :, None, :], cam_rays.shape)
            query_ray_orig_ex = jnp.broadcast_to(query_ray_orig, cam_rays.shape)

            depth = jnp.linalg.norm(pt - query_ray_orig, axis=-1)[..., None]
            depth = jnp.nan_to_num(depth, nan=1e6, posinf=1e6, neginf=1e6)
            depth = jax.lax.stop_gradient(depth)
            depth_encode = jnp.concatenate(
                [jnp.tanh(depth), jnp.tanh(depth / 10.0), jnp.tanh(depth / 100.0), jnp.tanh(depth / 1000.0)],
                axis=-1,
            )

            if fast_embed:
                # per-sample channels only (7 of 16); per-ray channels ride
                # in pre1_ray via the split kernels above
                ps_tok = tokf(
                    jnp.concatenate([cam_rays, depth_encode], axis=-1)
                    .reshape(B * V, n_rays, S_, -1),
                    S_,
                ).astype(cd)
                lc_tok = ps_tok
                pre1 = add_perray(ps_tok @ qe_ps, pre1_ray, S_)
                coords_embed = self.query_embed_2(nn.relu(pre1))
            else:
                cam_origin_zeros = jnp.zeros_like(query_ray_orig_ex)
                local_coords = jnp.concatenate(
                    [cam_rays, cam_origin_zeros, ray_dir_s, depth_encode, query_ray_orig_ex], axis=-1
                )                                                          # 16 channels
                lc_tok = tokf(local_coords.reshape(B * V, n_rays, S_, -1), S_)
                coords_embed = self.query_embed_2(nn.relu(self.query_embed(lc_tok)))
            ce = coords_embed.reshape(*tg_, -1)
            # logit accumulation in f32 (softmax island); the product runs in
            # the operand dtype — bitwise-unchanged in f32 configs, and in
            # bf16 it deletes the f32 copies of both 128-wide operands
            dot1 = jnp.sum(kv_bv * ce, axis=-1, dtype=jnp.float32) / 11.31  # (*tg_)
            return {
                "S": S_, "tg": tg_, "pixel_val": pixel_val, "pt": pt,
                "pre_p": pre_p, "pre_s": pre_s, "ce": ce, "lc_tok": lc_tok,
                "dot1": dot1,
            }

        def ray_major(dot, S_):
            """(*tg_) logits -> (B, V, N, S_)."""
            return dot.transpose(0, 1, 3, 2) if smaj else dot

        stages = [run_stage(jnp.linspace(0.0, 1.0, S1), S1)]
        if two_stage:
            S2 = cfg.fine_samples
            # locate the round-1 attention peak per (ray, view) from the
            # coarse logits; refine uniformly inside the bracketing coarse
            # interval [t*-1, t*+1]/(S1-1), offset half a fine step so fine
            # points interleave rather than duplicate the coarse ones
            d1 = ray_major(stages[0]["dot1"], S1)                          # (B, V, N, S1)
            s_star = jax.lax.stop_gradient(jnp.argmax(d1, axis=-1)).astype(jnp.float32)
            t_lo = jnp.clip((s_star - 1.0) / (S1 - 1), 0.0, 1.0)
            t_hi = jnp.clip((s_star + 1.0) / (S1 - 1), 0.0, 1.0)
            offs = (jnp.arange(S2, dtype=jnp.float32) + 0.5) / S2
            tv2 = t_lo[..., None] + (t_hi - t_lo)[..., None] * offs        # (B, V, N, S2)
            stages.append(run_stage(tv2.reshape(B * V, n_rays, S2), S2))

        def joint_softmax(dots_list):
            """Per-stage token-grid logits -> joint softmax over both views
            and ALL stages' samples; returns (per-stage ray-major weights,
            full (B, V, N, S_eff) weights)."""
            d_all = jnp.concatenate(
                [ray_major(d, st["S"]) for st, d in zip(stages, dots_list)], axis=-1
            )                                                              # (B, V, N, SE)
            SE = d_all.shape[-1]
            w = jax.nn.softmax(d_all.transpose(0, 2, 1, 3).reshape(B, n_rays, V * SE), axis=-1)
            w = w.reshape(B, n_rays, V, SE).transpose(0, 2, 1, 3)
            pieces, o = [], 0
            for st in stages:
                pieces.append(w[..., o: o + st["S"]])
                o += st["S"]
            return pieces, w

        def wsum(w_bv, pre, S_):
            """sum_s w * pre over one stage's tokens -> (B, N, C) view-sum."""
            if smaj:
                # Pallas streaming reduction: XLA reassociates the
                # (multiply, reduce) chain into two stages with a f32 copy of
                # the whole 832-wide activation (3.5 GB/pass, trace-verified).
                # vsum=V folds the view-row sum into the kernel (r5: the
                # separate per-view f32 outputs + XLA reduce cost ~8.6
                # ms/image in re-read bandwidth)
                from coponerf_tpu.ops.pallas.weighted_sum import weighted_sum_smaj

                w = w_bv.reshape(B * V, n_rays, S_)
                return weighted_sum_smaj(pre, w, S_, vsum=V)               # (B, N, C)
            w = w_bv.reshape(B * V, n_rays, S_, 1).astype(pre.dtype)
            rw = pre.reshape(B * V, n_rays, S_, -1) * w
            per_view = jnp.sum(rw, axis=2, dtype=jnp.float32)              # (B*V, N, C)
            return jnp.sum(per_view.reshape(B, V, n_rays, -1), axis=1)

        def weighted_latent(w_list):
            """sum_{v,s} w[v,s] * latent_value([e_2v || e_2v+1]) across all
            stages, with the linear maps deferred to per-ray tokens.
            Slot-b activations arrive in natural cross row order, so both
            slots use the same weights.  Weights arrive RAY-MAJOR
            (B, V, N, S_st) per stage; the joint softmax sums to 1 over all
            stages, so the folded bias rides once."""
            ua = ub = None
            for st, w_bv in zip(stages, w_list):
                a = wsum(w_bv, st["pre_p"], st["S"])
                # pre_s rows are natural cross order: no weight flip needed
                b2 = wsum(w_bv, st["pre_s"], st["S"])
                ua = a if ua is None else ua + a
                ub = b2 if ub is None else ub + b2
            return ua @ flv_a + ub @ flv_b + flv_bias                      # (B, N, 416)

        w1_list, at_wt_bv = joint_softmax([st["dot1"] for st in stages])
        at_wt = at_wt_bv.reshape(B * V, n_rays, -1)                        # round-1 weights

        # view-summed attended latent (the reference broadcasts this back
        # to both view slots, CoPoNeRF.py:455-461; both slots hold the
        # same sum)
        z_sum = weighted_latent(w1_list)                                   # (B, N, 416)

        if cfg.repeat_attention:
            z_embed = self.encode_latent(z_sum)                            # (B, N, 128)
            C_ze = z_embed.shape[-1]
            dots2 = []
            if fast_embed:
                # ze is per-RAY and identical across view rows: its kernel
                # block runs once on (B, N) tokens instead of (rows, T);
                # the old concat([ze_bv, lc]) f32-promoted a (rows, T,
                # ze+16)-wide matmul input per stage
                ze_part = z_embed.astype(jnp.float32) @ qre_z              # (B, N, 128)
                ze_rows = jnp.broadcast_to(
                    ze_part[:, None], (B, V) + ze_part.shape[1:]
                ).reshape(B * V, n_rays, -1)
                # f32 per-ray sum, cast ONCE at N tokens before the T-token
                # broadcast in add_perray
                pre2_ray_full = (pre2_ray + ze_rows).astype(cd)            # (B*V, N, 128)
            for st in stages:
                S_, tg_ = st["S"], st["tg"]
                if fast_embed:
                    pre2 = add_perray(st["lc_tok"] @ qre_ps, pre2_ray_full, S_)
                    emb2 = self.query_repeat_embed_2(nn.relu(pre2))
                    dots2.append(
                        jnp.sum(
                            emb2.reshape(*tg_, -1) * st["ce"],
                            axis=-1, dtype=jnp.float32,
                        ) / 11.31
                    )
                    continue
                if smaj:
                    ze = jnp.broadcast_to(z_embed[:, None, :, :], (B, S_, n_rays, C_ze))
                else:
                    ze = jnp.broadcast_to(z_embed[:, :, None, :], (B, n_rays, S_, C_ze))
                lc = st["lc_tok"].reshape(*tg_, -1)
                ze_bv = jnp.broadcast_to(ze[:, None], (B, V) + ze.shape[1:])
                dots2.append(jnp.sum(
                    self.query_repeat_embed_2(
                        nn.relu(self.query_repeat_embed(jnp.concatenate([ze_bv, lc], axis=-1)))
                    )
                    * st["ce"],
                    axis=-1, dtype=jnp.float32,
                ) / 11.31)                                                 # (*tg_)
            w2_list, _ = joint_softmax(dots2)
            # per-view partial2 + the (already view-summed) z_sum per slot,
            # then view-summed again: sum_v(partial2_v) + V * z_sum — exactly
            # the reference's repeated view_sum semantics
            z_sum = weighted_latent(w2_list) + V * z_sum

        # assemble the light-field decoder input: every view slot carries the
        # same view-summed latent, so z_flat is V copies of z_sum
        z_flat = jnp.concatenate([z_sum] * V, axis=-1)                     # (B, N, V*416)
        qro_n = jnp.broadcast_to(query_ray_orig[:, :, 0, :], (B * V, n_rays, 3))
        coords9 = jnp.concatenate([lf_coords, qro_n], axis=-1)
        coords18 = coords9.reshape(B, V, n_rays, 9).transpose(0, 2, 1, 3).reshape(B, n_rays, -1)
        rgb = self.phi(jnp.concatenate([z_flat, coords18], axis=-1))

        vm_any = (valid_mask.reshape(B, V, n_rays) > 0).any(axis=1).astype(rgb.dtype)
        rgb = rgb * vm_any[..., None] + (1.0 - vm_any[..., None])
        out["valid_mask"] = vm_any[..., None]
        out["rgb"] = rgb.reshape(B, n_qry, n_rays, 3)

        # attention-weighted 3D point -> depth in the query camera
        pt_all = jnp.concatenate([st["pt"] for st in stages], axis=-2)  # (B*V, N, SE, 3)
        pt_clamp = jnp.clip(pt_all, -100.0, 100.0)
        world_pt = jnp.sum(at_wt[..., None] * pt_clamp, axis=-2)           # (B*V, N, 3)
        world_pt = world_pt.reshape(B, V, n_rays, 3).sum(axis=1)
        world_pt_cam = G.project_cam2world(world_pt, query["cam2world"][:, 0])
        depth_ray = world_pt_cam[:, :, 2]

        # correspondence transfer outputs for the cycle loss
        T_to_C1 = G.batch_project_to_other_img(
            query["uv"][:, 0], depth_ray, query["intrinsics"][:, 0, :3, :3],
            ctx_intr[:, 0, :3, :3], query_cam2world[:, 0],
        )
        T_to_C2 = G.batch_project_to_other_img(
            query["uv"][:, 0], depth_ray, query["intrinsics"][:, 0, :3, :3],
            ctx_intr[:, 1, :3, :3], query_cam2world[:, 1],
        )
        up_hw = (cfg.mask_upsample, cfg.mask_upsample)
        out["matchability_cycle_mask"] = flow_ops.mask_from_confidence(
            T_to_C2, mask_bwd, n_rays, upsample_size=up_hw
        )
        C2_to_C1, mask_c2 = flow_ops.flow2kps_from_upsampled(T_to_C2, state.kps_flow_bwd, n_rays)

        out["T_to_C1_pts"] = T_to_C1
        out["T_to_C2_pts"] = T_to_C2
        out["C2_pts_to_C1"] = jnp.swapaxes(C2_to_C1, 1, 2)
        out["mask_c2"] = mask_c2
        out["at_wt"] = at_wt
        out["at_wt_max"] = jnp.argmax(at_wt, axis=-1)
        out["depth_ray"] = jnp.clip(depth_ray, 0.0, 10.0)[..., None]
        out["pixel_val"] = jnp.concatenate([st["pixel_val"] for st in stages], axis=-2)
        out["coords"] = coords9
        out["uv"] = query["uv"]
        out["z"] = state.z
        out["rel_pose"] = rel_pose
        out["rel_pose_flip"] = G.pose_inverse_4x4(rel_pose)
        out["gt_rel_pose"] = G.pose_inverse_4x4(ctx_c2w[:, 0]) @ ctx_c2w[:, 1]
        out["gt_rel_pose_flip"] = jnp.linalg.inv(G.pose_inverse_4x4(ctx_c2w[:, -1]) @ ctx_c2w[:, 0])
        return out

    def valid_ray_mask(
        self, batch: Dict[str, Any], state: SceneState, val: bool = False
    ) -> jnp.ndarray:
        """Per-ray epipolar validity, any-over-views/hypotheses: (B, n_rays) bool.

        Recomputes ONLY the geometry prefix of render() (the ~15 lines up to
        project_rays — no latents, no sampling, ~10 flops/ray) so the eval
        harness can skip whole chunks of rays that render() would compute and
        then overwrite white (reference: CoPoNeRF.py:562-563; mirrored at the
        vm_any overwrite in render()).  Must stay in lockstep with render()'s
        geometry; drift is pinned by
        tests/test_eval_harness.py::test_valid_ray_mask_matches_render.
        """
        ctx = batch["context"]
        query = batch["query"]
        B, V = ctx["rgb"].shape[:2]
        H = ctx["rgb"].shape[2]
        n_rays = query["uv"].shape[2]
        inv_ctx = G.pose_inverse_4x4(ctx["cam2world"])
        if val:
            q1 = inv_ctx[:, 0:1] @ query["cam2world"]
            q2 = G.pose_inverse_4x4(state.rel_pose)[:, None] @ q1
            query_cam2world = jnp.concatenate([q1, q2], axis=1)
        else:
            query_cam2world = inv_ctx @ query["cam2world"]
        n_hyp = query_cam2world.shape[1]
        uv = jnp.broadcast_to(query["uv"], (B, n_hyp, n_rays, 2)).reshape(B * n_hyp, n_rays, 2)
        q_intr = jnp.broadcast_to(query["intrinsics"], (B, n_hyp, 4, 4)).reshape(B * n_hyp, 4, 4)
        qc2w_flat = query_cam2world.reshape(B * n_hyp, 4, 4)
        lf_coords = G.plucker_embedding(qc2w_flat, uv, q_intr)
        ctx_intr = ctx["intrinsics"]
        intr_norm = ctx_intr.at[:, :, :2, :].set(ctx_intr[:, :, :2, :] / H)
        cam_origin = jnp.broadcast_to(
            G.get_ray_origin(qc2w_flat)[:, None, :], (B * n_hyp, n_rays, 3)
        )
        eye = jnp.broadcast_to(jnp.eye(4), (B * n_hyp, 4, 4))
        proj = G.project_rays(cam_origin, lf_coords[..., :3], eye, intr_norm.reshape(B * V, 4, 4))
        return proj["overlaps_image"].reshape(B, n_hyp, n_rays).any(axis=1)

    def __call__(self, batch: Dict[str, Any], val: bool = False, train: bool = False):
        state = self.encode(batch, train=train)
        return self.render(batch, state, val=val, train=train)
