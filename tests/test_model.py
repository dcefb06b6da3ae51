"""End-to-end model smoke tests on tiny synthetic scenes (CPU).

Uses fast structural init (shapes via eval_shape, numpy fill) — the faithful
model.init is exercised separately in the slow marker test."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from coponerf_tpu.config import Config, ModelConfig, LossConfig, TrainConfig
from coponerf_tpu.data.synthetic import make_batch
from coponerf_tpu.models import CoPoNeRF
from coponerf_tpu.utils.fast_init import fast_init

pytestmark = pytest.mark.slow

IMG = 32


@pytest.fixture(scope="session")
def tiny_setup():
    cfg = ModelConfig(mask_upsample=IMG, npoints=8)
    model = CoPoNeRF(cfg)
    batch_np, _ = make_batch(batch_size=1, image_size=IMG, n_rays=16, seed=0)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=False)
    return cfg, model, batch, variables


def test_forward_shapes_and_finiteness(tiny_setup):
    cfg, model, batch, variables = tiny_setup
    out = model.apply(variables, batch, val=False, train=False)
    B, n_rays = 1, 16
    assert out["rgb"].shape == (B, 1, n_rays, 3)
    assert out["depth_ray"].shape == (B, n_rays, 1)
    assert out["at_wt"].shape == (B * 2, n_rays, cfg.npoints)
    assert out["rel_pose"].shape == (B, 4, 4)
    for k in ["rgb", "depth_ray", "rel_pose", "T_to_C1_pts", "T_to_C2_pts"]:
        assert np.isfinite(np.asarray(out[k])).all(), k
    # attention weights are a joint softmax over both views' samples
    w = np.asarray(out["at_wt"]).reshape(B, 2, n_rays, cfg.npoints)
    np.testing.assert_allclose(w.sum(axis=(1, 3)), 1.0, atol=1e-5)
    # estimated pose is a rigid transform
    R = np.asarray(out["rel_pose"])[:, :3, :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.eye(3)[None], atol=1e-5)


def test_val_mode_dual_hypothesis(tiny_setup):
    cfg, model, batch, variables = tiny_setup
    out = model.apply(variables, batch, val=True, train=False)
    assert out["rgb"].shape == (1, 1, 16, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_encode_render_split_matches_fused(tiny_setup):
    cfg, model, batch, variables = tiny_setup
    state = model.apply(variables, batch, train=False, method="encode")
    out_split = model.apply(variables, batch, state, val=False, method="render")
    out_fused = model.apply(variables, batch, val=False, train=False)
    np.testing.assert_allclose(
        np.asarray(out_split["rgb"]), np.asarray(out_fused["rgb"]), atol=1e-5
    )


def test_train_step_descends_on_mesh():
    from coponerf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from coponerf_tpu.training.trainer import TrainState, make_optimizer, make_train_step

    cfg = Config(
        model=ModelConfig(mask_upsample=IMG, npoints=8),
        loss=LossConfig(pose=True, cycle=True, ssim=False),
        train=TrainConfig(lr=1e-4),
    )
    model = CoPoNeRF(cfg.model)
    batch_np, _ = make_batch(batch_size=2, image_size=IMG, n_rays=16, seed=1)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=True)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, steps_per_epoch=100),
    )
    mesh = make_mesh((2,), ("data",), devices=jax.devices()[:2])
    state = replicate(mesh, state)
    step_fn = make_train_step(cfg)

    p0 = np.asarray(jax.device_get(state.params["phi"]["lin_out"]["Dense_0"]["kernel"]))
    losses = []
    for _ in range(3):
        sharded = shard_batch(mesh, batch)
        state, metrics = step_fn(state, sharded)
        losses.append(float(metrics["total_train_loss"]))
    assert all(np.isfinite(losses)), losses
    assert "pose_loss" in metrics and "cycle_loss" in metrics
    assert float(metrics["grad_norm"]) > 0.0
    p1 = np.asarray(jax.device_get(state.params["phi"]["lin_out"]["Dense_0"]["kernel"]))
    assert np.abs(p1 - p0).max() > 0.0  # optimizer actually applied updates


def test_coarse_fine_render_structure(tiny_setup):
    """Two-stage coarse-to-fine sampling: joint softmax over the union of
    stages normalizes correctly, outputs keep their contracts, and the
    sample axis is coarse+fine wide.  (Quality vs the single-stage path is
    gated on TRAINED weights — see PARITY.md — because top-1 refinement is
    only meaningful once attention is peaked.)"""
    import dataclasses

    cfg, model, batch, variables = tiny_setup
    cf_model = CoPoNeRF(dataclasses.replace(
        cfg, fast_sampling=True, compute_dtype="bfloat16",
        coarse_samples=6, fine_samples=4))
    out = cf_model.apply(variables, batch, val=True, train=False)
    SE = 6 + 4
    B, n_rays = 1, 16
    assert out["at_wt"].shape == (B * 2, n_rays, SE)
    assert out["pixel_val"].shape[-2] == SE
    w = np.asarray(out["at_wt"]).reshape(B, 2, n_rays, SE)
    np.testing.assert_allclose(w.sum(axis=(1, 3)), 1.0, atol=1e-4)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert np.isfinite(np.asarray(out["depth_ray"])).all()
    # training ignores the two-stage config (selection is non-differentiable)
    out_tr, _ = cf_model.apply(
        variables, batch, val=False, train=True, mutable=["batch_stats"]
    )
    assert out_tr["at_wt"].shape == (B * 2, n_rays, cfg.npoints)


def test_nan_batch_skips_update():
    """A poisoned batch must leave params bit-identical and increment the
    apply_if_finite skip counter (reference wrapper.py:44-58 semantics: scan
    grads for NaN/Inf, skip the optimizer step)."""
    from coponerf_tpu.training.trainer import TrainState, make_optimizer, make_train_step

    cfg = Config(
        model=ModelConfig(mask_upsample=IMG, npoints=8),
        loss=LossConfig(),
        train=TrainConfig(lr=1e-4),
    )
    model = CoPoNeRF(cfg.model)
    batch_np, _ = make_batch(batch_size=1, image_size=IMG, n_rays=16, seed=2)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=True)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, steps_per_epoch=100),
    )
    step_fn = make_train_step(cfg)

    # poison the CONTEXT images (gt rgb is NaN-scrubbed by image_loss,
    # matching the reference): the NaN rides encoder -> UFC -> render -> loss
    poisoned = dict(batch)
    poisoned["context"] = dict(batch["context"])
    poisoned["context"]["rgb"] = batch["context"]["rgb"].at[..., 0].set(jnp.nan)

    p0 = jax.device_get(state.params)
    state1, metrics = step_fn(state, poisoned)
    assert int(jax.device_get(state1.opt_state.notfinite_count)) == 1
    p1 = jax.device_get(state1.params)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(a, b)
    # a clean batch afterwards must update params and reset the counter
    state2, _ = step_fn(state1, batch)
    assert int(jax.device_get(state2.opt_state.notfinite_count)) == 0
    changed = any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(jax.device_get(state2.params)))
    )
    assert changed


def test_fast_render_matches_exact(tiny_setup):
    """The throughput path (bf16 + banded sample-major one-hot sampling)
    matches the exact f32 path to bf16-level error, val + train modes."""
    import dataclasses

    cfg, model, batch, variables = tiny_setup
    fast_model = CoPoNeRF(dataclasses.replace(
        cfg, fast_sampling=True, compute_dtype="bfloat16"))
    for val in (False, True):
        out_e = model.apply(variables, batch, val=val, train=False)
        out_f = fast_model.apply(variables, batch, val=val, train=False)
        a, b = np.asarray(out_e["rgb"]), np.asarray(out_f["rgb"])
        assert np.isfinite(b).all()
        scale = np.abs(a).mean() + 1e-6
        assert np.abs(a - b).mean() / scale < 2e-2, (val, np.abs(a - b).max())
        wa = np.asarray(out_e["at_wt"]); wb = np.asarray(out_f["at_wt"])
        assert np.abs(wa - wb).mean() < 2e-2


def test_encode_dtype_wiring():
    """Under compute_dtype=bfloat16 the UFC pipeline emits bf16 feature
    latents while the precision-sensitive encode outputs (flows, rel_pose,
    masks) stay f32; the exact config keeps everything f32."""
    import dataclasses

    cfg = ModelConfig(mask_upsample=32, npoints=4, ufc_layer_nums=(1, 1, 1))
    batch_np, _ = make_batch(batch_size=1, image_size=32, n_rays=8, seed=0)
    batch = jax.tree.map(jnp.asarray, batch_np)

    model = CoPoNeRF(cfg)
    variables = fast_init(model, batch, val=False, train=False)
    st = model.apply(variables, batch, train=False, method="encode")
    assert all(z.dtype == jnp.float32 for z in st.z)

    fast = CoPoNeRF(dataclasses.replace(cfg, compute_dtype="bfloat16", fast_sampling=True))
    st = fast.apply(variables, batch, train=False, method="encode")
    assert all(z.dtype == jnp.bfloat16 for z in st.z), [z.dtype for z in st.z]
    assert st.rel_pose.dtype == jnp.float32
    assert all(f.dtype == jnp.float32 for f in st.flows)
    assert st.mask_bwd.dtype == jnp.float32


@pytest.mark.slow
def test_fast_render_big_level_cache_matches_exact():
    """At >=128^2 the full-res table takes the cached fast path (SceneState
    z0_bf16 / z0_pad_sw built in encode: pre-cast border table and pre-padded
    view-swapped zeros table).  Must match the exact f32 path to bf16-level
    error — pins the cache wiring (mode discrimination, row swap, zero ring)
    that the tiny-image tests never reach."""
    import dataclasses

    img = 128
    cfg = ModelConfig(mask_upsample=img, npoints=8)
    model = CoPoNeRF(cfg)
    batch_np, _ = make_batch(batch_size=1, image_size=img, n_rays=24, seed=3)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=False)
    fast_model = CoPoNeRF(dataclasses.replace(
        cfg, fast_sampling=True, compute_dtype="bfloat16"))

    out_e = model.apply(variables, batch, val=True, train=False)
    # the sample-major cached path is the encode/render split (bench/eval)
    state = fast_model.apply(variables, batch, train=False, method="encode")
    assert state.z0_bf16 is not None and state.z0_pad_sw is not None
    out_f = fast_model.apply(variables, batch, state, val=True, method="render")
    a, b = np.asarray(out_e["rgb"]), np.asarray(out_f["rgb"])
    assert np.isfinite(b).all()
    scale = np.abs(a).mean() + 1e-6
    assert np.abs(a - b).mean() / scale < 2e-2, np.abs(a - b).max()


def test_render_trajectory_one_dispatch(tiny_setup):
    """eval/trajectory.py: n-frame path rendered with one amortized encode
    (BASELINE config 5).  Endpoint poses are the two context cameras."""
    from coponerf_tpu.eval.trajectory import interpolate_poses, render_trajectory

    cfg, model, batch, variables = tiny_setup
    frames = render_trajectory(model, variables, batch, n_frames=2, image_size=IMG, chunk=512)
    assert frames.shape == (2, IMG, IMG, 3)
    assert np.isfinite(frames).all()
    # path endpoints are exactly the context cameras
    c2w = np.asarray(batch["context"]["cam2world"])[0]
    path = interpolate_poses(c2w[0], c2w[1], 5)
    np.testing.assert_allclose(path[0], c2w[0], atol=1e-6)
    np.testing.assert_allclose(path[-1], c2w[1], atol=1e-6)
    for m in path:
        R = m[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_overlap_table_generator(tiny_setup):
    """eval/overlap.py: per-scene co-visible-fraction table (the reference
    ships tables but not the generator)."""
    from coponerf_tpu.eval.overlap import compute_overlap_table

    cfg, model, batch, variables = tiny_setup
    item = jax.tree.map(lambda x: np.asarray(x[0]), batch)  # strip batch dim
    ds = [(item, None, None), (item, None, None)]
    table = compute_overlap_table(model, variables, ds)
    assert table.shape == (2, 1)
    assert np.isfinite(table).all() and (table >= 0).all() and (table <= 1).all()
    np.testing.assert_allclose(table[0], table[1], atol=1e-6)


def test_train_loop_epoch_snapshot(tmp_path):
    """trainer.train must save epoch-cadence checkpoints (model_epoch_%04d) —
    reference wrapper.py:97-99 parity; the epochs_til_ckpt knob was previously
    configured but never read (VERDICT r4 missing item 3)."""
    import os

    from coponerf_tpu.training import trainer
    from coponerf_tpu.utils.fast_init import fast_init as _fi

    cfg = Config(
        model=ModelConfig(mask_upsample=IMG, npoints=8),
        loss=LossConfig(),
        train=TrainConfig(lr=1e-4, steps_per_epoch=2, epochs_til_ckpt=1,
                          iters_til_ckpt=0, steps_til_summary=100),
        logging_root=str(tmp_path),
        experiment_name="snap",
    )
    model = CoPoNeRF(cfg.model)
    batch_np, _ = make_batch(batch_size=1, image_size=IMG, n_rays=16, seed=4)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = _fi(model, batch, val=False, train=True)
    state = trainer.TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=trainer.make_optimizer(cfg, steps_per_epoch=2),
    )
    from coponerf_tpu.parallel.mesh import make_mesh

    mesh = make_mesh((1,), ("data",), devices=jax.devices()[:1])
    trainer.train(cfg, [(batch_np)] * 5, num_steps=5, state=state, mesh=mesh)
    ckpts = sorted(os.listdir(os.path.join(str(tmp_path), "snap", "checkpoints")))
    # steps_per_epoch=2, epochs_til_ckpt=1 -> snapshots at steps 2 and 4
    assert "model_epoch_0001.npz" in ckpts, ckpts
    assert "model_epoch_0002.npz" in ckpts, ckpts
    assert "model_final.npz" in ckpts, ckpts


def test_ufc_scan_matches_loop():
    """scan-rolled UFC stages (ModelConfig.ufc_scan) produce the same outputs
    as the default layer loop, given the same params restacked via
    stack_ufc_params; unstack_ufc_params round-trips exactly."""
    from coponerf_tpu.models.ufc import UFC, stack_ufc_params, unstack_ufc_params

    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(2, hw, hw, 24).astype(np.float32))
        for hw in (4, 8, 16)
    ]
    kw = dict(nhead=4, feat_dim=(24, 24, 24), layer_nums=(2, 2, 1), remat=False)
    loop = UFC(**kw)
    scan = UFC(**kw, scan_layers=True)
    vars_loop = loop.init(jax.random.PRNGKey(0), feats)
    stacked = {"params": stack_ufc_params(vars_loop["params"], (2, 2, 1))}
    # round-trip
    rt = unstack_ufc_params(stacked["params"], (2, 2, 1))
    for a, b in zip(jax.tree.leaves(rt), jax.tree.leaves(vars_loop["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # scan layout inits to the same SHAPES as stack_ufc_params produces
    vars_scan = jax.eval_shape(lambda: scan.init(jax.random.PRNGKey(0), feats))
    assert jax.tree.map(lambda x: x.shape, vars_scan["params"]) == jax.tree.map(
        lambda x: x.shape, stacked["params"]
    )
    out_loop = loop.apply(vars_loop, feats)
    out_scan = scan.apply(stacked, feats)
    for a, b in zip(jax.tree.leaves(out_loop), jax.tree.leaves(out_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
