"""Eval/validation observability: chunked render assembly (incl. REAL
attention weights and correspondence outputs, test.py:200-212 parity),
flow-warped context panels (summary/summaries.py:163-207 parity), and full
val-loss term coverage (wrapper.py:160-254)."""

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
N_RAYS = 16


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(mask_upsample=IMG, npoints=8)
    model = CoPoNeRF(cfg)
    batch_np, gt = make_batch(batch_size=1, image_size=IMG, n_rays=N_RAYS, seed=0)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=False)
    return cfg, model, batch_np, gt, batch, variables


def test_chunked_render_assembles_all_keys(setup):
    """Chunk-assembled per-ray outputs must equal the single-shot val render,
    key by key — this is what guarantees the logged at_wt/correspondence
    values are real, not placeholders."""
    from coponerf_tpu.eval.harness import _RAY_AXIS, make_renderer

    cfg, model, _, _, batch, variables = setup
    keys = tuple(_RAY_AXIS)
    encode, render_image = make_renderer(model, chunk=8, keys=keys)
    state = encode(variables, batch)
    assembled = render_image(variables, batch, state, N_RAYS)

    direct = model.apply(variables, batch, state, val=True, method="render")
    for k in keys:
        a, d = np.asarray(assembled[k]), np.asarray(direct[k])
        assert a.shape == d.shape, k
        # rtol covers XLA fusion-order noise on pixel-coordinate outputs
        np.testing.assert_allclose(a, d, rtol=1e-5, atol=1e-5, err_msg=k)
    # at_wt is a real distribution over samples (joint softmax over views)
    w = np.asarray(assembled["at_wt"]).reshape(1, 2, N_RAYS, cfg.npoints)
    np.testing.assert_allclose(w.sum(axis=(1, 3)), 1.0, atol=1e-5)
    assert np.asarray(assembled["at_wt"]).std() > 0  # not uniform


class _TinyEvalSet:
    def __init__(self, n):
        self.items = []
        for i in range(n):
            b, g = make_batch(
                batch_size=1, image_size=IMG, n_rays=IMG * IMG,
                seed=100 + i, full_query_image=True,
            )
            item = jax.tree.map(lambda x: np.asarray(x[0]), b)
            gt0 = jax.tree.map(lambda x: np.asarray(x[0]), g)
            self.items.append((item, gt0, 1.0))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _evaluate_quiet(*args, **kwargs):
    import warnings

    from coponerf_tpu.eval.harness import evaluate

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # LPIPS column intentionally absent
        return evaluate(*args, verbose=False, **kwargs)


def test_evaluate_tail_policy(setup):
    """Default drops the n % batch_size tail scenes — the reference eval
    DataLoader is built with drop_last=True (test.py:130), so evaluating the
    tail would change the scene set vs the reference protocol.
    drop_last=False is the documented opt-in deviation that covers every
    scene."""
    cfg, model, _, _, _, variables = setup

    ds = _TinyEvalSet(3)
    acc = _evaluate_quiet(model, variables, ds, batch_size=2,
                          chunk=IMG * IMG // 2, image_size=IMG)
    assert len(acc.metrics["all"]["psnr"]) == 2  # tail scene dropped

    acc_all = _evaluate_quiet(model, variables, ds, batch_size=2,
                              chunk=IMG * IMG // 2, image_size=IMG,
                              drop_last=False)
    assert len(acc_all.metrics["all"]["psnr"]) == 3  # opt-in includes tail
    # the two shared scenes carry identical metrics under either policy
    np.testing.assert_allclose(acc.metrics["all"]["psnr"],
                               acc_all.metrics["all"]["psnr"][:2], rtol=1e-6)


def test_evaluate_pruned_matches_unpruned_through_loader(setup):
    """evaluate() now feeds batches through the ordered PrefetchLoader;
    pruned and unpruned rendering must give identical metrics through that
    path (VERDICT r4 item 4)."""
    cfg, model, batch_np, _, _, variables = setup

    ds = _TinyEvalSet(2)
    common = dict(batch_size=1, chunk=IMG * IMG // 2, image_size=IMG)
    acc_plain = _evaluate_quiet(model, variables, ds, **common)
    acc_pruned = _evaluate_quiet(model, variables, ds, prune_invalid=True, **common)
    for k in ("psnr", "ssim", "rot", "trans"):
        np.testing.assert_allclose(
            acc_plain.metrics["all"][k], acc_pruned.metrics["all"][k],
            rtol=1e-5, atol=1e-6, err_msg=k,
        )


def test_warped_context_panels(setup):
    from coponerf_tpu.training.summaries import warped_context_panels

    _, _, batch_np, _, _, _ = setup
    ctx = batch_np["context"]["rgb"]  # (1, 2, H, W, 3)
    rng = np.random.RandomState(0)
    flow_f = rng.randn(1, 2, IMG // 2, IMG // 2).astype(np.float32) * 2
    flow_b = -flow_f
    panels = warped_context_panels(ctx, flow_f, flow_b)
    assert sorted(panels) == [
        "masked_warped_img", "masked_warped_img_flip", "warped_img", "warped_img_flip",
    ]
    for k, v in panels.items():
        assert v.shape == (1, 3 * IMG, IMG, 3), k  # [src ; warped ; tgt] stack
        assert v.min() >= 0.0 and v.max() <= 1.0, k
    # the top strip of warped_img is ctx2 verbatim
    np.testing.assert_allclose(
        panels["warped_img"][0, :IMG], (ctx[0, 1] + 1) * 0.5, atol=1e-6
    )


class _StubLogger:
    def __init__(self):
        self.scalars = {}
        self.images = {}

    def log(self, step, metrics):
        self.scalars.update(metrics)

    def log_image(self, step, tag, img):
        self.images[tag] = np.asarray(img)


def test_val_fn_full_loss_parity(setup):
    """Validation must log every enabled loss term (img/pose/cycle/ssim) —
    reference wrapper.py:160-254 computes the same dict at val."""
    from coponerf_tpu.training.trainer import TrainState, make_optimizer
    from coponerf_tpu.training.validation import make_val_fn

    model_cfg, model, _, _, _, variables = setup
    # validation consumes FULL query images (uv covers the image)
    batch_np, gt = make_batch(
        batch_size=1, image_size=IMG, n_rays=IMG * IMG, seed=0, full_query_image=True
    )
    cfg = Config(
        model=model_cfg,
        loss=LossConfig(pose=True, cycle=True, ssim=True),
        train=TrainConfig(),
    )
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(cfg, steps_per_epoch=10),
    )
    val_fn = make_val_fn(cfg, [(batch_np, gt)], chunk=8, image_size=IMG)
    logger = _StubLogger()
    val_fn(state, step=1, logger=logger)
    for term in ("val_img_loss", "val_pose_loss", "val_cycle_loss", "val_ssim_loss"):
        assert term in logger.scalars, (term, sorted(logger.scalars))
        assert np.isfinite(logger.scalars[term]), term
    # honest entropy scalar from the REAL at_wt
    assert "val_ent" in logger.scalars and np.isfinite(logger.scalars["val_ent"])
    assert "val_warped_img" in logger.images


def _rotated_batch(batch_np, deg=90.0):
    """Rotate the query camera about the up axis so a large fraction of rays
    fall outside both context epipolar frusta (sparse valid mask)."""
    b = {k: {kk: np.array(vv) for kk, vv in v.items()} for k, v in batch_np.items()}
    th = np.deg2rad(deg)
    R = np.eye(4)
    c, s = np.cos(th), np.sin(th)
    R[0, 0], R[0, 2], R[2, 0], R[2, 2] = c, s, -s, c
    b["query"]["cam2world"] = b["query"]["cam2world"] @ R
    return jax.tree.map(jnp.asarray, b)


def test_valid_ray_mask_matches_render(setup):
    """model.valid_ray_mask recomputes only render()'s geometry prefix; it
    must equal render()'s own valid_mask output exactly (the drift pin the
    pruning path relies on), on both an all-valid and a sparse-mask batch."""
    _, model, batch_np, _, batch, variables = setup
    for b in (batch, _rotated_batch(batch_np)):
        state = model.apply(variables, b, train=False, method="encode")
        m = model.apply(variables, b, state, val=True, method="valid_ray_mask")
        r = model.apply(variables, b, state, val=True, method="render")
        vm_render = np.asarray(r["valid_mask"])[..., 0] > 0
        np.testing.assert_array_equal(np.asarray(m), vm_render)


def test_pruned_render_matches_unpruned(setup):
    """prune_invalid=True must render FEWER chunks on a sparse-mask scene and
    reproduce the unpruned rgb exactly (invalid rays are white either way,
    reference CoPoNeRF.py:562-563); aux outputs must match on valid rays."""
    from coponerf_tpu.eval.harness import make_renderer

    _, model, batch_np, _, _, variables = setup
    b = _rotated_batch(batch_np)
    keys = ("rgb", "depth_ray", "at_wt")
    encode, render_plain = make_renderer(model, chunk=8, keys=keys)
    _, render_pruned = make_renderer(model, chunk=8, keys=keys, prune_invalid=True)
    state = encode(variables, b)

    mask = np.asarray(
        model.apply(variables, b, state, val=True, method="valid_ray_mask")
    )
    n_valid = int(mask.sum(axis=-1).max())
    assert 0 < n_valid < N_RAYS - 8, f"geometry no longer sparse: {n_valid}/{N_RAYS}"

    plain = render_plain(variables, b, state, N_RAYS)
    pruned = render_pruned(variables, b, state, N_RAYS)
    assert render_pruned.last_n_rendered < N_RAYS  # actually skipped chunks

    # rgb: exact protocol output, compared everywhere (invalid rays = white)
    np.testing.assert_allclose(
        np.asarray(pruned["rgb"]), np.asarray(plain["rgb"]), rtol=1e-5, atol=1e-5
    )
    # aux outputs: compared on valid rays only (pruned rays are zero-filled)
    valid = mask[0]
    np.testing.assert_allclose(
        np.asarray(pruned["depth_ray"])[0, valid],
        np.asarray(plain["depth_ray"])[0, valid],
        rtol=1e-5, atol=1e-5,
    )
    at_p = np.asarray(pruned["at_wt"]).reshape(2, N_RAYS, -1)
    at_u = np.asarray(plain["at_wt"]).reshape(2, N_RAYS, -1)
    np.testing.assert_allclose(at_p[:, valid], at_u[:, valid], rtol=1e-5, atol=1e-5)
