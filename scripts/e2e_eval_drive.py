"""End-to-end drive of the offline eval stack on fabricated scenes:
dataset -> encode -> chunked dual-hypothesis render -> metrics -> report.
Creates 2 synthetic 256x455 scenes + pose table + a fast-init checkpoint,
GENERATES the per-scene overlap table with eval/overlap.py (reproducible
binning, the reference's assets/overlap/*.npy analogue), builds
structure-only LPIPS weights so every protocol column prints, then invokes
the test.py path."""

import os
import sys
import tempfile

import numpy as np
from scipy.io import savemat


def build_fake_data(root):
    img_root = os.path.join(root, "test")
    os.makedirs(img_root, exist_ok=True)
    rng = np.random.RandomState(0)
    tables = {}
    for s in range(2):
        name = f"scene{s:03d}"
        sdir = os.path.join(img_root, name)
        os.makedirs(sdir, exist_ok=True)
        frames, rows = {}, []
        base = rng.rand(300, 500, 3) * 255
        for i in range(30):
            ts = 1000 * i
            # translate a fixed pattern so correspondence is meaningful
            img = np.roll(base, shift=i * 3, axis=1)[:256, :455].astype(np.uint8)
            frames[f"{ts}.png"] = img
            w2c = np.eye(4)
            w2c[0, 3] = 0.02 * i
            rows.append([ts, 0.9, 0.9, 0.5, 0.5, 0, 0, *w2c[:3].reshape(-1)])
        np.savez(os.path.join(sdir, "data.npz"), **frames)
        tables[name] = np.array(rows, np.float64)
    pose_path = os.path.join(root, "test.mat")
    savemat(pose_path, tables)
    return img_root, pose_path


def build_checkpoint(root):
    import jax
    import jax.numpy as jnp

    from coponerf_tpu.config import ModelConfig
    from coponerf_tpu.data.synthetic import make_batch
    from coponerf_tpu.models import CoPoNeRF
    from coponerf_tpu.training import checkpoint as ckpt_lib
    from coponerf_tpu.utils.fast_init import fast_init

    # params must be built at the eval resolution (the UFC pos_embeds are
    # sized by the feature grids, 16^2/32^2/64^2 at 256^2 input)
    model = CoPoNeRF(ModelConfig())
    batch_np, _ = make_batch(1, 256, 16, seed=0)
    batch = jax.tree.map(jnp.asarray, batch_np)
    variables = fast_init(model, batch, val=False, train=False)

    class S:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

    return ckpt_lib.save(root, S(), step=0, name="fastinit")


def build_overlap_table(root, img_root, pose_path, ckpt):
    """Generate the per-scene overlap table from the model's own
    correspondence field (eval/overlap.py) — the regenerable analogue of the
    reference's shipped assets/overlap/*.npy."""
    import jax
    import jax.numpy as jnp

    from coponerf_tpu.config import ModelConfig
    from coponerf_tpu.data.realestate import RealEstate10kVis
    from coponerf_tpu.eval.overlap import compute_overlap_table
    from coponerf_tpu.models import CoPoNeRF
    from coponerf_tpu.training import checkpoint as ckpt_lib

    model = CoPoNeRF(ModelConfig(fast_sampling=True, compute_dtype="bfloat16"))
    params, batch_stats, _, _ = ckpt_lib.load(ckpt)
    variables = jax.tree.map(jnp.asarray, {"params": params, "batch_stats": batch_stats})
    ds = RealEstate10kVis(img_root, pose_path, overlap=None, n_skip=50)
    table = compute_overlap_table(model, variables, ds)
    overlap_path = os.path.join(root, "overlap.npy")
    np.save(overlap_path, table)
    print("overlap table:", table.ravel(), flush=True)
    return overlap_path


def main():
    root = tempfile.mkdtemp(prefix="e2e_eval_")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    img_root, pose_path = build_fake_data(root)
    ckpt = build_checkpoint(root)
    overlap_path = build_overlap_table(root, img_root, pose_path, ckpt)
    from coponerf_tpu.eval.lpips_jax import make_random_weights

    lpips_path = make_random_weights(os.path.join(root, "lpips_rand.npz"))
    print("data:", img_root, "ckpt:", ckpt, flush=True)

    sys.argv = [
        "test.py", "--data_root", img_root, "--pose_root", pose_path,
        "--overlap", overlap_path, "--checkpoint_path", ckpt,
        "--lpips_weights", lpips_path,
        "--max_batches", "1", "--chunk", "8192", "--fast",
    ]
    import test as test_entry

    test_entry.main()


if __name__ == "__main__":
    main()
