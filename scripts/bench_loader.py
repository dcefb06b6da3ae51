"""Measure input-pipeline throughput (pairs/s) with the multiprocess
prefetch loader on fabricated RealEstate10K-format scenes.

Pass criterion (VERDICT round 1, item 6): sustained loader rate >= 2x the
train-step consumption rate at batch 12/chip (12 pairs / 1.38 s = 8.7
pairs/s -> need >= 17.4 pairs/s).

Usage: python scripts/bench_loader.py [num_workers] [batch_size]
"""

import os
import sys
import tempfile
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)


def main():
    num_workers = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import numpy as np
    from scipy.io import savemat

    # training sampling needs >= ~85 frames/scene (50-frame context
    # separation + +-32 query window, realestate10k_dataio.py:283-311)
    root = tempfile.mkdtemp(prefix="bench_loader_")
    img_root = os.path.join(root, "train")
    rng = np.random.RandomState(0)
    tables = {}
    for s in range(max(4, batch_size)):
        name = f"scene{s:03d}"
        sdir = os.path.join(img_root, name)
        os.makedirs(sdir, exist_ok=True)
        base = (rng.rand(300, 500, 3) * 255)
        frames, rows = {}, []
        for i in range(120):
            ts = 1000 * i
            frames[f"{ts}.png"] = np.roll(base, i * 2, axis=1)[:256, :455].astype(np.uint8)
            w2c = np.eye(4)
            w2c[0, 3] = 0.01 * i
            rows.append([ts, 0.9, 0.9, 0.5, 0.5, 0.0, 0.0] + list(w2c[:3].reshape(-1)))
        np.savez(os.path.join(sdir, "data.npz"), **frames)
        tables[name] = np.asarray(rows, np.float64)
    pose_path = os.path.join(root, "poses.mat")
    savemat(pose_path, tables)

    from coponerf_tpu.data.loader import PrefetchLoader
    from coponerf_tpu.data.realestate import RealEstate10k

    ds = RealEstate10k(img_root, pose_path, num_ctxt_views=2, num_query_views=1,
                       query_sparsity=192, augment=True)
    loader = PrefetchLoader(ds, batch_size, shuffle=True, num_workers=num_workers)
    it = iter(loader)
    for _ in range(4):  # warm: worker spawn + first tasks
        next(it)
    n = 24
    t0 = time.time()
    for _ in range(n):
        next(it)
    dt = time.time() - t0
    loader.close()
    pairs_per_sec = n * batch_size / dt
    print(
        f"workers={num_workers} batch={batch_size}: "
        f"{pairs_per_sec:.1f} pairs/s ({n} batches in {dt:.2f}s)"
    )


if __name__ == "__main__":
    main()
