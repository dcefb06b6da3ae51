"""Bulk scene-cache conversion CLI.

Converts every scene's ``data.npz`` under a dataset root into the native
mmap-able cache format (runtime/scenecache.cpp), so training/eval sample
loading becomes a single native crop/resize call instead of zip inflation
per frame (the reference's hot path, realestate10k_dataio.py:237-456).

Usage:
    python scripts/build_scene_cache.py DATA_ROOT [--force]

Caches are written next to each ``data.npz`` as ``scene.cache``; the
dataset prefers them automatically (scene_dataset.py use_cache=True).
"""

import argparse
import os
import sys
import time

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_root", help="dataset split root (scene dirs with data.npz)")
    p.add_argument("--force", action="store_true", help="rebuild existing caches")
    args = p.parse_args()

    from coponerf_tpu.data.fast_loader import convert_scene_npz

    scenes = sorted(
        d for d in os.listdir(args.data_root)
        if os.path.isfile(os.path.join(args.data_root, d, "data.npz"))
    )
    if not scenes:
        print(f"no scenes with data.npz under {args.data_root}", file=sys.stderr)
        sys.exit(1)
    t0 = time.time()
    done = skipped = failed = 0
    for i, name in enumerate(scenes):
        npz = os.path.join(args.data_root, name, "data.npz")
        cache = os.path.join(args.data_root, name, "scene.cache")
        if os.path.exists(cache) and not args.force:
            skipped += 1
            continue
        try:
            convert_scene_npz(npz, cache)
            done += 1
        except Exception as e:  # keep converting; report at the end
            failed += 1
            print(f"FAILED {name}: {e!r}", file=sys.stderr)
        if (i + 1) % 100 == 0:
            rate = (done + skipped) / (time.time() - t0 + 1e-9)
            print(f"[{i + 1}/{len(scenes)}] {rate:.1f} scenes/s", flush=True)
    print(
        f"converted {done}, skipped {skipped} existing, failed {failed} "
        f"of {len(scenes)} scenes in {time.time() - t0:.1f}s"
    )
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
