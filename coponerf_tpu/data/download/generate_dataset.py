"""Dataset downloader: build RealEstate10K / ACID scene archives from the
official pose lists (replaces data_download/generate_realestate.py and
generate_acid.py — both share this machinery; they differ only in the pose
list layout, which is identical for the two datasets).

Pipeline per sequence: parse the official ``.txt`` pose file (one video URL +
per-frame rows), download the YouTube video at 360p, extract the timestamped
frames with ffmpeg, pack them into one compressed ``data.npz`` per scene, and
log failures to ``failed_videos_<mode>.txt``.

Requires ``pytube`` (or ``yt-dlp``) and ``ffmpeg`` on the machine that runs
it — neither ships in this image, so imports are deferred and errors are
explicit.  Usage:

    python -m coponerf_tpu.data.download.generate_dataset \
        --pose_dir RealEstate10K/test --out_root data/realestate/test
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
from collections import defaultdict
from typing import Dict, List


def _ms_to_ffmpeg_ts(timestamp_us: int) -> str:
    t = int(timestamp_us / 1000)
    hh = t // 3600000
    mm = (t % 3600000) // 60000
    ss = ((t % 3600000) % 60000) // 1000
    ms = ((t % 3600000) % 60000) % 1000
    return f"{hh:02d}:{mm:02d}:{ss:02d}.{ms:03d}"


def parse_pose_file(path: str):
    """First line: video URL; remaining: timestamp_us + 18 pose floats."""
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    url = lines[0]
    timestamps = [int(l.split()[0]) for l in lines[1:]]
    return url, timestamps


def download_video(url: str, out_path: str, resolution: str = "360p") -> bool:
    try:
        from pytube import YouTube  # deferred; not installed in this image

        yt = YouTube(url)
        stream = yt.streams.filter(res=resolution).first() or yt.streams.first()
        stream.download(filename=out_path)
        return True
    except ImportError:
        # yt-dlp fallback
        try:
            subprocess.run(
                ["yt-dlp", "-f", "bv*[height<=360]", "-o", out_path, url],
                check=True, capture_output=True,
            )
            return True
        except Exception:
            raise SystemExit(
                "Neither pytube nor yt-dlp is available; install one to download."
            )
    except Exception:
        return False


def extract_and_pack(video_path: str, timestamps: List[int], scene_dir: str):
    os.makedirs(scene_dir, exist_ok=True)
    for ts in timestamps:
        out = os.path.join(scene_dir, f"{ts}.jpg")
        subprocess.run(
            ["ffmpeg", "-y", "-ss", _ms_to_ffmpeg_ts(ts), "-i", video_path,
             "-vframes", "1", "-q:v", "1", "-f", "image2", out],
            capture_output=True,
        )
    import imageio.v2 as imageio
    import numpy as np

    images: Dict[str, "np.ndarray"] = {}
    for jpg in glob.glob(os.path.join(scene_dir, "*.jpg")):
        images[os.path.basename(jpg)] = imageio.imread(jpg)
        os.remove(jpg)
    if images:
        np.savez_compressed(os.path.join(scene_dir, "data.npz"), **images)
    return len(images)


def build_pose_mat(pose_dir: str, out_mat: str):
    """Pack the official per-sequence pose .txt files into the global .mat
    table the loaders consume: scene_name -> (N, 19) rows
    [timestamp, fx, fy, cx, cy, 0, 0, 12 w2c entries] (normalized K, as in
    data/realestate10k_dataio.py:37-48)."""
    import numpy as np
    from scipy.io import savemat

    tables = {}
    for txt in sorted(glob.glob(os.path.join(pose_dir, "*.txt"))):
        with open(txt) as f:
            lines = [l.strip() for l in f if l.strip()][1:]
        rows = [[float(x) for x in l.split()] for l in lines]
        tables[os.path.splitext(os.path.basename(txt))[0]] = np.asarray(rows, np.float64)
    savemat(out_mat, tables)
    return len(tables)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pose_dir", required=True, help="directory of official .txt pose files")
    p.add_argument("--out_root", required=True)
    p.add_argument("--mode", default="test")
    p.add_argument("--tmp", default="/tmp/video_download")
    p.add_argument("--pose_mat", default=None, help="also write the global pose .mat here")
    args = p.parse_args()

    if args.pose_mat:
        n = build_pose_mat(args.pose_dir, args.pose_mat)
        print(f"wrote pose table for {n} scenes -> {args.pose_mat}")

    os.makedirs(args.out_root, exist_ok=True)
    os.makedirs(args.tmp, exist_ok=True)
    failed_log = os.path.join(args.out_root, f"failed_videos_{args.mode}.txt")

    # group sequences by video URL so each video downloads once
    by_url: Dict[str, List[str]] = defaultdict(list)
    for txt in sorted(glob.glob(os.path.join(args.pose_dir, "*.txt"))):
        url, _ = parse_pose_file(txt)
        by_url[url].append(txt)

    for url, seq_files in by_url.items():
        video_path = os.path.join(args.tmp, "current_video.mp4")
        if not download_video(url, video_path):
            with open(failed_log, "a") as f:
                for s in seq_files:
                    f.write(os.path.basename(s) + "\n")
            continue
        for txt in seq_files:
            seqname = os.path.splitext(os.path.basename(txt))[0]
            scene_dir = os.path.join(args.out_root, seqname)
            if os.path.exists(os.path.join(scene_dir, "data.npz")):
                continue
            _, timestamps = parse_pose_file(txt)
            n = extract_and_pack(video_path, timestamps, scene_dir)
            print(f"{seqname}: packed {n} frames")
        os.remove(video_path)


if __name__ == "__main__":
    main()
