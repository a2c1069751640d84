"""Generate a synthetic-but-DSTL-shaped .mat set at the reference's scale.

The reference trains on 5,985 patches loaded from three directories of
MATLAB files (F8_IMAGES4.py:20-32): ``RGBs/`` (224x224x3 ``inputPatch``),
``all20Ch/`` (224x224x20 cubes) and ``class06_mats/`` (building masks),
paired by filename. The DSTL files themselves are not on this box, so the
real-scale dress rehearsal generates a set with the same layout, shapes,
dtypes and filename pairing — content mirrors ``data.dstl.synthetic_dstl``
(masks = unions of random rectangles incl. all-background patches; every
modality = noise + scale*mask so the task is learnable and soft-Jaccard is
a meaningful target). NIR signal goes in cube channels 9-11 and SWIR in
12-14, the slices ``load_dstl`` extracts (F8_IMAGES4.py:41-47); the other
14 cube channels are noise the ingestion must ignore.

Usage: python scripts/make_dstl_scale_set.py OUTDIR [N] [SEED]
Writes OUTDIR/{RGBs,all20Ch,class06_mats}/patch_%05d.mat. ~29 GB at
N=5985; resumable (skips complete triples).
"""

import sys
from pathlib import Path

import numpy as np
import scipy.io as sio

LIM = 224


def make_mask(rng):
    mask = np.zeros((LIM, LIM), dtype=np.float32)
    for _ in range(int(rng.integers(0, 4))):  # 0 rects => all-background
        h = int(rng.integers(LIM // 8, LIM // 2))
        w = int(rng.integers(LIM // 8, LIM // 2))
        y0 = int(rng.integers(0, LIM - h))
        x0 = int(rng.integers(0, LIM - w))
        mask[y0 : y0 + h, x0 : x0 + w] = 1.0
    return mask


def main():
    out = Path(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5985
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    dirs = {k: out / k for k in ("RGBs", "all20Ch", "class06_mats")}
    for d in dirs.values():
        d.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(seed)
    for i in range(n):
        name = f"patch_{i:05d}.mat"
        paths = {k: d / name for k, d in dirs.items()}
        # draw the per-patch randomness even when skipping so a resumed
        # generation produces the same remaining files
        mask = make_mask(rng)
        rgb = rng.normal(0.0, 1.0, (LIM, LIM, 3)).astype(np.float32)
        cube = rng.normal(0.0, 1.0, (LIM, LIM, 20)).astype(np.float32)
        if all(p.exists() for p in paths.values()):
            continue
        m = mask[:, :, None]
        rgb += 2.0 * m
        cube[:, :, 9:12] += 1.5 * m   # NIR channels (F8_IMAGES4.py:41-43)
        cube[:, :, 12:15] += 1.0 * m  # SWIR channels (F8_IMAGES4.py:45-47)
        sio.savemat(paths["RGBs"], {"inputPatch": rgb}, do_compression=False)
        sio.savemat(paths["all20Ch"], {"inputPatch": cube}, do_compression=False)
        sio.savemat(
            paths["class06_mats"], {"inputPatch": mask}, do_compression=False
        )
        if (i + 1) % 500 == 0:
            print(f"{i + 1}/{n}", flush=True)
    print(f"done: {n} triples under {out}")


if __name__ == "__main__":
    main()
