"""Generate the rehearsal pack.npz DIRECTLY (no .mat intermediate).

Produces arrays BIT-IDENTICAL to
``make_dstl_scale_set.py OUT N SEED`` followed by
``data.dstl.pack_mat_directory(OUT/RGBs, OUT/all20Ch, OUT/class06_mats, ...)``:
the per-patch RNG sequence (mask rects -> rgb normal -> 20-ch cube normal),
the mask-signal adds, the NIR(9:12)/SWIR(12:15) slices and the NCHW
moveaxis all mirror those two code paths exactly (verified by
tests/test_pack_direct.py on a small N).

Why it exists: the .mat -> native-C++-reader -> pack ingestion leg was
already executed and timed in rounds 3-4 (NOTES: 1,125.8 s pack wall,
artifacts in scripts/rehearsal_r3/). Regenerating the 29 GB .mat tree
after a box wipe costs ~45 min that the 70-epoch protocol window needs;
this script rebuilds the same pack content in a few minutes. The pack is
written UNCOMPRESSED (np.savez) — ``load_pack`` reads either form and the
payload is gaussian noise that zlib cannot shrink.

Usage: python scripts/make_pack_direct.py OUT.npz [N] [SEED]
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from make_dstl_scale_set import LIM, make_mask  # noqa: E402


def build_pack(n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    rgb = np.empty((n, 3, LIM, LIM), np.float32)
    nir = np.empty((n, 3, LIM, LIM), np.float32)
    swir = np.empty((n, 3, LIM, LIM), np.float32)
    masks = np.empty((n, 1, LIM, LIM), np.float32)
    names = [f"patch_{i:05d}.mat" for i in range(n)]
    for i in range(n):
        mask = make_mask(rng)
        r = rng.normal(0.0, 1.0, (LIM, LIM, 3)).astype(np.float32)
        cube = rng.normal(0.0, 1.0, (LIM, LIM, 20)).astype(np.float32)
        m = mask[:, :, None]
        r += 2.0 * m
        cube[:, :, 9:12] += 1.5 * m
        cube[:, :, 12:15] += 1.0 * m
        rgb[i] = np.moveaxis(r, 2, 0)
        nir[i] = np.moveaxis(cube[:, :, 9:12], 2, 0)
        swir[i] = np.moveaxis(cube[:, :, 12:15], 2, 0)
        masks[i, 0] = mask
        if (i + 1) % 500 == 0:
            print(f"{i + 1}/{n}", flush=True)
    return dict(rgb=rgb, nir=nir, swir=swir, masks=masks,
                names=np.asarray(names))


def main():
    out = Path(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5985
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    t0 = time.time()
    pack = build_pack(n, seed)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(out, **pack)
    print(f"wrote {out} ({out.stat().st_size / 1e9:.2f} GB) "
          f"in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
