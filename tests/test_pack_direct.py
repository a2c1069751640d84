"""Direct pack generator must be bit-identical to the .mat route.

scripts/make_pack_direct.py exists so the 70-epoch rehearsal can rebuild
its pack after a box wipe without regenerating the 29 GB .mat tree; this
test proves the shortcut changes nothing: for a small N, generate the
.mat set (scripts/make_dstl_scale_set.py), pack it through
data.dstl.pack_mat_directory (scipy or native reader, whichever the box
has), and compare every array against build_pack's output.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np

SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"


def test_direct_pack_matches_mat_route(tmp_path):
    sys.path.insert(0, str(SCRIPTS))
    from make_pack_direct import build_pack

    n, seed = 7, 3
    subprocess.run(
        [sys.executable, str(SCRIPTS / "make_dstl_scale_set.py"),
         str(tmp_path), str(n), str(seed)],
        check=True,
    )
    from corrifnet_tpu.data.dstl import pack_mat_directory

    pack_mat_directory(
        str(tmp_path / "RGBs"), str(tmp_path / "all20Ch"),
        str(tmp_path / "class06_mats"), str(tmp_path / "pack.npz"), n,
    )
    ref = np.load(tmp_path / "pack.npz", allow_pickle=False)
    direct = build_pack(n, seed)
    for key in ("rgb", "nir", "swir", "masks"):
        assert direct[key].dtype == ref[key].dtype
        np.testing.assert_array_equal(direct[key], ref[key])
    assert list(direct["names"]) == list(ref["names"])
