#!/bin/bash
# Round-2 close-out measurements, in priority order, for when the TPU
# tunnel is back (it was down for hours late in round 2). Each step is
# independently useful; later steps can be dropped if time runs out.
#   bash scripts/r2_close_measure.sh 2>&1 | tee /tmp/r2_close.log
set -x
cd "$(dirname "$0")/.."

# 0. tunnel sanity
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 0b. per-layer fused-kernel microbench (smallest compiles, fastest signal)
timeout 1800 python scripts/micro_fusedconv.py
MF_FWD_ONLY=1 timeout 1200 python scripts/micro_fusedconv.py

# 1. ablations (device trace, B=8, the bench config): fusebn, remat:mid
timeout 1200 python scripts/profile_step.py 8 unroll:0,rng:rbg
timeout 1200 python scripts/profile_step.py 8 unroll:0,rng:rbg,fusebn:1
timeout 1200 python scripts/profile_step.py 8 unroll:0,rng:rbg,remat:mid
timeout 1200 python scripts/profile_step.py 8 unroll:0,rng:rbg,fusebn:1,remat:mid

# 1b. fused-block kernel path (ops/fusedconv.py) ablation
timeout 1200 python scripts/profile_step.py 8 unroll:0,rng:rbg,fusedblk:1
timeout 1200 python scripts/profile_step.py 8 unroll:0,rng:rbg,fusedblk:1,remat:mid

# 1c. auto-layout probe (donated-state layouts; untagged-copy pool)
timeout 1800 python scripts/layout_probe.py 8 3 224 | tail -5

# 2. bench at HEAD (records the pipelined-dispatch number)
timeout 3600 python bench.py

# 2b. full (reference-faithful) depth mode: the single-pass ReLU+IN
#     fallback rewrite targets its 128^3 decoder slabs (was 25.51
#     patches/s at the last measurement). Trace + bench at B=8.
timeout 2400 python scripts/profile_step.py 8 unroll:0,rng:rbg,depth:full
BENCH_DEPTH=full BENCH_BATCH=8 timeout 3600 python bench.py

# 3. if fusebn won in (1): flip the MMVit4 default + bench again, then
#    re-record the dryrun loss (expect a 3rd-4th decimal reassociation
#    shift; update CLAUDE.md + __graft_entry__ docs).

# 4. zoo-matrix refresh for the three models whose semantics were fixed by
#    the round-2 parity campaign (DeepLab inplace-ReLU aliasing, RFNet gated
#    modal_fusion, MultiSenseSeg decode gate) — the earlier matrix rows
#    measured the pre-fix models.
MODELS_OVERRIDE="DeepLabv3_plus RFNet MultiSenseSeg" \
  timeout 5400 bash scripts/zoo_matrix.sh /tmp/zoo_refix || true
cat /tmp/zoo_refix/zoo_matrix.tsv || true
