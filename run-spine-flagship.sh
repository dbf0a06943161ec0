#!/usr/bin/env bash
# Resumable driver for the anisotropic-flagship convergence study:
# the UNMODIFIED VNetDeepSup MRISpineSeg recipe (512x512x12, 20
# classes, 15000 iters) on the structured synthetic spine task.
# Reference recipe: /root/reference/configs/mri_spine_seg/
# vnetdeepsup_mri_spine_seg_512_512_12_15k.yml:11-20.
#
# The full schedule is ~5.6 h at 1.34 s/step on one v5e chip, so the
# study spans sessions: each invocation regenerates the (gitignored)
# dataset if absent, resumes from the newest checkpoint, and can be
# wall-bounded with SPINE_TIMEOUT seconds (default: unbounded).
# Checkpoints + eval curve land in output/synspine15k/ and
# train.log; copy new eval points into documentation/benchmarks.md.
set -e
set -o pipefail

cfg=configs/synthetic/vnetdeepsup_synspine_15k.yml
save_dir=output/synspine15k
mkdir -p "$save_dir"

if [ ! -f data/synspine2/synspine2_phase0/train_list.txt ]; then
    python3 tools/generate_synthetic_dataset.py --root data \
        --num_volumes 40 --style spine --name synspine2 --seed 7 \
        --val_frac 0.1
fi

# Newest COMPLETE iter_N checkpoint, if any. Checkpoint files are
# written atomically (tmp+rename, opt.msgpack last — see
# utils/checkpoint.py), so "opt.msgpack present" marks a resumable dir;
# fall back past any dir a mid-save SIGTERM left without one. Sort on
# basenames so an underscore in $save_dir can't break the numeric key.
resume=""
for d in $(ls "$save_dir" 2>/dev/null | grep '^iter_' | sort -t_ -k2 -rn); do
    if [ -f "$save_dir/$d/opt.msgpack" ] && \
       [ -f "$save_dir/$d/model.msgpack" ]; then
        resume="$save_dir/$d"
        break
    fi
    echo "Skipping incomplete checkpoint $save_dir/$d"
done
resume_flag=""
if [ -n "$resume" ]; then
    echo "Resuming from $resume"
    resume_flag="--resume_model $resume"
fi

runner="python3"
if [ -n "$SPINE_TIMEOUT" ]; then
    runner="timeout $SPINE_TIMEOUT python3"
fi

status=0
$runner train.py --config "$cfg" \
    --save_dir "$save_dir" \
    --save_interval 500 --log_iters 50 \
    --do_eval --keep_checkpoint_max 3 --seed 7 \
    $resume_flag 2>&1 | tee -a "$save_dir"/train.log || status=$?

# timeout(1) exit 124 is the expected wall-bounded stop, not a failure.
if [ "$status" -eq 124 ]; then
    echo "Wall-bounded stop (SPINE_TIMEOUT=${SPINE_TIMEOUT}s); resumable."
    exit 0
fi
exit "$status"
