#!/usr/bin/env bash
# One-command reproduce for MRISpineSeg (parity with run-vnet-mri.sh)
set -e

yml=vnet_mri_spine_seg_512_512_12_15k
save_dir_all=saved_model
save_dir=saved_model/${yml}
mkdir -p $save_dir

python3 train.py --config configs/mri_spine_seg/${yml}.yml \
    --save_dir $save_dir \
    --save_interval 500 --log_iters 100 \
    --num_workers 6 --do_eval --use_vdl \
    --keep_checkpoint_max 5 --seed 0

python3 val.py --config configs/mri_spine_seg/${yml}.yml \
    --save_dir $save_dir/best_model --model_path $save_dir/best_model/model.msgpack

python3 export.py --config configs/mri_spine_seg/${yml}.yml \
    --model_path $save_dir/best_model/model.msgpack \
    --save_dir $save_dir/export --input_shape 1 1 512 512 12

python3 deploy/python/infer.py \
    --config $save_dir/export/deploy.yaml \
    --image_path data/MRSpineSeg/MRI_spine_seg_phase0_class20_big_12/images \
    --benchmark True
