#!/usr/bin/env bash
# One-command reproduce: train -> val -> export -> deploy-infer
# (parity with reference run-vnet.sh:11-27; device selection is automatic
# via jax.devices() instead of CUDA_VISIBLE_DEVICES)
set -e

# On TPU, prefer the production variant (bf16 + remat + Pallas MXU
# convs): yml=vnet_lung_coronavirus_128_128_128_15k_tpu
yml=${VNET_CONFIG:-vnet_lung_coronavirus_128_128_128_15k}
save_dir_all=saved_model
save_dir=saved_model/${yml}
mkdir -p $save_dir

# Train the model: see the train section in README for more parameters
python3 train.py --config configs/lung_coronavirus/${yml}.yml \
    --save_dir $save_dir \
    --save_interval 500 --log_iters 100 \
    --num_workers 6 --do_eval --use_vdl \
    --keep_checkpoint_max 5 --seed 0

# Validate the model: see the val section in README for more parameters
python3 val.py --config configs/lung_coronavirus/${yml}.yml \
    --save_dir $save_dir/best_model --model_path $save_dir/best_model/model.msgpack

# Export with jax.export / StableHLO
python3 export.py --config configs/lung_coronavirus/${yml}.yml \
    --model_path $save_dir/best_model/model.msgpack \
    --save_dir $save_dir/export

# Deploy inference
python3 deploy/python/infer.py \
    --config $save_dir/export/deploy.yaml \
    --image_path data/lung_coronavirus/lung_coronavirus_phase0/images \
    --benchmark True
