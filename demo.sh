#!/usr/bin/env bash
# End-to-end demo workflow (reference surface: demo.sh)
set -e

# 1. data preparation: multiscale HR -> 512 sub-images -> edge masks -> bicubic LR
python scripts/data_preparation/generate_multiscale_img.py --input datasets/DF2K_OST/HR --output datasets/DF2K_OST/multiscale
python scripts/data_preparation/extract_subimages.py --input datasets/DF2K_OST/multiscale --output datasets/DF2K_OST/multiscale_HR_sub_512 --crop_size 512 --step 256
python scripts/data_preparation/generate_mask.py --input datasets/DF2K_OST/multiscale_HR_sub_512 --output datasets/DF2K_OST/mask_selfsim --threshold 20
python scripts/data_preparation/generate_bicubic_lr.py --input datasets/DF2K_OST/multiscale_HR_sub_512 --output datasets/DF2K_OST/bicubic/x4/multiscale_HR_sub_512 --scale 4 --mod 0

# 2. training
python -m ssl_tpu.train -opt options/train/ESRGANSSL/train_ESRGANSSL_bicubic_x4.yml

# 3. evaluation
python -m ssl_tpu.test -opt options/test/ESRGANSSL/test_ESRGANSSL_bicubic_x4.yml

# 4. inference on your own images
python inference/inference_ssl_sr.py --input my_lq_images/ --output results/my_sr \
    --model_path experiments/ESRGANSSL_bicubic_x4/models/net_g_400000.pkl
