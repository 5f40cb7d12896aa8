#!/bin/bash
# Full LangSplat pipeline (TPU-native), mirroring /root/reference/process.sh.
# Usage: dataset_path=data/sofa casename=sofa bash process.sh
set -e

# 1. language features (SAM+CLIP; needs local model weights)
python -m langsplat_tpu.cli.preprocess_cli --dataset_path "$dataset_path"

# 2. scene-wise autoencoder: 512-d -> 3-d codes
python -m langsplat_tpu.cli.autoencoder_cli \
    --dataset_path "$dataset_path" --dataset_name "$casename" \
    --encoder_dims 256 128 64 32 3 --decoder_dims 16 32 64 128 256 256 512 --lr 0.0007
python -m langsplat_tpu.cli.autoencoder_cli test \
    --dataset_path "$dataset_path" --dataset_name "$casename"

# 3. RGB 3DGS pretraining (phase A)
python train.py -s "$dataset_path" -m "output/${casename}" --no_include_feature

# 4. language feature training per SAM granularity level (phase B)
for level in 1 2 3; do
    python train.py -s "$dataset_path" -m "output/${casename}" \
        --start_checkpoint "output/${casename}_-1/chkpnt30000.npz" \
        --feature_level "${level}"
done

# 5. render RGB + language features
for level in 1 2 3; do
    python render.py -m "output/${casename}_${level}" -s "$dataset_path"
    python render.py -m "output/${casename}_${level}" -s "$dataset_path" --include_feature
done
