#!/usr/bin/env bash
# Full training recipes (counterpart of the reference's run_eval.py SLURM
# driver — SURVEY.md §2.1).  Stages must run sequentially: the GAN config
# points at the HWR and autoencoder checkpoints.
#
# For a cluster, wrap each line in your scheduler's submit command; the
# trainers soft-resume from checkpoint-latest so preempted jobs requeue
# cleanly (train.py -r).
set -euo pipefail
cd "$(dirname "$0")/.."

# 1. HWR pretraining (IAM; --dataset synthetic for a data-free smoke)
python train.py -c configs/iam_hwr.json "$@"

# 2. perceptual autoencoder
python train.py -c configs/iam_auto_2tight.json "$@"

# 3. the GAN (uses saved/iam_hwr + saved/iam_auto_2tight checkpoints)
python train.py -c configs/iam_gan_paper.json "$@"

# 4. style extraction + quick evals
python get_styles.py -c configs/iam_gan_paper.json -k saved/iam_gan_paper
python eval_writer_id.py saved/iam_gan_paper/train_styles_*.npz
python evaluate.py -c configs/iam_gan_paper.json -k saved/iam_gan_paper -n 50
