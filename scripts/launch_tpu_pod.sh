#!/usr/bin/env bash
# Multi-host TPU pod launcher (replaces the reference's slurm scripts,
# reference baseline/*/run_*.slurm and the torchrun/slurm env parsing in
# utils.py:37-93). On a TPU pod each host runs the same command;
# jax.distributed.initialize() discovers peers from the TPU metadata —
# no rendezvous files, no WORLD_SIZE plumbing.
#
# Usage (from the pod's controller):
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="bash $(pwd)/scripts/launch_tpu_pod.sh --step 5 \
#                --dataset_name multimodal --target sex --base_path /data/abcd"
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m multimodal_neuroimage_tpu.cli.main --distributed "$@"
