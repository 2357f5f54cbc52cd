#!/usr/bin/env bash
# Multi-host data-parallel training (reference tools/scripts/dist_train.sh,
# which used torch.distributed.launch + NCCL).
#
# TPU-native launch: run this script once per host of the pod slice. JAX
# discovers the coordinator through the TPU runtime metadata, or explicitly:
#
#   JAX_COORDINATOR_ADDRESS=<host0>:8476 \
#   JAX_NUM_PROCESSES=<n_hosts> JAX_PROCESS_ID=<rank> \
#   bash tools/scripts/dist_train.sh --cfg_file cfgs/...yaml
#
# All per-host processes see their local chips; the global mesh is formed by
# jax.distributed.initialize() inside tools/train.py (--dist).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python train.py --dist "$@"
