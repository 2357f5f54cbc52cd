#!/usr/bin/env bash
# Multi-host evaluation (reference tools/scripts/dist_test.sh, which used
# torch.distributed.launch + NCCL DDP around the eval model).
#
# TPU-native launch: run once per host of the pod slice. Each process scores
# its stride-shard of the val split on its local chips (add --num_devices N
# to also shard each batch over N local chips) and rank 0 merges det_annos
# and writes result.json (fv2p_tpu eval_utils._interleave + misc.all_gather;
# reference merge: pcdet/utils/common_utils.py:185-206).
#
#   JAX_COORDINATOR_ADDRESS=<host0>:8476 \
#   JAX_NUM_PROCESSES=<n_hosts> JAX_PROCESS_ID=<rank> \
#   bash tools/scripts/dist_test.sh --cfg_file cfgs/...yaml --ckpt ...
set -euo pipefail
cd "$(dirname "$0")/.."
exec python test.py --dist "$@"
