#!/usr/bin/env bash
# Launch commands for the benchmark configs (BASELINE.md / reference
# README.md flag table; counterpart of the reference's missing
# `deqmpc/run.sh`). Generate expert data first:
#   python -m deqmpc_tpu.data.expert_gen --env <env> --episodes 256
set -e
cd "$(dirname "$0")/.."

case "${1:-pendulum}" in
  # 1. pendulum deq-mpc-deq (T=5, deq_iter=6, hdim=256) — PR1 reference
  pendulum)
    python -m deqmpc_tpu.training.train --env pendulum --model_type deq-mpc-deq \
      --T 5 --deq_iter 6 --hdim 256 --bsz 128 --save --name pendulum_deqmpc ;;
  # 2. cartpole swing-up (longer horizon, tighter control limits)
  cartpole)
    python -m deqmpc_tpu.training.train --env cartpole1link --model_type deq-mpc-deq \
      --T 10 --deq_iter 6 --hdim 256 --bsz 128 --nq 2 --save --name cartpole_deqmpc ;;
  # 3. flying cartpole — deq-mpc-nn vs diff-mpc-deq comparison
  flying_nn)
    python -m deqmpc_tpu.training.train --env FlyingCartpole --model_type deq-mpc-nn \
      --T 5 --deq_iter 6 --hdim 256 --bsz 128 --nq 7 --save --name flying_deqmpc_nn ;;
  flying_diffmpc)
    python -m deqmpc_tpu.training.train --env FlyingCartpole --model_type diff-mpc-deq \
      --T 5 --hdim 256 --bsz 128 --nq 7 --save --name flying_diffmpc_deq ;;
  # 3b. obstacle variant: solver carries per-(b,t) nearest-4 sphere
  # constraints (AL_mpc_custom.py counterpart)
  flying_obstacles)
    python -m deqmpc_tpu.training.train --env FlyingCartpole_obstacles --model_type deq-mpc-nn \
      --T 5 --deq_iter 6 --hdim 256 --bsz 128 --nq 7 --save --name flying_obstacles ;;
  # 4. rex_quadrotor deq-mpc-deq (hardest KKT blocks)
  rexquad)
    python -m deqmpc_tpu.training.train --env rexquadrotor --model_type deq-mpc-deq \
      --T 5 --deq_iter 6 --hdim 256 --bsz 128 --nq 6 --save --name rexquad_deqmpc ;;
  # 5. streaming warm-start mode (L=2) on rex_quadrotor
  rexquad_streaming)
    python -m deqmpc_tpu.training.train --env rexquadrotor --model_type deq-mpc-deq \
      --T 5 --deq_iter 6 --hdim 256 --bsz 128 --nq 6 --streaming --streaming_steps 2 \
      --save --name rexquad_streaming ;;
  *)
    echo "usage: $0 {pendulum|cartpole|flying_nn|flying_diffmpc|rexquad|rexquad_streaming}" ;;
esac
