"""Policy layer: network + optimizer composition and losses (SURVEY.md §2.1)."""
from .deqmpc_policy import DEQMPCPolicy, NNMPCPolicy, PolicyCarry, PolicyConfig
from .losses import (compute_cost_coeff, compute_loss_deqmpc,
                     compute_loss_deqmpc_hist)
from .policy_variants import (DEQMPCPolicyFeedback, DEQMPCPolicyHistory,
                              DEQMPCPolicyHistoryEstPred, DEQMPCPolicyMem,
                              DEQMPCPolicyQ)
from .tracking_mpc import TrackingMPC

__all__ = [
    "DEQMPCPolicy",
    "NNMPCPolicy",
    "PolicyCarry",
    "PolicyConfig",
    "TrackingMPC",
    "DEQMPCPolicyFeedback",
    "DEQMPCPolicyHistory",
    "DEQMPCPolicyHistoryEstPred",
    "DEQMPCPolicyMem",
    "DEQMPCPolicyQ",
    "compute_cost_coeff",
    "compute_loss_deqmpc",
    "compute_loss_deqmpc_hist",
]
