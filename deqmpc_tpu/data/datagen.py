"""Expert-trajectory data pipeline.

Counterpart of the reference's `deqmpc/datagen.py`: load expert
pickles (:5-32), concatenate into flat arrays with episode-boundary
masks (:60-86), and sample random (history, horizon) windows with
cumulative-product mask zeroing past episode ends (:88-141).

The reference's expert pickles (`data/expert_traj_*.pkl`) are not in
the public release; `expert_gen.py` regenerates them with the AL
solver as the MPC expert (the controllable path — SURVEY.md §7).
Sampling runs host-side in numpy (cheap, data-dependent) and feeds
fixed-shape device batches.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

DATA_DIR = os.environ.get(
    "DEQMPC_DATA_DIR", os.path.join(os.path.dirname(__file__), "..", "..", "data")
)


def expert_data_path(env_name: str, teacher: str = "mpc") -> str:
    """File naming mirrors the reference (`datagen.py:15-28`)."""
    return os.path.join(DATA_DIR, f"expert_traj_{teacher}-{env_name}_new.pkl")


def get_gt_data(args, env, type: str = "mpc") -> List:
    """Load expert trajectories: list of trajectories, each a list of
    (state, action) tuples (`datagen.py:5-32`)."""
    path = expert_data_path(env.spec_id, type)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} not found — generate it with "
            f"`python -m deqmpc_tpu.data.expert_gen --env {getattr(args, 'env', env.spec_id)}`"
        )
    with open(path, "rb") as f:
        eps = pickle.load(f)
    if not eps:
        raise ValueError(
            f"{path} contains no episodes (truncated or placeholder "
            f"artifact?) — regenerate it with `python -m "
            f"deqmpc_tpu.data.expert_gen --env "
            f"{getattr(args, 'env', env.spec_id)}`")
    return eps


def merge_gt_data(gt_trajs: List, num_trajs: int = 2_000_000) -> Dict[str, np.ndarray]:
    """Concatenate trajectories into flat arrays with a mask that is 0
    at each episode's last step (`datagen.py:60-86`)."""
    states, actions, mask = [], [], []
    for i, traj in enumerate(gt_trajs):
        if i >= num_trajs:
            break
        for s, a in traj:
            states.append(np.asarray(s, np.float32))
            actions.append(np.asarray(a, np.float32))
            mask.append(1.0)
        mask[-1] = 0.0
    return {
        "state": np.stack(states).astype(np.float32),
        "action": np.stack(actions).astype(np.float32),
        "mask": np.asarray(mask, np.float32),
    }


def sample_trajectory(gt: Dict[str, np.ndarray], bsz: int, H: int, T: int,
                      rng: Optional[np.random.Generator] = None) -> Dict[str, np.ndarray]:
    """Sample bsz random windows: H-step observation history ending at
    the anchor, T-step future horizon starting at the anchor. Windows
    whose *history* crosses an episode boundary are rejected; horizon
    steps past an episode end are zeroed via the cumulative-product
    mask (`datagen.py:88-141`)."""
    rng = rng or np.random.default_rng()
    N = len(gt["state"])
    out = {k: [] for k in ("obs", "obs_action", "state", "action", "mask")}
    count = 0
    while count < bsz:
        idxs = rng.integers(H - 1, N, size=bsz * 4)
        for i in idxs:
            if count >= bsz:
                break
            if H > 1 and np.any(gt["mask"][i + 1 - H : i + 1] == 0):
                continue
            out["obs"].append(gt["state"][i + 1 - H : i + 1])
            out["obs_action"].append(gt["action"][i + 1 - H : i + 1])
            if i + T <= N:
                s = gt["state"][i : i + T]
                a = gt["action"][i : i + T]
                m = gt["mask"][i : i + T]
            else:
                pad = i + T - N
                s = np.concatenate([gt["state"][i:], np.zeros((pad, gt["state"].shape[1]), np.float32)])
                a = np.concatenate([gt["action"][i:], np.zeros((pad, gt["action"].shape[1]), np.float32)])
                m = np.concatenate([gt["mask"][i:], np.zeros(pad, np.float32)])
            out["state"].append(s)
            out["action"].append(a)
            out["mask"].append(m)
            count += 1
    batch = {k: np.stack(v) for k, v in out.items()}
    # zero everything past the first episode end inside the horizon
    batch["mask"] = np.cumprod(batch["mask"], axis=1)
    return batch
